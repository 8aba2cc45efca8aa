"""Does f32 roundoff move corrected-mode CMB convergence? (VERDICT r3 item 2)

Trains the CMB workload (wave_averaged, parity=False — radiation stresses
active) with plain Adam in f32 and in f64 (same code, JAX_ENABLE_X64 in a
subprocess), identical PRNGKey(0) init, and compares the per-iteration loss
trajectories and terminal losses. The f64 run is the oracle: if the f32
trajectory tracks it and lands in the same basin, the measured ~0.01-0.2%
f32 gradient gap (wave_grad_cond.py) does not move training.

Usage: python .soak/cmb_f32_conv.py [iters]   # orchestrates both phases
"""

import os
import subprocess
import sys

import numpy as np

ITERS = int(os.environ.get("CFC_ITERS", sys.argv[1] if len(sys.argv) > 1 else "500"))
LR = float(os.environ.get("CFC_LR", "1e-4"))


def run_phase(out, dtype):
    import jax
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import optax

    sys.path.insert(0, "/root/repo")
    import tempfile

    from pinn_depthestimation_tpu import data as data_mod
    from pinn_depthestimation_tpu.config import parse_config
    from pinn_depthestimation_tpu.models import MLPSpec, init_mlp_params
    from pinn_depthestimation_tpu.training.loss import build_loss_fn
    from pinn_depthestimation_tpu.utils import synthetic

    tmp = tempfile.mkdtemp()
    csv, mat = os.path.join(tmp, "f.csv"), os.path.join(tmp, "r.mat")
    synthetic.make_cmb_dataset(csv, mat, nx=21, ny=17, n_csv=120, seed=6,
                               nan_fraction=0.03)
    cfg = parse_config({
        "layers": {"input_features": 2, "hidden_layers": 3, "hidden_width": 20,
                   "output_features": 6, "dropout_rate": 0.0, "init_type": "xavier"},
        "adam_optimizer": {"max_it": ITERS, "learning_rate": LR,
                           "scheduler_step_size": 10000, "scheduler_gamma": 0.8},
        "lbfgs_optimizer": {"max_it": 0, "learning_rate": 1, "max_evaluation": 0,
                            "history_size": 5, "tolerance_grad": 1e-9,
                            "tolerance_change": 1e-12},
        "loss": {"weight_fid_loss": 1, "weight_res_loss": 1,
                 "weight_h_loss": 2, "weight_U_loss": 1, "weight_V_loss": 1,
                 "weight_eta_mean_loss": 1, "weight_Hrms_loss": 1,
                 "weight_k_loss": 1},
        "data_fidelity": {"file": csv, "inputs": ["x", "y"],
                          "outputs": ["h", "U", "V", "eta_mean", "Hrms", "k"],
                          "training_points": 80},
        "data_residual": {"file": mat,
                          "inputs": {"x": {"requires_grad": ["true"]},
                                     "y": {"requires_grad": ["true"]}},
                          "outputs": ["h", "U", "V", "eta_mean", "Hrms", "k"],
                          "interval_x": 1, "interval_y": 1},
        "data_test": {"x_min": 25.0, "x_max": 33.0,
                      "y_min": -13.0, "y_max": 13.0},
        "physics": "wave_averaged",
        "parity": False,
    })
    spec = MLPSpec.from_layers(cfg.layers)
    params32 = init_mlp_params(jax.random.PRNGKey(0), spec)
    params = jax.tree.map(lambda a: jnp.asarray(np.asarray(a), dtype), params32)
    if os.environ.get("CFC_PERTURB") == "1":
        # one infinitesimal kick: chaos control — if this forks an f64 run as
        # much as f32-vs-f64 forks, the fork is Lyapunov amplification, not
        # precision
        params = dict(params)
        params["b_in"] = params["b_in"].at[0].add(float(os.environ.get("CFC_KICK", "1e-12")))
    td = data_mod.load_training_data(cfg)
    batch = {
        "fidelity_input": jnp.asarray(td.fidelity_input, dtype),
        "fidelity_true": jnp.asarray(td.fidelity_true, dtype),
        "residual_input": jnp.asarray(td.residual_input, dtype),
    }
    loss_fn = build_loss_fn(cfg, spec)
    vg = jax.jit(jax.value_and_grad(loss_fn, has_aux=True))
    opt = optax.adam(LR)
    state = opt.init(params)
    losses = []
    for _ in range(ITERS):
        (total, _aux), g = vg(params, batch)
        losses.append(float(total))
        updates, state = opt.update(g, state)
        params = optax.apply_updates(params, updates)
    # final h field on the collocation rows
    from pinn_depthestimation_tpu.models import mlp_apply
    h = np.asarray(mlp_apply(params, batch["residual_input"], spec)[:, 0],
                   np.float64)
    np.savez(out, losses=np.asarray(losses), h=h)
    print(f"{dtype}: first {losses[0]:.6e} last {losses[-1]:.6e}")


def main():
    if len(sys.argv) > 2 and sys.argv[1] == "--phase":
        run_phase(sys.argv[3], "float64" if sys.argv[2] == "f64" else "float32")
        return
    outs = {}
    for phase in ("f32", "f64", "f64p"):
        out = f"/tmp/cfc_{phase}.npz"
        env = dict(os.environ, CFC_ITERS=str(ITERS), CFC_LR=str(LR))
        if phase.startswith("f64"):
            env["JAX_ENABLE_X64"] = "1"
        if phase == "f64p":
            env["CFC_PERTURB"] = "1"
        subprocess.run([sys.executable, __file__, "--phase",
                        "f64" if phase.startswith("f64") else "f32", out],
                       env=env, check=True)
        outs[phase] = np.load(out)
    l32, l64 = outs["f32"]["losses"], outs["f64"]["losses"]
    rel = np.abs(l32 - l64) / np.abs(l64)
    h32, h64 = outs["f32"]["h"], outs["f64"]["h"]
    hrmse = np.sqrt(np.mean((h32 - h64) ** 2))
    print(f"{ITERS} iters: loss rel diff first {rel[0]:.2e} median "
          f"{np.median(rel):.2e} max {np.max(rel):.2e}")
    print(f"terminal: f32 {l32[-1]:.6e} vs f64 {l64[-1]:.6e} "
          f"(rel {rel[-1]:.2e}); h-field RMSE(f32,f64) {hrmse:.3e} m "
          f"({hrmse / (np.ptp(h64) + 1e-12):.2%} of f64 predicted range)")
    # chaos control: f64 vs f64+1e-12 kick
    lp = outs["f64p"]["losses"]
    relp = np.abs(lp - l64) / np.abs(l64)
    hp = outs["f64p"]["h"]
    print(f"chaos control (f64 vs f64+{os.environ.get('CFC_KICK', '1e-12')} kick): median rel "
          f"{np.median(relp):.2e} max {np.max(relp):.2e}; terminal "
          f"{lp[-1]:.6e} vs {l64[-1]:.6e} (rel {relp[-1]:.2e}); h RMSE "
          f"{np.sqrt(np.mean((hp - h64) ** 2)):.3e} m")


if __name__ == "__main__":
    main()
