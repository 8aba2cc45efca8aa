"""wave_averaged f32 gradient-conditioning probe (VERDICT r3 weak #1).

Runs twice: once plain (f32) and once with JAX_ENABLE_X64=1 (the f64
oracle, same code) — compares param-gradients of the corrected-mode
(parity=False) wave_averaged residual loss at torch-seeded random init.

Usage:  python .soak/wave_grad_cond.py            # orchestrates both runs
        python .soak/wave_grad_cond.py --phase f32|f64 --out X.npz
"""

import argparse
import os
import subprocess
import sys

import numpy as np


def run_phase(out, dtype, ablate):
    import jax
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    sys.path.insert(0, "/root/repo")
    from pinn_depthestimation_tpu.config import parse_config
    from pinn_depthestimation_tpu.models import MLPSpec, init_mlp_params
    from pinn_depthestimation_tpu.training.loss import build_loss_fn
    from pinn_depthestimation_tpu.utils import synthetic

    import tempfile

    from pinn_depthestimation_tpu import data as data_mod

    tmp = tempfile.mkdtemp()
    csv, mat = os.path.join(tmp, "f.csv"), os.path.join(tmp, "r.mat")
    data_seed = int(os.environ.get("WGC_SEED", "5"))
    depth = int(os.environ.get("WGC_DEPTH", "3"))
    nx = int(os.environ.get("WGC_NX", "33"))
    ny = int(os.environ.get("WGC_NY", "27"))
    n_csv = int(os.environ.get("WGC_NCSV", "200"))
    synthetic.make_cmb_dataset(csv, mat, nx=nx, ny=ny, n_csv=n_csv,
                               seed=data_seed, nan_fraction=0.03)
    cfg = parse_config({
        "layers": {"input_features": 2, "hidden_layers": depth, "hidden_width": 20,
                   "output_features": 6, "dropout_rate": 0.0, "init_type": "xavier"},
        "adam_optimizer": {"max_it": 1, "learning_rate": 1e-4,
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
                          "training_points": 60},
        "data_residual": {"file": mat,
                          "inputs": {"x": {"requires_grad": ["true"]},
                                     "y": {"requires_grad": ["true"]}},
                          "outputs": ["h", "U", "V", "eta_mean", "Hrms", "k"],
                          "interval_x": 1, "interval_y": 1},
        "data_test": {"x_min": 25.0, "x_max": 33.0,
                      "y_min": -13.0, "y_max": 13.0},
        "physics": "wave_averaged",
        "parity": os.environ.get("WGC_PARITY", "0") == "1",
    })
    spec = MLPSpec.from_layers(cfg.layers)
    params32 = init_mlp_params(jax.random.PRNGKey(0), spec)
    out_scale = float(os.environ.get("WGC_OUTSCALE", "1.0"))
    if out_scale != 1.0:  # shrink head outputs -> small kh (adversarial)
        params32 = dict(params32)
        params32["w_out"] = params32["w_out"] * out_scale
    head_scale = float(os.environ.get("WGC_HEADSCALE", "1.0"))
    if head_scale != 1.0:
        # shrink ONLY the h (col 0) and k (col 5) heads: t = 2kh -> tiny while
        # Hrms (so E) stays O(1) — the adversarial small-t regime where the
        # naive quotient's AD cancellation dominates the stress gradients
        params32 = dict(params32)
        w = np.asarray(params32["w_out"]).copy()
        b = np.asarray(params32["b_out"]).copy()
        w[:, 0] *= head_scale; w[:, 5] *= head_scale
        b[0] *= head_scale; b[5] *= head_scale
        params32["w_out"], params32["b_out"] = w, b
    params = jax.tree.map(lambda a: jnp.asarray(np.asarray(a), dtype), params32)
    td = data_mod.load_training_data(cfg)
    batch = {
        "fidelity_input": jnp.asarray(td.fidelity_input, dtype),
        "fidelity_true": jnp.asarray(td.fidelity_true, dtype),
        "residual_input": jnp.asarray(td.residual_input, dtype),
    }
    if ablate == "drop_stress":
        import pinn_depthestimation_tpu.physics as phys
        orig = phys.wave_averaged_residuals
        def patched(fields, grads, *, parity=True):
            fc, fxr, fyr = orig(fields, grads, parity=True)  # parity=True: E=0
            return fc, fxr, fyr
        phys.wave_averaged_residuals = patched
    elif ablate == "naive_sinh":
        # the pre-round-4 formulation: AD through the raw quotient
        import pinn_depthestimation_tpu.physics as phys
        phys._t_over_sinh = lambda t: t / jnp.sinh(t)

    loss_fn = build_loss_fn(cfg, spec)
    (total, (fid, resl)), g = jax.jit(
        jax.value_and_grad(loss_fn, has_aux=True)
    )(params, batch)
    flat = jnp.concatenate([jnp.ravel(l) for l in jax.tree.leaves(g)])
    np.savez(out, total=float(total), fid=float(fid), res=float(resl),
             g=np.asarray(flat, np.float64),
             **{f"g_{k}": np.asarray(v, np.float64) for k, v in g.items()})
    print(f"{dtype}: total {float(total):.8e} fid {float(fid):.8e} "
          f"res {float(resl):.8e} |g| {float(jnp.linalg.norm(flat)):.6e}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--phase", default=None)
    ap.add_argument("--out", default=None)
    ap.add_argument("--ablate", default="none")
    args = ap.parse_args()
    if args.phase:
        dtype = "float64" if args.phase == "f64" else "float32"
        run_phase(args.out, dtype, args.ablate)
        return

    for ablate in os.environ.get("WGC_ABLATE", "none").split(","):
        outs = {}
        for phase in ("f32", "f64"):
            out = f"/tmp/wgc_{phase}_{ablate}.npz"
            env = dict(os.environ)
            if phase == "f64":
                env["JAX_ENABLE_X64"] = "1"
            subprocess.run(
                [sys.executable, __file__, "--phase", phase, "--out", out,
                 "--ablate", ablate],
                env=env, check=True,
            )
            outs[phase] = np.load(out)
        g32, g64 = outs["f32"]["g"], outs["f64"]["g"]
        rel = np.linalg.norm(g32 - g64) / np.linalg.norm(g64)
        cos = np.dot(g32, g64) / (np.linalg.norm(g32) * np.linalg.norm(g64))
        print(f"[{ablate}] grad rel gap {rel:.3%}, cosine {cos:.6f}, "
              f"loss rel {abs(outs['f32']['total']-outs['f64']['total'])/outs['f64']['total']:.2e}")
        # per-leaf metric in _assert_grads_close semantics (max-abs-scaled
        # elementwise gap) — the round-3c "2.6-4.0%" reading
        worst = 0.0
        for k in outs["f32"].files:
            if not k.startswith("g_"):
                continue
            a, b = outs["f64"][k], outs["f32"][k]
            leaf = np.max(np.abs(b - a)) / (np.abs(a).max() + 1e-12)
            worst = max(worst, leaf)
            print(f"    leaf {k[2:]:>9s}: max-scaled gap {leaf:.3%}, "
                  f"norm-rel {np.linalg.norm(b - a) / (np.linalg.norm(a) + 1e-300):.3%}")
        print(f"[{ablate}] worst per-leaf max-scaled gap {worst:.3%}")


if __name__ == "__main__":
    main()
