"""Attribute the CMB sharded-gate looseness (VERDICT r4 item 6).

MULTICHIP_r04.json certifies the CMB separate-fidelity sharded program at
1.1e-4/2.4e-4 (loss/grad rel) vs ~1e-7 for the other two pipelines, with the
residual looseness unattributed. This probe decomposes it on the gate's own
problem (8 virtual CPU devices, the exact cfg from __graft_entry__.py):

  A. sharded-XLA vs plain-XLA, f32      -> psum/reduction-order contribution
  B. fused(interpret) vs plain-XLA, f32 -> kernel dot-order contribution
     (unsharded, so no psum in the diff)
  C. fused(interpret)+shard_map vs plain-XLA, f32 -> the gate's own number
  D. sharded-XLA vs plain-XLA, f64      -> if ~1e-12, the f32 gaps are
     conditioning (the wave_averaged residual's catastrophic term
     cancellation amplifying ULP-order differences), not a shard-path bug.

Run: XLA_FLAGS=--xla_force_host_platform_device_count=8 python .soak/cmb_gate_attrib.py
"""
import os
import sys
import tempfile

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")
sys.path.insert(0, "/root/repo")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from pinn_depthestimation_tpu import data as data_mod  # noqa: E402
from pinn_depthestimation_tpu import parallel  # noqa: E402
from pinn_depthestimation_tpu.config import parse_config  # noqa: E402
from pinn_depthestimation_tpu.models import MLPSpec, init_mlp_params  # noqa: E402
from pinn_depthestimation_tpu.training import build_loss_fn  # noqa: E402
from pinn_depthestimation_tpu.utils import synthetic  # noqa: E402


def gate_cmb_config(tmp):
    """The exact cfg __graft_entry__.dryrun_multichip certifies."""
    csv = os.path.join(tmp, "fid.csv")
    mat2 = os.path.join(tmp, "res.mat")
    synthetic.make_cmb_dataset(csv, mat2, nx=15, ny=13, n_csv=77, seed=6,
                               nan_fraction=0.03)
    outs6 = ["h", "U", "V", "eta_mean", "Hrms", "k"]
    return parse_config({
        "layers": {"input_features": 2, "hidden_layers": 3,
                   "hidden_width": 16, "output_features": 6,
                   "dropout_rate": 0.0, "init_type": "xavier"},
        "adam_optimizer": {"max_it": 1, "learning_rate": 1e-4,
                           "scheduler_step_size": 100, "scheduler_gamma": 0.8},
        "lbfgs_optimizer": {"max_it": 0, "learning_rate": 1,
                            "max_evaluation": 0, "history_size": 5,
                            "tolerance_grad": 1e-9, "tolerance_change": 1e-12},
        "loss": {"weight_fid_loss": 1, "weight_res_loss": 1,
                 **{f"weight_{k}_loss": w for k, w in
                    zip(outs6, (2, 1, 1, 1, 0.5, 0.5))}},
        "data_fidelity": {"file": csv, "inputs": ["x", "y"],
                          "outputs": outs6, "training_points": 60},
        "data_residual": {"file": mat2,
                          "inputs": {"x": {"requires_grad": ["true"]},
                                     "y": {"requires_grad": ["true"]}},
                          "outputs": outs6, "interval_x": 1, "interval_y": 1},
        "data_test": {"x_min": 25.0, "x_max": 33.0,
                      "y_min": -13.0, "y_max": 13.0},
        "physics": "wave_averaged",
        "parity": False,
    })


def loss_grad(fn, params, batch):
    (t, _), g = jax.jit(jax.value_and_grad(fn, has_aux=True))(params, batch)
    return float(t), g


def rels(tag, t, g, t_ref, g_ref):
    lrel = abs(t - t_ref) / max(abs(t_ref), 1e-300)
    grel = max(
        float(np.max(np.abs(np.asarray(a) - np.asarray(b)))
              / (np.max(np.abs(np.asarray(b))) + 1e-300))
        for a, b in zip(jax.tree.leaves(g), jax.tree.leaves(g_ref))
    )
    print(f"{tag:55s} loss rel {lrel:.3e}   grad rel {grel:.3e}")
    return lrel, grel


def main():
    tmp = tempfile.mkdtemp()
    cfg = gate_cmb_config(tmp)
    spec = MLPSpec.from_layers(cfg.layers)
    params = dict(init_mlp_params(jax.random.PRNGKey(0), spec))
    params["b_out"] = params["b_out"].at[3].add(1.0)
    td = data_mod.load_training_data(cfg)
    mesh = parallel.make_mesh(8, 1, devices=jax.devices("cpu")[:8])

    host = {"fidelity_input": td.fidelity_input,
            "fidelity_true": td.fidelity_true,
            "residual_input": td.residual_input}
    batch32 = {k: jnp.asarray(v, jnp.float32) for k, v in host.items()}
    shard32 = parallel.shard_batch(host, mesh)
    repl = parallel.replicate(params, mesh)

    t0, g0 = loss_grad(build_loss_fn(cfg, spec), params, batch32)
    print(f"plain XLA f32 loss = {t0:.8e}")

    a = rels("A sharded-XLA f32 vs plain",
             *loss_grad(build_loss_fn(cfg, spec, mesh=mesh), repl, shard32),
             t0, g0)
    b = rels("B fused(interpret) unsharded f32 vs plain",
             *loss_grad(build_loss_fn(cfg, spec, fused_kernel=True,
                                      fused_interpret=True), params, batch32),
             t0, g0)
    c = rels("C fused(interpret)+shard_map f32 vs plain (gate)",
             *loss_grad(build_loss_fn(cfg, spec, fused_kernel=True,
                                      fused_interpret=True, mesh=mesh),
                        repl, shard32),
             t0, g0)

    # D: the same structural comparison in f64 — conditioning removed.
    with jax.enable_x64():
        params64 = jax.tree.map(lambda v: jnp.asarray(np.asarray(v), jnp.float64),
                                params)
        batch64 = {k: jnp.asarray(v, jnp.float64) for k, v in host.items()}
        t64, g64 = loss_grad(build_loss_fn(cfg, spec), params64, batch64)
        print(f"plain XLA f64 loss = {t64:.12e}")
        shard64 = parallel.shard_batch(
            {k: np.asarray(v, np.float64) for k, v in host.items()}, mesh)
        repl64 = parallel.replicate(params64, mesh)
        d = rels("D sharded-XLA f64 vs plain f64",
                 *loss_grad(build_loss_fn(cfg, spec, mesh=mesh), repl64,
                            shard64),
                 t64, g64)

    # conditioning scale: f32 plain vs f64 plain (single-path dtype gap)
    lrel_dtype = abs(t0 - t64) / abs(t64)
    grel_dtype = max(
        float(np.max(np.abs(np.asarray(a) - np.asarray(b)))
              / (np.max(np.abs(np.asarray(b))) + 1e-300))
        for a, b in zip(jax.tree.leaves(g0), jax.tree.leaves(g64))
    )
    print(f"\nplain f32 vs plain f64 (single-path conditioning): "
          f"loss rel {lrel_dtype:.3e}   grad rel {grel_dtype:.3e}")
    print("\nAttribution: if D ~ 1e-12 while A/B/C ~ the dtype gap, the gate "
          "looseness is f32 conditioning of the wave_averaged residual "
          "(term cancellation), not a shard-path discrepancy.")


if __name__ == "__main__":
    main()
