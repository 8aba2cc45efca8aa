"""Round-5 re-pin of the BASELINE.md margin-table row, now that the mesh
path routes through the SHARDED ONE-KERNEL training step
(ops/kernels_step.fused_loss_and_grad_sharded: per-shard train-epilogue
kernel, psum'd loss stats + gradient partial sums, global cotangent
scales): 1-chip-TPU-mesh shard_map overhead on the flagship Adam step
(fused f32, scan-chunked), plus a hardware numerics check that the mesh
trajectory equals the plain trajectory.

ONE process, sequential (TPU hygiene): plain Trainer then mesh Trainer,
timing the jitted `_adam_chunk` (500-step scans, 3 reps, median), syncing
by fetching a loss value (block_until_ready is unreliable through the
tunnel — CLAUDE.md). Mirrors .soak/shard_ab_r4.py (two-kernel era:
4.995 ms plain vs 4.902 ms mesh = 0.981x).

Usage: python .soak/shard_ab_r5.py [--smoke]
"""

import sys
import tempfile
import time

import numpy as np

from pinn_depthestimation_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

SMOKE = "--smoke" in sys.argv

import jax  # noqa: E402

if SMOKE:
    jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp  # noqa: E402

from pinn_depthestimation_tpu.config import parse_config  # noqa: E402
from pinn_depthestimation_tpu.parallel import make_mesh  # noqa: E402
from pinn_depthestimation_tpu.training import Trainer  # noqa: E402
from pinn_depthestimation_tpu.utils import synthetic  # noqa: E402

if not SMOKE:
    assert jax.devices()[0].platform == "tpu", "this A/B needs the real chip"

NX, NY = (16, 14) if SMOKE else (81, 261)
DEPTH = 3 if SMOKE else 100
CHUNK = 5 if SMOKE else 500
REPS = 2 if SMOKE else 3

mat = tempfile.mktemp(suffix=".mat")
synthetic.make_newmethod_mat(mat, nx=NX, ny=NY, nan_fraction=0.408, seed=21)
cfg = parse_config({
    "layers": {"input_features": 2, "hidden_layers": DEPTH, "hidden_width": 20,
               "output_features": 3, "dropout_rate": 0.0, "init_type": "xavier"},
    "adam_optimizer": {"max_it": 1000, "learning_rate": 1e-4,
                       "scheduler_step_size": 10000, "scheduler_gamma": 0.8},
    "lbfgs_optimizer": {"max_it": 0, "learning_rate": 1, "max_evaluation": 0,
                        "history_size": 100, "tolerance_grad": 1e-5,
                        "tolerance_change": 1e-7,
                        "line_search_fn": "strong_wolfe"},
    "loss": {"weight_fid_loss": 1, "weight_res_loss": 1},
    "data": {"file": mat,
             "inputs": {"x": {"requires_grad": ["true"]},
                        "y": {"requires_grad": ["true"]}},
             "trues": ["U", "V"], "unknowns": ["h"]},
    "data_test": {"x_min": 25.0, "x_max": 33.0, "y_min": -13.0, "y_max": 13.0},
})


def run_chunk_and_time(tr):
    """(median ms/iter, loss trajectory of one deterministic chunk)."""
    key = jax.random.PRNGKey(0)
    run = lambda: tr._adam_chunk(  # noqa: E731
        tr.state.params, tr.state.opt_state, tr.batch, key, jnp.int32(0), CHUNK
    )
    _, _, losses = run()
    traj = np.asarray(losses)  # compile + warm, host sync
    ts = []
    for _ in range(REPS):
        t0 = time.perf_counter()
        _, _, losses = run()
        float(losses[-1, -1])
        ts.append((time.perf_counter() - t0) / CHUNK * 1e3)
    return sorted(ts)[len(ts) // 2], traj


results, trajs = {}, {}
for label, mesh in (("plain", None), ("mesh1", "build")):
    if mesh == "build":
        mesh = make_mesh(1, devices=jax.devices()[:1])
    with tempfile.TemporaryDirectory() as run_dir:
        tr = Trainer(cfg, run_dir=run_dir, echo_every=0, mesh=mesh)
        ms, traj = run_chunk_and_time(tr)
    results[label], trajs[label] = ms, traj
    uses_step = tr.fused_step_fn is not None
    print(f"{label}: {ms:.3f} ms/iter (fused={tr.use_fused_kernel}, "
          f"one_kernel_step={uses_step}, "
          f"{tr.batch['residual_input'].shape[0]} pts)", flush=True)

rel = np.max(np.abs(trajs["mesh1"] - trajs["plain"])
             / np.maximum(np.abs(trajs["plain"]), 1e-12))
print(f"RESULT mesh1 loss trajectory vs plain: max rel diff {rel:.3e} "
      f"over {CHUNK} iters x 3 loss terms", flush=True)
print(f"RESULT shard overhead mesh1/plain = "
      f"{results['mesh1'] / results['plain']:.3f}x", flush=True)
