"""Round-4 re-pin of the BASELINE.md margin-table row: 1-chip-TPU-mesh
shard_map overhead on the flagship Adam step (fused f32, scan-chunked).

ONE process, sequential (TPU hygiene): plain Trainer then mesh Trainer,
timing the jitted `_adam_chunk` (500-step scans, 3 reps, median), syncing
by fetching a loss value (block_until_ready is unreliable through the
tunnel — CLAUDE.md). Mirrors the r3 A/B recorded in BASELINE.md
(4.97 ms plain vs 4.91 ms mesh).

Usage: python .soak/shard_ab_r4.py [--smoke]
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


def time_chunk(tr):
    key = jax.random.PRNGKey(0)
    run = lambda: tr._adam_chunk(  # noqa: E731
        tr.state.params, tr.state.opt_state, tr.batch, key, jnp.int32(0), CHUNK
    )
    _, _, losses = run()
    float(losses[-1, -1])  # compile + warm, host sync
    ts = []
    for _ in range(REPS):
        t0 = time.perf_counter()
        _, _, losses = run()
        float(losses[-1, -1])
        ts.append((time.perf_counter() - t0) / CHUNK * 1e3)
    return sorted(ts)[len(ts) // 2]


results = {}
for label, mesh in (("plain", None), ("mesh1", "build")):
    if mesh == "build":
        mesh = make_mesh(1, devices=jax.devices()[:1])
    with tempfile.TemporaryDirectory() as run_dir:
        tr = Trainer(cfg, run_dir=run_dir, echo_every=0, mesh=mesh)
        ms = time_chunk(tr)
    results[label] = ms
    print(f"{label}: {ms:.3f} ms/iter (fused={tr.use_fused_kernel}, "
          f"{tr.batch['residual_input'].shape[0]} pts)", flush=True)

print(f"RESULT shard overhead mesh1/plain = "
      f"{results['mesh1'] / results['plain']:.3f}x", flush=True)
