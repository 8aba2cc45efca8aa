"""Fused-vs-XLA Adam-step crossover in DEPTH (round 4).

The round-2 fused auto-threshold (>=8192 points) was tuned on the 101-layer
flagship; the round-4 CMB A/B (.soak/shard_cmb_ab.py) showed XLA beating the
fused path at the reference CMB net's depth 10 (0.427 vs 0.570 ms/iter at
20.5k pts). This sweep pins the crossover depth at a fixed large point count
so _decide_fused_kernel can gate on depth as well as size. ONE process,
sequential; newmethod-shaped config (shared points, 3 heads) so the
one-kernel step is in play exactly as deployed.

Usage: python .soak/fused_depth_sweep.py [--smoke]
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
from pinn_depthestimation_tpu.training import Trainer  # noqa: E402
from pinn_depthestimation_tpu.utils import synthetic  # noqa: E402

if not SMOKE:
    assert jax.devices()[0].platform == "tpu"

NX, NY = (16, 14) if SMOKE else (81, 261)
DEPTHS = (3,) if SMOKE else (10, 16, 25, 40, 100)
CHUNK = 5 if SMOKE else 500
REPS = 2 if SMOKE else 3

mat = tempfile.mktemp(suffix=".mat")
synthetic.make_newmethod_mat(mat, nx=NX, ny=NY, nan_fraction=0.05, seed=21)


def cfg_for(depth, fused_mode):
    return parse_config({
        "layers": {"input_features": 2, "hidden_layers": depth,
                   "hidden_width": 20, "output_features": 3,
                   "dropout_rate": 0.0, "init_type": "xavier"},
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
        "fused_kernel": fused_mode,
    })


def time_step(cfg):
    run_dir = tempfile.mkdtemp()
    tr = Trainer(cfg, run_dir=run_dir, echo_every=0)
    key = jax.random.PRNGKey(0)
    run = lambda: tr._adam_chunk(  # noqa: E731
        tr.state.params, tr.state.opt_state, tr.batch, key, jnp.int32(0), CHUNK
    )
    _, _, losses = run()
    float(np.asarray(losses)[-1, -1])
    ts = []
    for _ in range(REPS):
        t0 = time.perf_counter()
        _, _, losses = run()
        float(losses[-1, -1])
        ts.append((time.perf_counter() - t0) / CHUNK * 1e3)
    return sorted(ts)[len(ts) // 2], tr


for depth in DEPTHS:
    ms_x, _ = time_step(cfg_for(depth, "off"))
    # CPU smoke: 'auto' (auto-disables Pallas); hardware: force 'on'
    ms_f, tr = time_step(cfg_for(depth, "auto" if SMOKE else "on"))
    print(f"depth {depth:4d}: xla {ms_x:.3f} ms, fused {ms_f:.3f} ms "
          f"(xla/fused {ms_x / ms_f:.2f}x, one_kernel="
          f"{tr.fused_step_fn is not None}, "
          f"{tr.batch['residual_input'].shape[0]} pts)", flush=True)
