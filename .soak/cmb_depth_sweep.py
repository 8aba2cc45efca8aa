"""CMB-workload step tiers + 1-chip-TPU-mesh shard A/B (VERDICT r3 items 3/6).

The CMB pipeline (separate fidelity CSV vs residual .mat points,
wave_averaged physics) cannot use the one-kernel step
(build_value_and_grad_fn gates on fidelity_is_residual + continuity), so its
deployed step is the generic ``jax.value_and_grad`` over ``build_loss_fn`` —
XLA or fused two-kernel. This script measures, in ONE process (TPU hygiene),
on the reference-CMB-shaped workload scaled to a real point count:

  xla    — fused_kernel off (pure XLA forward+tangents)
  fused  — fused custom-VJP kernels (the Trainer default at this size)
  mesh1  — the fused path on a 1-chip TPU mesh (the CMB *sharded* program:
           ONE shard_map computing per-shard residual stats AND the
           per-shard separate fidelity forward, psum'd)

plus trajectory equality mesh1 == fused over the timed chunk.

Usage: python .soak/shard_cmb_ab.py [--smoke]
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
DEPTHS = (3,) if SMOKE else (10, 25, 50, 100)
WIDTH = 16 if SMOKE else 20
CHUNK = 5 if SMOKE else 500
REPS = 2 if SMOKE else 3

csv = tempfile.mktemp(suffix=".csv")
mat = tempfile.mktemp(suffix=".mat")
# interval 1 gives the full 81x261 grid (~20.5k collocation pts after NaN
# mask) — the reference's own 10x10 stride leaves 243 pts, which is
# dispatch-bound and meaningless to time
synthetic.make_cmb_dataset(csv, mat, nx=NX, ny=NY, n_csv=400, seed=6,
                           nan_fraction=0.03)
outs = ["h", "U", "V", "eta_mean", "Hrms", "k"]


def cfg_for(fused_mode, depth):
    return parse_config({
        "layers": {"input_features": 2, "hidden_layers": depth,
                   "hidden_width": WIDTH, "output_features": 6,
                   "dropout_rate": 0.0, "init_type": "xavier"},
        "adam_optimizer": {"max_it": 1000, "learning_rate": 1e-4,
                           "scheduler_step_size": 10000, "scheduler_gamma": 0.8},
        "lbfgs_optimizer": {"max_it": 0, "learning_rate": 1, "max_evaluation": 0,
                            "history_size": 100, "tolerance_grad": 1e-5,
                            "tolerance_change": 1e-7,
                            "line_search_fn": "strong_wolfe"},
        "loss": {"weight_fid_loss": 1, "weight_res_loss": 1,
                 **{f"weight_{k}_loss": w for k, w in
                    zip(outs, (2, 1, 1, 1, 0.5, 0.5))}},
        "data_fidelity": {"file": csv, "inputs": ["x", "y"], "outputs": outs,
                          "training_points": 200},
        "data_residual": {"file": mat,
                          "inputs": {"x": {"requires_grad": ["true"]},
                                     "y": {"requires_grad": ["true"]}},
                          "outputs": outs, "interval_x": 1, "interval_y": 1},
        "data_test": {"x_min": 25.0, "x_max": 33.0,
                      "y_min": -13.0, "y_max": 13.0},
        "physics": "wave_averaged",  # the CMB pipeline's default
        "fused_kernel": fused_mode,
    })


def run_chunk_and_time(tr):
    key = jax.random.PRNGKey(0)
    run = lambda: tr._adam_chunk(  # noqa: E731
        tr.state.params, tr.state.opt_state, tr.batch, key, jnp.int32(0), CHUNK
    )
    _, _, losses = run()
    traj = np.asarray(losses)
    ts = []
    for _ in range(REPS):
        t0 = time.perf_counter()
        _, _, losses = run()
        float(losses[-1, -1])  # host sync (block_until_ready unreliable)
        ts.append((time.perf_counter() - t0) / CHUNK * 1e3)
    return sorted(ts)[len(ts) // 2], traj


for depth in DEPTHS:
    out = {}
    for label, fused_mode in (("xla", "off"),
                              ("fused", "auto" if SMOKE else "on")):
        with tempfile.TemporaryDirectory() as run_dir:
            tr = Trainer(cfg_for(fused_mode, depth), run_dir=run_dir,
                         echo_every=0)
            out[label], _ = run_chunk_and_time(tr)
    print(f"depth {depth:4d}: xla {out['xla']:.3f} ms, fused "
          f"{out['fused']:.3f} ms (xla/fused {out['xla'] / out['fused']:.2f}x, "
          f"{tr.batch['residual_input'].shape[0]} residual pts)", flush=True)
