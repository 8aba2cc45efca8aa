"""Flagship Adam step across kernel precision tiers, one-kernel vs
two-kernel (round-5 of the round-3 build). ONE process, sequential.

Per tier (f32, f32x3, bf16): the Trainer's deployed value_and_grad_fn
(one-kernel fused step) and the generic value_and_grad(loss_fn) two-kernel
path, scanned in 500-step chunks, synced by fetching a value.

Usage: python .soak/step_tiers_r5.py [--smoke]
"""

import sys
import tempfile
import time

from pinn_depthestimation_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

SMOKE = "--smoke" in sys.argv

import jax  # noqa: E402

if SMOKE:
    jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp  # noqa: E402
import optax  # noqa: E402

from pinn_depthestimation_tpu.config import parse_config  # noqa: E402
from pinn_depthestimation_tpu.training import Trainer  # noqa: E402
from pinn_depthestimation_tpu.utils import synthetic  # noqa: E402

if not SMOKE:
    assert jax.devices()[0].platform == "tpu"
NX, NY = (16, 14) if SMOKE else (81, 261)
DEPTH = 3 if SMOKE else 100
CHUNK = 5 if SMOKE else 500
REPS = 2 if SMOKE else 3

mat = tempfile.mktemp(suffix=".mat")
synthetic.make_newmethod_mat(mat, nx=NX, ny=NY, nan_fraction=0.408, seed=21)


def make_trainer(tier):
    cfg = parse_config({
        "layers": {"input_features": 2, "hidden_layers": DEPTH,
                   "hidden_width": 20, "output_features": 3,
                   "dropout_rate": 0.0, "init_type": "xavier"},
        "adam_optimizer": {"max_it": 1000, "learning_rate": 1e-4,
                           "scheduler_step_size": 10000,
                           "scheduler_gamma": 0.8},
        "lbfgs_optimizer": {"max_it": 0, "learning_rate": 1,
                            "max_evaluation": 0, "history_size": 100,
                            "tolerance_grad": 1e-5,
                            "tolerance_change": 1e-7,
                            "line_search_fn": "strong_wolfe"},
        "loss": {"weight_fid_loss": 1, "weight_res_loss": 1},
        "kernel_precision": tier,
        "data": {"file": mat,
                 "inputs": {"x": {"requires_grad": ["true"]},
                            "y": {"requires_grad": ["true"]}},
                 "trues": ["U", "V"], "unknowns": ["h"]},
        "data_test": {"x_min": 25.0, "x_max": 33.0,
                      "y_min": -13.0, "y_max": 13.0},
    })
    return Trainer(cfg, run_dir=tempfile.mkdtemp(), echo_every=0)


def timed(label, chunk_fn, params, opt_state):
    run = jax.jit(chunk_fn)
    float(run(params, opt_state))  # compile + warm + sync
    ts = []
    for _ in range(REPS):
        t0 = time.perf_counter()
        float(run(params, opt_state))
        ts.append((time.perf_counter() - t0) / CHUNK * 1e3)
    ms = sorted(ts)[len(ts) // 2]
    print(f"{label}: {ms:.3f} ms/iter", flush=True)
    return ms


def scan_step(step_body):
    def chunk(params, opt_state):
        (p, o, acc), _ = jax.lax.scan(
            lambda c, _: (step_body(*c), None),
            (params, opt_state, jnp.float32(0)), None, CHUNK)
        return acc + jax.tree.reduce(lambda a, b: a + jnp.sum(b) * 0, p, 0.0)
    return chunk


for tier in ("f32", "f32x3", "bf16"):
    tr = make_trainer(tier)
    params, opt_state, batch = tr.state.params, tr.state.opt_state, tr.batch
    optimizer, loss_fn = tr.optimizer, tr.loss_fn
    n_pts = batch["residual_input"].shape[0]
    print(f"-- tier {tier}: fused={tr.use_fused_kernel}, "
          f"one-kernel={tr.fused_step_fn is not None}, {n_pts} pts",
          flush=True)

    def one_kernel(p, o, acc):
        (total, _), grads = tr.value_and_grad_fn(p, batch, None)
        updates, o = optimizer.update(grads, o, p)
        return optax.apply_updates(p, updates), o, acc + total

    def two_kernel(p, o, acc):
        (total, _), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            p, batch, None)
        updates, o = optimizer.update(grads, o, p)
        return optax.apply_updates(p, updates), o, acc + total

    timed(f"{tier} one-kernel", scan_step(one_kernel), params, opt_state)
    timed(f"{tier} two-kernel", scan_step(two_kernel), params, opt_state)
print("TIERS_OK", flush=True)
