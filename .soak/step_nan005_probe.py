"""Probe the bf16 one-kernel step slowdown at the 20,084-point workload
(nan_fraction 0.05 — the full-schedule soak shape, where bf16 measured
3.97 ms/iter vs the 12,516-pt A/B's 1.35 ms =>  ~1.8x worse per point).
Suspect: the one-kernel step forces the STREAM backward for every tier,
but bf16's two-kernel default is REBUILD (cheap single-pass recompute
beats f32-state DMA — kernels_vjp per-tier impl defaults). A/B at
20,084 pts: one-kernel (stream epilogue, tile-height sweep) vs the
two-kernel generic path, bf16 and f32. ONE process, sequential.

Usage: python .soak/step_nan005_probe.py
"""

import tempfile
import time

from pinn_depthestimation_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import optax  # noqa: E402

from pinn_depthestimation_tpu.config import parse_config  # noqa: E402
from pinn_depthestimation_tpu.training import Trainer  # noqa: E402
from pinn_depthestimation_tpu.utils import synthetic  # noqa: E402

assert jax.devices()[0].platform == "tpu"
CHUNK, REPS = 300, 3

mat = tempfile.mktemp(suffix=".mat")
synthetic.make_newmethod_mat(mat, nx=81, ny=261, nan_fraction=0.05, seed=21)


def make_trainer(tier):
    cfg = parse_config({
        "layers": {"input_features": 2, "hidden_layers": 100,
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
    print(f"  {label}: {ms:.3f} ms/iter", flush=True)
    return ms


def scan_step(step_body):
    def chunk(params, opt_state):
        (p, o, acc), _ = jax.lax.scan(
            lambda c, _: (step_body(*c), None),
            (params, opt_state, jnp.float32(0)), None, CHUNK)
        return acc + jax.tree.reduce(lambda a, b: a + jnp.sum(b) * 0, p, 0.0)
    return chunk


for tier in ("bf16", "f32"):
    tr = make_trainer(tier)
    params, opt_state, batch = tr.state.params, tr.state.opt_state, tr.batch
    optimizer, loss_fn = tr.optimizer, tr.loss_fn
    n_pts = batch["residual_input"].shape[0]
    print(f"-- tier {tier}: {n_pts} pts", flush=True)

    def one_kernel(p, o, acc):
        (total, _), grads = tr.value_and_grad_fn(p, batch, None)
        updates, o = optimizer.update(grads, o, p)
        return optax.apply_updates(p, updates), o, acc + total

    def two_kernel(p, o, acc):
        (total, _), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            p, batch, None)
        updates, o = optimizer.update(grads, o, p)
        return optax.apply_updates(p, updates), o, acc + total

    timed("one-kernel auto-tile", scan_step(one_kernel), params, opt_state)
    timed("two-kernel generic", scan_step(two_kernel), params, opt_state)

    # tile-height sweep on the one-kernel path (rows_per_tile override)
    from pinn_depthestimation_tpu.ops.kernels_step import fused_loss_and_grad
    from pinn_depthestimation_tpu.models import MLPSpec

    spec = tr.spec
    coords = batch["residual_input"]
    trues = batch["fidelity_true"][:, :2]
    mask = jnp.ones((coords.shape[0],), jnp.float32)
    sel = jnp.where(coords[:, 0] < 25.5, 1.0, 0.0) * mask
    fidw = jnp.ones((2,), jnp.float32)

    for tm in (256, 384, 512, 640, 768):
        def direct(p, o, acc, _tm=tm):
            (total, _), grads = fused_loss_and_grad(
                p, coords, trues, sel, mask, fidw, spec, 2, 1.0, 1.0,
                precision=tier, rows_per_tile=_tm,
            )
            updates, o = optimizer.update(grads, o, p)
            return optax.apply_updates(p, updates), o, acc + total
        try:
            timed(f"one-kernel tm={tm}", scan_step(direct), params, opt_state)
        except Exception as e:
            print(f"  one-kernel tm={tm}: FAILED {type(e).__name__}",
                  flush=True)
