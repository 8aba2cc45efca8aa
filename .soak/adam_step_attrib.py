"""Attribute the flagship Adam step (4.96 ms, fused f32) into components:

  A. full shipped step      (Trainer._adam_chunk: loss+grad+adam+stack)
  B. loss + grad only       (value_and_grad(loss_fn), no optimizer)
  C. raw kernel fwd+bwd     (custom-VJP fused_apply_with_tangents, K=2,
                             trivial loss — the kernel-only floor)
  D. optimizer update only  (optax adam + apply_updates on the pytree)
  E. fused forward only     (eval kernel, the 1x-forward floor)

All scanned in 500-step chunks (host dispatch ~25 ms RTT — CLAUDE.md),
synced by fetching a value. ONE process, sequential.

Usage: python .soak/adam_step_attrib.py [--smoke]
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
import optax  # noqa: E402

from pinn_depthestimation_tpu.config import parse_config  # noqa: E402
from pinn_depthestimation_tpu.ops import kernels, kernels_vjp  # noqa: E402
from pinn_depthestimation_tpu.training import Trainer  # noqa: E402
from pinn_depthestimation_tpu.utils import synthetic  # noqa: E402

if not SMOKE:
    assert jax.devices()[0].platform == "tpu"
INTERPRET = SMOKE
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

run_dir = tempfile.mkdtemp()
tr = Trainer(cfg, run_dir=run_dir, echo_every=0)
params, opt_state, batch = tr.state.params, tr.state.opt_state, tr.batch
spec, loss_fn, optimizer = tr.spec, tr.loss_fn, tr.optimizer
coords = batch["residual_input"]
n_pts = coords.shape[0]
print(f"fused={tr.use_fused_kernel}, one-kernel={tr.fused_step_fn is not None}, {n_pts} pts, depth {DEPTH}", flush=True)


def timed(label, chunk_fn):
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


def scan_over(body):
    def chunk(params, opt_state):
        (p, o, acc), _ = jax.lax.scan(
            lambda c, _: (body(*c), None), (params, opt_state, jnp.float32(0)),
            None, CHUNK)
        return acc + jax.tree.reduce(lambda a, b: a + jnp.sum(b) * 0, p, 0.0)
    return chunk


# A. full shipped step (the Trainer's value_and_grad_fn: one-kernel fused
# step when the config permits, generic value_and_grad otherwise)
def full_step(p, o, acc):
    (total, _), grads = tr.value_and_grad_fn(p, batch, None)
    updates, o = optimizer.update(grads, o, p)
    p = optax.apply_updates(p, updates)
    return p, o, acc + total


# A2. generic two-kernel step (value_and_grad over the loss builder)
def generic_step(p, o, acc):
    (total, _), grads = jax.value_and_grad(loss_fn, has_aux=True)(p, batch, None)
    updates, o = optimizer.update(grads, o, p)
    p = optax.apply_updates(p, updates)
    return p, o, acc + total


# B. loss+grad only (params perturbed by grads*0 to keep the scan honest)
def loss_grad_only(p, o, acc):
    (total, _), grads = jax.value_and_grad(loss_fn, has_aux=True)(p, batch, None)
    p = jax.tree.map(lambda a, g: a + 0.0 * g, p, grads)
    return p, o, acc + total


# C. raw custom-VJP kernel floor: fused fwd+tangents under grad, trivial loss
def kernel_floor(p, o, acc):
    def l(pp):
        y, dy = kernels_vjp.fused_apply_with_tangents(
            pp, coords, spec, 2, "f32", INTERPRET)
        return jnp.sum(y * y) + jnp.sum(dy * dy)

    v, grads = jax.value_and_grad(l)(p)
    p = jax.tree.map(lambda a, g: a + 0.0 * g, p, grads)
    return p, o, acc + v


# D. optimizer only (grads := params)
def opt_only(p, o, acc):
    updates, o = optimizer.update(p, o, p)
    p = optax.apply_updates(p, updates)
    return p, o, acc + updates["w_out"][0, 0]


# E. fused forward only (eval kernel)
def fwd_only(p, o, acc):
    y, dy = kernels.packed_mlp_fwd_tangents(
        p, coords, spec, 2, precision="f32", interpret=INTERPRET)
    s = jnp.sum(y) + jnp.sum(dy)
    p = jax.tree.map(lambda a: a + 0.0 * s, p)
    return p, o, acc + s


a = timed("A full step       ", scan_over(full_step))
a2 = timed("A2 generic step   ", scan_over(generic_step))
b = timed("B loss+grad       ", scan_over(loss_grad_only))
c = timed("C kernel fwd+bwd  ", scan_over(kernel_floor))
d = timed("D optimizer       ", scan_over(opt_only))
e = timed("E fused fwd (eval)", scan_over(fwd_only))
print(f"\nglue A-B (opt+stack): {a - b:.3f} ms (D alone {d:.3f})\n"
      f"loss-vs-kernel B-C (physics/stats/fid): {b - c:.3f} ms\n"
      f"bwd cost C-E: {c - e:.3f} ms ({c / e:.2f}x fwd)", flush=True)
