"""Re-measure the 10M-point training step with the ONE-KERNEL path (the
README/STATUS "10M-pt step" scale datapoint dates from the two-kernel era:
3.6 s f32 / 2.2 s f32x3). One full Adam step = fused_loss_and_grad +
optax.adam update, jitted, on 10M synthetic collocation points at the
flagship depth (2->[20]x100->3). ONE process, tiers sequential.

Usage: python .soak/step10m_r5.py [--smoke]
"""

import sys
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

from pinn_depthestimation_tpu.models import MLPSpec, init_mlp_params  # noqa: E402
from pinn_depthestimation_tpu.ops.kernels_step import fused_loss_and_grad  # noqa: E402

if not SMOKE:
    assert jax.devices()[0].platform == "tpu", "this soak needs the real chip"

N = 4096 if SMOKE else 10_000_000
DEPTH = 3 if SMOKE else 100
REPS = 2 if SMOKE else 3

spec = MLPSpec(sizes=(2,) + (20,) * (DEPTH + 1) + (3,), init_type="xavier")
params = init_mlp_params(jax.random.PRNGKey(0), spec)
rs = np.random.RandomState(0)
coords = jnp.asarray(rs.uniform(-1, 1, (N, 2)).astype(np.float32))
trues = jnp.asarray(rs.randn(N, 2).astype(np.float32) * 0.1)
mask = jnp.ones((N,), jnp.float32)
sel = (coords[:, 0] < 0.0).astype(jnp.float32)
fidw = jnp.ones((2,), jnp.float32)

opt = optax.adam(1e-4)
opt_state = opt.init(params)


CHUNK = 2 if SMOKE else 5  # scan-chunk steps: per-dispatch tunnel RTT is
                           # ~25 ms (CLAUDE.md timing rule) — amortize it


def make_chunk(precision):
    @jax.jit
    def chunk(p, st):
        def step(carry, _):
            p, st = carry
            (total, _), grads = fused_loss_and_grad(
                p, coords, trues, sel, mask, fidw, spec, 2, 1.0, 1.0,
                precision=precision, interpret=SMOKE,
            )
            updates, st = opt.update(grads, st, p)
            return (optax.apply_updates(p, updates), st), total

        (p, st), totals = jax.lax.scan(step, (p, st), None, length=CHUNK)
        return p, st, totals

    return chunk


for precision in ("f32", "f32x3", "bf16"):
    chunk = make_chunk(precision)
    p, st, totals = chunk(params, opt_state)
    float(totals[-1])  # compile + host sync (block_until_ready unreliable)
    ts = []
    for _ in range(REPS):
        t0 = time.perf_counter()
        _, _, totals = chunk(params, opt_state)
        float(totals[-1])
        ts.append((time.perf_counter() - t0) / CHUNK)
    med = sorted(ts)[len(ts) // 2]
    print(f"{precision}: {med:.3f} s/step at {N:,} pts "
          f"({N / med:.3e} pt-steps/s), loss {float(totals[-1]):.4e}",
          flush=True)
