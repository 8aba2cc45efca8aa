"""Hardware A/B: HBM-streaming backward kernel vs segmented-rebuild.

Flagship shape (2->[20]x100->3, 12,516 points, kt=2). ONE process,
sequential (CLAUDE.md measurement hygiene). For each config: correctness
(max rel grad diff vs the rebuild impl on-chip) + scan-chunked timing.

Usage: python .soak/bwd_stream_ab.py [--smoke]
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

from pinn_depthestimation_tpu.models.mlp import MLPSpec, init_mlp_params  # noqa: E402
from pinn_depthestimation_tpu.ops import kernels_vjp as kv  # noqa: E402

if not SMOKE:
    assert jax.devices()[0].platform == "tpu"
INTERPRET = SMOKE
DEPTH = 3 if SMOKE else 100
N = 100 if SMOKE else 12516
CHUNK = 3 if SMOKE else 300
REPS = 2 if SMOKE else 3
KT = 2

spec = MLPSpec(sizes=(2,) + (20,) * (DEPTH + 1) + (3,), init_type="xavier")
params = init_mlp_params(jax.random.PRNGKey(0), spec)
rs = np.random.RandomState(1)
coords = jnp.asarray(rs.uniform(-1, 1, (N, 2)), jnp.float32)
ybar = jnp.asarray(rs.randn(N, 3), jnp.float32)
dybar = jnp.asarray(rs.randn(KT, N, 3), jnp.float32)


def grads_once(impl, precision, tm):
    return kv.packed_mlp_bwd(params, coords, ybar, dybar, spec, KT,
                             precision=precision, interpret=INTERPRET,
                             rows_per_tile=tm, impl=impl)


def rel_diff(a, b):
    out = 0.0
    for k in a:
        x, y = np.asarray(a[k], np.float64), np.asarray(b[k], np.float64)
        if x.size == 0:
            continue
        out = max(out, float(np.max(np.abs(x - y)) / (np.abs(x).max() + 1e-30)))
    return out


def timed(impl, precision, tm):
    def chunk(p):
        def body(c, _):
            g = kv.packed_mlp_bwd(c, coords, ybar, dybar, spec, KT,
                                  precision=precision, interpret=INTERPRET,
                                  rows_per_tile=tm, impl=impl)
            return jax.tree.map(lambda a, b: a + 0.0 * b, c, g), None
        out, _ = jax.lax.scan(body, p, None, CHUNK)
        return jax.tree.reduce(lambda a, b: a + jnp.sum(b) * 0, out, 0.0) + out["w_out"][0, 0]

    run = jax.jit(chunk)
    float(run(params))
    ts = []
    for _ in range(REPS):
        t0 = time.perf_counter()
        float(run(params))
        ts.append((time.perf_counter() - t0) / CHUNK * 1e3)
    return sorted(ts)[len(ts) // 2]


for precision in ("f32", "f32x3", "bf16"):
    base = jax.tree.map(np.asarray, grads_once("rebuild", precision, 0))
    ms0 = timed("rebuild", precision, 0)
    print(f"[{precision}] rebuild tm=default: {ms0:.3f} ms/call", flush=True)
    tms = (8, 16) if SMOKE else (256, 384, 512, 640, 768, 1024)
    for tm in tms:
        try:
            g = jax.tree.map(np.asarray, grads_once("stream", precision, tm))
            d = rel_diff(base, g)
            ms = timed("stream", precision, tm)
            print(f"[{precision}] stream  tm={tm}: {ms:.3f} ms/call "
                  f"({ms0 / ms:.2f}x) rel_diff={d:.2e}", flush=True)
        except Exception as e:
            msg = str(e).split("\n")[0][:160]
            print(f"[{precision}] stream  tm={tm}: FAIL {msg}", flush=True)
