"""Inference (grid-predict) throughput: the Predictor's fused forward path
(ops/kernels.packed_mlp_fwd_tangents with 0 tangent streams) at flagship
depth on a large grid — the reference's test.py surface (predict U,V,h on
the full nx x ny grid). ONE process, tiers sequential; host-sync by value
fetch per rep (CLAUDE.md timing rules).

Usage: python .soak/predict_rate_r5.py [--smoke]
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

from pinn_depthestimation_tpu.models import MLPSpec, init_mlp_params  # noqa: E402
from pinn_depthestimation_tpu.ops import kernels  # noqa: E402

if not SMOKE:
    assert jax.devices()[0].platform == "tpu", "this soak needs the real chip"

N = 4096 if SMOKE else 10_000_000
DEPTH = 3 if SMOKE else 100
REPS = 2 if SMOKE else 5

spec = MLPSpec(sizes=(2,) + (20,) * (DEPTH + 1) + (3,), init_type="xavier")
params = init_mlp_params(jax.random.PRNGKey(0), spec)
coords = jnp.asarray(
    np.random.RandomState(0).uniform(-1, 1, (N, 2)).astype(np.float32)
)

for precision in ("f32", "f32x3", "bf16"):
    def predict(p, x, _prec=precision):
        y, _ = kernels.packed_mlp_fwd_tangents(
            p, x, spec, 0, precision=_prec, interpret=SMOKE
        )
        return y

    y = predict(params, coords)
    float(y[0, 0])  # compile + host sync
    ts = []
    for _ in range(REPS):
        t0 = time.perf_counter()
        y = predict(params, coords)
        float(y[0, 0])
        ts.append(time.perf_counter() - t0)
    med = sorted(ts)[len(ts) // 2]
    print(f"{precision}: {med * 1e3:.1f} ms for {N:,} pts "
          f"({N / med:.3e} predictions/s)", flush=True)
