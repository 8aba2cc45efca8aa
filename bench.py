"""Benchmark: collocation-point residual evaluation throughput on TPU.

Metric (BASELINE.md north star): physics-residual evaluations per second per
chip on the flagship newmethod configuration (2 -> [20]*100 -> 3 MLP,
``continuity_only`` residual — forward pass + x/y coordinate-tangent
propagation + residual algebra per point). Target: 1e8 evals/sec on a
v5e-8 slice == 1.25e7 per chip; ``vs_baseline`` is measured against the
per-chip share.

Prints ONE JSON line:
    {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}
"""

from __future__ import annotations

import functools
import json
import time

import jax
import jax.numpy as jnp
import numpy as np

PER_CHIP_TARGET = 1e8 / 8  # north star is quoted for a v5e-8 slice


def residual_eval_fn(spec, backend: str = "auto"):
    """Returns f(params, coords) -> per-point continuity residual."""
    from pinn_depthestimation_tpu import physics
    from pinn_depthestimation_tpu.models import mlp_apply_with_tangents
    from pinn_depthestimation_tpu.ops import kernels

    if backend == "auto":
        backend = "pallas" if kernels.pallas_supported() else "xla"

    if backend == "pallas":
        def fn(params, coords):
            return kernels.fused_residual_continuity(params, coords, spec)
        return fn, "pallas"

    def fn(params, coords):
        awt = functools.partial(mlp_apply_with_tangents, params, spec=spec)
        _, fields, grads = physics.model_fields_and_grads(
            awt, coords, ["x", "y"], ["x", "y"], ["U", "V", "h"]
        )
        return physics.continuity_only_residuals(fields, grads)

    return fn, "xla"


def main():
    from pinn_depthestimation_tpu.models import MLPSpec, init_mlp_params
    from pinn_depthestimation_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    spec = MLPSpec(sizes=(2,) + (20,) * 100 + (3,), init_type="xavier")
    params = init_mlp_params(jax.random.PRNGKey(0), spec)

    n_points = 1 << 21  # ~2.1M collocation points
    coords = jnp.asarray(
        np.random.RandomState(0).uniform(-1, 1, (n_points, 2)), jnp.float32
    )

    fn, backend = residual_eval_fn(spec)
    run = jax.jit(lambda p, c: jnp.sum(fn(p, c) ** 2))

    # warmup/compile (fetch the scalar: through the remote-TPU tunnel,
    # block_until_ready alone does NOT reliably wait — only a device->host
    # value transfer synchronizes, so every timed rep fetches its result)
    float(run(params, coords))

    reps = 7
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        float(run(params, coords))
        times.append(time.perf_counter() - t0)
    dt = sorted(times)[len(times) // 2]  # median, robust to tunnel jitter

    evals_per_sec = n_points / dt
    print(json.dumps({
        "metric": f"residual_evals_per_sec_per_chip[{backend}]",
        "value": round(evals_per_sec, 1),
        "unit": "collocation-point residual evals/s/chip (2->[20]x100->3 MLP, continuity)",
        "vs_baseline": round(evals_per_sec / PER_CHIP_TARGET, 4),
    }))


if __name__ == "__main__":
    main()
