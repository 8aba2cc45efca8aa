"""bf16 roofline, round 5.

Findings so far: all VPU post-ops are hidden (ablations flat); the limit is
MXU issue/latency on the small (TM,128)@(128,128) dots — per-matmul amortized
0.56us vs the 0.2us streaming bound. Probes:

* TM scaling with ONE output (res-in-kernel frees the VMEM): if rate rises
  with TM, row-streaming amortizes fill/drain + weight swaps.
* tangent dots with bf16 accumulation (perf probe; accuracy checked): tests
  whether f32-accum readback halves the effective MXU rate.
* interleaved layer schedule: primal advanced one layer ahead of tangents
  (breaks the per-layer lockstep on act's latency).
"""

from __future__ import annotations

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from pinn_depthestimation_tpu.models import MLPSpec, init_mlp_params
from pinn_depthestimation_tpu.ops import kernels as K
from pinn_depthestimation_tpu.utils.cache import enable_compilation_cache

LANES = 128


def _kernel(
    x_ref, w_in_ref, b_in_ref, w_h_ref, b_h_ref, w_out_ref, b_out_ref, t_rows_ref,
    out_ref, *, n_stack, g, d_out, mode,
):
    f32, bf16 = jnp.float32, jnp.bfloat16

    def dot(a, w, pref=f32):
        return jax.lax.dot_general(
            a, w, (((1,), (0,)), ((), ())),
            precision=jax.lax.Precision.DEFAULT, preferred_element_type=pref,
        )

    x = x_ref[:]
    z = dot(x.astype(bf16), w_in_ref[:]) + b_in_ref[:]
    a = jnp.tanh(z)
    da = 1.0 - a * a
    ts = [t_rows_ref[c : c + 1, :] * da for c in range(2)]

    if mode == "ahead":
        # primal runs one layer AHEAD of the tangent streams: the tangent
        # matmuls of layer l issue alongside the primal matmul of l+1, so
        # the act() latency of layer l+1 overlaps tangent work of layer l.
        prev_da = da
        prev_ts = ts
        for l in range(n_stack):
            w = w_h_ref[l]
            za = dot(a.astype(bf16), w)
            zts = [dot(t.astype(bf16), w) for t in prev_ts]
            # tangents finish layer l-1->l using the PREVIOUS da
            ts = [t * prev_da for t in zts] if l > 0 else zts
            na = jnp.tanh(za + b_h_ref[l : l + 1, :])
            prev_da = 1.0 - na * na
            a = na
            prev_ts = ts if l > 0 else zts
        # NOTE: this variant intentionally skips one da multiply at the
        # boundary — perf probe only (value differs).
        ts = [t * prev_da for t in prev_ts]
    else:
        tan_pref = bf16 if mode == "tanbf16" else f32
        for l in range(n_stack):
            w = w_h_ref[l]
            za = dot(a.astype(bf16), w)
            if mode == "tanbf16":
                zts = [dot(t.astype(bf16), w, tan_pref) for t in ts]
            else:
                zts = [dot(t.astype(bf16), w) for t in ts]
            a = jnp.tanh(za + b_h_ref[l : l + 1, :])
            nda = 1.0 - a * a
            if mode == "tanbf16":
                ts = [t.astype(f32) * nda for t in zts]
            else:
                ts = [t * nda for t in zts]

    y = dot(a.astype(bf16), w_out_ref[:]) + b_out_ref[:]
    dx = dot(ts[0].astype(bf16), w_out_ref[:])
    dy = dot(ts[1].astype(bf16), w_out_ref[:])
    fc = (
        dx * pltpu.roll(y, 2, 1)
        + y * pltpu.roll(dx, 2, 1)
        + dy * pltpu.roll(y, 1, 1)
        + y * pltpu.roll(dy, 1, 1)
    )
    out_ref[:] = fc


@functools.partial(jax.jit, static_argnames=("spec", "tm", "mode"))
def run_variant(params, coords, spec, tm, mode):
    packed = K.pack_params(params, spec, dtype=jnp.bfloat16, passes=1)
    g = packed["g"]
    x_packed, n = K.pack_coords(coords.astype(jnp.float32), spec, g, tm)
    m = x_packed.shape[0]
    n_stack = int(packed["w_h"].shape[0])
    grid = (m // tm,)
    row_spec = pl.BlockSpec((tm, LANES), lambda i: (i, 0), memory_space=pltpu.VMEM)
    full = lambda *s: pl.BlockSpec(s, lambda i: (0,) * len(s), memory_space=pltpu.VMEM)  # noqa: E731
    out = pl.pallas_call(
        functools.partial(_kernel, n_stack=n_stack, g=g, d_out=spec.d_out, mode=mode),
        grid=grid,
        in_specs=[row_spec, full(LANES, LANES), full(1, LANES),
                  full(max(n_stack, 1), LANES, LANES), full(max(n_stack, 1), LANES),
                  full(LANES, LANES), full(1, LANES), full(spec.d_in, LANES)],
        out_specs=row_spec,
        out_shape=jax.ShapeDtypeStruct((m, LANES), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * tm * LANES * LANES * (n_stack + 2) * 3 * grid[0],
            bytes_accessed=m * LANES * 8,
            transcendentals=tm * LANES * (n_stack + 1) * grid[0],
        ),
    )(x_packed, packed["w_in"], packed["b_in"], packed["w_h"], packed["b_h"],
      packed["w_out"], packed["b_out"], packed["t_rows"])
    fc = out[:, 2 : g * spec.d_out : spec.d_out]
    return jnp.sum(fc.reshape(-1)[:n] ** 2)


def measure(fn, *args, reps=7):
    float(fn(*args))
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        float(fn(*args))
        times.append(time.perf_counter() - t0)
    return sorted(times)[len(times) // 2]


def main():
    enable_compilation_cache()
    spec = MLPSpec(sizes=(2,) + (20,) * 100 + (3,), init_type="xavier")
    params = init_mlp_params(jax.random.PRNGKey(0), spec)
    n_points = 4_000_000
    coords = jnp.asarray(
        np.random.RandomState(0).uniform(-1, 1, (n_points, 2)), jnp.float32
    )
    base = jax.jit(lambda p, c: jnp.sum(
        K.fused_residual_continuity(p, c, spec, precision="bf16") ** 2))
    ref_val = float(base(params, coords))

    jobs = [("full", tm) for tm in (1536, 2048, 3072, 4096, 6144)]
    jobs += [("tanbf16", 1536), ("tanbf16", 3072), ("ahead", 1536)]
    for mode, tm in jobs:
        try:
            f = lambda p, c: run_variant(p, c, spec, tm, mode)  # noqa: E731
            val = float(f(params, coords))
            dt = measure(f, params, coords)
            rel = abs(val - ref_val) / abs(ref_val)
            print(f"{mode} TM={tm}: {n_points/dt:.3e} evals/s (val rel {rel:.2e})",
                  flush=True)
        except Exception as e:
            print(f"{mode} TM={tm}: FAILED {type(e).__name__}: {str(e)[:120]}",
                  flush=True)


if __name__ == "__main__":
    main()
