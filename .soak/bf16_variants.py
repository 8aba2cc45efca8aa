"""A/B harness for closing the bf16 (and f32x3) roofline gap.

Variants over the fused forward+tangent kernel, measured on the real chip in
ONE process (TPU hygiene: no concurrent jobs, host-synchronized timing):

* base        — library kernel as shipped (separate per-stream matmuls,
                f32 post-ops, per-matmul bf16 casts)
* stacked     — the K tangent streams ride ONE (K*TM, 128) matmul per layer
                (fewer MXU dispatches; weights stay loaded across streams)
* bf16post    — keep the carried activation/tangent streams in bf16 between
                matmuls: one cast per dot output, post-ops (dact, t*nda) in
                bf16 (packed VPU rate), halves stream VMEM -> larger TM fits
* stacked+bf16post
* TM sweep on the winner(s)
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


def _variant_kernel(
    x_ref, w_in_ref, b_in_ref, w_h_ref, b_h_ref, w_out_ref, b_out_ref, t_rows_ref,
    *out_refs, n_stack, n_tangents, stacked, bf16_post, dot_precision,
):
    f32, bf16 = jnp.float32, jnp.bfloat16

    def dot(a, w):
        return jax.lax.dot_general(
            a, w, (((1,), (0,)), ((), ())),
            precision=dot_precision, preferred_element_type=f32,
        )

    def post(z):
        """tanh + derivative with the variant's post-op dtype."""
        a = jnp.tanh(z)  # f32 in, f32 out
        if bf16_post:
            ab = a.astype(bf16)
            return ab, (1.0 - ab * ab)  # bf16 mults at packed VPU rate
        return a, 1.0 - a * a

    x = x_ref[:]
    z = dot(x.astype(bf16), w_in_ref[:]) + b_in_ref[:]
    a, da = post(z)

    if stacked:
        ts = jnp.concatenate(
            [t_rows_ref[c : c + 1, :].astype(da.dtype) * da for c in range(n_tangents)],
            axis=0,
        )
    else:
        ts = [t_rows_ref[c : c + 1, :].astype(da.dtype) * da for c in range(n_tangents)]

    def cast_in(s):
        return s if bf16_post else s.astype(bf16)

    def layer(l_w, l_b, a, ts):
        za = dot(cast_in(a), l_w)
        if stacked:
            zt = dot(cast_in(ts), l_w)
        else:
            zt = [dot(cast_in(t), l_w) for t in ts]
        na, nda = post(za + l_b)
        if stacked:
            nda_rep = jnp.concatenate([nda] * n_tangents, axis=0)
            nts = zt.astype(nda.dtype) * nda_rep if bf16_post else zt * nda_rep
        else:
            nts = [
                (t.astype(nda.dtype) * nda) if bf16_post else t * nda for t in zt
            ]
        return na, nts

    for l in range(n_stack):
        a, ts = layer(w_h_ref[l], b_h_ref[l : l + 1, :], a, ts)

    out_refs[0][:] = dot(cast_in(a), w_out_ref[:]) + b_out_ref[:]
    if stacked:
        tm = x.shape[0]
        zo = dot(cast_in(ts), w_out_ref[:])
        for k in range(n_tangents):
            out_refs[1 + k][:] = zo[k * tm : (k + 1) * tm, :]
    else:
        for k in range(n_tangents):
            out_refs[1 + k][:] = dot(cast_in(ts[k]), w_out_ref[:])


def variant_raw(params, coords, spec, n_tangents, rows_per_tile, *,
                stacked=False, bf16_post=False):
    packed = K.pack_params(params, spec, dtype=jnp.bfloat16, passes=1)
    g = packed["g"]
    x_packed, n = K.pack_coords(coords.astype(jnp.float32), spec, g, rows_per_tile)
    m = x_packed.shape[0]
    n_stack = int(packed["w_h"].shape[0])

    kernel = functools.partial(
        _variant_kernel, n_stack=n_stack, n_tangents=n_tangents,
        stacked=stacked, bf16_post=bf16_post,
        dot_precision=jax.lax.Precision.DEFAULT,
    )
    grid = (m // rows_per_tile,)
    row_spec = pl.BlockSpec((rows_per_tile, LANES), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    full = lambda *s: pl.BlockSpec(s, lambda i: (0,) * len(s), memory_space=pltpu.VMEM)  # noqa: E731
    wshape = (LANES, LANES)
    out_shape = [jax.ShapeDtypeStruct((m, LANES), jnp.float32)] * (1 + n_tangents)
    flops_per_tile = 2 * rows_per_tile * LANES * LANES * (n_stack + 2) * (1 + n_tangents)
    outs = pl.pallas_call(
        kernel, grid=grid,
        in_specs=[row_spec, full(*wshape), full(1, LANES),
                  full(max(n_stack, 1), *wshape), full(max(n_stack, 1), LANES),
                  full(*wshape), full(1, LANES), full(spec.d_in, LANES)],
        out_specs=[row_spec] * (1 + n_tangents),
        out_shape=out_shape,
        cost_estimate=pl.CostEstimate(
            flops=flops_per_tile * grid[0],
            bytes_accessed=(m * LANES * 4) * (2 + n_tangents),
            transcendentals=rows_per_tile * LANES * (n_stack + 1) * grid[0],
        ),
    )(x_packed, packed["w_in"], packed["b_in"],
      packed["w_h"], packed["b_h"], packed["w_out"], packed["b_out"],
      packed["t_rows"])
    return outs, n, g


@functools.partial(jax.jit, static_argnames=("spec", "rows_per_tile", "stacked", "bf16_post"))
def variant_residual(params, coords, spec, rows_per_tile, stacked, bf16_post):
    outs, n, g = variant_raw(params, coords, spec, 2, rows_per_tile,
                             stacked=stacked, bf16_post=bf16_post)
    y, dy_dx, dy_dy = outs
    d_out = spec.d_out
    ph = K._packed_head
    U, V, h = (ph(y, i, g, d_out) for i in range(3))
    U_x, h_x = ph(dy_dx, 0, g, d_out), ph(dy_dx, 2, g, d_out)
    V_y, h_y = ph(dy_dy, 1, g, d_out), ph(dy_dy, 2, g, d_out)
    fc = (h_x * U + h * U_x) + (h_y * V + h * V_y)
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

    # library baseline (in-process, same data)
    base = jax.jit(lambda p, c: jnp.sum(
        K.fused_residual_continuity(p, c, spec, precision="bf16") ** 2))
    ref_val = float(base(params, coords))
    dt = measure(base, params, coords)
    print(f"base(lib bf16, TM=1536): {n_points/dt:.3e} evals/s  val={ref_val:.6e}",
          flush=True)

    for stacked, bf16_post, tms in [
        (False, False, [1536]),            # harness sanity vs lib
        (True, False, [1536, 2048]),
        (False, True, [1536, 2048, 3072]),
        (True, True, [1536, 2048, 3072, 4096]),
    ]:
        for tm in tms:
            name = f"stacked={int(stacked)} bf16post={int(bf16_post)} TM={tm}"
            try:
                fn = lambda p, c: variant_residual(p, c, spec, tm, stacked, bf16_post)  # noqa: E731
                val = float(fn(params, coords))
                dt = measure(fn, params, coords)
                rel = abs(val - ref_val) / abs(ref_val)
                print(f"{name}: {n_points/dt:.3e} evals/s  (vs base val rel {rel:.2e})",
                      flush=True)
            except Exception as e:
                print(f"{name}: FAILED {type(e).__name__}: {str(e)[:200]}", flush=True)


if __name__ == "__main__":
    main()
