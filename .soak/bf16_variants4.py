"""bf16 roofline, round 4: surgical ablations on the res-in-kernel variant.

All variants are PERF PROBES (some compute wrong math on purpose) except
'full' and 'tanbf16'. Ablations:
  full      — v3 winner (res-in-kernel, f32 post-ops)
  nomult    — tangent streams advance by matmul only (drop *nda)   [wrong]
  noact     — primal act = identity, dact = 1 (keep structure)     [wrong]
  nobias    — drop bias add                                        [wrong]
  tanbf16   — tangent dots accumulate in bf16 (preferred_element_type):
              skips the f32 accum readback + cast on 2/3 of matmuls [real
              candidate for the bf16 tier if accuracy holds]
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
    tan_pref = bf16 if mode == "tanbf16" else f32

    def dot(a, w, pref=f32):
        return jax.lax.dot_general(
            a, w, (((1,), (0,)), ((), ())),
            precision=jax.lax.Precision.DEFAULT, preferred_element_type=pref,
        )

    def post(z):
        if mode == "noact":
            return z, None
        a = jnp.tanh(z)
        return a, (1.0 - a * a)

    x = x_ref[:]
    z = dot(x.astype(bf16), w_in_ref[:])
    if mode != "nobias":
        z = z + b_in_ref[:]
    a, da = post(z)
    if mode in ("nomult", "noact"):
        ts = [t_rows_ref[c : c + 1, :] * jnp.ones_like(z) for c in range(2)]
    else:
        ts = [t_rows_ref[c : c + 1, :] * da for c in range(2)]
    if mode == "tanbf16":
        ts = [t.astype(bf16) for t in ts]

    for l in range(n_stack):
        w = w_h_ref[l]
        za = dot(a.astype(bf16), w)
        zts = [dot(t.astype(bf16) if mode != "tanbf16" else t, w, tan_pref)
               for t in ts]
        if mode != "nobias":
            za = za + b_h_ref[l : l + 1, :]
        a, nda = post(za)
        if mode in ("nomult", "noact"):
            ts = zts
        elif mode == "tanbf16":
            ts = [(t * nda.astype(bf16)) for t in zts]
        else:
            ts = [t * nda for t in zts]

    y = dot(a.astype(bf16), w_out_ref[:]) + b_out_ref[:]
    dx = dot(ts[0].astype(bf16) if mode != "tanbf16" else ts[0], w_out_ref[:])
    dy = dot(ts[1].astype(bf16) if mode != "tanbf16" else ts[1], w_out_ref[:])
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

    for mode in ("full", "nomult", "noact", "nobias", "tanbf16"):
        for tm in (1536,):
            try:
                f = lambda p, c: run_variant(p, c, spec, tm, mode)  # noqa: E731
                val = float(f(params, coords))
                dt = measure(f, params, coords)
                rel = abs(val - ref_val) / abs(ref_val)
                print(f"{mode} TM={tm}: {n_points/dt:.3e} evals/s "
                      f"(val rel {rel:.2e})", flush=True)
            except Exception as e:
                print(f"{mode} TM={tm}: FAILED {type(e).__name__}: {str(e)[:120]}",
                      flush=True)


if __name__ == "__main__":
    main()
