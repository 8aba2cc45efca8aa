"""bf16 roofline attribution, round 2.

(a) matmul-only chains (0/1/2 extra streams, no post-ops): what rate can
    back-to-back (TM,128)@(128,128) bf16 dots actually sustain? This bounds
    every other improvement.
(b) residual-in-kernel: compute the packed continuity residual INSIDE the
    kernel, writing ONE (TM,128) f32 output instead of three — frees ~6 MB
    of VMEM (output tiles + their double buffers) to unlock TM>=3072 and
    cuts output DMA 3x.
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


# ----------------------------------------------------------- (a) matmul-only
def _chain_kernel(x_ref, w_h_ref, *out_refs, n_stack, n_streams):
    def dot(a, w):
        return jax.lax.dot_general(
            a, w, (((1,), (0,)), ((), ())),
            precision=jax.lax.Precision.DEFAULT,
            preferred_element_type=jnp.float32,
        )

    streams = [x_ref[:].astype(jnp.bfloat16) for _ in range(n_streams)]
    for l in range(n_stack):
        w = w_h_ref[l]
        streams = [dot(s, w).astype(jnp.bfloat16) for s in streams]
    acc = streams[0].astype(jnp.float32)
    for s in streams[1:]:
        acc = acc + s.astype(jnp.float32)
    out_refs[0][:] = acc


@functools.partial(jax.jit, static_argnames=("n_stack", "n_streams", "tm"))
def chain_only(x_packed, w_h, n_stack, n_streams, tm):
    m = x_packed.shape[0]
    grid = (m // tm,)
    row_spec = pl.BlockSpec((tm, LANES), lambda i: (i, 0), memory_space=pltpu.VMEM)
    full = lambda *s: pl.BlockSpec(s, lambda i: (0,) * len(s), memory_space=pltpu.VMEM)  # noqa: E731
    out = pl.pallas_call(
        functools.partial(_chain_kernel, n_stack=n_stack, n_streams=n_streams),
        grid=grid,
        in_specs=[row_spec, full(n_stack, LANES, LANES)],
        out_specs=row_spec,
        out_shape=jax.ShapeDtypeStruct((m, LANES), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * m * LANES * LANES * n_stack * n_streams,
            bytes_accessed=m * LANES * 8,
            transcendentals=0,
        ),
    )(x_packed, w_h)
    return jnp.sum(out)


# ------------------------------------------------- (b) residual-in-kernel
def _residual_kernel(
    x_ref, w_in_ref, b_in_ref, w_h_ref, b_h_ref, w_out_ref, b_out_ref, t_rows_ref,
    out_ref, *, n_stack, bf16_post, g, d_out,
):
    f32, bf16 = jnp.float32, jnp.bfloat16

    def dot(a, w):
        return jax.lax.dot_general(
            a, w, (((1,), (0,)), ((), ())),
            precision=jax.lax.Precision.DEFAULT, preferred_element_type=f32,
        )

    def post(z):
        a = jnp.tanh(z)
        if bf16_post:
            ab = a.astype(bf16)
            return ab, (1.0 - ab * ab)
        return a, 1.0 - a * a

    def cast_in(s):
        return s if bf16_post else s.astype(bf16)

    x = x_ref[:]
    z = dot(x.astype(bf16), w_in_ref[:]) + b_in_ref[:]
    a, da = post(z)
    ts = [t_rows_ref[c : c + 1, :].astype(da.dtype) * da for c in range(2)]

    for l in range(n_stack):
        w, b = w_h_ref[l], b_h_ref[l : l + 1, :]
        za = dot(cast_in(a), w)
        zts = [dot(cast_in(t), w) for t in ts]
        a, nda = post(za + b)
        ts = [(t.astype(nda.dtype) * nda) if bf16_post else t * nda for t in zts]

    y = dot(cast_in(a), w_out_ref[:]) + b_out_ref[:]
    dy_dx = dot(cast_in(ts[0]), w_out_ref[:])
    dy_dy = dot(cast_in(ts[1]), w_out_ref[:])

    # packed continuity residual: fc = (h_x U + h U_x) + (h_y V + h V_y),
    # computed in lane layout; heads of point c sit at lanes c*d_out + head
    def head(arr, h_idx):
        return arr[:, h_idx : g * d_out : d_out]

    U, V, h = head(y, 0), head(y, 1), head(y, 2)
    U_x, h_x = head(dy_dx, 0), head(dy_dx, 2)
    V_y, h_y = head(dy_dy, 1), head(dy_dy, 2)
    fc = (h_x * U + h * U_x) + (h_y * V + h * V_y)   # (tm, g)
    out = jnp.zeros(out_ref.shape, f32)
    out_ref[:] = out.at[:, :g].set(fc)


@functools.partial(jax.jit, static_argnames=("spec", "tm", "bf16_post"))
def residual_in_kernel(params, coords, spec, tm, bf16_post):
    packed = K.pack_params(params, spec, dtype=jnp.bfloat16, passes=1)
    g = packed["g"]
    x_packed, n = K.pack_coords(coords.astype(jnp.float32), spec, g, tm)
    m = x_packed.shape[0]
    n_stack = int(packed["w_h"].shape[0])
    grid = (m // tm,)
    row_spec = pl.BlockSpec((tm, LANES), lambda i: (i, 0), memory_space=pltpu.VMEM)
    full = lambda *s: pl.BlockSpec(s, lambda i: (0,) * len(s), memory_space=pltpu.VMEM)  # noqa: E731
    out = pl.pallas_call(
        functools.partial(
            _residual_kernel, n_stack=n_stack, bf16_post=bf16_post,
            g=g, d_out=spec.d_out,
        ),
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
    fc = out[:, : g]
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

    # in-process library baseline for today's tunnel conditions
    base = jax.jit(lambda p, c: jnp.sum(
        K.fused_residual_continuity(p, c, spec, precision="bf16") ** 2))
    ref_val = float(base(params, coords))
    dt = measure(base, params, coords)
    base_rate = n_points / dt
    print(f"base(lib bf16): {base_rate:.3e} evals/s", flush=True)

    # (a) pure matmul chains: 101 layers, 1/2/3 streams
    g = 6
    packed = K.pack_params(params, spec, dtype=jnp.bfloat16, passes=1)
    tm = 1536
    x_packed, _ = K.pack_coords(coords, spec, g, tm)
    for n_streams in (1, 2, 3):
        f = lambda xp, wh: chain_only(xp, wh, 101, n_streams, tm)  # noqa: E731
        dt = measure(f, x_packed, jnp.concatenate(
            [packed["w_h"], packed["w_h"][:1], packed["w_h"][:1]]))
        # rate in "evals/s" equivalent: points processed / time
        pts = x_packed.shape[0] * g
        print(f"matmul-only {n_streams} streams TM={tm}: "
              f"{pts/dt:.3e} pts/s ({dt*1e3:.1f} ms)", flush=True)

    # (b) residual-in-kernel
    for bf16_post in (False, True):
        for tm2 in (1536, 2048, 3072, 4096):
            name = f"res-in-kernel bf16post={int(bf16_post)} TM={tm2}"
            try:
                f = lambda p, c: residual_in_kernel(p, c, spec, tm2, bf16_post)  # noqa: E731
                val = float(f(params, coords))
                dt = measure(f, params, coords)
                rel = abs(val - ref_val) / abs(ref_val)
                print(f"{name}: {n_points/dt:.3e} evals/s "
                      f"({n_points/dt/base_rate:.2f}x base, val rel {rel:.2e})",
                      flush=True)
            except Exception as e:
                print(f"{name}: FAILED {type(e).__name__}: {str(e)[:120]}",
                      flush=True)


if __name__ == "__main__":
    main()
