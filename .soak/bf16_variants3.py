"""bf16 roofline, round 3: break the per-layer MXU<->VPU serialization.

Attribution so far (bf16_variants2 on-chip):
* matmul-only, 1 dependent chain: 27% of MXU peak (latency-bound)
* matmul-only, 3 independent streams: 72% of peak (8.5e7 pts/s equivalent)
* full kernel: 55% of the matmul-only bound -> the post-op chain
  (bias -> tanh -> dact -> tangent mults -> casts) serializes against the
  MXU because ALL streams' layer-(l+1) matmuls depend on layer-l's nda.

Fix under test: S interleaved slices of the tile (independent chains) so one
slice's VPU post-ops overlap another's MXU matmuls. Plus: residual computed
in-kernel via lane rolls (ONE f32 output instead of three -> -6 MB VMEM,
1/3 output DMA), and bf16 post-ops.
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
    out_ref, *, n_stack, n_slices, bf16_post, res_in_kernel, g, d_out,
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
    tm = x.shape[0]
    sl = tm // n_slices
    # per-slice independent state: (a, [t_x, t_y])
    state = []
    for s in range(n_slices):
        xs = x[s * sl : (s + 1) * sl, :]
        z = dot(xs.astype(bf16), w_in_ref[:]) + b_in_ref[:]
        a, da = post(z)
        ts = [t_rows_ref[c : c + 1, :].astype(da.dtype) * da for c in range(2)]
        state.append((a, ts))

    for l in range(n_stack):
        w = w_h_ref[l]
        b = b_h_ref[l : l + 1, :]
        new_state = []
        for s in range(n_slices):
            a, ts = state[s]
            za = dot(cast_in(a), w)
            zts = [dot(cast_in(t), w) for t in ts]
            na, nda = post(za + b)
            nts = [
                (t.astype(nda.dtype) * nda) if bf16_post else t * nda for t in zts
            ]
            new_state.append((na, nts))
        state = new_state

    for s in range(n_slices):
        a, ts = state[s]
        y = dot(cast_in(a), w_out_ref[:]) + b_out_ref[:]
        dx = dot(cast_in(ts[0]), w_out_ref[:])
        dy = dot(cast_in(ts[1]), w_out_ref[:])
        if res_in_kernel:
            # heads of point c: U=3c, V=3c+1, h=3c+2 (d_out=3). Lane-roll the
            # operands so every product lands on the h lane (3c+2):
            # fc[3c+2] = h_x*U + h*U_x + h_y*V + h*V_y
            fc = (
                dx * pltpu.roll(y, 2, 1)
                + y * pltpu.roll(dx, 2, 1)
                + dy * pltpu.roll(y, 1, 1)
                + y * pltpu.roll(dy, 1, 1)
            )
            out_ref[s * sl : (s + 1) * sl, :] = fc
        else:
            out_ref[s * sl : (s + 1) * sl, :] = y  # placeholder: perf probe only


@functools.partial(
    jax.jit, static_argnames=("spec", "tm", "n_slices", "bf16_post", "res_in_kernel")
)
def run_variant(params, coords, spec, tm, n_slices, bf16_post, res_in_kernel=True):
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
            _kernel, n_stack=n_stack, n_slices=n_slices, bf16_post=bf16_post,
            res_in_kernel=res_in_kernel, g=g, d_out=spec.d_out,
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
    fc = out[:, 2 : g * spec.d_out : spec.d_out]  # h lanes (XLA-side slice)
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
    dt = measure(base, params, coords)
    base_rate = n_points / dt
    print(f"base(lib bf16): {base_rate:.3e} evals/s  val={ref_val:.6e}", flush=True)

    for n_slices, bf16_post, tms in [
        (1, False, [1536]),           # sanity: res-in-kernel alone
        (2, False, [1536, 2048]),
        (2, True, [1536, 2048, 3072]),
        (3, True, [1536, 3072]),
        (4, True, [2048, 4096]),
    ]:
        for tm in tms:
            name = f"S={n_slices} bf16post={int(bf16_post)} resk TM={tm}"
            try:
                f = lambda p, c: run_variant(p, c, spec, tm, n_slices, bf16_post)  # noqa: E731
                val = float(f(params, coords))
                dt = measure(f, params, coords)
                rel = abs(val - ref_val) / abs(ref_val)
                print(f"{name}: {n_points/dt:.3e} evals/s "
                      f"({n_points/dt/base_rate:.2f}x, val rel {rel:.2e})",
                      flush=True)
            except Exception as e:
                print(f"{name}: FAILED {type(e).__name__}: {str(e)[:120]}",
                      flush=True)


if __name__ == "__main__":
    main()
