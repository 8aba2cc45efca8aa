"""Probe the ROOFLINE.md deferred idea: merge the 3 per-layer stream dots
(primal + 2 tangents) into ONE (3TM, 128) dot per layer, keeping all streams
in a single persistent array so no per-layer concat is needed.

Round-3 measured the per-dot overhead of the 101-deep small-dot chain at
~0.74 us fixed (0.94 us dependent minus ~0.2 us streaming); 3 dots/layer
amortize to ~0.56 us/dot. One taller dot pays the fixed cost once:
projected ~20% bf16. Variants:

* V1 "roll":   post-ops computed full-width; primal nda broadcast to the
  tangent blocks via pltpu.roll along sublanes + iota selects. No copies.
* V2 "concat": post-ops on the primal slice only; streams re-concatenated
  per layer (the copy round-3's stacked-tangent probe paid).

Exactness: every variant must match the shipped fused_residual_continuity
bit-for-bit per tier (row-wise MXU arithmetic is unchanged).

Usage: python .soak/merged_chain_probe.py [--smoke]
"""

import functools
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
from jax.experimental import pallas as pl  # noqa: E402
from jax.experimental.pallas import tpu as pltpu  # noqa: E402

from pinn_depthestimation_tpu.models import MLPSpec, init_mlp_params  # noqa: E402
from pinn_depthestimation_tpu.ops import kernels as K  # noqa: E402

if not SMOKE:
    assert jax.devices()[0].platform == "tpu"
INTERPRET = SMOKE
DEPTH = 3 if SMOKE else 100
N = 4096 if SMOKE else 2_000_000
REPS = 2 if SMOKE else 5

spec = MLPSpec(sizes=(2,) + (20,) * DEPTH + (3,), init_type="xavier")
params = init_mlp_params(jax.random.PRNGKey(0), spec)
coords = jnp.asarray(np.random.RandomState(0).uniform(-1, 1, (N, 2)), jnp.float32)


def _merged_kernel(
    x_ref, w_in_ref, b_in_ref, w_h_ref, b_h_ref, w_out_ref, b_out_ref, t_rows_ref,
    out_ref,
    *, n_stack, init_type, dot_precision, three_pass, variant, d_out,
):
    f32 = jnp.float32

    def act(z):
        return jnp.tanh(z) if init_type == "xavier" else jnp.where(z >= 0, z, 0.01 * z)

    def dact(z, a):
        return 1.0 - a * a if init_type == "xavier" else jnp.where(z >= 0, 1.0, 0.01)

    def dot(a, w):
        return jax.lax.dot_general(
            a, w, (((1,), (0,)), ((), ())),
            precision=dot_precision, preferred_element_type=f32,
        )

    if three_pass:
        def matmul(a, w):
            a_hi, a_lo = K._split_f32(a)
            return (dot(a_lo, w[0]) + dot(a_hi, w[1])) + dot(a_hi, w[0])
    else:
        def matmul(a, w):
            return dot(a.astype(w.dtype), w)

    x = x_ref[:]
    tm = x.shape[0]
    # layer 0: primal only, tangent seeds from t_rows * da (as shipped)
    z = matmul(x, w_in_ref[:]) + b_in_ref[:]
    a = act(z)
    da = dact(z, a)
    tx = t_rows_ref[0:1, :] * da
    ty = t_rows_ref[1:2, :] * da
    s = jnp.concatenate([a, tx, ty], axis=0)  # ONE concat per tile, not per layer

    if variant == "roll":
        rows = jax.lax.broadcasted_iota(jnp.int32, (3 * tm, K.LANES), 0)
        is_primal = rows < tm
        is_t1 = (rows >= tm) & (rows < 2 * tm)

        def layer(l_w, l_b, s):
            z = matmul(s, l_w)
            zb = z + l_b           # bias only meaningful on primal rows
            na = act(zb)
            nda = dact(zb, na)
            nda1 = pltpu.roll(nda, tm, 0)       # primal's nda -> block 1 rows
            nda2 = pltpu.roll(nda, 2 * tm, 0)   # primal's nda -> block 2 rows
            return jnp.where(
                is_primal, na, z * jnp.where(is_t1, nda1, nda2)
            )
    else:  # concat
        def layer(l_w, l_b, s):
            z = matmul(s, l_w)
            za = z[0:tm] + l_b
            na = act(za)
            nda = dact(za, na)
            return jnp.concatenate(
                [na, z[tm:2 * tm] * nda, z[2 * tm:] * nda], axis=0
            )

    for l in range(n_stack):  # static unroll (<=128 layers, as shipped)
        s = layer(w_h_ref[l], b_h_ref[l:l + 1, :], s)

    out = matmul(s, w_out_ref[:])
    y = out[0:tm] + b_out_ref[:]   # bias on the primal slice only
    dx = out[tm:2 * tm]
    dy = out[2 * tm:]
    out_ref[:] = (
        dx * pltpu.roll(y, 2, 1) + y * pltpu.roll(dx, 2, 1)
    ) + (dy * pltpu.roll(y, 1, 1) + y * pltpu.roll(dy, 1, 1))


@functools.partial(jax.jit, static_argnames=("precision", "variant", "rows"))
def merged_residual(params, coords, *, precision, variant, rows=0):
    if not rows:
        rows = K._DEFAULT_ROWS_BY_PRECISION[precision]
    three_pass = precision == "f32x3"
    dtype = jnp.bfloat16 if precision != "f32" else jnp.float32
    packed = K.pack_params(params, spec, dtype=dtype,
                           passes=2 if three_pass else 1)
    g = packed["g"]
    x_packed, n = K.pack_coords(coords, spec, g, rows)
    m = x_packed.shape[0]
    n_stack = int(packed["w_h"].shape[0])

    kernel = functools.partial(
        _merged_kernel, n_stack=n_stack, init_type=spec.init_type,
        dot_precision=K._DOT_PRECISION[precision], three_pass=three_pass,
        variant=variant, d_out=spec.d_out,
    )
    grid = (m // rows,)
    row_spec = pl.BlockSpec((rows, K.LANES), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    full = lambda *s: pl.BlockSpec(s, lambda i: (0,) * len(s),  # noqa: E731
                                   memory_space=pltpu.VMEM)
    wshape = (2, K.LANES, K.LANES) if three_pass else (K.LANES, K.LANES)
    out = pl.pallas_call(
        kernel, grid=grid,
        in_specs=[row_spec, full(*wshape), full(1, K.LANES),
                  full(max(n_stack, 1), *wshape), full(max(n_stack, 1), K.LANES),
                  full(*wshape), full(1, K.LANES), full(spec.d_in, K.LANES)],
        out_specs=row_spec,
        out_shape=jax.ShapeDtypeStruct((m, K.LANES), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * rows * K.LANES * K.LANES * (n_stack + 2) * 3 * grid[0],
            bytes_accessed=m * K.LANES * 4 * 2,
            transcendentals=rows * K.LANES * (n_stack + 1) * grid[0] * 3,
        ),
        interpret=INTERPRET,
    )(x_packed, packed["w_in"], packed["b_in"], packed["w_h"], packed["b_h"],
      packed["w_out"], packed["b_out"], packed["t_rows"])
    fc = out[:, 2:g * spec.d_out:spec.d_out]
    return fc.reshape(-1)[:n]


def timed(fn):
    r = fn()
    float(r[0])  # compile + sync
    ts = []
    for _ in range(REPS):
        t0 = time.perf_counter()
        float(fn()[0])
        ts.append(time.perf_counter() - t0)
    return N / sorted(ts)[len(ts) // 2]


for precision in ("f32", "f32x3", "bf16"):
    base = jax.jit(lambda p, c: K.fused_residual_continuity(
        p, c, spec, precision=precision, interpret=INTERPRET))
    ref = base(params, coords)
    rate0 = timed(lambda: base(params, coords))
    print(f"{precision}: shipped {rate0:.3e} evals/s", flush=True)
    for variant in ("roll", "concat"):
        try:
            got = merged_residual(params, coords, precision=precision,
                                  variant=variant)
            exact = bool(jnp.all(got == ref))
            maxd = float(jnp.max(jnp.abs(got - ref)))
            rate = timed(lambda: merged_residual(
                params, coords, precision=precision, variant=variant))
            print(f"  merged/{variant}: {rate:.3e} evals/s "
                  f"({rate / rate0:.3f}x)  exact={exact} maxdiff={maxd:.1e}",
                  flush=True)
        except Exception as e:  # Mosaic lowering failures are findings too
            print(f"  merged/{variant}: FAILED {type(e).__name__}: "
                  f"{str(e)[:300]}", flush=True)
print("done", flush=True)
