"""Pallas fused MLP kernels: the TPU-native hot path for PINN residuals.

Problem shape (SURVEY.md §3.4): the flagship model is a chain of ~100 tiny
``(20, 20)`` matmuls over a tall batch of collocation points. Two properties
make the stock XLA path slow on TPU:

* a width-20 operand occupies 20 of the MXU's 128 lanes — ~2.4% utilization;
* each layer's activations (+2 tangent streams) round-trip through HBM, so
  the computation is bandwidth-bound (~500 MB of traffic per layer per
  million points).

This kernel fixes both:

**Lane packing.** ``G = floor(128 / width)`` points are packed into each
128-lane row, and every layer weight ``w`` becomes the block-diagonal
``kron(I_G, w)`` (a ``(128, 128)`` tile). One MXU matmul then advances G
points through the layer simultaneously — a 6x utilization gain at width 20.
Dead lanes carry zero weights/biases, so tanh keeps them at exactly 0 and
results are bit-identical to the unpacked form.

**Full-chain fusion.** The packed activations and K coordinate-tangent
streams stay in VMEM across all layers (~6 MB of packed weights + a few
128 KB tiles — well under the ~16 MB budget); HBM sees only the packed
inputs and the K+1 packed outputs.

The kernel computes exactly what ``models.mlp.mlp_apply_with_tangents``
computes (same math, same f32 precision by default) and is validated against
it in tests; ``apply_with_tangents_packed`` is a drop-in substitute, so the
physics layer (``physics.model_fields_and_grads``) is oblivious to which
backend produced the derivatives.

Precision tiers (``precision=``):

* ``'f32'``   — f32 storage, ``Precision.HIGHEST`` dots (true f32 via
  six-pass bf16 on the MXU). Matches the XLA reference path to f32
  roundoff.
* ``'f32x3'`` — split-f32: every f32 operand is decomposed into bf16
  ``hi + lo`` parts and each dot runs as THREE single-pass bf16 matmuls
  (``hi·hi + lo·hi + hi·lo``, f32 accumulation) — the ``Precision.HIGH``
  tier Mosaic cannot lower natively. Half the MXU passes of HIGHEST at
  ~2^-17 relative operand precision (orders of magnitude tighter than the
  TF32 a torch/A100 run of the reference silently uses). Weights are
  hi/lo-split once at pack time; activations are split on the VPU per
  matmul.
* ``'bf16'``  — bf16 storage and single-pass MXU with f32 accumulation:
  maximum-throughput serving mode. Biases and accumulators stay f32 in
  every tier.
"""

from __future__ import annotations

import functools
from typing import Sequence

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from pinn_depthestimation_tpu.models.mlp import MLPSpec

LANES = 128
# Packed rows per grid tile (TM), per precision tier. The cheaper the MXU
# passes, the larger the optimal tile (per-layer VPU overhead amortizes):
# v5e sweep — f32 flat 768-1152 (VMEM-bound above ~1024 with f32 weights);
# f32x3 rises to TM=2048 (+7% over 1024; bf16 weights free ~3 MB of VMEM);
# bf16 peaks at 1536 (OOMs at 3072).
DEFAULT_ROWS = 1024
_DEFAULT_ROWS_BY_PRECISION = {"f32": 1024, "f32x3": 2048, "bf16": 1536}


def auto_rows_per_tile(n_rows: int, default: int) -> int:
    """Tile height minimizing end-of-batch padding: split ``n_rows`` evenly
    into ``ceil(n_rows / default)`` tiles, rounded up to the 8-sublane
    granule. The TM sweeps are flat around the tuned defaults (ROOFLINE.md),
    so trimming the last-tile waste dominates any tile-size effect: at the
    flagship 12,516 points the fixed defaults padded the batch 1.47x (f32,
    TM=1024) and 1.96x (f32x3, TM=2048); even tiles pad <=0.6%."""
    k = max(1, -(-n_rows // default))
    rows = -(-n_rows // k)
    return max(8, min(default, -(-rows // 8) * 8))


def pallas_supported() -> bool:
    try:
        return jax.devices()[0].platform == "tpu"
    except Exception:  # pragma: no cover - no backend at all
        return False


def packing_factor(spec: MLPSpec) -> int:
    """Points per 128-lane row: limited by the widest per-point block."""
    per_point = max(spec.width, spec.d_in, spec.d_out)
    g = LANES // per_point
    if g < 1:
        raise ValueError(f"width {per_point} exceeds {LANES} lanes")
    return g


def _block_diag(w: jax.Array, g: int, dtype) -> jax.Array:
    """``kron(I_g, w)`` zero-padded to (LANES, LANES)."""
    k = jnp.kron(jnp.eye(g, dtype=w.dtype), w)
    out = jnp.zeros((LANES, LANES), dtype)
    return out.at[: k.shape[0], : k.shape[1]].set(k.astype(dtype))


def _tile_bias(b: jax.Array, g: int, dtype) -> jax.Array:
    t = jnp.tile(b, g)
    out = jnp.zeros((LANES,), dtype)
    return out.at[: t.shape[0]].set(t.astype(dtype))


_DOT_PRECISION = {
    "f32": jax.lax.Precision.HIGHEST,
    "f32x3": jax.lax.Precision.DEFAULT,  # 3 manual bf16 passes (see _split_f32)
    "bf16": jax.lax.Precision.DEFAULT,
}


def _split_f32(a: jax.Array):
    """Decompose f32 into bf16 ``(hi, lo)`` with ``hi + lo`` carrying ~16
    mantissa bits of ``a`` (the split-f32 / bf16x3 emulation of
    ``Precision.HIGH``)."""
    hi = a.astype(jnp.bfloat16)
    lo = (a - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    return hi, lo


def _split_passes(w: jax.Array) -> jax.Array:
    """f32 ``(..., LANES, LANES)`` -> bf16 ``(..., 2, LANES, LANES)`` hi/lo."""
    hi, lo = _split_f32(w)
    return jnp.stack([hi, lo], axis=-3)


def pack_params(params: dict, spec: MLPSpec, *, dtype=jnp.float32, passes: int = 1) -> dict:
    """Precompute packed block-diagonal weights (jit-safe, runs via XLA).

    ``passes=2`` (the f32x3 tier) stores each weight as a leading-axis pair of
    bf16 hi/lo splits — same bytes as one f32 copy."""
    g = packing_factor(spec)
    if spec.n_hidden < 1:
        raise ValueError("packed kernel needs at least one hidden layer")

    f32 = jnp.float32
    w_in = _block_diag(params["w_in"], g, f32)        # (128, 128); rows g*d_in+c
    b_in = _tile_bias(params["b_in"], g, f32)
    n_stack = params["w_hidden"].shape[0]
    if n_stack > 0:
        w_h = jax.vmap(lambda w: _block_diag(w, g, f32))(params["w_hidden"])
        # biases stay f32: added post-matmul in f32, and bf16 (m, 128) memrefs
        # reject dynamic row loads under Mosaic's 16-row alignment rule
        b_h = jax.vmap(lambda b: _tile_bias(b, g, f32))(params["b_hidden"])
    else:
        w_h = jnp.zeros((0, LANES, LANES), f32)
        b_h = jnp.zeros((0, LANES), f32)
    w_out = _block_diag(params["w_out"], g, f32)
    b_out = _tile_bias(params["b_out"], g, f32)

    if passes == 2:
        w_in, w_h, w_out = _split_passes(w_in), _split_passes(w_h), _split_passes(w_out)
    elif dtype != f32:
        w_in, w_h, w_out = (a.astype(dtype) for a in (w_in, w_h, w_out))

    # Tangent seed rows: pushing the coordinate-c unit tangent of every packed
    # point through w_in gives a row-constant vector: sum_g w_in_packed[g*d_in+c]
    # — derived from the same (possibly reduced-precision) weights the forward
    # matmuls use, so tangents stay consistent with the tier's forward function.
    d_in = spec.d_in
    rows = jnp.arange(g) * d_in
    w_in_eff = w_in.astype(f32).sum(axis=0) if passes == 2 else w_in  # hi+lo
    t_rows = jnp.stack(
        [jnp.sum(w_in_eff[rows + c].astype(f32), axis=0) for c in range(d_in)]
    )

    return {
        "g": g,
        "w_in": w_in,
        "b_in": b_in.reshape(1, LANES),
        "w_h": w_h,
        "b_h": b_h,
        "w_out": w_out,
        "b_out": b_out.reshape(1, LANES),
        "t_rows": t_rows,  # (d_in, 128)
    }


def pack_coords(coords: jax.Array, spec: MLPSpec, g: int, rows_per_tile: int):
    """(N, d_in) -> padded (M, 128) packed rows; returns (packed, n_rows)."""
    n = coords.shape[0]
    d_in = spec.d_in
    per_row = g * d_in
    n_pad = (-n) % (g * rows_per_tile)
    if n_pad:
        coords = jnp.concatenate(
            [coords, jnp.broadcast_to(coords[:1], (n_pad, d_in))], axis=0
        )
    m = coords.shape[0] // g
    packed = coords.reshape(m, per_row)
    packed = jnp.pad(packed, ((0, 0), (0, LANES - per_row)))
    return packed, n


def unpack_outputs(y_packed: jax.Array, n: int, g: int, d_out: int) -> jax.Array:
    """(M, 128) packed rows -> (n, d_out)."""
    m = y_packed.shape[0]
    y = y_packed[:, : g * d_out].reshape(m * g, d_out)
    return y[:n]


# Above this stack depth the hidden-layer loop stays a fori_loop (compile
# size); at or below it the loop fully unrolls, which lets Mosaic schedule
# across layer boundaries — measured 1.12x (f32) / 1.35x (bf16) on v5e for
# the 100-layer flagship vs the rolled concat-stream form.
UNROLL_MAX_LAYERS = 128


def _mlp_kernel(
    x_ref, w_in_ref, b_in_ref, w_h_ref, b_h_ref, w_out_ref, b_out_ref, t_rows_ref,
    *out_refs,
    n_stack: int,
    n_tangents: int,
    init_type: str,
    dot_precision,
    three_pass: bool = False,
    continuity_epilogue: bool = False,
    d_out: int = 3,
):
    """Fused packed forward + tangent propagation for one (TM, 128) tile.

    The primal and the K tangent streams advance through each layer as
    SEPARATE matmuls issued back to back (primal first): the tangent matmuls
    have no data dependence on the primal's tanh, so with the layer loop
    fully unrolled the scheduler overlaps the VPU post-ops of one stream
    with the MXU work of the others. (The earlier one-concatenated-matmul
    form serialized tanh against the whole (K+1)*TM-row matmul and cost
    ~12% at f32 / ~35% at bf16.)
    """
    f32 = jnp.float32

    def act(z):
        if init_type == "xavier":
            return jnp.tanh(z)
        return jnp.where(z >= 0, z, 0.01 * z)

    def dact(z, a):
        if init_type == "xavier":
            return 1.0 - a * a
        return jnp.where(z >= 0, 1.0, 0.01)

    def dot(a, w):
        return jax.lax.dot_general(
            a, w, (((1,), (0,)), ((), ())),
            precision=dot_precision, preferred_element_type=f32,
        )

    if three_pass:
        # split-f32: w is a (2, 128, 128) bf16 hi/lo pair; the activation is
        # split on the VPU. Small cross terms are summed first.
        def matmul(a, w):
            a_hi, a_lo = _split_f32(a)
            return (dot(a_lo, w[0]) + dot(a_hi, w[1])) + dot(a_hi, w[0])
    else:
        # cast the activation stream to the weight dtype (bf16 mode) with f32
        # accumulation; a no-op in f32 mode
        def matmul(a, w):
            return dot(a.astype(w.dtype), w)

    x = x_ref[:]
    tm = x.shape[0]
    z = matmul(x, w_in_ref[:]) + b_in_ref[:]
    a = act(z)
    da = dact(z, a)
    # (1, 128) tangent seed rows broadcast against the (tm, 128) da to give
    # full (tm, 128) tangent streams
    ts = [t_rows_ref[c : c + 1, :] * da for c in range(n_tangents)]

    def layer(l_w, l_b, a, ts):
        za = matmul(a, l_w)
        zts = [matmul(t, l_w) for t in ts]
        z_a = za + l_b
        na = act(z_a)
        nda = dact(z_a, na)
        return na, [zt * nda for zt in zts]

    if n_stack > 0:
        if n_stack <= UNROLL_MAX_LAYERS:
            for l in range(n_stack):  # static: full unroll
                a, ts = layer(w_h_ref[l], b_h_ref[l : l + 1, :], a, ts)
        else:
            def body(l, carry):
                a, ts = carry[0], list(carry[1:])
                a, ts = layer(w_h_ref[l], b_h_ref[pl.ds(l, 1), :], a, ts)
                return (a, *ts)

            out = jax.lax.fori_loop(0, n_stack, body, (a, *ts))
            a, ts = out[0], list(out[1:])

    y = matmul(a, w_out_ref[:]) + b_out_ref[:]
    if continuity_epilogue:
        # The continuity residual computed IN the packed lane layout, writing
        # ONE (TM, 128) f32 tile instead of three: frees ~6 MB of VMEM
        # (output tiles + double buffers) and cuts output DMA 3x — measured
        # +11% bf16 eval throughput, value bit-identical to the unfused
        # combination. Heads of point c sit at lanes c*d_out + {U=0, V=1,
        # h=2}; rolling an operand by +k lanes aligns lane 3c with 3c+k, so
        # every product lands on its point's h lane:
        #   fc[3c+2] = (h_x*U + h*U_x) + (h_y*V + h*V_y)
        dx = matmul(ts[0], w_out_ref[:])
        dy = matmul(ts[1], w_out_ref[:])
        out_refs[0][:] = (
            dx * pltpu.roll(y, 2, 1) + y * pltpu.roll(dx, 2, 1)
        ) + (dy * pltpu.roll(y, 1, 1) + y * pltpu.roll(dy, 1, 1))
    else:
        out_refs[0][:] = y
        for k in range(n_tangents):
            out_refs[1 + k][:] = matmul(ts[k], w_out_ref[:])


def packed_mlp_fwd_tangents_raw(
    params: dict,
    coords: jax.Array,
    spec: MLPSpec,
    n_tangents: int,
    rows_per_tile: int = 0,
    precision: str = "f32",
    interpret: bool = False,
    continuity_epilogue: bool = False,
):
    """Run the fused kernel, returning the PACKED ``(m, 128)`` output tiles
    (primal first, then the tangent streams) plus ``(n, g)`` — for consumers
    that stay in the packed lane layout (e.g. the packed residual below) and
    skip the lane->row unpack relayout (~10% of the bench at 10M points).

    With ``continuity_epilogue`` the kernel emits a SINGLE packed tile
    carrying the continuity residual on the h lanes (requires the
    ``(U, V, h)`` 3-head contract and 2 coordinate tangents)."""
    if precision not in _DOT_PRECISION:
        raise ValueError(f"precision must be one of {sorted(_DOT_PRECISION)}")
    if continuity_epilogue and (spec.d_out != 3 or n_tangents != 2):
        raise ValueError(
            "continuity_epilogue requires d_out=3 heads (U, V, h) and "
            f"2 tangents, got d_out={spec.d_out}, n_tangents={n_tangents}"
        )
    if not rows_per_tile:
        n_rows = -(-coords.shape[0] // packing_factor(spec))
        rows_per_tile = auto_rows_per_tile(
            n_rows, _DEFAULT_ROWS_BY_PRECISION[precision]
        )
    three_pass = precision == "f32x3"
    dtype = jnp.bfloat16 if precision != "f32" else jnp.float32
    passes = 2 if three_pass else 1
    packed = pack_params(params, spec, dtype=dtype, passes=passes)
    g = packed["g"]
    x_packed, n = pack_coords(coords.astype(jnp.float32), spec, g, rows_per_tile)
    m = x_packed.shape[0]
    n_stack = int(packed["w_h"].shape[0])

    kernel = functools.partial(
        _mlp_kernel,
        n_stack=n_stack,
        n_tangents=n_tangents,
        init_type=spec.init_type,
        dot_precision=_DOT_PRECISION[precision],
        three_pass=three_pass,
        continuity_epilogue=continuity_epilogue,
        d_out=spec.d_out,
    )

    grid = (m // rows_per_tile,)
    row_spec = pl.BlockSpec(
        (rows_per_tile, LANES), lambda i: (i, 0), memory_space=pltpu.VMEM
    )
    full = lambda *s: pl.BlockSpec(s, lambda i: (0,) * len(s), memory_space=pltpu.VMEM)  # noqa: E731
    wshape = (2, LANES, LANES) if three_pass else (LANES, LANES)

    n_outs = 1 if continuity_epilogue else 1 + n_tangents
    out_shape = [jax.ShapeDtypeStruct((m, LANES), jnp.float32)] * n_outs
    flops_per_tile = 2 * rows_per_tile * LANES * LANES * (n_stack + 2) * (1 + n_tangents)

    outs = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            row_spec,                                  # x
            full(*wshape),                             # w_in
            full(1, LANES),                            # b_in
            full(max(n_stack, 1), *wshape),            # w_h
            full(max(n_stack, 1), LANES),              # b_h
            full(*wshape),                             # w_out
            full(1, LANES),                            # b_out
            full(spec.d_in, LANES),                    # t_rows
        ],
        out_specs=[row_spec] * n_outs,
        out_shape=out_shape,
        cost_estimate=pl.CostEstimate(
            flops=flops_per_tile * grid[0],
            bytes_accessed=(m * LANES * 4) * (1 + n_outs),
            transcendentals=rows_per_tile * LANES * (n_stack + 1) * grid[0],
        ),
        interpret=interpret,
    )(
        x_packed,
        packed["w_in"],
        packed["b_in"],
        packed["w_h"] if n_stack else jnp.zeros((1,) + wshape, dtype),
        packed["b_h"] if n_stack else jnp.zeros((1, LANES), jnp.float32),
        packed["w_out"],
        packed["b_out"],
        packed["t_rows"],
    )
    return outs, n, g


@functools.partial(
    jax.jit,
    static_argnames=("spec", "n_tangents", "rows_per_tile", "precision", "interpret"),
)
def packed_mlp_fwd_tangents(
    params: dict,
    coords: jax.Array,
    spec: MLPSpec,
    n_tangents: int,
    rows_per_tile: int = 0,
    precision: str = "f32",
    interpret: bool = False,
):
    """Run the fused kernel. Returns ``(y (N, d_out), dy (n_tangents, N, d_out))``.

    Tangents are the first ``n_tangents`` coordinate directions (in input
    order), which is what every residual in ``physics`` consumes.
    ``rows_per_tile=0`` resolves to the tier's tuned default
    (``_DEFAULT_ROWS_BY_PRECISION``).
    """
    outs, n, g = packed_mlp_fwd_tangents_raw(
        params, coords, spec, n_tangents, rows_per_tile, precision, interpret
    )
    y = unpack_outputs(outs[0], n, g, spec.d_out)
    if n_tangents == 0:
        return y, jnp.zeros((0,) + y.shape, y.dtype)
    dy = jnp.stack(
        [unpack_outputs(o, n, g, spec.d_out) for o in outs[1:]], axis=0
    )
    return y, dy


def apply_with_tangents_packed(
    params: dict,
    x: jax.Array,
    tangents: Sequence[jax.Array] | jax.Array,
    spec: MLPSpec,
    *,
    precision: str = "f32",
    interpret: bool = False,
):
    """Drop-in for ``mlp_apply_with_tangents`` restricted to coordinate-basis
    tangents in input order (which is all the physics bridge ever requests)."""
    if isinstance(tangents, jax.Array):
        k = tangents.shape[0]
    else:
        k = len(tangents)
    return packed_mlp_fwd_tangents(
        params, x, spec, k, precision=precision, interpret=interpret
    )


@functools.partial(
    jax.jit, static_argnames=("spec", "precision", "interpret")
)
def fused_residual_continuity(
    params, coords, spec, *, precision: str = "f32", interpret: bool = False
):
    """Per-point continuity residual via the fused kernel (bench hot path).

    Computes ``d(hU)/dx + d(hV)/dy`` (physics.continuity_only_residuals)
    ENTIRELY inside the kernel via lane rolls (``continuity_epilogue``):
    one packed output tile instead of three, so the kernel's VMEM output
    footprint and HBM writeback drop 3x (round-2 form: residual algebra in
    XLA on three packed outputs; round-3 in-kernel epilogue measured +11%
    bf16 with bit-identical values)."""
    outs, n, g = packed_mlp_fwd_tangents_raw(
        params, coords, spec, 2, precision=precision, interpret=interpret,
        continuity_epilogue=True,
    )
    fc = outs[0][:, 2 : g * spec.d_out : spec.d_out]  # h lanes -> (m, g)
    return fc.reshape(-1)[:n]
