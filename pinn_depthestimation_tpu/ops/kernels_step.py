"""One-kernel training step: fused loss + gradients for shared-point
continuity losses.

The standard fused training step runs TWO Pallas kernels per iteration: the
forward+tangents kernel (for the loss value and the cotangent epilogue in
XLA) and the custom-VJP backward kernel (whose replay phase recomputes the
exact same forward). For the flagship configuration — the newmethod pipeline
where fidelity and residual share one point set (reference
``train_newmethod.py:126-156`` slices one forward) and the physics is
``continuity_only``/``continuity_ftemp`` (reference ``physics.py:18-47``) —
the whole ``value_and_grad`` collapses into ONE kernel: the streaming
backward's replay phase IS the forward, so the kernel finishes it with the
output-layer dot, computes the residual/fidelity/anchor statistics and the
output cotangents in-lane (``kernels_vjp._make_bwd_kernel_stream`` with
``train_epilogue``), and backpropagates as usual. Measured on v5e this
deletes the separate forward kernel (~0.75 ms of the 3.65 ms flagship Adam
step) without the O(N·L) activation memory a save-states forward would need.

Loss semantics are exactly ``training/loss.py``'s shared-forward path:

* residual = mean_masked(fc^2) [+ sum(sel·(h-depth)^2)/sum(sel) for
  ``continuity_only``], fc = d(hU)/dx + d(hV)/dy
* fidelity = Σ_j w_j · mean_masked((y_j - true_j)^2) over the true heads
* total = w_fid·fidelity + w_res·residual

The anchor selector (quirk 2, SURVEY §5) and all masks are computed by the
caller (``training/loss.py``) and passed as data; the global denominators
(masked counts) are batch statistics with zero parameter gradient, so the
cotangent scales are plain scalars.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from pinn_depthestimation_tpu.models.mlp import MLPSpec
from pinn_depthestimation_tpu.ops.kernels import _DOT_PRECISION, LANES, auto_rows_per_tile
from pinn_depthestimation_tpu.ops.kernels_vjp import (
    RING_SLOTS,
    STREAM_ROWS,
    _make_bwd_kernel_stream,
    pack_params_strided,
    pack_values_strided,
)

KT = 2  # the continuity losses differentiate w.r.t. (x, y) only


def _check_step_spec(spec: MLPSpec, n_true: int, has_anchor: bool) -> None:
    if spec.dropout_rate:
        raise ValueError("fused training step does not support dropout")
    if spec.d_out < 3 or not (0 < n_true <= 3):
        raise ValueError("fused training step needs (U, V, h) heads")
    if has_anchor and n_true > 2:
        raise ValueError(
            "the anchor selector rides the h column of the packed obs rows; "
            "3 observed fidelity heads collide with it (use the generic "
            "loss path for anchored 3-head configurations)"
        )


def _loss_scales(
    sel, mask, fid_weights, n_true, w_fid, w_res, anchor_depth, has_anchor
):
    """Global denominators and the SMEM cotangent-scale vector.

    The denominators (masked counts) are batch statistics with zero
    parameter gradient; on a sharded batch the ``jnp.sum`` here reduces the
    GLOBAL mask (GSPMD inserts the psum), so every shard runs the kernel
    with the full-batch scales and per-shard partial sums psum exactly to
    the full-batch loss and gradients."""
    f32 = jnp.float32
    n_res = jnp.sum(mask)
    n_sel = jnp.sum(sel)
    res_scale = 2.0 * w_res / n_res
    anchor_scale = (2.0 * w_res / n_sel) if has_anchor else jnp.float32(0.0)
    fid_scales = 2.0 * w_fid * fid_weights.astype(f32) / n_res
    scal = jnp.zeros((8,), f32)
    scal = scal.at[0].set(res_scale).at[1].set(anchor_scale).at[2].set(anchor_depth)
    scal = scal.at[3 : 3 + n_true].set(fid_scales)
    return n_res, n_sel, scal


def _combine_stats(stats, params, grads, fid_weights, n_res, n_sel,
                   n_true, w_fid, w_res, has_anchor):
    """Loss terms from the kernel's sufficient-statistics row + grads cast
    back to the parameter dtypes."""
    grads = jax.tree.map(lambda a, p: a.astype(p.dtype), grads, params)
    residual = stats[0] / n_res
    if has_anchor:
        residual = residual + stats[1] / n_sel
    fidelity = jnp.sum(
        fid_weights.astype(jnp.float32) * stats[2 : 2 + n_true]
    ) / n_res
    total = w_fid * fidelity + w_res * residual
    return (total, (fidelity, residual)), grads


@functools.partial(
    jax.jit,
    static_argnames=(
        "spec", "n_true", "w_fid", "w_res", "anchor_depth", "has_anchor",
        "precision", "interpret", "rows_per_tile",
    ),
)
def fused_loss_and_grad(
    params: dict,
    coords: jax.Array,      # (N, 2) residual==fidelity points
    trues: jax.Array,       # (N, n_true) observed true heads
    sel: jax.Array,         # (N,) anchor selector, already mask-multiplied
    mask: jax.Array,        # (N,) validity mask (1.0 = real point)
    fid_weights: jax.Array,  # (n_true,) per-output fidelity weights
    spec: MLPSpec,
    n_true: int,
    w_fid: float,
    w_res: float,
    anchor_depth: float = 0.75,
    has_anchor: bool = True,
    precision: str = "f32",
    interpret: bool = False,
    rows_per_tile: int = 0,
):
    """Returns ``((total, (fidelity, residual)), grads)`` — the exact value
    and parameter gradients of the shared-forward continuity loss, from one
    Pallas kernel invocation.

    Empty anchor selections divide by zero into nan, matching the
    reference's ``torch.mean`` of an empty tensor (physics.py:28) and the
    XLA path."""
    _check_step_spec(spec, n_true, has_anchor)
    mask = mask.astype(jnp.float32)
    sel = sel.astype(jnp.float32)
    n_res, n_sel, scal = _loss_scales(
        sel, mask, fid_weights, n_true, w_fid, w_res, anchor_depth, has_anchor
    )
    stats, grads = _stats_and_grads(
        params, coords, trues, sel, mask, scal, spec, n_true, has_anchor,
        precision, interpret, rows_per_tile,
    )
    return _combine_stats(stats, params, grads, fid_weights, n_res, n_sel,
                          n_true, w_fid, w_res, has_anchor)


def fused_loss_and_grad_sharded(
    params: dict,
    coords: jax.Array,
    trues: jax.Array,
    sel: jax.Array,
    mask: jax.Array,
    fid_weights: jax.Array,
    spec: MLPSpec,
    n_true: int,
    w_fid: float,
    w_res: float,
    mesh,
    anchor_depth: float = 0.75,
    has_anchor: bool = True,
    precision: str = "f32",
    interpret: bool = False,
    rows_per_tile: int = 0,
):
    """Data-parallel one-kernel step: ONE ``shard_map`` per evaluation, the
    fused loss+grad kernel on each shard's rows, ``psum`` over ICI of the
    loss sufficient statistics AND the parameter-gradient partial sums.

    Exact full-batch numerics: the cotangent scales are built from the
    GLOBAL masked counts (outside the shard_map), so per-shard gradients
    are partial sums of the full-batch gradient and add exactly. Rows must
    already be sharded evenly over the mesh's ``data`` axis with padding
    masked (``parallel.shard_batch``)."""
    from jax.sharding import PartitionSpec as P

    _check_step_spec(spec, n_true, has_anchor)
    mask = mask.astype(jnp.float32)
    sel = sel.astype(jnp.float32)
    n_res, n_sel, scal = _loss_scales(
        sel, mask, fid_weights, n_true, w_fid, w_res, anchor_depth, has_anchor
    )

    def shard_fn(p, c, t, s_, m, sc):
        stats, grads = _stats_and_grads(
            p, c, t, s_, m, sc, spec, n_true, has_anchor, precision,
            interpret, rows_per_tile,
        )
        return jax.tree.map(
            lambda a: jax.lax.psum(a, "data"), (stats, grads)
        )

    stats, grads = jax.shard_map(
        shard_fn,
        mesh=mesh,
        in_specs=(P(), P("data"), P("data"), P("data"), P("data"), P()),
        out_specs=P(),
        check_vma=False,  # pallas_call carries no vma annotations
    )(params, coords, trues, sel, mask, scal)
    return _combine_stats(stats, params, grads, fid_weights, n_res, n_sel,
                          n_true, w_fid, w_res, has_anchor)


def _stats_and_grads(
    params, coords, trues, sel, mask, scal, spec, n_true, has_anchor,
    precision, interpret, rows_per_tile,
):
    """Shard-local kernel invocation: pack rows, run the train-epilogue
    streaming backward, compact the gradients. Returns ``(stats, grads)``
    where ``stats`` is the (LANES,) f32 sufficient-statistics row (lane 0 =
    sum fc^2, 1 = sum sel*(h-depth)^2, 2+j = sum fid err_j^2) and ``grads``
    is the f32 parameter pytree of loss-gradient partial sums over these
    rows."""
    three_pass = precision == "f32x3"
    dtype = jnp.bfloat16 if precision != "f32" else jnp.float32
    passes = 2 if three_pass else 1
    packed = pack_params_strided(params, spec, dtype=dtype, passes=passes)
    s, g = packed["s"], packed["g"]
    tm = rows_per_tile or auto_rows_per_tile(
        -(-coords.shape[0] // g), STREAM_ROWS[precision]
    )
    w = spec.width
    f32 = jnp.float32

    # obs rows: trues at block cols [0, n_true), anchor sel at col 2 (the h
    # column — free only while n_true <= 2, enforced by _check_step_spec);
    # msk rows: validity at cols 0..2. Padding rows are zero. Anchorless
    # losses skip the sel write so a 3rd observed head keeps its column.
    obs_vals = jnp.zeros((coords.shape[0], 3), f32)
    obs_vals = obs_vals.at[:, :n_true].set(trues.astype(f32))
    if has_anchor:
        obs_vals = obs_vals.at[:, 2].add(sel)
    msk_vals = jnp.broadcast_to(mask[:, None], (coords.shape[0], 3))

    x_packed, _ = pack_values_strided(coords.astype(f32), spec.d_in, g, s, tm)
    obs_packed, _ = pack_values_strided(obs_vals, 3, g, s, tm)
    msk_packed, _ = pack_values_strided(msk_vals, 3, g, s, tm)
    m = x_packed.shape[0]
    n_stack = int(packed["w_h"].shape[0])
    ns = max(n_stack, 1)
    state_rows = (1 + KT) * tm

    kernel = _make_bwd_kernel_stream(
        spec, n_stack, KT, g, s, _DOT_PRECISION[precision], tm,
        RING_SLOTS, three_pass, train_epilogue=n_true,
    )

    grid = (m // tm,)
    row_spec = pl.BlockSpec((tm, LANES), lambda i: (i, 0), memory_space=pltpu.VMEM)
    full = lambda *shape: pl.BlockSpec(  # noqa: E731
        shape, lambda i: (0,) * len(shape), memory_space=pltpu.VMEM
    )
    wshape = (2, LANES, LANES) if three_pass else (LANES, LANES)

    out_shape = [
        jax.ShapeDtypeStruct((s, LANES), f32),        # dw_in compact
        jax.ShapeDtypeStruct((1, LANES), f32),        # db_in
        jax.ShapeDtypeStruct((ns, s, LANES), f32),    # dw_h compact
        jax.ShapeDtypeStruct((ns, LANES), f32),       # db_h
        jax.ShapeDtypeStruct((s, LANES), f32),        # dw_out compact
        jax.ShapeDtypeStruct((1, LANES), f32),        # db_out
        jax.ShapeDtypeStruct((1, LANES), f32),        # loss stats
        jax.ShapeDtypeStruct((n_stack + 1, state_rows, LANES), f32),  # states
    ]
    out_specs = [
        full(s, LANES), full(1, LANES), full(ns, s, LANES),
        full(ns, LANES), full(s, LANES), full(1, LANES), full(1, LANES),
        pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),
    ]

    outs = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            row_spec,                        # x
            full(*wshape),                   # w_in
            full(1, LANES),                  # b_in
            full(ns, *wshape),               # w_h
            full(ns, LANES),                 # b_h
            full(*wshape),                   # w_out
            full(max(spec.d_in, 1), LANES),  # t_rows
            full(1, LANES),                  # b_out
            row_spec,                        # obs
            row_spec,                        # msk
            pl.BlockSpec(memory_space=pltpu.SMEM),  # scalars
        ],
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.VMEM((RING_SLOTS, state_rows, LANES), f32),
            pltpu.SemaphoreType.DMA((RING_SLOTS,)),
            pltpu.SemaphoreType.DMA((RING_SLOTS,)),
        ],
        interpret=interpret,
    )(
        x_packed,
        packed["w_in"], packed["b_in"],
        packed["w_h"] if n_stack else jnp.zeros((1,) + wshape, dtype),
        packed["b_h"] if n_stack else jnp.zeros((1, LANES), f32),
        packed["w_out"],
        packed["t_rows"],
        packed["b_out"],
        obs_packed,
        msk_packed,
        scal,
    )
    dw_in_c, db_in, dw_h_c, db_h, dw_out_c, db_out, stats = outs[:7]

    def bias_fold(row, width_):
        blocks = row[: g * s].reshape(g, s)[:, :width_]
        return jnp.sum(blocks, axis=0)

    if n_stack:
        b_hidden = jnp.sum(
            db_h[:n_stack, : g * s].reshape(n_stack, g, s)[:, :, :w], axis=1
        )
        w_hidden = dw_h_c[:n_stack, :w, :w]
    else:
        b_hidden = jnp.zeros_like(params["b_hidden"])
        w_hidden = jnp.zeros_like(params["w_hidden"])

    grads = {
        "w_in": dw_in_c[: spec.d_in, :w],
        "b_in": bias_fold(db_in[0], w),
        "w_hidden": w_hidden,
        "b_hidden": b_hidden,
        "w_out": dw_out_c[:w, : spec.d_out],
        "b_out": bias_fold(db_out[0], spec.d_out),
    }
    return stats[0], grads
