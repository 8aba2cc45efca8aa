"""Differentiable fused MLP+tangents: custom-VJP Pallas kernels for training.

``ops.kernels`` fuses the forward pass + coordinate tangents for residual
*evaluation*. This module makes that computation **trainable**: a custom-VJP
wrapper whose backward pass is itself a fused Pallas kernel, so the whole
PINN training step (loss -> parameter gradients through the K-tangent
derivative stack of a 100-layer chain) runs at MXU speed with O(1) HBM
activation traffic.

Backward-pass design:

* **Aligned lane packing.** Points are packed at stride ``S = ceil(max(width,
  d_in, d_out)/8)*8`` lanes (e.g. 24 for width 20 -> G = 5 points/row).
  8-aligned block offsets let the kernel extract block-diagonal weight
  gradients with cheap row slices + lane rolls.
* **Two state-residency strategies** (``impl=``, per-precision tuned
  default):

  - ``'rebuild'`` — segmented recomputation: nothing is saved from the
    forward pass except the inputs. The backward kernel replays the chain,
    checkpointing the packed state every ``CKPT_EVERY`` layers into VMEM,
    then walks segments in reverse, rebuilding per-layer states into a small
    segment buffer — live memory is O(L/K + K) tiles instead of O(L), zero
    HBM activation traffic.
  - ``'stream'`` — HBM state streaming: the replay phase streams EVERY layer
    state to an HBM buffer through a small VMEM ring with async DMA; the
    reverse walk streams them back with a prefetch ring. No per-segment
    rebuild (3·L+4 dots/tile instead of 4·L+4) and O(ring) VMEM, at the cost
    of 2×L state tiles of HBM traffic. Wins for the expensive-dot tiers
    (f32/f32x3) where recompute dots dominate DMA; loses for bf16.
* **In-kernel gradient compaction.** The per-layer packed weight gradient is
  a (128, 128) matmul result whose G diagonal SxS blocks all correspond to
  the *same* unpacked weight; the kernel folds them immediately
  (``sum_g roll(rows_g, -g*S)``) into an (L, S, 128) accumulator that stays
  VMEM-resident across the sequential grid — ~1.2 MB instead of 6.3 MB.
* Gradient accumulators use constant-index output blocks: grid programs on
  TPU run sequentially, so each tile adds its contribution in place.

Backward math per hidden layer (state carries the activation ``a`` and the
pre-scaling tangent streams ``u^k``; ``t^k = u^k * D`` with ``D = act'``):

    D_bar   = sum_k t_bar^k * u^k
    u_bar^k = t_bar^k * D
    z_bar   = (a_bar + D_bar * d(D)/d(z)/...) -- for tanh: (a_bar - 2 a D_bar) * D
    W_bar  += S_{l-1}^T @ [z_bar; u_bar^1; ...]   (one stacked matmul)
    S_bar_{l-1} = [z_bar; u_bar^*] @ W_l^T        (one stacked matmul)

The input layer additionally backpropagates the tangent *seeds* (rows of the
packed ``w_in``): their cotangent is a column-sum scattered into coordinate
rows of the compact ``w_in`` gradient.

Precision tiers mirror ``ops.kernels``: ``'f32'`` (HIGHEST, six-pass),
``'f32x3'`` (split-f32 — packed weights pre-split into bf16 hi/lo pairs,
runtime operands split on the VPU, every contraction = 3 single-pass bf16
matmuls with f32 accumulation; gradients track ``jax.grad`` to ~5e-6 rel),
and ``'bf16'`` (single-pass throughput tier).

Restrictions (asserted): >= 1 hidden layer, no dropout, coordinate-basis
tangents in input order (all the physics bridge ever uses), and the VJP w.r.t.
``coords`` is **not computed** (returned as zeros) — training losses never
differentiate w.r.t. the data.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from pinn_depthestimation_tpu.models.mlp import MLPSpec
from pinn_depthestimation_tpu.ops.kernels import (
    _DOT_PRECISION,
    _split_f32,
    _split_passes,
    LANES,
    auto_rows_per_tile,
    packed_mlp_fwd_tangents,
)

BWD_ROWS = 256        # points-rows per tile (tuned: +10% over 128 on v5e)
CKPT_EVERY = 8        # checkpoint cadence (round-2 sweep: 54.2 ms vs 59.2 at
                      # 14, 100k pts x 101 layers; seg-unroll OOMs at 256 rows
                      # and wins nothing at 128 — kept off)
CKPT_EVERY_F32X3 = 12  # the 3-pass tier recomputes with cheap bf16 matmuls, so
                       # sparser checkpoints win: 43.3 ms vs 44.8 at ckpt=8
                       # (100k pts x 101 layers, rows=256; rows>=384 OOMs VMEM)
SEG_UNROLL_DEFAULT = False
# impl='auto' resolution per precision tier, from the flagship hardware A/B
# (.soak/bwd_stream_ab.py, v5e, 12,516 pts x 101 layers): stream/rebuild =
# 1.30x f32 (tm 640), 1.16x f32x3 (tm 512); bf16 0.90x (cheap single-pass
# recompute beats the f32-state DMA) so bf16 stays on rebuild.
BWD_IMPL_DEFAULT = {"f32": "stream", "f32x3": "stream", "bf16": "rebuild"}
STREAM_ROWS = {"f32": 640, "f32x3": 512, "bf16": 512}  # stream tile heights
RING_SLOTS = 4      # VMEM staging ring depth (prefetch distance RING_SLOTS - 1)


def aligned_stride(spec: MLPSpec) -> int:
    s = max(spec.width, spec.d_in, spec.d_out)
    return -(-s // 8) * 8


def packing_factor_aligned(spec: MLPSpec) -> int:
    g = LANES // aligned_stride(spec)
    if g < 1:
        raise ValueError(f"per-point stride {aligned_stride(spec)} exceeds {LANES} lanes")
    return g


def _embed(w: jnp.ndarray, s: int) -> jnp.ndarray:
    out = jnp.zeros((s, s), w.dtype)
    return out.at[: w.shape[0], : w.shape[1]].set(w)


def _block_diag_strided(w, g: int, s: int, dtype) -> jnp.ndarray:
    k = jnp.kron(jnp.eye(g, dtype=w.dtype), _embed(w, s))
    out = jnp.zeros((LANES, LANES), dtype)
    return out.at[: g * s, : g * s].set(k.astype(dtype))


def _tile_bias_strided(b, g: int, s: int) -> jnp.ndarray:
    pad = jnp.zeros((s,), jnp.float32).at[: b.shape[0]].set(b.astype(jnp.float32))
    out = jnp.zeros((LANES,), jnp.float32)
    return out.at[: g * s].set(jnp.tile(pad, g))


def pack_params_strided(params: dict, spec: MLPSpec, dtype=jnp.float32, passes: int = 1) -> dict:
    s = aligned_stride(spec)
    g = packing_factor_aligned(spec)
    if spec.n_hidden < 1:
        raise ValueError("fused VJP kernel needs at least one hidden layer")
    f32 = jnp.float32
    w_in = _block_diag_strided(params["w_in"], g, s, f32)
    b_in = _tile_bias_strided(params["b_in"], g, s)
    n_stack = params["w_hidden"].shape[0]
    if n_stack > 0:
        w_h = jax.vmap(lambda w: _block_diag_strided(w, g, s, f32))(params["w_hidden"])
        b_h = jax.vmap(lambda b: _tile_bias_strided(b, g, s))(params["b_hidden"])
    else:
        w_h = jnp.zeros((0, LANES, LANES), f32)
        b_h = jnp.zeros((0, LANES), f32)
    w_out = _block_diag_strided(params["w_out"], g, s, f32)
    b_out = _tile_bias_strided(params["b_out"], g, s)
    if passes == 2:
        w_in, w_h, w_out = _split_passes(w_in), _split_passes(w_h), _split_passes(w_out)
    elif dtype != f32:
        w_in, w_h, w_out = (a.astype(dtype) for a in (w_in, w_h, w_out))
    rows = jnp.arange(g) * s
    w_in_eff = w_in.astype(f32).sum(axis=0) if passes == 2 else w_in
    t_rows = jnp.stack(
        [jnp.sum(w_in_eff[rows + c].astype(f32), axis=0) for c in range(spec.d_in)]
    )
    return {
        "s": s, "g": g,
        "w_in": w_in, "b_in": b_in.reshape(1, LANES),
        "w_h": w_h, "b_h": b_h,
        "w_out": w_out, "b_out": b_out.reshape(1, LANES),
        "t_rows": t_rows,
    }


def pack_values_strided(values: jnp.ndarray, width: int, g: int, s: int, rows_multiple: int):
    """(N, width) -> (M, 128) rows holding G points at lane offsets g*s.
    Padding rows are ZERO (so padded points contribute nothing to gradient
    accumulators). Returns (packed, n)."""
    n = values.shape[0]
    pad = (-n) % (g * rows_multiple)
    if pad:
        values = jnp.concatenate(
            [values, jnp.zeros((pad,) + values.shape[1:], values.dtype)]
        )
    m = values.shape[0] // g
    grouped = values.reshape(m, g, width)
    lanes = jnp.zeros((m, g, s), values.dtype).at[:, :, :width].set(grouped)
    lanes = lanes.reshape(m, g * s)
    return jnp.pad(lanes, ((0, 0), (0, LANES - g * s))), n


def _compact(mat, g: int, s: int):
    """Fold the G diagonal SxS blocks of a (128,128) value into (S,128):
    block g's columns are rolled to lane 0 so all blocks overlap."""
    acc = mat[0:s, :]
    for gg in range(1, g):
        rows = mat[gg * s : (gg + 1) * s, :]
        acc = acc + pltpu.roll(rows, LANES - gg * s, 1)
    return acc


def _roll_sum(vec_2d, g: int, s: int):
    """sum_g roll(v, -g*s) for a (1,128) value (seed-row gradient folding)."""
    acc = vec_2d
    for gg in range(1, g):
        acc = acc + pltpu.roll(vec_2d, LANES - gg * s, 1)
    return acc


def _bwd_math(spec: MLPSpec, n_tangents: int, dot_precision, tm: int,
              three_pass: bool):
    """Shared math closures for the backward kernel bodies: activation
    family, precision-tiered contractions, and the stacked-state splitter.
    Returned as a dict so both kernel builders (segmented-rebuild and
    HBM-streaming) use identical arithmetic."""
    kt = n_tangents
    init_type = spec.init_type
    f32 = jnp.float32

    def act(z):
        return jnp.tanh(z) if init_type == "xavier" else jnp.where(z >= 0, z, 0.01 * z)

    def dact_from(a, z=None):
        if init_type == "xavier":
            return 1.0 - a * a
        return jnp.where(a >= 0, 1.0, 0.01)  # sign(a) == sign(z) for leaky relu

    def ddact_times(a, dbar):
        """cotangent into a from D_bar: d(D)/d(a) * D_bar."""
        if init_type == "xavier":
            return -2.0 * a * dbar
        return jnp.zeros_like(a)  # D piecewise-constant

    def _dot(a, b, dims):
        return jax.lax.dot_general(
            a, b, (dims, ((), ())),
            precision=dot_precision, preferred_element_type=f32,
        )

    if three_pass:
        # split-f32 tier: packed weights carry a leading bf16 hi/lo pass axis;
        # runtime operands (activations/cotangents) are split on the VPU.
        def mm(a, w):
            a_hi, a_lo = _split_f32(a)
            d = lambda x, wp: _dot(x, wp, ((1,), (0,)))  # noqa: E731
            return (d(a_lo, w[0]) + d(a_hi, w[1])) + d(a_hi, w[0])

        def mm_t(a, w):
            """a @ w^T via dot_general contracting on w's last dim."""
            a_hi, a_lo = _split_f32(a)
            d = lambda x, wp: _dot(x, wp, ((1,), (1,)))  # noqa: E731
            return (d(a_lo, w[0]) + d(a_hi, w[1])) + d(a_hi, w[0])

        def mm_tn(a, b):
            """a^T @ b: contract first dims. Both operands are runtime f32."""
            a_hi, a_lo = _split_f32(a)
            b_hi, b_lo = _split_f32(b)
            d = lambda x, y: _dot(x, y, ((0,), (0,)))  # noqa: E731
            return (d(a_lo, b_hi) + d(a_hi, b_lo)) + d(a_hi, b_hi)
    else:
        def mm(a, w):
            return _dot(a.astype(w.dtype), w, ((1,), (0,)))

        def mm_t(a, w):
            """a @ w^T via dot_general contracting on w's last dim."""
            return _dot(a.astype(w.dtype), w, ((1,), (1,)))

        def mm_tn(a, b):
            """a^T @ b: contract first dims."""
            return _dot(a.astype(b.dtype), b, ((0,), (0,)))

    def split(stacked):
        return stacked[:tm], [stacked[(1 + k) * tm : (2 + k) * tm] for k in range(kt)]

    return dict(act=act, dact_from=dact_from, ddact_times=ddact_times,
                mm=mm, mm_t=mm_t, mm_tn=mm_tn, split=split)


def _make_bwd_kernel(spec: MLPSpec, n_stack: int, n_tangents: int, g: int, s: int,
                     dot_precision, tm: int, ckpt_every: int, seg_unroll: bool,
                     three_pass: bool = False):
    """Build the backward kernel body (shapes static via closure).

    ``seg_unroll``: statically unroll the per-segment loops (<= ``ckpt_every``
    iterations) so layer indices are constants and Mosaic can schedule across
    layer boundaries. The long replay loop always stays rolled — fully
    unrolling it blew the 16 MB scoped-VMEM budget (measured 24.9 MB).
    """
    kt = n_tangents
    CKPT_EVERY = ckpt_every
    n_seg = -(-n_stack // CKPT_EVERY) if n_stack else 0
    unroll = seg_unroll
    math = _bwd_math(spec, n_tangents, dot_precision, tm, three_pass)
    act, dact_from, ddact_times = math["act"], math["dact_from"], math["ddact_times"]
    mm, mm_t, mm_tn, split = math["mm"], math["mm_t"], math["mm_tn"], math["split"]

    def kernel(
        x_ref, w_in_ref, b_in_ref, w_h_ref, b_h_ref, w_out_ref, t_rows_ref,
        ybar_ref, *rest,
    ):
        tbar_refs = rest[:kt]
        (dw_in_ref, db_in_ref, dw_h_ref, db_h_ref, dw_out_ref, db_out_ref) = rest[kt : kt + 6]
        ckpt_ref, seg_ref = rest[kt + 6 :]

        @pl.when(pl.program_id(0) == 0)
        def _zero():
            dw_in_ref[:] = jnp.zeros_like(dw_in_ref)
            db_in_ref[:] = jnp.zeros_like(db_in_ref)
            dw_h_ref[:] = jnp.zeros_like(dw_h_ref)
            db_h_ref[:] = jnp.zeros_like(db_h_ref)
            dw_out_ref[:] = jnp.zeros_like(dw_out_ref)
            db_out_ref[:] = jnp.zeros_like(db_out_ref)

        x = x_ref[:]

        # ---- state helpers: C = [a; u^1; ...; u^kt] stacked ((kt+1)*tm, 128)
        def layer_forward(c_state, j):
            """Advance state through hidden-stack layer j (0-based w_h index)."""
            a, us = split(c_state)
            d = dact_from(a)
            streams = jnp.concatenate([a] + [u * d for u in us], axis=0)
            zs = mm(streams, w_h_ref[j])
            z_a, z_us = split(zs)
            na = act(z_a + b_h_ref[pl.ds(j, 1), :])
            return jnp.concatenate([na] + z_us, axis=0)

        # ---- phase A: input layer + replay with checkpoints
        z0 = mm(x, w_in_ref[:]) + b_in_ref[:]
        a0 = act(z0)
        seeds = [
            jnp.broadcast_to(t_rows_ref[c : c + 1, :], (tm, LANES)) for c in range(kt)
        ]
        c_state = jnp.concatenate([a0] + seeds, axis=0)
        ckpt_ref[0] = c_state

        def replay(j, c_state):
            c_state = layer_forward(c_state, j)

            @pl.when((j + 1) % CKPT_EVERY == 0)
            def _store():
                ckpt_ref[(j + 1) // CKPT_EVERY] = c_state

            return c_state

        if n_stack > 0:
            c_state = jax.lax.fori_loop(0, n_stack, replay, c_state)

        # ---- output layer backward
        a_last, us_last = split(c_state)
        d_last = dact_from(a_last)
        s_last = jnp.concatenate([a_last] + [u * d_last for u in us_last], axis=0)
        ybar = ybar_ref[:]
        zbar_out = jnp.concatenate([ybar] + [r[:] for r in tbar_refs], axis=0)
        dw_out_ref[:] += _compact(mm_tn(s_last, zbar_out), g, s)
        db_out_ref[:] += jnp.sum(ybar, axis=0, keepdims=True)
        sbar = mm_t(zbar_out, w_out_ref[:])  # [a_bar; t_bar^k] for the last state

        # ---- hidden stack backward, segment by segment (python loop: static)
        def backward_through(c_prev, c_cur, sbar, j):
            """One hidden layer backward; returns (sbar_prev, dw_compact, db_row)."""
            a_cur, us_cur = split(c_cur)
            d_cur = dact_from(a_cur)
            abar, tbars = split(sbar)
            dbar = jnp.zeros_like(a_cur)
            for k in range(kt):
                dbar = dbar + tbars[k] * us_cur[k]
            ubars = [tbars[k] * d_cur for k in range(kt)]
            zbar = (abar + ddact_times(a_cur, dbar)) * d_cur

            a_prev, us_prev = split(c_prev)
            d_prev = dact_from(a_prev)
            s_prev = jnp.concatenate([a_prev] + [u * d_prev for u in us_prev], axis=0)
            zbar_stack = jnp.concatenate([zbar] + ubars, axis=0)
            dw = _compact(mm_tn(s_prev, zbar_stack), g, s)
            db = jnp.sum(zbar, axis=0, keepdims=True)
            sbar_prev = mm_t(zbar_stack, w_h_ref[j])
            return sbar_prev, dw, db

        for seg in range(n_seg - 1, -1, -1):
            j0 = seg * CKPT_EVERY
            seg_len = min(CKPT_EVERY, n_stack - j0)
            # rebuild the segment's states from the checkpoint
            seg_ref[0] = ckpt_ref[seg]

            if unroll:
                carry = seg_ref[0]
                for i in range(seg_len):
                    carry = layer_forward(carry, j0 + i)
                    seg_ref[i + 1] = carry
                # walk the segment in reverse (static indices throughout)
                for i in range(seg_len):
                    idx = seg_len - 1 - i
                    j = j0 + idx
                    sbar, dw, db = backward_through(
                        seg_ref[idx], seg_ref[idx + 1], sbar, j
                    )
                    dw_h_ref[j] += dw
                    db_h_ref[j : j + 1, :] += db
            else:
                def rebuild(i, carry):
                    carry = layer_forward(carry, j0 + i)
                    seg_ref[i + 1] = carry
                    return carry

                jax.lax.fori_loop(0, seg_len, rebuild, seg_ref[0])

                # walk the segment in reverse
                def seg_back(i, sbar):
                    idx = seg_len - 1 - i            # position within segment
                    j = j0 + idx                     # w_h layer index
                    sbar_prev, dw, db = backward_through(
                        seg_ref[idx], seg_ref[idx + 1], sbar, j
                    )
                    dw_h_ref[j] += dw
                    db_h_ref[pl.ds(j, 1), :] += db
                    return sbar_prev

                sbar = jax.lax.fori_loop(0, seg_len, seg_back, sbar)

        # ---- input layer backward
        c0 = ckpt_ref[0]
        a_0, us_0 = split(c0)
        d_0 = dact_from(a_0)
        abar0, tbars0 = split(sbar)
        dbar0 = jnp.zeros_like(a_0)
        for k in range(kt):
            dbar0 = dbar0 + tbars0[k] * us_0[k]
        zbar0 = (abar0 + ddact_times(a_0, dbar0)) * d_0
        dw_in = _compact(mm_tn(x, zbar0), g, s)
        # tangent seeds: u^k_0 = sum_g w_in[g*s + k]; cotangent is a column
        # sum folded over blocks, scattered into coordinate row k
        for k in range(kt):
            ubar0 = tbars0[k] * d_0
            v = jnp.sum(ubar0, axis=0, keepdims=True)       # (1, 128)
            folded = _roll_sum(v, g, s)
            row_ids = jax.lax.broadcasted_iota(jnp.int32, (s, LANES), 0)
            dw_in = dw_in + jnp.where(row_ids == k, folded, 0.0)
        dw_in_ref[:] += dw_in
        db_in_ref[:] += jnp.sum(zbar0, axis=0, keepdims=True)

    return kernel


def _make_bwd_kernel_stream(spec: MLPSpec, n_stack: int, n_tangents: int,
                            g: int, s: int, dot_precision, tm: int,
                            ring_slots: int, three_pass: bool = False,
                            train_epilogue: int = 0):
    """Backward kernel body, HBM-streaming variant.

    Instead of VMEM-resident checkpoints + per-segment recomputation, the
    replay phase streams EVERY layer state to an HBM buffer (``states_ref``,
    an output ref in ``MemorySpace.HBM`` — Mosaic rejects HBM *scratch*)
    through a small VMEM staging ring with async DMA; the backward walk then
    streams states back in reverse with a prefetch ring. This removes the
    per-segment rebuild entirely (dots/tile: 4·L+4 → 3·L+4) and shrinks the
    VMEM state footprint from O(L/K + K) tiles to O(ring) tiles, which is
    what lets ``rows_per_tile`` grow past the rebuild kernel's 256 — the
    binding constraint is MXU issue rate on the small-dot chain
    (ROOFLINE.md), so fewer/taller dots are the win.

    Hazard accounting: ring slot for state ``j`` is ``j % R`` with prefetch
    distance ``R - 1`` (the reverse-walk prefetch targets ``j - (R-1)``), so
    a DMA never lands in a slot loaded in the same iteration — the slot it
    reuses was consumed one full iteration earlier. The write phase waits on
    slot ``j % R``'s previous DMA before restoring into it.

    ``train_epilogue`` (= the number of fidelity outputs when nonzero, 0
    otherwise) turns the body into the ONE-KERNEL training step for the
    shared-points continuity losses: instead of taking output cotangents as
    inputs, the kernel finishes the forward (output-layer dot), computes the
    continuity residual + fidelity error + depth anchor IN the packed lane
    layout (same rolls as ``kernels.continuity_epilogue``), accumulates the
    loss sufficient statistics, derives the output cotangents from them, and
    proceeds with the standard backward. This deletes the separate forward
    kernel from the training step — the replay phase IS the forward.
    Contract: ``n_tangents == 2``, heads ``(U, V, h)`` at block columns
    (0, 1, 2), fidelity trues at columns [0, n_true). Inputs swap to
    ``b_out`` (1,128), ``obs`` rows (trues at cols [0,n_true), premasked
    anchor sel at col 2), ``msk`` rows (validity at cols 0..2), and an SMEM
    scalar vector ``[res_scale, anchor_scale, anchor_depth,
    fid_scale_0..]``; a (1,128) stats accumulator output is appended
    (lanes: 0=sum fc^2, 1=sum sel*(h-depth)^2, 2+j=sum fid err_j^2).
    """
    kt = n_tangents
    R = ring_slots
    n_states = n_stack + 1  # state 0 = after input layer; j+1 = after w_h[j]
    pdist = R - 1
    n_true = train_epilogue
    if train_epilogue:
        assert kt == 2 and spec.d_out >= 3 and 0 < n_true <= 3
    math = _bwd_math(spec, n_tangents, dot_precision, tm, three_pass)
    act, dact_from, ddact_times = math["act"], math["dact_from"], math["ddact_times"]
    mm, mm_t, mm_tn, split = math["mm"], math["mm_t"], math["mm_tn"], math["split"]

    def kernel(
        x_ref, w_in_ref, b_in_ref, w_h_ref, b_h_ref, w_out_ref, t_rows_ref,
        *rest,
    ):
        if train_epilogue:
            b_out_ref, obs_ref, msk_ref, scal_ref = rest[:4]
            (dw_in_ref, db_in_ref, dw_h_ref, db_h_ref, dw_out_ref, db_out_ref,
             stats_ref, states_ref) = rest[4:12]
            ring, sem_w, sem_r = rest[12:]
        else:
            ybar_ref = rest[0]
            tbar_refs = rest[1 : 1 + kt]
            (dw_in_ref, db_in_ref, dw_h_ref, db_h_ref, dw_out_ref, db_out_ref,
             states_ref) = rest[1 + kt : 8 + kt]
            ring, sem_w, sem_r = rest[8 + kt :]

        @pl.when(pl.program_id(0) == 0)
        def _zero():
            dw_in_ref[:] = jnp.zeros_like(dw_in_ref)
            db_in_ref[:] = jnp.zeros_like(db_in_ref)
            dw_h_ref[:] = jnp.zeros_like(dw_h_ref)
            db_h_ref[:] = jnp.zeros_like(db_h_ref)
            dw_out_ref[:] = jnp.zeros_like(dw_out_ref)
            db_out_ref[:] = jnp.zeros_like(db_out_ref)
            if train_epilogue:
                stats_ref[:] = jnp.zeros_like(stats_ref)

        x = x_ref[:]

        def layer_forward(c_state, j):
            a, us = split(c_state)
            d = dact_from(a)
            streams = jnp.concatenate([a] + [u * d for u in us], axis=0)
            zs = mm(streams, w_h_ref[j])
            z_a, z_us = split(zs)
            na = act(z_a + b_h_ref[pl.ds(j, 1), :])
            return jnp.concatenate([na] + z_us, axis=0)

        def put_state(j, st):
            """Stage state j and start its DMA to HBM; recycle slot j-R."""
            slot = jax.lax.rem(j, R)

            @pl.when(j >= R)
            def _():
                pltpu.make_async_copy(
                    ring.at[slot], states_ref.at[j - R], sem_w.at[slot]
                ).wait()

            ring[slot] = st
            pltpu.make_async_copy(
                ring.at[slot], states_ref.at[j], sem_w.at[slot]
            ).start()

        # ---- phase A: input layer + replay, streaming every state out
        z0 = mm(x, w_in_ref[:]) + b_in_ref[:]
        a0 = act(z0)
        seeds = [
            jnp.broadcast_to(t_rows_ref[c : c + 1, :], (tm, LANES)) for c in range(kt)
        ]
        c_state = jnp.concatenate([a0] + seeds, axis=0)
        put_state(0, c_state)

        def replay(j, st):
            st = layer_forward(st, j)
            put_state(j + 1, st)
            return st

        c_state = jax.lax.fori_loop(0, n_stack, replay, c_state)

        def drain(i, _):
            j = n_states - 1 - i
            slot = jax.lax.rem(j, R)
            pltpu.make_async_copy(
                ring.at[slot], states_ref.at[j], sem_w.at[slot]
            ).wait()
            return 0

        jax.lax.fori_loop(0, min(R, n_states), drain, 0)

        # ---- output layer: forward finish (train) or given cotangents
        a_last, us_last = split(c_state)
        d_last = dact_from(a_last)
        s_last = jnp.concatenate([a_last] + [u * d_last for u in us_last], axis=0)
        if train_epilogue:
            # finish the forward: y and the two coordinate-derivative streams
            out_f = mm(s_last, w_out_ref[:])
            y = out_f[:tm] + b_out_ref[:]
            dyx, dyy = out_f[tm : 2 * tm], out_f[2 * tm : 3 * tm]

            # lane-column indicators within the s-strided blocks
            lane = jax.lax.broadcasted_iota(jnp.int32, (tm, LANES), 1)
            col = jax.lax.rem(lane, s)
            inblk = lane < g * s
            def colf(c):
                return jnp.where((col == c) & inblk, 1.0, 0.0).astype(y.dtype)

            obs, msk = obs_ref[:], msk_ref[:]
            roll = lambda v, k: pltpu.roll(v, k, 1)          # noqa: E731
            rollm = lambda v, k: pltpu.roll(v, LANES - k, 1)  # noqa: E731

            # continuity residual on the h lanes (kernels.continuity_epilogue
            # rolls, valid in the aligned layout because in-block head
            # distances are identical): fc[ps+2] = h_x U + h U_x + h_y V + h V_y
            y2, y1 = roll(y, 2), roll(y, 1)
            dx2, dy1 = roll(dyx, 2), roll(dyy, 1)
            fch = (dyx * y2 + y * dx2 + dyy * y1 + y * dy1) * colf(2) * msk
            sel = obs * colf(2)                  # premasked anchor selector
            depth = scal_ref[2]
            anch = sel * (y - depth)             # zero off selected h lanes
            errs = [colf(j) * msk * (y - obs) for j in range(n_true)]

            # loss sufficient statistics -> lane-splayed accumulator row
            sidx = jax.lax.broadcasted_iota(jnp.int32, (1, LANES), 1)
            stats_row = jnp.where(sidx == 0, jnp.sum(fch * fch), 0.0)
            stats_row += jnp.where(sidx == 1, jnp.sum(anch * anch), 0.0)
            for j in range(n_true):
                stats_row += jnp.where(sidx == 2 + j, jnp.sum(errs[j] * errs[j]), 0.0)
            stats_ref[:] += stats_row

            # cotangents (the epilogue's exact VJP; fcbar is zero off the h
            # lanes so each rolled product lands on its head's column)
            fcbar = scal_ref[0] * fch
            ybar = scal_ref[1] * anch
            for j in range(n_true):
                ybar += scal_ref[3 + j] * errs[j]
            ybar += rollm(fcbar * dyx, 2) + rollm(fcbar * dyy, 1) \
                + fcbar * (dx2 + dy1)
            tbarx = fcbar * y2 + rollm(fcbar * y, 2)
            tbary = fcbar * y1 + rollm(fcbar * y, 1)
            zbar_out = jnp.concatenate([ybar, tbarx, tbary], axis=0)
        else:
            ybar = ybar_ref[:]
            zbar_out = jnp.concatenate([ybar] + [r[:] for r in tbar_refs], axis=0)
        dw_out_ref[:] += _compact(mm_tn(s_last, zbar_out), g, s)
        db_out_ref[:] += jnp.sum(ybar, axis=0, keepdims=True)
        sbar = mm_t(zbar_out, w_out_ref[:])

        # ---- hidden stack backward, streaming states in reverse
        def backward_through(c_prev, c_cur, sbar, j):
            a_cur, us_cur = split(c_cur)
            d_cur = dact_from(a_cur)
            abar, tbars = split(sbar)
            dbar = jnp.zeros_like(a_cur)
            for k in range(kt):
                dbar = dbar + tbars[k] * us_cur[k]
            ubars = [tbars[k] * d_cur for k in range(kt)]
            zbar = (abar + ddact_times(a_cur, dbar)) * d_cur

            a_prev, us_prev = split(c_prev)
            d_prev = dact_from(a_prev)
            s_prev = jnp.concatenate([a_prev] + [u * d_prev for u in us_prev], axis=0)
            zbar_stack = jnp.concatenate([zbar] + ubars, axis=0)
            dw = _compact(mm_tn(s_prev, zbar_stack), g, s)
            db = jnp.sum(zbar, axis=0, keepdims=True)
            sbar_prev = mm_t(zbar_stack, w_h_ref[j])
            return sbar_prev, dw, db

        def get_start(j):
            slot = jax.lax.rem(j, R)
            pltpu.make_async_copy(
                states_ref.at[j], ring.at[slot], sem_r.at[slot]
            ).start()

        def prefetch(i, _):
            get_start(n_stack - 1 - i)
            return 0

        jax.lax.fori_loop(0, min(pdist, n_stack), prefetch, 0)

        def bwd_step(i, carry):
            sbar, c_cur = carry
            j = n_stack - 1 - i
            slot = jax.lax.rem(j, R)
            pltpu.make_async_copy(
                states_ref.at[j], ring.at[slot], sem_r.at[slot]
            ).wait()
            c_prev = ring[slot]

            @pl.when(j >= pdist)
            def _():
                get_start(j - pdist)

            sbar_prev, dw, db = backward_through(c_prev, c_cur, sbar, j)
            dw_h_ref[j] += dw
            db_h_ref[pl.ds(j, 1), :] += db
            return sbar_prev, c_prev

        sbar, c0 = jax.lax.fori_loop(0, n_stack, bwd_step, (sbar, c_state))

        # ---- input layer backward (c0 == state 0)
        a_0, us_0 = split(c0)
        d_0 = dact_from(a_0)
        abar0, tbars0 = split(sbar)
        dbar0 = jnp.zeros_like(a_0)
        for k in range(kt):
            dbar0 = dbar0 + tbars0[k] * us_0[k]
        zbar0 = (abar0 + ddact_times(a_0, dbar0)) * d_0
        dw_in = _compact(mm_tn(x, zbar0), g, s)
        for k in range(kt):
            ubar0 = tbars0[k] * d_0
            v = jnp.sum(ubar0, axis=0, keepdims=True)       # (1, 128)
            folded = _roll_sum(v, g, s)
            row_ids = jax.lax.broadcasted_iota(jnp.int32, (s, LANES), 0)
            dw_in = dw_in + jnp.where(row_ids == k, folded, 0.0)
        dw_in_ref[:] += dw_in
        db_in_ref[:] += jnp.sum(zbar0, axis=0, keepdims=True)

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=(
        "spec", "n_tangents", "precision", "interpret",
        "rows_per_tile", "ckpt_every", "seg_unroll", "impl",
    ),
)
def packed_mlp_bwd(
    params: dict,
    coords: jax.Array,
    ybar: jax.Array,
    dybar: jax.Array,
    spec: MLPSpec,
    n_tangents: int,
    precision: str = "f32",
    interpret: bool = False,
    rows_per_tile: int = 0,
    ckpt_every: int = 0,
    seg_unroll: int = -1,
    impl: str = "auto",
) -> dict:
    """Parameter gradients of ``(y, dy) = mlp_apply_with_tangents(...)`` given
    output cotangents ``ybar (N, d_out)`` and ``dybar (K, N, d_out)``.

    ``impl`` selects the kernel body: ``'stream'`` (HBM-streamed states, no
    segment rebuild — see ``_make_bwd_kernel_stream``), ``'rebuild'`` (VMEM
    checkpoints + segmented recompute), or ``'auto'`` (the tuned default).
    ``rows_per_tile``/``ckpt_every`` default (0) to the per-impl tuned rows
    (STREAM_ROWS / BWD_ROWS) and the per-precision CKPT_EVERY[_F32X3];
    ``seg_unroll`` -1 resolves to the tuned default, 0/1 force the
    rebuild impl's per-segment loops rolled/unrolled."""
    if spec.dropout_rate:
        raise ValueError("fused VJP kernel does not support dropout")
    if impl == "auto":
        impl = BWD_IMPL_DEFAULT[precision]
    if impl not in ("stream", "rebuild"):
        raise ValueError(f"unknown bwd impl {impl!r}")
    three_pass = precision == "f32x3"
    dtype = jnp.bfloat16 if precision != "f32" else jnp.float32
    passes = 2 if three_pass else 1
    packed = pack_params_strided(params, spec, dtype=dtype, passes=passes)
    s, g = packed["s"], packed["g"]
    # even tiles minimize last-tile padding (see kernels.auto_rows_per_tile);
    # at BWD_ROWS=256 / G=5 the flagship pad was only 2.2%, but small batches
    # (a few hundred CMB gauge points) padded up to 1280 points
    tm = rows_per_tile or auto_rows_per_tile(
        -(-coords.shape[0] // g),
        STREAM_ROWS[precision] if impl == "stream" else BWD_ROWS,
    )
    ckpt = ckpt_every or (CKPT_EVERY_F32X3 if three_pass else CKPT_EVERY)
    unroll = SEG_UNROLL_DEFAULT if seg_unroll < 0 else bool(seg_unroll)
    w = spec.width

    x_packed, _ = pack_values_strided(coords.astype(jnp.float32), spec.d_in, g, s, tm)
    ybar_packed, _ = pack_values_strided(ybar.astype(jnp.float32), spec.d_out, g, s, tm)
    tbar_packed = [
        pack_values_strided(dybar[k].astype(jnp.float32), spec.d_out, g, s, tm)[0]
        for k in range(n_tangents)
    ]
    m = x_packed.shape[0]
    n_stack = int(packed["w_h"].shape[0])
    ns = max(n_stack, 1)
    n_ckpt = (-(-n_stack // ckpt) if n_stack else 0) + 1
    state_rows = (1 + n_tangents) * tm

    grid = (m // tm,)
    row_spec = pl.BlockSpec((tm, LANES), lambda i: (i, 0), memory_space=pltpu.VMEM)
    full = lambda *shape: pl.BlockSpec(  # noqa: E731
        shape, lambda i: (0,) * len(shape), memory_space=pltpu.VMEM
    )
    wshape = (2, LANES, LANES) if three_pass else (LANES, LANES)

    out_shape = [
        jax.ShapeDtypeStruct((s, LANES), jnp.float32),        # dw_in compact
        jax.ShapeDtypeStruct((1, LANES), jnp.float32),        # db_in
        jax.ShapeDtypeStruct((ns, s, LANES), jnp.float32),    # dw_h compact
        jax.ShapeDtypeStruct((ns, LANES), jnp.float32),       # db_h
        jax.ShapeDtypeStruct((s, LANES), jnp.float32),        # dw_out compact
        jax.ShapeDtypeStruct((1, LANES), jnp.float32),        # db_out
    ]
    out_specs = [
        full(s, LANES), full(1, LANES), full(ns, s, LANES),
        full(ns, LANES), full(s, LANES), full(1, LANES),
    ]

    if impl == "stream":
        kernel = _make_bwd_kernel_stream(
            spec, n_stack, n_tangents, g, s, _DOT_PRECISION[precision], tm,
            RING_SLOTS, three_pass,
        )
        # per-tile state stream; lives in HBM (Mosaic forbids HBM scratch, so
        # it is an output ref we drop), rewritten by every grid step
        out_shape = out_shape + [
            jax.ShapeDtypeStruct((n_stack + 1, state_rows, LANES), jnp.float32)
        ]
        out_specs = out_specs + [pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM)]
        scratch_shapes = [
            pltpu.VMEM((RING_SLOTS, state_rows, LANES), jnp.float32),  # ring
            pltpu.SemaphoreType.DMA((RING_SLOTS,)),                    # writes
            pltpu.SemaphoreType.DMA((RING_SLOTS,)),                    # reads
        ]
    else:
        kernel = _make_bwd_kernel(
            spec, n_stack, n_tangents, g, s, _DOT_PRECISION[precision], tm,
            ckpt, unroll, three_pass,
        )
        scratch_shapes = [
            pltpu.VMEM((n_ckpt, state_rows, LANES), jnp.float32),               # ckpt
            pltpu.VMEM((min(ckpt, ns) + 1, state_rows, LANES), jnp.float32),  # seg
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
            row_spec,                        # ybar
            *([row_spec] * n_tangents),      # tangent cotangents
        ],
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=scratch_shapes,
        interpret=interpret,
    )(
        x_packed,
        packed["w_in"], packed["b_in"],
        packed["w_h"] if n_stack else jnp.zeros((1,) + wshape, dtype),
        packed["b_h"] if n_stack else jnp.zeros((1, LANES), jnp.float32),
        packed["w_out"],
        packed["t_rows"],
        ybar_packed,
        *tbar_packed,
    )
    dw_in_c, db_in, dw_h_c, db_h, dw_out_c, db_out = outs[:6]

    def bias_fold(row, width_):
        blocks = row[: g * s].reshape(g, s)[:, :width_]
        return jnp.sum(blocks, axis=0)

    if n_stack:
        b_hidden = jnp.sum(  # fold the G lane blocks per layer
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
    return jax.tree.map(lambda a, p: a.astype(p.dtype), grads, params)


# ---------------------------------------------------------------------------
# custom_vjp wrapper
# ---------------------------------------------------------------------------

@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5, 6))
def _fused_apply_core(
    params: dict,
    coords: jax.Array,
    spec: MLPSpec,
    n_tangents: int,
    precision: str = "f32",
    interpret: bool = False,
    bwd_impl: str = "auto",
):
    return packed_mlp_fwd_tangents(
        params, coords, spec, n_tangents, precision=precision, interpret=interpret
    )


def fused_apply_with_tangents(
    params: dict,
    coords: jax.Array,
    spec: MLPSpec,
    n_tangents: int,
    precision: str = "f32",
    interpret: bool = False,
    bwd_impl: str = "auto",
):
    """Differentiable fused forward+tangents.

    Forward == ``kernels.packed_mlp_fwd_tangents``; backward is the fused
    Pallas VJP kernel (``bwd_impl`` selects its body — see
    ``packed_mlp_bwd``).

    .. warning:: **coords is NOT differentiable through this function.**
       The VJP w.r.t. ``coords`` is not implemented; ``coords`` passes
       through ``lax.stop_gradient`` here, so any gradient w.r.t. the
       coordinates (e.g. a fused Sobolev-style loss or coordinate-space
       test-time adaptation) is identically zero by AD semantics — do not
       build such losses on this path; use the XLA
       ``mlp_apply_with_tangents`` instead, which differentiates fully.
    """
    return _fused_apply_core(
        params, jax.lax.stop_gradient(coords), spec, n_tangents,
        precision, interpret, bwd_impl,
    )


def _fused_fwd(params, coords, spec, n_tangents, precision, interpret, bwd_impl):
    out = packed_mlp_fwd_tangents(
        params, coords, spec, n_tangents, precision=precision, interpret=interpret
    )
    return out, (params, coords)


def _fused_bwd(spec, n_tangents, precision, interpret, bwd_impl, residuals, cotangents):
    params, coords = residuals
    ybar, dybar = cotangents
    grads = packed_mlp_bwd(
        params, coords, ybar, dybar, spec, n_tangents,
        precision=precision, interpret=interpret, impl=bwd_impl,
    )
    return grads, jnp.zeros_like(coords)


_fused_apply_core.defvjp(_fused_fwd, _fused_bwd)
