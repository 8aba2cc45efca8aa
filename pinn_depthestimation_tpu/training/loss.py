"""Loss assembly: weighted fidelity MSE + physics residual, one jitted fn.

Reproduces the reference composition (reference ``train.py:128-157``,
``train_newmethod.py:120-159``):

* fidelity: per-output weighted MSE between predictions on the observation
  points and the stored truths. The CMB pipeline weights each output by
  ``loss.weight_<key>_loss`` (reference ``train.py:140-141``); the newmethod
  pipeline sums unweighted per-output ``mse_loss`` (reference
  ``train_newmethod.py:129-133``) — identical formula with unit weights.
* residual: the configured physics equation evaluated on the collocation
  batch, with derivatives from one fused forward-with-tangents pass.
* total = ``weight_fid_loss * fidelity + weight_res_loss * residual``
  (reference ``train.py:157``).

The returned ``loss_fn(params, batch)`` is pure and jit/grad/vmap-safe; the
batch dict may carry ``fidelity_mask``/``residual_mask`` for padded sharded
batches (means renormalize).
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp

from pinn_depthestimation_tpu import physics
from pinn_depthestimation_tpu.config import Config
from pinn_depthestimation_tpu.models import MLPSpec, mlp_apply, mlp_apply_with_tangents

# Separate-fidelity forwards below this many points stay on XLA even with
# the fused kernels on. Hardware A/B (v5e, .soak/fused_fidelity_ab.py): the
# zero-tangent fused pass is 0.83-0.93x XLA at EVERY size swept (512-65,536
# observations, both the flagship 101-layer and the reference CMB 11-layer
# shapes) — a single-stream forward has no tangent streams to fuse, so XLA's
# own fusion already wins on speed. The fused path is kept as the
# O(1)-activation-memory escape hatch: above ~1M observation points the XLA
# forward+backward's saved activations (n*width*layers*4B ~ 8 GB at 1M for
# the flagship depth) start to crowd HBM. See build_loss_fn.fidelity_forward.
FUSED_FIDELITY_MIN_POINTS = 1 << 20


def resolve_names(config: Config) -> dict:
    """Input/output name lists per pipeline kind."""
    if config.kind == "newmethod":
        d = config.data
        return {
            "fidelity_inputs": list(d.inputs),
            "fidelity_outputs": list(d.trues),
            "residual_inputs": list(d.inputs),
            "residual_grad_inputs": [n for n, g in zip(d.inputs, d.requires_grad) if g],
            "network_outputs": list(d.outputs),  # true heads then unknown heads
        }
    fd, rd = config.data_fidelity, config.data_residual
    return {
        "fidelity_inputs": list(fd.inputs),
        "fidelity_outputs": list(fd.outputs),
        "residual_inputs": list(rd.inputs),
        "residual_grad_inputs": [n for n, g in zip(rd.inputs, rd.requires_grad) if g],
        "network_outputs": list(rd.outputs),
    }


def _anchor_kwargs(config: Config, input_min_max: dict | None) -> dict:
    """Quirk-2 toggle (SURVEY.md §5): the reference compares its depth-anchor
    threshold (physical 25.5 m) against NORMALIZED x, selecting every point.
    parity=True reproduces that; parity=False interprets the threshold in
    physical coordinates by mapping it into normalized space (equivalent to
    comparing against denormalized x, with no extra data plumbing)."""
    equation_kwargs: dict = {}
    if not config.parity and config.physics == "continuity_only":
        if (
            not input_min_max
            or "x" not in input_min_max
            or input_min_max["x"][0] == input_min_max["x"][1]
        ):
            # failing loudly, not falling back: without the x bounds the
            # threshold would be compared raw (25.5) against normalized x in
            # [-1, 1] — every point anchor-selected, which is exactly the
            # quirk-2 behavior the caller opted OUT of with parity=false
            raise ValueError(
                "parity=false with continuity_only physics needs "
                "input_min_max with non-degenerate 'x' bounds to place the "
                "anchor threshold in normalized coordinates (pass the "
                "loader's input_min_max to build_loss_fn/"
                "build_value_and_grad_fn)"
            )
        lo, hi = input_min_max["x"]
        anchor_raw = config.raw.get("anchor", {})
        threshold = float(anchor_raw.get("threshold", 25.5))
        equation_kwargs["anchor_threshold"] = 2 * (threshold - lo) / (hi - lo) - 1
        if "depth" in anchor_raw:
            equation_kwargs["anchor_depth"] = float(anchor_raw["depth"])
    return equation_kwargs


def build_loss_fn(
    config: Config,
    spec: MLPSpec,
    *,
    residual_chunk_size: int | None = None,
    input_min_max: dict | None = None,
    fused_kernel: bool = False,
    fused_interpret: bool = False,
    fused_precision: str = "f32",
    mesh=None,
    fidelity_is_residual: bool = False,
) -> Callable:
    """Returns ``loss_fn(params, batch, dropout_rng=None) -> (total, (fid, res))``.

    ``residual_chunk_size``: evaluate the residual term in fixed-size point
    chunks under ``jax.checkpoint`` (gradient accumulation over sufficient
    statistics — numerically the exact full-batch loss). Required for very
    large collocation sets (10M+ points): the unchunked reverse pass would
    store every layer's activations for the whole batch (~19 GB/Mpoint for
    the flagship net), while chunking bounds the live activation memory to
    one chunk. Defaults to unchunked.

    ``fused_kernel``: route the residual forward+tangent stack through the
    Pallas custom-VJP kernels (``ops.kernels_vjp``) — O(1) activation memory
    (no chunking needed) and MXU-speed forward AND backward. Requires
    dropout = 0. With ``mesh``, the kernel runs per-shard under ``shard_map``
    and the residual is assembled from psum'd sufficient statistics (exact
    full-batch numerics); without a mesh a plain ``pallas_call`` is used.
    """
    if fused_kernel:
        residual_chunk_size = None  # the fused backward is O(1) in activations
    names = resolve_names(config)
    fid_outputs = names["fidelity_outputs"]
    net_outputs = names["network_outputs"]
    residual_inputs = names["residual_inputs"]

    equation = physics.residual_loss(config.physics)
    needed = physics.required_grad_coords(config.physics)
    missing = [c for c in needed if c not in residual_inputs]
    if missing:
        raise ValueError(
            f"physics equation {config.physics!r} needs input coordinates {needed}, "
            f"but residual inputs are {residual_inputs} (missing {missing})"
        )
    no_grad = [c for c in needed if c not in names["residual_grad_inputs"]]
    if no_grad:
        raise ValueError(
            f"physics equation {config.physics!r} differentiates w.r.t. {needed}, "
            f"but the config marks {no_grad} as requires_grad=false"
        )
    grad_coords = list(needed)
    if fused_kernel:
        # the fused kernel produces tangents for the FIRST k input columns in
        # order; anything else must fall back to the XLA path
        cols = [residual_inputs.index(c) for c in grad_coords]
        if cols != list(range(len(cols))):
            raise ValueError(
                "fused_kernel requires the differentiated coordinates to be "
                f"the leading residual inputs in order; got {grad_coords} "
                f"within {residual_inputs}"
            )
        if spec.dropout_rate:
            raise ValueError("fused_kernel does not support dropout")

    # Fidelity predictions reuse the head order of the *fidelity* outputs:
    # in both pipelines output column i corresponds to fidelity output i
    # (reference train.py:137-138, train_newmethod.py:130-131).
    fid_weights = jnp.asarray([config.output_weight(k) for k in fid_outputs], jnp.float32)
    parity = config.parity

    equation_kwargs = _anchor_kwargs(config, input_min_max)

    # The newmethod pipeline evaluates fidelity and residual on the SAME
    # point set (reference train_newmethod.py:126-156 does one forward and
    # slices it). When the loader certifies that contract
    # (``fidelity_is_residual``, set by load_newmethod_training_data — never
    # inferred from shapes), reuse the residual forward's primal output for
    # the fidelity term instead of a second full forward. Requires a
    # deterministic forward (dropout off).
    share_forward = fidelity_is_residual and spec.dropout_rate == 0.0

    def make_awt(p):
        """Per-params apply-with-tangents, fused or XLA."""
        if fused_kernel:
            from pinn_depthestimation_tpu.ops import kernels_vjp

            return lambda x, t: kernels_vjp.fused_apply_with_tangents(
                p, x, spec, t.shape[0], fused_precision, fused_interpret
            )
        return lambda x, t: mlp_apply_with_tangents(p, x, t, spec)

    def fidelity_forward(p, x, dropout_rng=None):
        """The separate fidelity-only forward, used when the observation
        points genuinely differ from the collocation points — the CMB
        pipeline (fidelity CSV vs residual .mat grid, reference
        train.py:131-141) and the legacy numerical_model pipeline. (The
        newmethod flagship never reaches this: its loader certifies
        fidelity==residual and the residual forward is shared.) Stays on
        XLA up to FUSED_FIDELITY_MIN_POINTS: the hardware A/B showed the
        zero-tangent fused pass loses to XLA at every size up to 65,536
        observations (no tangent streams to fuse — see the constant's
        comment), so the fused form is only the O(1)-activation-memory
        path for observation sets large enough that XLA's saved
        activations would crowd HBM (fused_kernel already guarantees
        dropout=0)."""
        if fused_kernel and x.shape[0] >= FUSED_FIDELITY_MIN_POINTS:
            from pinn_depthestimation_tpu.ops import kernels_vjp

            y, _ = kernels_vjp.fused_apply_with_tangents(
                p, x, spec, 0, fused_precision, fused_interpret
            )
            return y
        return mlp_apply(p, x, spec, dropout_rng=dropout_rng)

    def loss_fn(params, batch, dropout_rng=None):
        apply_with_tangents = make_awt(params)

        def bundle(points):
            return physics.model_fields_and_grads(
                apply_with_tangents, points, residual_inputs, grad_coords, net_outputs
            )

        def fidelity_from(pred):
            err2 = (batch["fidelity_true"] - pred[..., : len(fid_outputs)]) ** 2
            fid_mask = batch.get("fidelity_mask")
            per_output = (
                jnp.mean(err2, axis=0)
                if fid_mask is None
                else jnp.sum(err2 * fid_mask[:, None], axis=0) / jnp.sum(fid_mask)
            )
            return jnp.sum(fid_weights * per_output)

        res_input = batch["residual_input"]
        res_mask = batch.get("residual_mask")

        fidelity = None
        plain_path = (
            not (fused_kernel and mesh is not None)
            and (
                residual_chunk_size is None
                or res_input.shape[0] <= residual_chunk_size
            )
        )

        if fused_kernel and mesh is not None:
            # ONE shard_map per loss evaluation: per-shard fused kernel +
            # psum'd sufficient statistics for the residual AND the fidelity
            # term — exact full-batch numerics, data-parallel over ICI.
            # (Round 1 ran a second, unfused XLA forward for fidelity outside
            # the shard_map; folding it in shares the fused forward when the
            # loader certifies fidelity==residual points, and removes a
            # dispatch + a GSPMD-sharded 101-layer forward otherwise.)
            from jax.sharding import PartitionSpec as P

            stats_fn = physics.residual_stats(config.physics)
            combine_fn = physics.residual_from_stats(config.physics)
            mask_in = (
                res_mask
                if res_mask is not None
                else jnp.ones((res_input.shape[0],), res_input.dtype)
            )
            fid_in = batch["fidelity_input"]
            fid_true = batch["fidelity_true"]
            fid_mask = batch.get("fidelity_mask")
            fmask_in = (
                fid_mask
                if fid_mask is not None
                else jnp.ones((fid_in.shape[0],), fid_in.dtype)
            )

            def shard_fn(p, pts, m, f_in, f_true, f_m):
                coords, fields, grads = physics.model_fields_and_grads(
                    make_awt(p), pts, residual_inputs, grad_coords, net_outputs
                )
                stats = dict(
                    stats_fn(
                        coords, fields, grads, mask=m, parity=parity,
                        **equation_kwargs,
                    )
                )
                if share_forward:
                    # loader contract: per-shard fidelity rows == residual
                    # rows (same array, same sharding/padding)
                    pred = jnp.stack(
                        [fields[name] for name in net_outputs], axis=-1
                    )[..., : len(fid_outputs)]
                else:
                    pred = fidelity_forward(p, f_in)[..., : len(fid_outputs)]
                err2 = (f_true - pred) ** 2
                stats["_fid_sum_err2"] = jnp.sum(err2 * f_m[:, None], axis=0)
                stats["_fid_n"] = jnp.sum(f_m)
                return jax.tree.map(lambda s: jax.lax.psum(s, "data"), stats)

            stats = jax.shard_map(
                shard_fn,
                mesh=mesh,
                in_specs=(P(), P("data"), P("data"), P("data"), P("data"), P("data")),
                out_specs=P(),
                check_vma=False,  # pallas_call carries no vma annotations
            )(params, res_input, mask_in, fid_in, fid_true, fmask_in)
            per_output = stats.pop("_fid_sum_err2") / stats.pop("_fid_n")
            fidelity = jnp.sum(fid_weights * per_output)
            residual = combine_fn(stats)
        elif plain_path:
            coords, fields, grads = bundle(res_input)
            residual = equation(
                coords, fields, grads, mask=res_mask, parity=parity, **equation_kwargs
            )
            if share_forward:
                # fidelity output i == network output i for the true heads
                # (loader contract: newmethod fidelity/residual points are the
                # same array, data.py::load_newmethod_training_data)
                pred_shared = jnp.stack(
                    [fields[name] for name in net_outputs], axis=-1
                )
                fidelity = fidelity_from(pred_shared)
        else:
            stats_fn = physics.residual_stats(config.physics)
            combine_fn = physics.residual_from_stats(config.physics)
            n = res_input.shape[0]
            chunk = residual_chunk_size
            pad = (-n) % chunk
            mask_full = (
                jnp.ones((n,), res_input.dtype) if res_mask is None else res_mask
            )
            if pad:
                res_input = jnp.concatenate(
                    [res_input, jnp.broadcast_to(res_input[:1], (pad,) + res_input.shape[1:])]
                )
                mask_full = jnp.concatenate([mask_full, jnp.zeros((pad,), mask_full.dtype)])
            k = res_input.shape[0] // chunk
            chunks = res_input.reshape(k, chunk, -1)
            masks = mask_full.reshape(k, chunk)

            # shared-points contract: fold the fidelity term into the same
            # chunked sufficient-statistics sweep. The whole point of
            # chunking is bounding reverse-pass activation memory to one
            # chunk — a separate full-batch differentiated fidelity forward
            # over the SAME rows would store every layer's activations for
            # the entire set again (the memory the chunking just saved).
            if share_forward:
                fid_true_full = batch["fidelity_true"]
                fmask_full = batch.get("fidelity_mask")
                if fmask_full is None:
                    fmask_full = jnp.ones((n,), res_input.dtype)
                if pad:
                    fid_true_full = jnp.concatenate(
                        [fid_true_full,
                         jnp.broadcast_to(
                             fid_true_full[:1], (pad,) + fid_true_full.shape[1:]
                         )]
                    )
                    fmask_full = jnp.concatenate(
                        [fmask_full, jnp.zeros((pad,), fmask_full.dtype)]
                    )
                fid_chunks = fid_true_full.reshape(k, chunk, -1)
                fmasks = fmask_full.reshape(k, chunk)

            @jax.checkpoint
            def chunk_stats(args):
                if share_forward:
                    points, m, f_true, f_m = args
                else:
                    points, m = args
                coords, fields, grads = bundle(points)
                stats = dict(stats_fn(
                    coords, fields, grads, mask=m, parity=parity, **equation_kwargs
                ))
                if share_forward:
                    pred = jnp.stack(
                        [fields[name] for name in net_outputs], axis=-1
                    )[..., : len(fid_outputs)]
                    err2 = (f_true - pred) ** 2
                    stats["_fid_sum_err2"] = jnp.sum(err2 * f_m[:, None], axis=0)
                    stats["_fid_n"] = jnp.sum(f_m)
                return stats

            xs = (
                (chunks, masks, fid_chunks, fmasks)
                if share_forward
                else (chunks, masks)
            )
            stats = jax.lax.map(chunk_stats, xs)
            summed = jax.tree.map(lambda a: jnp.sum(a, axis=0), stats)
            if share_forward:
                per_output = summed.pop("_fid_sum_err2") / summed.pop("_fid_n")
                fidelity = jnp.sum(fid_weights * per_output)
            residual = combine_fn(summed)

        if fidelity is None:
            # separate fidelity forward (reference train.py:131-141)
            pred = fidelity_forward(
                params, batch["fidelity_input"], dropout_rng=dropout_rng
            )
            fidelity = fidelity_from(pred)

        total = config.weight_fidelity * fidelity + config.weight_residual * residual
        return total, (fidelity, residual)

    return loss_fn


# One-kernel training step (ops/kernels_step.py) escape hatch: tests and
# drive scripts can force the generic value_and_grad path by flipping this.
FUSED_STEP_ENABLED = True


def one_kernel_step_applicable(
    config: Config, spec: MLPSpec, fidelity_is_residual: bool
) -> bool:
    """Does this configuration qualify for the one-kernel training step
    (``build_value_and_grad_fn``'s gate, minus the fused_kernel/escape-hatch
    inputs)? Shared with ``Trainer._decide_fused_kernel``: the fused-vs-XLA
    step crossover depends on which fused path would run (the one-kernel
    step wins from depth 10 up; the generic two-kernel path only from ~16 —
    round-4 depth sweeps, .soak/fused_depth_sweep.py / cmb_depth_sweep.py).
    """
    if not fidelity_is_residual or spec.dropout_rate:
        return False
    if config.physics not in ("continuity_only", "continuity_ftemp"):
        return False
    names = resolve_names(config)
    net_outputs = names["network_outputs"]
    fid_outputs = names["fidelity_outputs"]
    n_true = len(fid_outputs)
    has_anchor = config.physics == "continuity_only"
    if net_outputs[:3] != ["U", "V", "h"] or spec.d_out != 3:
        return False
    if fid_outputs != net_outputs[:n_true]:
        return False
    if n_true > (2 if has_anchor else 3):
        return False
    if names["residual_inputs"][:2] != ["x", "y"]:
        return False
    return True


def build_value_and_grad_fn(
    config: Config,
    spec: MLPSpec,
    *,
    input_min_max: dict | None = None,
    fused_kernel: bool = False,
    fused_interpret: bool = False,
    fused_precision: str = "f32",
    mesh=None,
    fidelity_is_residual: bool = False,
):
    """Loss+gradient in ONE fused Pallas kernel, when the configuration
    permits — else ``None`` (caller falls back to
    ``jax.value_and_grad(loss_fn, has_aux=True)``).

    The one-kernel step (``ops.kernels_step.fused_loss_and_grad``) covers the
    flagship configuration: fused kernels on, the newmethod shared-points
    contract (fidelity==residual points), ``continuity_only``/
    ``continuity_ftemp`` physics with the ``(U, V, h)`` head order, and
    dropout off. On a device mesh it routes to
    ``fused_loss_and_grad_sharded`` — one shard_map per step, the kernel on
    each shard's rows, psum'd loss statistics AND gradient partial sums,
    with globally-built cotangent scales for exact full-batch numerics. It
    returns ``fn(params, batch, dropout_rng=None) ->
    ((total, (fid, res)), grads)`` with exactly ``build_loss_fn``'s
    semantics — the custom-VJP backward's replay phase doubles as the
    forward, deleting the separate forward kernel from every training step.
    """
    if not (FUSED_STEP_ENABLED and fused_kernel):
        return None
    if not one_kernel_step_applicable(config, spec, fidelity_is_residual):
        return None
    names = resolve_names(config)
    net_outputs = names["network_outputs"]
    fid_outputs = names["fidelity_outputs"]
    residual_inputs = names["residual_inputs"]
    n_true = len(fid_outputs)
    # the anchor selector rides the h column of the obs rows; a 3-head
    # fidelity would collide with it (never the case with unknowns present;
    # enforced inside one_kernel_step_applicable)
    has_anchor = config.physics == "continuity_only"

    kwargs = _anchor_kwargs(config, input_min_max)
    anchor_threshold = kwargs.get("anchor_threshold", 25.5)
    anchor_depth = kwargs.get("anchor_depth", 0.75)
    fid_weights = jnp.asarray(
        [config.output_weight(k) for k in fid_outputs], jnp.float32
    )
    w_fid = float(config.weight_fidelity)
    w_res = float(config.weight_residual)
    ix = residual_inputs.index("x")

    from pinn_depthestimation_tpu.ops.kernels_step import (
        fused_loss_and_grad,
        fused_loss_and_grad_sharded,
    )

    def value_and_grad_fn(params, batch, dropout_rng=None):
        del dropout_rng  # dropout==0 enforced above
        coords = batch["residual_input"]
        mask = batch.get("residual_mask")
        if mask is None:
            mask = jnp.ones((coords.shape[0],), jnp.float32)
        sel = jnp.where(coords[:, ix] < anchor_threshold, 1.0, 0.0) * mask
        args = (
            params, coords, batch["fidelity_true"][:, :n_true], sel, mask,
            fid_weights, spec, n_true, w_fid, w_res,
        )
        kw = dict(
            anchor_depth=anchor_depth, has_anchor=has_anchor,
            precision=fused_precision, interpret=fused_interpret,
        )
        if mesh is not None:
            return fused_loss_and_grad_sharded(*args, mesh=mesh, **kw)
        return fused_loss_and_grad(*args, **kw)

    return value_and_grad_fn


