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


def build_loss_fn(config: Config, spec: MLPSpec) -> Callable:
    """Returns ``loss_fn(params, batch, dropout_rng=None) -> (total, (fid, res))``."""
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

    # Fidelity predictions reuse the head order of the *fidelity* outputs:
    # in both pipelines output column i corresponds to fidelity output i
    # (reference train.py:137-138, train_newmethod.py:130-131).
    fid_weights = jnp.asarray([config.output_weight(k) for k in fid_outputs], jnp.float32)
    parity = config.parity

    def loss_fn(params, batch, dropout_rng=None):
        # --- fidelity term (reference train.py:131-141)
        pred = mlp_apply(params, batch["fidelity_input"], spec, dropout_rng=dropout_rng)
        err2 = (batch["fidelity_true"] - pred[..., : len(fid_outputs)]) ** 2
        fid_mask = batch.get("fidelity_mask")
        per_output = (
            jnp.mean(err2, axis=0)
            if fid_mask is None
            else jnp.sum(err2 * fid_mask[:, None], axis=0) / jnp.sum(fid_mask)
        )
        fidelity = jnp.sum(fid_weights * per_output)

        # --- residual term (reference train.py:144-154)
        def apply_with_tangents(x, tangents):
            return mlp_apply_with_tangents(params, x, tangents, spec)

        coords, fields, grads = physics.model_fields_and_grads(
            apply_with_tangents,
            batch["residual_input"],
            residual_inputs,
            grad_coords,
            net_outputs,
        )
        residual = equation(
            coords, fields, grads, mask=batch.get("residual_mask"), parity=parity
        )

        total = config.weight_fidelity * fidelity + config.weight_residual * residual
        return total, (fidelity, residual)

    return loss_fn


def build_predict_fn(config: Config, spec: MLPSpec) -> Callable:
    """``predict(params, inputs) -> (N, d_out)`` (eval mode, no dropout)."""

    def predict(params, inputs):
        return mlp_apply(params, inputs, spec)

    return jax.jit(predict)
