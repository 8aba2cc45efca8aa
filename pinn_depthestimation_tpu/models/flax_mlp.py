"""Thin Flax linen wrapper around the functional MLP core.

Provided for users who want an ``nn.Module`` object in place of the reference's
``torch.nn.Module`` (reference ``dnn.py:5``). All numerics — init pairing,
zero-bias rule, stacked-hidden ``lax.scan`` forward — delegate to
``models.mlp`` so the two surfaces can never drift.
"""

from __future__ import annotations

import flax.linen as nn
import jax

from pinn_depthestimation_tpu.models.mlp import (
    MLPSpec,
    init_mlp_params,
    mlp_apply,
    mlp_apply_with_tangents,
)


class PinnMLP(nn.Module):
    """``PinnMLP(spec)(x)`` == ``mlp_apply(params, x, spec)``."""

    spec: MLPSpec

    @nn.compact
    def __call__(self, x, *, dropout_rng: jax.Array | None = None):
        params = self.param("mlp", lambda key: init_mlp_params(key, self.spec))
        return mlp_apply(params, x, self.spec, dropout_rng=dropout_rng)

    def apply_with_tangents(self, variables, x, tangents):
        params = variables["params"]["mlp"]
        return mlp_apply_with_tangents(params, x, tangents, self.spec)
