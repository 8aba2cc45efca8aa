from pinn_depthestimation_tpu.models.flax_mlp import PinnMLP  # noqa: F401
from pinn_depthestimation_tpu.models.mlp import (  # noqa: F401
    MLPSpec,
    init_mlp_params,
    mlp_apply,
    mlp_apply_with_tangents,
    num_params,
)
