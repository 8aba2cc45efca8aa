from pinn_depthestimation_tpu.ops.normalize import (  # noqa: F401
    denormalize,
    get_min_max,
    normalize,
)
from pinn_depthestimation_tpu.ops.derivatives import (  # noqa: F401
    coordinate_tangent,
    directional_derivative,
    value_and_coordinate_grads,
)
