from pinn_depthestimation_tpu.optim.lbfgs import (  # noqa: F401
    LBFGSOptions,
    LBFGSRunner,
    lbfgs_minimize,
)
