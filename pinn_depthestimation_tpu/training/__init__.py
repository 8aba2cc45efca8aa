from pinn_depthestimation_tpu.training.loss import build_loss_fn  # noqa: F401
from pinn_depthestimation_tpu.training.driver import Trainer  # noqa: F401
