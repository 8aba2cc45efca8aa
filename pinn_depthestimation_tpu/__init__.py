"""pinn_depthestimation_tpu — a TPU-native PINN bathymetry-inversion framework.

A ground-up JAX/XLA/Pallas rebuild of the capabilities of
``rezasalatin/PINN_depthEstimation`` (reference mounted at ``/root/reference``):
physics-informed neural networks that invert nearshore water depth ``h(x, y)``
from sparse surface observations, trained full-batch with an Adam warm phase
followed by strong-Wolfe L-BFGS.

Design (TPU-first, not a port):

* the MLP is a pure-functional pytree model (``models.mlp``) whose forward pass
  runs either through XLA (``lax.scan`` over stacked hidden layers) or through a
  fused Pallas kernel that packs ``floor(128 / width)`` collocation points into
  the 128-lane MXU tile via block-diagonal weights (``ops.kernels``);
* PDE residuals are forward-mode ``jax.jvp`` stacks over the model apply
  function (one jvp per coordinate gives every needed first derivative), jitted
  into a single XLA program (``physics``) — replacing the reference's nested
  ``torch.autograd.grad`` chains (reference ``physics.py:6-15``);
* L-BFGS runs entirely on device: fixed-history two-loop recursion plus a
  strong-Wolfe line search expressed as ``lax.while_loop`` (``optim.lbfgs``),
  replacing ``torch.optim.LBFGS`` (reference ``train.py:116-125``) and the
  historical SciPy L-BFGS-B host round-trip wrapper;
* collocation/observation batches shard over a ``jax.sharding.Mesh`` data axis
  with replicated parameters; XLA inserts the psum reductions (``parallel``).

The JSON config schema of the reference (``config_CMB.json``,
``config_CMB_h.json`` and the legacy ``config.json``/``config_txyz.json``) is
accepted verbatim (``config``).
"""

__version__ = "0.1.0"

from pinn_depthestimation_tpu.config import Config, load_config  # noqa: F401
