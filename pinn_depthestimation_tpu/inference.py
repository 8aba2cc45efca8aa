"""Inference + test-time physics adaptation (reference ``test.py`` parity).

Capabilities of the reference inference drivers, rebuilt:

* restore a trained model from a checkpoint (reference loads a whole pickled
  module, ``test.py:35-42``; here: params from a ``model*.msgpack`` /
  orbax checkpoint — architecture comes from the config, so checkpoints are
  portable across code versions);
* full-grid batch prediction, reshaped ``(ny, nx)`` with inputs denormalized
  for plotting (reference ``test.py:60-89``);
* optional **test-time adaptation**: when ``perform_optimization`` is set, a
  1-iteration L-BFGS (max_eval=2, history=10 — reference ``test.py:44-54``)
  fine-tunes the parameters against the pure physics residual on the test
  grid, then re-predicts (reference ``test.py:92-104``).

Big grids use the fused Pallas kernel on TPU for the residual derivative
stack; prediction itself is one jitted forward pass.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass, field

import jax
import jax.numpy as jnp
import numpy as np

from pinn_depthestimation_tpu import data as data_mod
from pinn_depthestimation_tpu import ops, physics
from pinn_depthestimation_tpu.config import Config
from pinn_depthestimation_tpu.models import (
    MLPSpec,
    init_mlp_params,
    mlp_apply,
    mlp_apply_with_tangents,
)
from pinn_depthestimation_tpu.optim import LBFGSOptions, LBFGSRunner
from pinn_depthestimation_tpu.training import checkpoint as ckpt_mod


@dataclass
class InferenceResult:
    """Grids keyed by variable name, shaped ``(ny, nx)`` where configured."""

    pred: dict[str, np.ndarray] = field(default_factory=dict)
    true: dict[str, np.ndarray] = field(default_factory=dict)
    inputs: dict[str, np.ndarray] = field(default_factory=dict)  # denormalized
    adapted: bool = False


class Predictor:
    def __init__(
        self,
        config: Config,
        checkpoint_path: str | None = None,
        *,
        use_fused_kernel: bool | None = None,
    ):
        """``use_fused_kernel``: route full-grid forward passes through the
        packed Pallas kernel (defaults to auto: on when running on TPU)."""
        self.config = config
        self.spec = MLPSpec.from_layers(config.layers)
        td = config.data_test
        if td is None:
            raise ValueError("config needs a data_test section for inference")
        self.test_cfg = td

        params = init_mlp_params(jax.random.PRNGKey(config.seed), self.spec)
        path = checkpoint_path or td.model
        if path:
            # structure-aware restore: framework msgpack/orbax (full
            # training-state or bare-params) or a reference torch .pth
            # (whole pickled dnn.DNN module / state_dict, reference
            # test.py:35-42) — migrating users' models load unchanged
            restored = ckpt_mod.restore_params_any(path, params, spec=self.spec)
            params = jax.tree.map(jnp.asarray, restored)
        self.params = params
        from pinn_depthestimation_tpu.ops import kernels

        if use_fused_kernel is None:
            use_fused_kernel = (
                kernels.pallas_supported()
                and self.spec.n_hidden >= 1
                and max(self.spec.width, self.spec.d_in, self.spec.d_out) <= 128
            )
        if use_fused_kernel:
            kprec = config.resolved_kernel_precision()

            def fused(p, x):
                y, _ = kernels.packed_mlp_fwd_tangents(
                    p, x, self.spec, 0, precision=kprec
                )
                return y

            self._predict = fused  # already jitted internally
        else:
            self._predict = jax.jit(lambda p, x: mlp_apply(p, x, self.spec))

    # ------------------------------------------------------------- predict

    def predict(self, inputs: np.ndarray) -> np.ndarray:
        return np.asarray(self._predict(self.params, jnp.asarray(inputs, jnp.float32)))

    def _grid(self, column: np.ndarray) -> np.ndarray:
        ny, nx = self.test_cfg.ny, self.test_cfg.nx
        if ny and nx and column.size == ny * nx:
            return column.reshape(ny, nx)  # reference test.py:69,84
        return column

    def run(self, test_data: data_mod.TestData | None = None) -> InferenceResult:
        """Full test pass: predict, optional physics adaptation, re-predict."""
        if test_data is None:
            test_data = data_mod.load_test_data(self.config)

        result = InferenceResult()
        for i, key in enumerate(self.test_cfg.inputs):
            lo, hi = test_data.input_min_max[key]
            col = np.asarray(test_data.inputs[:, i], np.float64)
            result.inputs[key] = self._grid(ops.denormalize(col, lo, hi))

        if self.config.perform_optimization:
            self.adapt(test_data.inputs)

        pred = self.predict(test_data.inputs)
        for i, key in enumerate(self.test_cfg.outputs):
            if i < pred.shape[1]:
                result.pred[key] = self._grid(pred[:, i])
        for key, arr in test_data.trues.items():
            result.true[key] = np.asarray(arr)
        result.adapted = self.config.perform_optimization
        return result

    # -------------------------------------------------- test-time adaptation

    def adapt(
        self,
        inputs: np.ndarray,
        *,
        equation: str | None = None,
        max_iter: int = 1,
        max_eval: int = 2,
        history_size: int = 10,
    ) -> int:
        """Physics-only L-BFGS fine-tune on the given (normalized) inputs.

        Mirrors the reference's fixed TTA optimizer settings (``test.py:45-54``:
        max_iter=1, max_eval=2, history_size=10, tolerances from the config)
        while generalizing the iteration budget. Returns evaluation count.

        **Deliberate divergence from observable reference behavior**: the
        reference hardcodes ``Navier_Stokes`` as the TTA equation regardless
        of pipeline (``test.py:6,96``) — which would ``AttributeError`` on
        the shipped CMB configs, since their test inputs lack the t/z/u/v
        variables Navier-Stokes needs (the reference's TTA path is broken
        as shipped). Here the equation defaults to ``config.physics`` (the
        equation the model was trained against) with an ``equation=``
        override; pass ``equation='navier_stokes'`` for literal reference
        semantics when the test inputs support it. Also documented in
        README.md / STATUS.md.
        """
        eq_name = equation or self.config.physics
        equation_fn = physics.residual_loss(eq_name)
        grad_coords = list(physics.required_grad_coords(eq_name))
        missing = [c for c in grad_coords if c not in self.test_cfg.inputs]
        if missing:
            raise ValueError(
                f"physics equation {eq_name!r} needs input coordinates "
                f"{grad_coords}, but data_test.inputs are "
                f"{list(self.test_cfg.inputs)} (missing {missing})"
            )
        input_names = list(self.test_cfg.inputs)
        output_names = list(self.test_cfg.outputs)
        coords = jnp.asarray(inputs, jnp.float32)
        spec = self.spec
        parity = self.config.parity

        def loss_fn(params, batch):
            del batch
            awt = functools.partial(mlp_apply_with_tangents, params, spec=spec)
            c, f, g = physics.model_fields_and_grads(
                awt, coords, input_names, grad_coords, output_names
            )
            loss = equation_fn(c, f, g, parity=parity)
            return loss, (jnp.zeros_like(loss), loss)

        lcfg = self.config.lbfgs
        runner = LBFGSRunner(
            loss_fn,
            self.params,
            LBFGSOptions(
                lr=lcfg.learning_rate,
                max_iter=max_iter,
                max_eval=max_eval,
                history_size=history_size,
                tolerance_grad=lcfg.tolerance_grad,
                tolerance_change=lcfg.tolerance_change,
                line_search=lcfg.line_search_fn,
            ),
        )
        state = runner.init(self.params, None)
        while not runner.finished(state):
            state, _ = runner.run_chunk(state, None)
        self.params = runner.get_params(state)
        return int(state.func_evals)
