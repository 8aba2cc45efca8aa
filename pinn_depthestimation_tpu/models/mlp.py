"""The PINN MLP as a pure-functional pytree model.

Capability parity with the reference ``DNN`` module (reference ``dnn.py:5-55``):

* layer sizes ``[in] + [width] * hidden_layers + [out]`` (reference
  ``train.py:56``);
* activation/init pairing chosen by ``init_type``: tanh + Xavier-uniform or
  LeakyReLU(0.01) + Kaiming-uniform (reference ``dnn.py:18-23,44-47``);
* zero bias init on every layer except the final one, which keeps the
  framework-default uniform ``±1/sqrt(fan_in)`` (reference ``dnn.py:33,51-52``
  — ``zero_bias=(i < num_layers - 2)``);
* dropout after every hidden activation (reference ``dnn.py:38``), inverted
  scaling as in ``torch.nn.Dropout``.

TPU-first representation: the (uniform-width) hidden layers are *stacked* into
single ``(L-1, W, W)`` / ``(L-1, W)`` arrays and applied with ``lax.scan`` —
one compiled loop body instead of 100 unrolled layers, which keeps compile
times flat in depth and matches the layout the fused Pallas kernel consumes
(``ops/kernels.py``).

``mlp_apply_with_tangents`` propagates K directional tangents alongside the
primal in one pass (value + dvalue/d(direction) per layer), the building block
for PDE residual evaluation: 1 pass replaces the reference's per-variable
nested ``torch.autograd.grad`` chains.
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Sequence

import jax
import jax.numpy as jnp
from jax import lax


@dataclass(frozen=True)
class MLPSpec:
    """Static architecture description (hashable; safe as a jit static arg).

    ``matmul_precision``: XLA dot precision for every layer. The JAX default
    lowers f32 matmuls to bf16 passes on TPU — catastrophic for PINN
    derivative stacks and L-BFGS convergence (tolerance_grad = 1e-5,
    reference ``config_CMB.json:23``) — so this framework defaults to
    ``'highest'`` (true f32 on the MXU) and exposes the knob for
    throughput-over-accuracy runs.
    """

    sizes: tuple[int, ...]          # [d_in, W, W, ..., W, d_out]
    init_type: str = "xavier"       # 'xavier' (tanh) | 'kaiming' (leaky_relu)
    dropout_rate: float = 0.0
    matmul_precision: str = "highest"  # 'default' | 'high' | 'highest'

    def __post_init__(self):
        if len(self.sizes) < 2:
            raise ValueError("MLP needs at least input and output sizes")
        hidden = self.sizes[1:-1]
        if hidden and any(w != hidden[0] for w in hidden):
            raise ValueError(
                "hidden layers must share one width (reference builds "
                f"[in]+[width]*n+[out], train.py:56); got {self.sizes}"
            )
        if self.init_type not in ("xavier", "kaiming"):
            raise ValueError(f"init_type must be 'xavier' or 'kaiming', got {self.init_type!r}")

    @property
    def d_in(self) -> int:
        return self.sizes[0]

    @property
    def d_out(self) -> int:
        return self.sizes[-1]

    @property
    def width(self) -> int:
        return self.sizes[1] if len(self.sizes) > 2 else self.sizes[-1]

    @property
    def n_hidden(self) -> int:
        """Number of hidden layers (== reference config ``hidden_layers``)."""
        return len(self.sizes) - 2

    @classmethod
    def from_layers(cls, layers_cfg) -> "MLPSpec":
        return cls(
            sizes=tuple(layers_cfg.sizes),
            init_type=layers_cfg.init_type,
            dropout_rate=layers_cfg.dropout_rate,
        )


_PRECISIONS = {
    "default": lax.Precision.DEFAULT,
    "high": lax.Precision.HIGH,
    "highest": lax.Precision.HIGHEST,
}


def _dot(a, w, spec: "MLPSpec"):
    """Last-axis contraction at the spec's explicit XLA precision."""
    return jnp.dot(a, w, precision=_PRECISIONS[spec.matmul_precision])


def _activation(init_type: str):
    if init_type == "xavier":
        return jnp.tanh
    return lambda z: jnp.where(z >= 0, z, 0.01 * z)  # LeakyReLU(0.01), dnn.py:21


def _activation_deriv(init_type: str, z, a):
    """Derivative of the activation given pre-activation z and activation a."""
    if init_type == "xavier":
        return 1.0 - a * a
    return jnp.where(z >= 0, 1.0, 0.01)


def _weight_init(init_type: str, stacked: bool = False):
    # Xavier-uniform bound sqrt(6/(fan_in+fan_out)) == torch
    # nn.init.xavier_uniform_ (reference dnn.py:47); Kaiming-uniform with
    # leaky_relu gain sqrt(2) -> bound sqrt(6/fan_in) == torch
    # nn.init.kaiming_uniform_(nonlinearity='leaky_relu') (reference dnn.py:45).
    # For the stacked (n_stack, W, W) hidden weights the leading dim is a
    # batch of independent layers, NOT a receptive field — without
    # batch_axis=0 the fan (and hence the init scale) would be wrong.
    batch = (0,) if stacked else ()
    if init_type == "xavier":
        return jax.nn.initializers.glorot_uniform(
            in_axis=-2, out_axis=-1, batch_axis=batch
        )
    return jax.nn.initializers.he_uniform(in_axis=-2, out_axis=-1, batch_axis=batch)


def init_mlp_params(key: jax.Array, spec: MLPSpec, dtype=jnp.float32) -> dict:
    """Initialize the parameter pytree.

    Layout: ``w_in (d_in, W)``, ``b_in (W,)``, stacked hidden
    ``w_hidden (n_hidden-1, W, W)`` / ``b_hidden (n_hidden-1, W)``, and
    ``w_out (W, d_out)``, ``b_out (d_out,)``.
    """
    if spec.n_hidden < 1:
        # Degenerate single-Linear network: in -> out directly.
        k_w, k_b = jax.random.split(key)
        w = _weight_init(spec.init_type)(k_w, (spec.d_in, spec.d_out), dtype)
        bound = 1.0 / math.sqrt(spec.d_in)
        b = jax.random.uniform(k_b, (spec.d_out,), dtype, -bound, bound)
        return {
            "w_in": jnp.zeros((spec.d_in, 0), dtype),
            "b_in": jnp.zeros((0,), dtype),
            "w_hidden": jnp.zeros((0, 0, 0), dtype),
            "b_hidden": jnp.zeros((0, 0), dtype),
            "w_out": w,
            "b_out": b,
        }

    W = spec.width
    n_stack = spec.n_hidden - 1
    k_in, k_hidden, k_out, k_bout = jax.random.split(key, 4)
    w_init = _weight_init(spec.init_type)
    w_init_stacked = _weight_init(spec.init_type, stacked=True)
    params = {
        "w_in": w_init(k_in, (spec.d_in, W), dtype),
        "b_in": jnp.zeros((W,), dtype),
        "w_hidden": (
            w_init_stacked(k_hidden, (n_stack, W, W), dtype)
            if n_stack > 0
            else jnp.zeros((0, W, W), dtype)
        ),
        "b_hidden": jnp.zeros((max(n_stack, 0), W), dtype),
        "w_out": w_init(k_out, (W, spec.d_out), dtype),
        # Final-layer bias keeps the framework-default uniform init: the
        # reference only zeroes biases on non-final layers (dnn.py:33,51-52).
        "b_out": jax.random.uniform(
            k_bout, (spec.d_out,), dtype, -1.0 / math.sqrt(W), 1.0 / math.sqrt(W)
        ),
    }
    return params


def num_params(params: dict) -> int:
    return sum(int(p.size) for p in jax.tree_util.tree_leaves(params))


def _dropout(a: jax.Array, rate: float, key: jax.Array) -> jax.Array:
    keep = 1.0 - rate
    mask = jax.random.bernoulli(key, keep, a.shape)
    return jnp.where(mask, a / keep, 0.0)


def mlp_apply(
    params: dict,
    x: jax.Array,
    spec: MLPSpec,
    *,
    dropout_rng: jax.Array | None = None,
) -> jax.Array:
    """Forward pass. ``x``: ``(..., d_in)`` -> ``(..., d_out)``.

    Dropout is applied after every hidden activation when ``dropout_rng`` is
    given and ``spec.dropout_rate > 0`` (training mode); inference passes no
    rng, matching ``model.eval()`` semantics (reference ``test.py:38``).
    """
    act = _activation(spec.init_type)
    rate = spec.dropout_rate
    use_dropout = dropout_rng is not None and rate > 0.0

    if spec.n_hidden < 1:
        return _dot(x, params["w_out"], spec) + params["b_out"]

    n_stack = params["w_hidden"].shape[0]
    if use_dropout:
        keys = jax.random.split(dropout_rng, n_stack + 1)
        first_key, stack_keys = keys[0], keys[1:]
    else:
        first_key = None
        stack_keys = jnp.zeros((n_stack, 2), dtype=jnp.uint32)

    a = act(_dot(x, params["w_in"], spec) + params["b_in"])
    if use_dropout:
        a = _dropout(a, rate, first_key)

    def body(carry, layer):
        w, b, k = layer
        h = act(_dot(carry, w, spec) + b)
        if use_dropout:
            h = _dropout(h, rate, k)
        return h, None

    if n_stack > 0:
        a, _ = lax.scan(body, a, (params["w_hidden"], params["b_hidden"], stack_keys))
    return _dot(a, params["w_out"], spec) + params["b_out"]


def mlp_apply_with_tangents(
    params: dict,
    x: jax.Array,
    tangents: Sequence[jax.Array] | jax.Array,
    spec: MLPSpec,
):
    """Forward pass fused with K directional (JVP) derivatives.

    ``tangents``: ``(K, ..., d_in)`` (or a sequence of ``(..., d_in)``)
    direction vectors; typically the coordinate basis ``e_x``, ``e_y``.

    Returns ``(y, dy)`` with ``y: (..., d_out)`` and ``dy: (K, ..., d_out)``.
    The primal activations are shared across all tangents — one pass total,
    versus one full reverse sweep per requested derivative in the reference
    (``physics.py:6-15``). Deterministic only (residual evaluation never uses
    dropout in the shipped configs, which set ``dropout_rate = 0.0``,
    reference ``config_CMB.json:7``).
    """
    if not isinstance(tangents, jax.Array):
        tangents = jnp.stack(list(tangents), axis=0)
    act = _activation(spec.init_type)
    dact = lambda z, a: _activation_deriv(spec.init_type, z, a)  # noqa: E731

    if spec.n_hidden < 1:
        w = params["w_out"]
        return _dot(x, w, spec) + params["b_out"], _dot(tangents, w, spec)

    z = _dot(x, params["w_in"], spec) + params["b_in"]
    a = act(z)
    da = dact(z, a)
    t = _dot(tangents, params["w_in"], spec) * da[None]

    def body(carry, layer):
        a, t = carry
        w, b = layer
        z = _dot(a, w, spec) + b
        na = act(z)
        nda = dact(z, na)
        nt = _dot(t, w, spec) * nda[None]
        return (na, nt), None

    if params["w_hidden"].shape[0] > 0:
        (a, t), _ = lax.scan(body, (a, t), (params["w_hidden"], params["b_hidden"]))

    y = _dot(a, params["w_out"], spec) + params["b_out"]
    dy = _dot(t, params["w_out"], spec)
    return y, dy
