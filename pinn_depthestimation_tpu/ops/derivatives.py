"""Forward-mode derivative primitives for PINN residuals.

The reference's core derivative primitive is a reverse-mode
``torch.autograd.grad(pred, var, grad_outputs=ones, create_graph=True)`` call
(reference ``physics.py:6-15``), invoked 2-12 times per residual and then
back-propagated through again for the parameter gradient — a
reverse-over-reverse stack.

The TPU-native design is forward-over-reverse: one ``jax.jvp`` per input
coordinate yields the derivative of *every* network output with respect to
that coordinate in a single pass, and derived quantities (``h*U``, radiation
stresses, ...) get their derivatives by pushing the same tangent through the
algebra with another (elementwise-cheap) ``jvp``. The parameter gradient is a
single reverse pass over the whole jitted program.
"""

from __future__ import annotations

from typing import Callable, Sequence

import jax
import jax.numpy as jnp


def coordinate_tangent(x: jax.Array, column: int) -> jax.Array:
    """Unit tangent selecting one input column of a ``(..., d_in)`` batch."""
    t = jnp.zeros_like(x)
    return t.at[..., column].set(1.0)


def directional_derivative(f: Callable, primals, tangents):
    """``jax.jvp`` that accepts bare pytrees for a single-argument ``f``."""
    _, dout = jax.jvp(f, (primals,), (tangents,))
    return dout


def value_and_coordinate_grads(
    f: Callable[[jax.Array], jax.Array],
    x: jax.Array,
    columns: Sequence[int],
):
    """Evaluate ``f(x)`` and its derivative w.r.t. selected input columns.

    One forward-mode pass per column; XLA CSE merges the repeated primal
    computation under jit. Equivalent to the reference's per-variable
    ``compute_gradient`` calls (reference ``physics.py:6-15``) but producing
    all output derivatives per coordinate at once.

    Returns ``(f(x), [df/dx_c for c in columns])``.
    """
    value = None
    grads = []
    for c in columns:
        value, g = jax.jvp(f, (x,), (coordinate_tangent(x, c),))
        grads.append(g)
    if value is None:  # no columns requested
        value = f(x)
    return value, grads
