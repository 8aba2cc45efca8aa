"""PDE residual library (shallow-water / wave-averaged nearshore physics).

Rebuilds the four residual losses of reference ``physics.py`` as pure
functions over *field values and their coordinate derivatives*:

* ``continuity_only``  — depth-anchored continuity (reference ``physics.py:18-33``)
* ``continuity_ftemp`` — anchor-free continuity (reference ``physics.py:37-47``)
* ``navier_stokes``    — time-dependent continuity + momentum with wave
  breaking (reference ``physics.py:50-88``)
* ``wave_averaged``    — wave-averaged momentum with bottom friction and
  radiation stresses (reference ``physics.py:91-120``, named
  ``physics_equation`` there)

Instead of nested reverse-mode autograd over a retained graph, callers supply
``grads[coord][field]`` — per-coordinate forward-mode derivatives of every
network output, produced in one fused pass by
``models.mlp.mlp_apply_with_tangents``. Derivatives of *derived* quantities
(``h*U``, radiation stresses) are obtained by pushing the same tangents
through the derivation algebra with an elementwise ``jax.jvp``.

Every loss takes an optional ``mask`` so collocation batches can be padded to
a device-mesh-divisible size; masked points contribute nothing and means are
renormalized. All functions are pure, jit-safe, and differentiable w.r.t.
anything in ``fields``/``grads`` (so ``jax.grad`` w.r.t. parameters works
through them).

Parity quirks (reproduced when ``parity=True``, documented in SURVEY.md §5):

1. The reference's radiation-stress prefactor ``E = 1/8**rho*g*Hrms**2``
   parses as ``(1/8**1025)*...`` which underflows to exactly 0.0, deleting the
   radiation-stress terms from ``wave_averaged``. ``parity=False`` computes
   the intended ``rho*g*Hrms**2/8``.
2. ``continuity_only``'s depth anchor compares the (normalized, in the
   shipped pipeline) x coordinate against 25.5, selecting every collocation
   point. The anchor coordinate array is whatever the caller passes as
   ``coords['x']`` — the parity pipeline passes normalized x exactly as the
   reference does (reference ``train_newmethod.py:156,231-232``); a corrected
   pipeline may pass physical x.
"""

from __future__ import annotations

from typing import Callable, Mapping

import jax
import jax.numpy as jnp

G = 9.81          # m/s^2 (reference physics.py:75,97)
RHO = 1025.0      # kg/m^3 (reference physics.py:98)
CD = 0.002        # drag coefficient (reference physics.py:71,99)
GAMMA_B = 0.78    # breaking index (reference physics.py:76)


def masked_mean(values: jax.Array, mask: jax.Array | None) -> jax.Array:
    """Mean over valid entries; ``mask=None`` means all valid."""
    if mask is None:
        return jnp.mean(values)
    mask = mask.astype(values.dtype)
    return jnp.sum(values * mask) / jnp.sum(mask)


def _subdict(d: Mapping[str, jax.Array], keys) -> dict[str, jax.Array]:
    return {k: d[k] for k in keys}


def derived_and_grad(
    fn: Callable[[dict], jax.Array],
    fields: Mapping[str, jax.Array],
    dfields: Mapping[str, jax.Array],
    keys,
):
    """Value of a derived quantity and its coordinate derivative by chain rule:
    push the coordinate tangent of the involved fields through ``fn``."""
    primal = _subdict(fields, keys)
    tangent = _subdict(dfields, keys)
    return jax.jvp(fn, (primal,), (tangent,))


# ---------------------------------------------------------------------------
# continuity_only — reference physics.py:18-33
# ---------------------------------------------------------------------------

def continuity_only_residuals(fields, grads):
    """Pointwise continuity residual ``d(hU)/dx + d(hV)/dy``."""
    h, U, V = fields["h"], fields["U"], fields["V"]
    dx, dy = grads["x"], grads["y"]
    hU_x = dx["h"] * U + h * dx["U"]
    hV_y = dy["h"] * V + h * dy["V"]
    return hU_x + hV_y


def continuity_only(
    coords,
    fields,
    grads,
    *,
    mask=None,
    parity: bool = True,
    anchor_threshold: float = 25.5,
    anchor_depth: float = 0.75,
):
    """Continuity loss plus depth anchor ``mean((h[x < 25.5] - 0.75)^2)``.

    ``coords['x']`` is compared against the threshold exactly as stored
    (see module docstring, quirk 2). ``parity`` is accepted for interface
    uniformity; this equation has no parity-dependent term.
    """
    del parity
    fc = continuity_only_residuals(fields, grads)
    loss_continuity = masked_mean(fc**2, mask)

    x = coords["x"]
    sel = (x < anchor_threshold)
    if mask is not None:
        sel = jnp.logical_and(sel, mask.astype(bool))
    sel = sel.astype(fc.dtype)
    n_sel = jnp.sum(sel)
    # Mean over the selected subset; empty selection yields nan exactly like
    # torch.mean of an empty tensor (reference physics.py:28).
    loss_condition = jnp.sum(sel * (fields["h"] - anchor_depth) ** 2) / n_sel
    return loss_continuity + loss_condition


# ---------------------------------------------------------------------------
# continuity_ftemp — reference physics.py:37-47
# ---------------------------------------------------------------------------

def continuity_ftemp(coords, fields, grads, *, mask=None, parity: bool = True):
    del coords, parity
    fc = continuity_only_residuals(fields, grads)
    return masked_mean(fc**2, mask)


# ---------------------------------------------------------------------------
# Navier_Stokes — reference physics.py:50-88
# ---------------------------------------------------------------------------

def navier_stokes_residuals(fields, grads):
    """Pointwise (continuity, x-momentum, y-momentum) residuals."""
    h, z, u, v = fields["h"], fields["z"], fields["u"], fields["v"]
    dt, dx, dy = grads["t"], grads["x"], grads["y"]

    u_t, u_x, u_y = dt["u"], dx["u"], dy["u"]
    v_t, v_x, v_y = dt["v"], dx["v"], dy["v"]
    z_t, z_x, z_y = dt["z"], dx["z"], dy["z"]

    depth = h + z
    h_x = dx["h"] + dx["z"]           # compute_gradient(h+z, x), physics.py:64
    h_y = dy["h"] + dy["z"]
    hu_x = h_x * u + depth * u_x      # compute_gradient((h+z)*u, x), physics.py:67
    hv_y = h_y * v + depth * v_y

    # Friction disabled in the reference (physics.py:72-73).
    fbr_x = 3.0 / 16.0 * G * GAMMA_B**2 * h_x * depth
    fbr_y = 3.0 / 16.0 * G * GAMMA_B**2 * h_y * depth

    fc = z_t + hu_x + hv_y
    fm_x = u_t + u * u_x + v * u_y + G * z_x + fbr_x
    fm_y = v_t + u * v_x + v * v_y + G * z_y + fbr_y
    return fc, fm_x, fm_y


def navier_stokes(coords, fields, grads, *, mask=None, parity: bool = True):
    del coords, parity
    fc, fm_x, fm_y = navier_stokes_residuals(fields, grads)
    return (
        masked_mean(fc**2, mask)
        + masked_mean(fm_x**2, mask)
        + masked_mean(fm_y**2, mask)
    )


# ---------------------------------------------------------------------------
# wave_averaged — reference physics.py:91-120 (`physics_equation`)
# ---------------------------------------------------------------------------

def _radiation_prefactor(hrms, parity: bool):
    if parity:
        # Reference: E = 1/8**rho*g*Hrms**2 -> (1/8**1025)*... == 0.0 exactly
        # (operator precedence; verified numerically). Keep the zeros in the
        # graph so downstream hazards (inf * 0) match.
        return jnp.zeros_like(hrms)
    return RHO * G * hrms**2 / 8.0


def _t_over_sinh(t):
    """``t / sinh(t)``, numerically stable under AD across the whole range.

    The naive quotient is fine to EVALUATE at small ``t``, but differentiating
    it applies the quotient rule: ``d/dt = (sinh t - t cosh t) / sinh^2 t``,
    whose numerator is ``-t^3/3 + O(t^5)`` computed as the difference of two
    ``~t`` quantities — catastrophic cancellation with f32 relative error
    ``~3*eps/t^2`` (measured: 0.5% at t=0.01, 46% at t=0.001; the round-3c
    wave_averaged gradient soft spot, since ``t = 2*k*h`` is tiny at random
    init where the k/h heads start near zero). The even Taylor series is
    stable at every AD order; the direct branch serves ``|t| >= 0.5`` where
    the cancellation is harmless (truncation error at the seam ~1e-9).
    """
    small = jnp.abs(t) < 0.5
    ts = jnp.where(small, t, 0.0)          # series arg (0 where unused)
    tb = jnp.where(small, 1.0, t)          # direct arg (never 0 -> sinh != 0)
    t2 = ts * ts
    series = 1.0 + t2 * (
        -1.0 / 6.0 + t2 * (7.0 / 360.0 + t2 * (
            -31.0 / 15120.0 + t2 * (127.0 / 604800.0)))
    )
    return jnp.where(small, series, tb / jnp.sinh(tb))


def wave_averaged_residuals(fields, grads, *, parity: bool = True):
    """Pointwise (continuity, x-momentum, y-momentum) residuals."""
    h, U, V = fields["h"], fields["U"], fields["V"]
    eta, hrms, k = fields["eta_mean"], fields["Hrms"], fields["k"]
    dx, dy = grads["x"], grads["y"]

    u_x, u_y = dx["U"], dy["U"]
    v_x, v_y = dx["V"], dy["V"]
    z_x, z_y = dx["eta_mean"], dy["eta_mean"]

    tau_bx = RHO * CD * U * jnp.abs(U)
    tau_by = RHO * CD * V * jnp.abs(V)

    # Sxx = E*(2kh/sinh(2kh) + 1/2), Syy = E*(kh/sinh(2kh)) — both via the
    # stable r = t/sinh(t) at t = 2kh (Syy = E*r/2). Reference physics.py:
    # 106-108 writes the naive quotients; the values agree to roundoff and
    # the parity-mode E=0 zeros are preserved exactly, but gradients avoid
    # the small-t quotient-rule cancellation (see _t_over_sinh).
    def sxx(f):
        e = _radiation_prefactor(f["Hrms"], parity)
        r = _t_over_sinh(2.0 * f["k"] * f["h"])
        return e * (r + 0.5)

    def syy(f):
        e = _radiation_prefactor(f["Hrms"], parity)
        r = _t_over_sinh(2.0 * f["k"] * f["h"])
        return e * (0.5 * r)

    stress_keys = ("h", "Hrms", "k")
    _, sxx_x = derived_and_grad(sxx, fields, dx, stress_keys)
    _, syy_y = derived_and_grad(syy, fields, dy, stress_keys)

    inv_rho_d = 1.0 / (RHO * (eta + h))
    fc = u_x + v_y
    fx = U * u_x + V * u_y + G * z_x + inv_rho_d * sxx_x + inv_rho_d * tau_bx
    fy = U * v_x + V * v_y + G * z_y + inv_rho_d * syy_y + inv_rho_d * tau_by
    return fc, fx, fy


def wave_averaged(coords, fields, grads, *, mask=None, parity: bool = True):
    del coords
    fc, fx, fy = wave_averaged_residuals(fields, grads, parity=parity)
    return (
        masked_mean(fc**2, mask)
        + masked_mean(fx**2, mask)
        + masked_mean(fy**2, mask)
    )


# ---------------------------------------------------------------------------
# Sufficient-statistics forms (for chunked/rematerialized evaluation)
# ---------------------------------------------------------------------------
# Every residual loss is a ratio of sums (masked means, possibly over
# data-dependent subsets like the depth anchor). The ``*_stats`` form returns
# those sums so collocation batches can be processed in chunks — summing
# chunk statistics and combining at the end reproduces the full-batch loss
# EXACTLY (same numerator/denominator), which is what lets 10M+ point
# training fit in HBM via gradient accumulation + jax.checkpoint.

def _mask_of(values, mask):
    return jnp.ones_like(values) if mask is None else mask.astype(values.dtype)


def continuity_only_stats(
    coords, fields, grads, *, mask=None, parity=True,
    anchor_threshold=25.5, anchor_depth=0.75,
):
    del parity
    fc = continuity_only_residuals(fields, grads)
    m = _mask_of(fc, mask)
    sel = (coords["x"] < anchor_threshold).astype(fc.dtype) * m
    return {
        "sum_fc2": jnp.sum(fc**2 * m),
        "n": jnp.sum(m),
        "sum_anchor": jnp.sum(sel * (fields["h"] - anchor_depth) ** 2),
        "n_anchor": jnp.sum(sel),
    }


def continuity_only_from_stats(s):
    return s["sum_fc2"] / s["n"] + s["sum_anchor"] / s["n_anchor"]


def continuity_ftemp_stats(coords, fields, grads, *, mask=None, parity=True):
    del coords, parity
    fc = continuity_only_residuals(fields, grads)
    m = _mask_of(fc, mask)
    return {"sum_fc2": jnp.sum(fc**2 * m), "n": jnp.sum(m)}


def continuity_ftemp_from_stats(s):
    return s["sum_fc2"] / s["n"]


def navier_stokes_stats(coords, fields, grads, *, mask=None, parity=True):
    del coords, parity
    fc, fm_x, fm_y = navier_stokes_residuals(fields, grads)
    m = _mask_of(fc, mask)
    return {
        "sum_fc2": jnp.sum(fc**2 * m),
        "sum_fx2": jnp.sum(fm_x**2 * m),
        "sum_fy2": jnp.sum(fm_y**2 * m),
        "n": jnp.sum(m),
    }


def _three_term_from_stats(s):
    return (s["sum_fc2"] + s["sum_fx2"] + s["sum_fy2"]) / s["n"]


def wave_averaged_stats(coords, fields, grads, *, mask=None, parity=True):
    del coords
    fc, fx, fy = wave_averaged_residuals(fields, grads, parity=parity)
    m = _mask_of(fc, mask)
    return {
        "sum_fc2": jnp.sum(fc**2 * m),
        "sum_fx2": jnp.sum(fx**2 * m),
        "sum_fy2": jnp.sum(fy**2 * m),
        "n": jnp.sum(m),
    }


# ---------------------------------------------------------------------------
# Model -> physics bridge
# ---------------------------------------------------------------------------

def model_fields_and_grads(
    apply_with_tangents: Callable,
    coords: jax.Array,
    input_names,
    grad_coords,
    output_names,
):
    """Evaluate a model and package (coords, fields, grads) for residual fns.

    ``apply_with_tangents(x, tangents) -> (y, dy)`` is typically a partial of
    ``models.mlp.mlp_apply_with_tangents``. ``grad_coords`` names the inputs
    to differentiate against (the config's ``requires_grad: true`` inputs,
    reference ``config_CMB.json:48-51``); one fused forward pass produces all
    of them.

    Returns ``(coord_dict, fields, grads)`` with 1-D ``(N,)`` leaves:
    ``coord_dict[name]``, ``fields[output]``, ``grads[coord][output]``.
    """
    input_names = list(input_names)
    output_names = list(output_names)
    grad_coords = list(grad_coords)
    columns = [input_names.index(c) for c in grad_coords]
    tangents = jnp.stack(
        [jnp.zeros_like(coords).at[..., c].set(1.0) for c in columns], axis=0
    )
    y, dy = apply_with_tangents(coords, tangents)
    coord_dict = {name: coords[..., i] for i, name in enumerate(input_names)}
    fields = {name: y[..., i] for i, name in enumerate(output_names)}
    grads = {
        c: {name: dy[k][..., i] for i, name in enumerate(output_names)}
        for k, c in enumerate(grad_coords)
    }
    return coord_dict, fields, grads


# ---------------------------------------------------------------------------
# Registry: config name -> (loss_fn, required coordinate-derivative names)
# ---------------------------------------------------------------------------

EQUATIONS: dict[str, tuple[Callable, tuple[str, ...], Callable, Callable]] = {
    "continuity_only": (
        continuity_only, ("x", "y"), continuity_only_stats, continuity_only_from_stats,
    ),
    "continuity_ftemp": (
        continuity_ftemp, ("x", "y"), continuity_ftemp_stats, continuity_ftemp_from_stats,
    ),
    "navier_stokes": (
        navier_stokes, ("t", "x", "y"), navier_stokes_stats, _three_term_from_stats,
    ),
    "wave_averaged": (
        wave_averaged, ("x", "y"), wave_averaged_stats, _three_term_from_stats,
    ),
}


def _lookup(name: str):
    try:
        return EQUATIONS[name]
    except KeyError:
        raise KeyError(
            f"unknown physics equation {name!r}; available: {sorted(EQUATIONS)}"
        ) from None


def required_grad_coords(name: str) -> tuple[str, ...]:
    return _lookup(name)[1]


def residual_loss(name: str):
    """Look up a residual loss by its config name."""
    return _lookup(name)[0]


def residual_stats(name: str):
    """Sufficient-statistics form: ``stats_fn(coords, fields, grads, ...)``."""
    return _lookup(name)[2]


def residual_from_stats(name: str):
    """Combiner: ``loss = combine(tree-summed stats)``."""
    return _lookup(name)[3]
