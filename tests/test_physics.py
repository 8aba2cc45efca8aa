"""Residual-library parity against a reverse-mode PyTorch oracle.

The oracle recomputes each reference equation with nested ``autograd.grad``
(float64); the JAX side computes the same losses from one fused
forward-with-tangents pass (float32). Agreement across random networks and
random collocation points validates both the derivative engine and the
equation algebra (SURVEY.md §4 'Unit'/'Parity').
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from pinn_depthestimation_tpu import physics
from pinn_depthestimation_tpu.models import MLPSpec, init_mlp_params, mlp_apply_with_tangents
from tests.oracles import torch_reference as oracle

RTOL = 5e-4


def _setup(d_in, d_out, seed, n=64, coords_scale=1.0):
    spec = MLPSpec(sizes=(d_in, 16, 16, 16, d_out), init_type="xavier")
    params = init_mlp_params(jax.random.PRNGKey(seed), spec)
    coords = np.random.RandomState(seed).uniform(-1, 1, (n, d_in)) * coords_scale
    model = oracle.build_torch_mlp(jax.tree.map(np.asarray, params))
    apply_fn = functools.partial(mlp_apply_with_tangents, params, spec=spec)
    apply_with_tangents = lambda x, t: apply_fn(x, t)  # noqa: E731
    return spec, params, coords, model, apply_with_tangents


def _jax_bundle(apply_with_tangents, coords, input_names, grad_coords, output_names):
    return physics.model_fields_and_grads(
        apply_with_tangents, jnp.asarray(coords, jnp.float32),
        input_names, grad_coords, output_names,
    )


def test_continuity_only_matches_oracle():
    _, _, coords, model, awt = _setup(2, 3, seed=0)
    c, f, g = _jax_bundle(awt, coords, ["x", "y"], ["x", "y"], ["U", "V", "h"])
    loss_jax = float(physics.continuity_only(c, f, g))

    cols = oracle.make_coord_cols(coords)
    out = oracle.predict_columns(model, cols)
    U, V, h = out[:, 0:1], out[:, 1:2], out[:, 2:3]
    loss_torch = float(oracle.loss_continuity_only(cols[0], cols[1], h, U, V))
    assert loss_jax == pytest.approx(loss_torch, rel=RTOL)


def test_continuity_only_anchor_selects_by_threshold():
    """With physical x (some > 25.5) the anchor must restrict to the subset."""
    _, _, coords, model, awt = _setup(2, 3, seed=1)
    coords = coords.copy()
    coords[:, 0] = coords[:, 0] * 4 + 25.5  # half below, half above 25.5
    c, f, g = _jax_bundle(awt, coords, ["x", "y"], ["x", "y"], ["U", "V", "h"])
    loss_jax = float(physics.continuity_only(c, f, g))

    cols = oracle.make_coord_cols(coords)
    out = oracle.predict_columns(model, cols)
    U, V, h = out[:, 0:1], out[:, 1:2], out[:, 2:3]
    loss_torch = float(oracle.loss_continuity_only(cols[0], cols[1], h, U, V))
    assert loss_jax == pytest.approx(loss_torch, rel=RTOL)


def test_continuity_ftemp_matches_oracle():
    _, _, coords, model, awt = _setup(2, 3, seed=2)
    c, f, g = _jax_bundle(awt, coords, ["x", "y"], ["x", "y"], ["U", "V", "h"])
    loss_jax = float(physics.continuity_ftemp(c, f, g))

    cols = oracle.make_coord_cols(coords)
    out = oracle.predict_columns(model, cols)
    U, V, h = out[:, 0:1], out[:, 1:2], out[:, 2:3]
    loss_torch = float(oracle.loss_continuity_ftemp(cols[0], cols[1], h, U, V))
    assert loss_jax == pytest.approx(loss_torch, rel=RTOL)


def test_navier_stokes_matches_oracle():
    # legacy-style net: (t, x, y) + extra non-grad input -> (h, z, u, v)
    _, _, coords, model, awt = _setup(3, 4, seed=3)
    c, f, g = _jax_bundle(awt, coords, ["t", "x", "y"], ["t", "x", "y"], ["h", "z", "u", "v"])
    loss_jax = float(physics.navier_stokes(c, f, g))

    cols = oracle.make_coord_cols(coords)
    out = oracle.predict_columns(model, cols)
    h, z, u, v = (out[:, i : i + 1] for i in range(4))
    loss_torch = float(oracle.loss_navier_stokes(cols[0], cols[1], cols[2], h, z, u, v))
    assert loss_jax == pytest.approx(loss_torch, rel=RTOL)


def test_wave_averaged_matches_oracle_parity_mode():
    _, _, coords, model, awt = _setup(2, 6, seed=4)
    names = ["h", "U", "V", "eta_mean", "Hrms", "k"]
    c, f, g = _jax_bundle(awt, coords, ["x", "y"], ["x", "y"], names)
    loss_jax = float(physics.wave_averaged(c, f, g, parity=True))

    cols = oracle.make_coord_cols(coords)
    out = oracle.predict_columns(model, cols)
    h, U, V, eta, hrms, k = (out[:, i : i + 1] for i in range(6))
    loss_torch = float(oracle.loss_wave_averaged(cols[0], cols[1], h, U, V, eta, hrms, k))
    assert loss_jax == pytest.approx(loss_torch, rel=RTOL)


def test_wave_averaged_matches_oracle_corrected_mode():
    """Corrected mode (parity=False, E = rho*g*Hrms^2/8) vs a torch-f64 oracle
    of the intended equation — the CMB pipeline's default physics un-pinned
    from continuity (VERDICT r3 weak #1)."""
    _, _, coords, model, awt = _setup(2, 6, seed=4)
    names = ["h", "U", "V", "eta_mean", "Hrms", "k"]
    c, f, g = _jax_bundle(awt, coords, ["x", "y"], ["x", "y"], names)
    loss_jax = float(physics.wave_averaged(c, f, g, parity=False))

    cols = oracle.make_coord_cols(coords)
    out = oracle.predict_columns(model, cols)
    h, U, V, eta, hrms, k = (out[:, i : i + 1] for i in range(6))
    loss_torch = float(oracle.loss_wave_averaged(
        cols[0], cols[1], h, U, V, eta, hrms, k, corrected=True))
    assert loss_jax == pytest.approx(loss_torch, rel=RTOL)


def test_wave_averaged_corrected_param_grads_match_f64_oracle():
    """f32 parameter GRADIENTS of the corrected-mode wave_averaged loss vs the
    torch-f64 oracle's autograd — the round-3c conditioning soft spot, now
    bounded: with the stable radiation-stress formulation (physics.py::
    _t_over_sinh) the measured per-leaf max-scaled gap is ~0.01% at this
    configuration (worst adversarial init measured: 0.19%,
    .soak/wave_grad_cond.py)."""
    spec, params, coords, model, _ = _setup(2, 6, seed=4)
    names = ["h", "U", "V", "eta_mean", "Hrms", "k"]

    def loss(p):
        awt = lambda x, t: mlp_apply_with_tangents(p, x, t, spec)  # noqa: E731
        c, f, g = physics.model_fields_and_grads(
            awt, jnp.asarray(coords, jnp.float32), ["x", "y"], ["x", "y"], names
        )
        return physics.wave_averaged(c, f, g, parity=False)

    g_jax = jax.grad(loss)(params)

    cols = oracle.make_coord_cols(coords)
    out = oracle.predict_columns(model, cols)
    h, U, V, eta, hrms, k = (out[:, i : i + 1] for i in range(6))
    loss_t = oracle.loss_wave_averaged(
        cols[0], cols[1], h, U, V, eta, hrms, k, corrected=True)
    loss_t.backward()
    linears = [m for m in model if isinstance(m, torch.nn.Linear)]
    g_torch = {
        "w_in": linears[0].weight.grad.numpy().T,
        "b_in": linears[0].bias.grad.numpy(),
        "w_hidden": np.stack([l.weight.grad.numpy().T for l in linears[1:-1]]),
        "b_hidden": np.stack([l.bias.grad.numpy() for l in linears[1:-1]]),
        "w_out": linears[-1].weight.grad.numpy().T,
        "b_out": linears[-1].bias.grad.numpy(),
    }
    for key, ref in g_torch.items():
        ours = np.asarray(g_jax[key], np.float64)
        scale = np.abs(ref).max() + 1e-12
        np.testing.assert_allclose(ours / scale, ref / scale, atol=5e-3,
                                   err_msg=key)


def test_t_over_sinh_stable_values_and_derivatives():
    """physics._t_over_sinh: values match the naive quotient to roundoff at
    moderate t, and f32 DERIVATIVES stay accurate at small t where AD through
    the naive quotient suffers catastrophic cancellation (measured 46% rel
    error at t=1e-3 — the radiation-stress gradient hazard)."""
    naive64 = lambda t: t / np.sinh(t)  # noqa: E731

    # values, f32, across the branch seam and into the direct branch
    ts = np.asarray([1e-4, 0.01, 0.3, 0.499, 0.5, 0.501, 1.0, 5.0, 20.0],
                    np.float32)
    got = np.asarray(physics._t_over_sinh(jnp.asarray(ts)), np.float64)
    np.testing.assert_allclose(got, naive64(ts.astype(np.float64)), rtol=2e-6)

    # f32 derivative at small t vs the analytic d/dt[t/sinh t] (f64)
    d_true = lambda t: (np.sinh(t) - t * np.cosh(t)) / np.sinh(t) ** 2  # noqa: E731
    d_stable = jax.vmap(jax.grad(physics._t_over_sinh))
    small = np.asarray([3e-4, 1e-3, 3e-3, 1e-2, 0.05, 0.2], np.float32)
    got_d = np.asarray(d_stable(jnp.asarray(small)), np.float64)
    np.testing.assert_allclose(got_d, d_true(small.astype(np.float64)),
                               rtol=1e-4)

    # ... and the naive f32 quotient really does fail there (the hazard the
    # stable form removes; guards against someone "simplifying" it back)
    d_naive = jax.vmap(jax.grad(lambda t: t / jnp.sinh(t)))
    err = np.abs(np.asarray(d_naive(jnp.asarray(small[:2])), np.float64)
                 - d_true(small[:2].astype(np.float64)))
    rel = err / np.abs(d_true(small[:2].astype(np.float64)))
    assert rel.max() > 0.05, rel

    # second-order AD (the training path differentiates the residual again)
    dd = jax.vmap(jax.grad(jax.grad(physics._t_over_sinh)))
    got_dd = np.asarray(dd(jnp.asarray(small)), np.float64)
    # analytic d2/dt2 [t/sinh t] = -1/3 + 7t^2/30 + O(t^4) near 0
    approx = -1.0 / 3.0 + 7.0 * small.astype(np.float64) ** 2 / 30.0
    np.testing.assert_allclose(got_dd[:4], approx[:4], rtol=1e-3)


def test_radiation_stress_quirk():
    """Parity mode: E underflows to zero so the stress terms vanish; corrected
    mode restores them (SURVEY.md §5 quirk 1)."""
    # First confirm the reference expression itself underflows.
    rho, g = 1025, 9.81
    assert 1 / 8**rho * g * 0.5**2 == 0.0

    _, _, coords, _, awt = _setup(2, 6, seed=5)
    names = ["h", "U", "V", "eta_mean", "Hrms", "k"]
    c, f, g_ = _jax_bundle(awt, coords, ["x", "y"], ["x", "y"], names)
    loss_parity = float(physics.wave_averaged(c, f, g_, parity=True))
    loss_fixed = float(physics.wave_averaged(c, f, g_, parity=False))
    assert np.isfinite(loss_parity) and np.isfinite(loss_fixed)
    assert loss_parity != loss_fixed  # stresses actually contribute when fixed


def test_masked_mean_matches_subset():
    _, _, coords, _, awt = _setup(2, 3, seed=6, n=40)
    names = ["U", "V", "h"]
    mask = np.zeros(40, dtype=bool)
    mask[:25] = True

    c, f, g = _jax_bundle(awt, coords, ["x", "y"], ["x", "y"], names)
    masked = float(physics.continuity_ftemp(c, f, g, mask=jnp.asarray(mask)))

    c2, f2, g2 = _jax_bundle(awt, coords[:25], ["x", "y"], ["x", "y"], names)
    subset = float(physics.continuity_ftemp(c2, f2, g2))
    assert masked == pytest.approx(subset, rel=1e-5)


def test_residual_registry():
    assert physics.required_grad_coords("navier_stokes") == ("t", "x", "y")
    assert physics.residual_loss("continuity_only") is physics.continuity_only
    with pytest.raises(KeyError, match="unknown physics"):
        physics.residual_loss("nope")


def test_grad_wrt_params_flows_through_residual():
    """The whole residual pipeline must be reverse-differentiable w.r.t.
    parameters (this is the training path)."""
    spec = MLPSpec(sizes=(2, 8, 8, 3), init_type="xavier")
    params = init_mlp_params(jax.random.PRNGKey(7), spec)
    coords = jnp.asarray(np.random.RandomState(7).uniform(-1, 1, (32, 2)), jnp.float32)

    def loss(p):
        awt = lambda x, t: mlp_apply_with_tangents(p, x, t, spec)  # noqa: E731
        c, f, g = physics.model_fields_and_grads(
            awt, coords, ["x", "y"], ["x", "y"], ["U", "V", "h"]
        )
        return physics.continuity_only(c, f, g)

    grads = jax.grad(loss)(params)
    flat = np.concatenate([np.asarray(v).ravel() for v in jax.tree.leaves(grads)])
    assert np.isfinite(flat).all()
    assert np.abs(flat).max() > 0
