"""Chunked (gradient-accumulation) residual evaluation == full-batch, exactly
up to f32 reduction order. This is the mechanism that lets 10M+ collocation
points train within HBM (BASELINE.md scaled case)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pinn_depthestimation_tpu.config import parse_config
from pinn_depthestimation_tpu.models import MLPSpec, init_mlp_params
from pinn_depthestimation_tpu.training import build_loss_fn
from pinn_depthestimation_tpu.utils import synthetic


def _cfg(tmp_path, physics_name="continuity_only", **extra):
    mat = str(tmp_path / "d.mat")
    synthetic.make_newmethod_mat(mat, nx=13, ny=11, nan_fraction=0.0, seed=3)
    raw = {
        "layers": {"input_features": 2, "hidden_layers": 3, "hidden_width": 12,
                   "output_features": 3, "dropout_rate": 0.0, "init_type": "xavier"},
        "adam_optimizer": {"max_it": 5, "learning_rate": 1e-3,
                           "scheduler_step_size": 5, "scheduler_gamma": 0.8},
        "lbfgs_optimizer": {"max_it": 0, "learning_rate": 1, "max_evaluation": 0,
                            "history_size": 5, "tolerance_grad": 1e-9,
                            "tolerance_change": 1e-12, "line_search_fn": "strong_wolfe"},
        "loss": {"weight_fid_loss": 1, "weight_res_loss": 1},
        "physics": physics_name,
        "data": {"file": mat,
                 "inputs": {"x": {"requires_grad": ["true"]},
                            "y": {"requires_grad": ["true"]}},
                 "trues": ["U", "V"], "unknowns": ["h"]},
    }
    raw.update(extra)
    return parse_config(raw)


def _batch(cfg):
    from pinn_depthestimation_tpu import data as data_mod

    td = data_mod.load_training_data(cfg)
    return {
        "fidelity_input": jnp.asarray(td.fidelity_input),
        "fidelity_true": jnp.asarray(td.fidelity_true),
        "residual_input": jnp.asarray(td.residual_input),
    }


@pytest.mark.parametrize("physics_name", ["continuity_only", "continuity_ftemp"])
@pytest.mark.parametrize("chunk", [17, 64, 143])  # incl. non-divisors -> padding
def test_chunked_equals_full(tmp_path, physics_name, chunk):
    cfg = _cfg(tmp_path, physics_name)
    spec = MLPSpec.from_layers(cfg.layers)
    params = init_mlp_params(jax.random.PRNGKey(0), spec)
    batch = _batch(cfg)  # 143 residual points

    full = build_loss_fn(cfg, spec)
    chunked = build_loss_fn(cfg, spec, residual_chunk_size=chunk)

    (t_full, (f_full, r_full)), g_full = jax.value_and_grad(full, has_aux=True)(params, batch)
    (t_ch, (f_ch, r_ch)), g_ch = jax.value_and_grad(chunked, has_aux=True)(params, batch)

    np.testing.assert_allclose(float(r_ch), float(r_full), rtol=1e-6)
    np.testing.assert_allclose(float(t_ch), float(t_full), rtol=1e-6)
    for k in g_full:
        np.testing.assert_allclose(
            np.asarray(g_ch[k]), np.asarray(g_full[k]), rtol=1e-4, atol=1e-7
        )


def test_chunked_with_mask(tmp_path):
    cfg = _cfg(tmp_path)
    spec = MLPSpec.from_layers(cfg.layers)
    params = init_mlp_params(jax.random.PRNGKey(1), spec)
    batch = _batch(cfg)
    n = batch["residual_input"].shape[0]
    mask = jnp.asarray((np.arange(n) % 3 != 0).astype(np.float32))
    batch_masked = dict(batch, residual_mask=mask, fidelity_mask=jnp.ones(n))

    full = build_loss_fn(cfg, spec)
    chunked = build_loss_fn(cfg, spec, residual_chunk_size=32)
    t_full, _ = full(params, batch_masked)
    t_ch, _ = chunked(params, batch_masked)
    np.testing.assert_allclose(float(t_ch), float(t_full), rtol=1e-6)


def test_stats_forms_match_losses(tmp_path):
    """Every equation: combine(stats) == direct loss on the same bundle."""
    import functools

    from pinn_depthestimation_tpu import physics
    from pinn_depthestimation_tpu.models import mlp_apply_with_tangents

    rs = np.random.RandomState(5)
    for name, d_in, outs in [
        ("continuity_only", 2, ["U", "V", "h"]),
        ("continuity_ftemp", 2, ["U", "V", "h"]),
        ("navier_stokes", 3, ["h", "z", "u", "v"]),
        ("wave_averaged", 2, ["h", "U", "V", "eta_mean", "Hrms", "k"]),
    ]:
        spec = MLPSpec(sizes=(d_in, 14, 14, len(outs)), init_type="xavier")
        params = init_mlp_params(jax.random.PRNGKey(hash(name) % 2**31), spec)
        coords = jnp.asarray(rs.uniform(-1, 1, (50, d_in)), jnp.float32)
        names = ["t", "x", "y"][:d_in] if d_in == 3 else ["x", "y"]
        awt = functools.partial(mlp_apply_with_tangents, params, spec=spec)
        c, f, g = physics.model_fields_and_grads(
            awt, coords, names, list(physics.required_grad_coords(name)), outs
        )
        direct = physics.residual_loss(name)(c, f, g, parity=True)
        stats = physics.residual_stats(name)(c, f, g, parity=True)
        via_stats = physics.residual_from_stats(name)(stats)
        np.testing.assert_allclose(float(via_stats), float(direct), rtol=1e-6)


def test_config_key_round_trips(tmp_path):
    cfg = _cfg(tmp_path, residual_chunk_size=4096)
    assert cfg.residual_chunk_size == 4096


def test_corrected_anchor_mode(tmp_path):
    """parity=False maps the physical anchor threshold into normalized space
    so it selects the intended subset (SURVEY.md §5 quirk 2)."""
    cfg_parity = _cfg(tmp_path)
    cfg_fixed = _cfg(tmp_path, parity=False)
    spec = MLPSpec.from_layers(cfg_parity.layers)
    params = init_mlp_params(jax.random.PRNGKey(2), spec)
    batch = _batch(cfg_parity)
    mm = {"x": (25.0, 33.0), "y": (-13.0, 13.0)}

    loss_parity = build_loss_fn(cfg_parity, spec, input_min_max=mm)
    loss_fixed = build_loss_fn(cfg_fixed, spec, input_min_max=mm)
    t_p, (_, r_p) = loss_parity(params, batch)
    t_f, (_, r_f) = loss_fixed(params, batch)
    # parity mode anchors on ALL points, corrected mode only on x < 25.5 m
    # (a 1/16 slice of the synthetic domain) -> different residual losses
    assert float(r_p) != pytest.approx(float(r_f), rel=1e-6)

    # corrected threshold in normalized space: 2*(25.5-25)/8-1 = -0.875;
    # chunked evaluation must agree with unchunked in corrected mode too
    chunked = build_loss_fn(cfg_fixed, spec, residual_chunk_size=32, input_min_max=mm)
    t_c, _ = chunked(params, batch)
    np.testing.assert_allclose(float(t_c), float(t_f), rtol=1e-6)


def test_chunked_shared_fidelity_stays_chunked(tmp_path, monkeypatch):
    """With the newmethod shared-points contract, the chunked path must fold
    the fidelity term into the chunked sweep — a separate full-batch
    differentiated fidelity forward over the same rows would re-pay exactly
    the activation memory residual_chunk_size exists to bound."""
    import pinn_depthestimation_tpu.training.loss as loss_mod

    cfg = _cfg(tmp_path)
    spec = MLPSpec.from_layers(cfg.layers)
    params = init_mlp_params(jax.random.PRNGKey(5), spec)
    batch = _batch(cfg)
    mm = {"x": (25.0, 33.0), "y": (-13.0, 13.0)}

    plain = build_loss_fn(cfg, spec, input_min_max=mm,
                          fidelity_is_residual=True)
    t_plain, (f_plain, r_plain) = plain(params, batch)

    def boom(*a, **k):
        raise AssertionError(
            "full-batch fidelity forward called on the chunked shared path"
        )

    monkeypatch.setattr(loss_mod, "mlp_apply", boom)
    chunked = build_loss_fn(cfg, spec, residual_chunk_size=32,
                            input_min_max=mm, fidelity_is_residual=True)
    t_c, (f_c, r_c) = chunked(params, batch)   # must not touch mlp_apply
    np.testing.assert_allclose(float(t_c), float(t_plain), rtol=2e-6)
    np.testing.assert_allclose(float(f_c), float(f_plain), rtol=2e-6)
    np.testing.assert_allclose(float(r_c), float(r_plain), rtol=2e-6)
    # grads agree too (the term is differentiated through the chunk sweep)
    g_p = jax.grad(lambda p: plain(p, batch)[0])(params)
    monkeypatch.setattr(loss_mod, "mlp_apply", boom)
    g_c = jax.grad(lambda p: chunked(p, batch)[0])(params)
    for k in g_p:
        a, b = np.asarray(g_p[k]), np.asarray(g_c[k])
        if a.size:
            scale = np.abs(a).max() + 1e-12
            np.testing.assert_allclose(b / scale, a / scale, atol=1e-5)
    # the separate-points contract still uses the fidelity forward
    sep = build_loss_fn(cfg, spec, residual_chunk_size=32, input_min_max=mm)
    with pytest.raises(AssertionError, match="full-batch fidelity"):
        sep(params, batch)


def test_corrected_anchor_requires_bounds(tmp_path):
    """parity=false continuity_only without input_min_max must fail loudly
    instead of silently reproducing the quirk-2 anchor behavior."""
    cfg_fixed = _cfg(tmp_path, parity=False)
    spec = MLPSpec.from_layers(cfg_fixed.layers)
    with pytest.raises(ValueError, match="input_min_max"):
        build_loss_fn(cfg_fixed, spec)
    with pytest.raises(ValueError, match="input_min_max"):
        build_loss_fn(cfg_fixed, spec, input_min_max={"x": (3.0, 3.0)})
