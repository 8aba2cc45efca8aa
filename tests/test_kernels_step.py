"""One-kernel training step (ops/kernels_step.py) vs the generic
value_and_grad of the loss builder — interpret mode."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pinn_depthestimation_tpu import data as data_mod
from pinn_depthestimation_tpu.config import parse_config
from pinn_depthestimation_tpu.models import MLPSpec, init_mlp_params
from pinn_depthestimation_tpu.ops.kernels_step import fused_loss_and_grad
from pinn_depthestimation_tpu.training import build_loss_fn
from pinn_depthestimation_tpu.training.loss import build_value_and_grad_fn
from pinn_depthestimation_tpu.utils import synthetic


def _newmethod_cfg(tmp_path, **extra):
    mat = str(tmp_path / "d.mat")
    synthetic.make_newmethod_mat(mat, nx=12, ny=10, nan_fraction=0.15, seed=3)
    raw = {
        "layers": {"input_features": 2, "hidden_layers": 4, "hidden_width": 20,
                   "output_features": 3, "dropout_rate": 0.0, "init_type": "xavier"},
        "adam_optimizer": {"max_it": 3, "learning_rate": 1e-3,
                           "scheduler_step_size": 5, "scheduler_gamma": 0.8},
        "lbfgs_optimizer": {"max_it": 0, "learning_rate": 1, "max_evaluation": 0,
                            "history_size": 5, "tolerance_grad": 1e-9,
                            "tolerance_change": 1e-12, "line_search_fn": "strong_wolfe"},
        "loss": {"weight_fid_loss": 1, "weight_res_loss": 1},
        "data": {"file": mat,
                 "inputs": {"x": {"requires_grad": ["true"]},
                            "y": {"requires_grad": ["true"]}},
                 "trues": ["U", "V"], "unknowns": ["h"]},
    }
    raw.update(extra)
    return parse_config(raw)


def _grads_close(a, b, tol):
    for k in a:
        x, y = np.asarray(a[k]), np.asarray(b[k])
        if x.size == 0:
            continue
        scale = np.abs(x).max() + 1e-12
        np.testing.assert_allclose(y / scale, x / scale, atol=tol, err_msg=k)


@pytest.mark.parametrize("physics_name", ["continuity_only", "continuity_ftemp"])
def test_fused_step_matches_loss_builder(tmp_path, physics_name):
    """((total,(fid,res)), grads) equals jax.value_and_grad of the shared
    loss builder path through a real newmethod config + loader."""
    cfg = _newmethod_cfg(tmp_path, physics=physics_name)
    spec = MLPSpec.from_layers(cfg.layers)
    params = init_mlp_params(jax.random.PRNGKey(0), spec)
    td = data_mod.load_training_data(cfg)
    assert td.fidelity_is_residual
    batch = {"fidelity_input": jnp.asarray(td.fidelity_input),
             "fidelity_true": jnp.asarray(td.fidelity_true),
             "residual_input": jnp.asarray(td.residual_input)}

    kw = dict(fused_kernel=True, fused_interpret=True,
              fidelity_is_residual=True, input_min_max=td.input_min_max)
    loss_fn = build_loss_fn(cfg, spec, **kw)
    vg = build_value_and_grad_fn(cfg, spec, **kw)
    assert vg is not None
    (t1, (f1, r1)), g1 = jax.value_and_grad(loss_fn, has_aux=True)(params, batch)
    (t2, (f2, r2)), g2 = vg(params, batch)
    assert float(t2) == pytest.approx(float(t1), rel=1e-5)
    assert float(f2) == pytest.approx(float(f1), rel=1e-5)
    assert float(r2) == pytest.approx(float(r1), rel=1e-5)
    _grads_close(g1, g2, 2e-5)


def test_fused_step_adam_trajectory_matches(tmp_path):
    """Three Adam steps through the one-kernel path track the generic path."""
    import optax

    cfg = _newmethod_cfg(tmp_path)
    spec = MLPSpec.from_layers(cfg.layers)
    td = data_mod.load_training_data(cfg)
    batch = {"fidelity_input": jnp.asarray(td.fidelity_input),
             "fidelity_true": jnp.asarray(td.fidelity_true),
             "residual_input": jnp.asarray(td.residual_input)}
    kw = dict(fused_kernel=True, fused_interpret=True,
              fidelity_is_residual=True, input_min_max=td.input_min_max)
    loss_fn = build_loss_fn(cfg, spec, **kw)
    vg_ref = lambda p, b, rng=None: jax.value_and_grad(  # noqa: E731
        loss_fn, has_aux=True)(p, b, rng)
    vg_fused = build_value_and_grad_fn(cfg, spec, **kw)

    opt = optax.adam(1e-3)
    for vg, out in ((vg_ref, []), (vg_fused, [])):
        params = init_mlp_params(jax.random.PRNGKey(1), spec)
        state = opt.init(params)
        for _ in range(3):
            (total, _), grads = vg(params, batch)
            updates, state = opt.update(grads, state, params)
            params = optax.apply_updates(params, updates)
            out.append(float(total))
        if vg is vg_ref:
            ref_losses = out
        else:
            fused_losses = out
    np.testing.assert_allclose(fused_losses, ref_losses, rtol=1e-4)


def test_fused_step_masked_and_f32x3():
    """Direct oracle check with a nontrivial mask, partial anchor selection,
    non-unit weights, and the f32x3 tier."""
    from pinn_depthestimation_tpu import physics
    from pinn_depthestimation_tpu.models import mlp_apply_with_tangents

    spec = MLPSpec(sizes=(2,) + (20,) * 5 + (3,), init_type="xavier")
    params = init_mlp_params(jax.random.PRNGKey(0), spec)
    rs = np.random.RandomState(1)
    n = 217
    coords = jnp.asarray(rs.uniform(-1, 1, (n, 2)), jnp.float32)
    trues = jnp.asarray(rs.randn(n, 2).astype(np.float32) * 0.1)
    mask = jnp.asarray((rs.rand(n) > 0.1).astype(np.float32))
    sel = (coords[:, 0] < 0.3).astype(jnp.float32) * mask
    w_fid, w_res = 0.7, 1.3
    fidw = jnp.asarray([1.0, 2.0], jnp.float32)

    def ref_loss(p):
        tang = jnp.stack(
            [jnp.zeros_like(coords).at[:, c].set(1.0) for c in range(2)]
        )
        y, dy = mlp_apply_with_tangents(p, coords, tang, spec)
        fields = {"U": y[:, 0], "V": y[:, 1], "h": y[:, 2]}
        grads = {
            "x": {"U": dy[0, :, 0], "V": dy[0, :, 1], "h": dy[0, :, 2]},
            "y": {"U": dy[1, :, 0], "V": dy[1, :, 1], "h": dy[1, :, 2]},
        }
        fc = physics.continuity_only_residuals(fields, grads)
        res = (jnp.sum(fc**2 * mask) / jnp.sum(mask)
               + jnp.sum(sel * (fields["h"] - 0.6) ** 2) / jnp.sum(sel))
        err2 = (trues - y[:, :2]) ** 2
        fid = jnp.sum(fidw * jnp.sum(err2 * mask[:, None], 0) / jnp.sum(mask))
        return w_fid * fid + w_res * res, (fid, res)

    (t1, (f1, r1)), g1 = jax.value_and_grad(ref_loss, has_aux=True)(params)
    for precision, tol in (("f32", 2e-5), ("f32x3", 1e-4)):
        (t2, (f2, r2)), g2 = fused_loss_and_grad(
            params, coords, trues, sel, mask, fidw, spec, 2, w_fid, w_res,
            anchor_depth=0.6, has_anchor=True, precision=precision,
            interpret=True,
        )
        assert float(t2) == pytest.approx(float(t1), rel=1e-3 if precision == "f32x3" else 1e-5)
        assert float(f2) == pytest.approx(float(f1), rel=1e-3)
        assert float(r2) == pytest.approx(float(r1), rel=1e-3)
        _grads_close(g1, g2, tol)


@pytest.mark.parametrize(
    "width,depth,n_true,has_anchor,precision,tol",
    [
        (17, 4, 2, True, "f32", 3e-5),    # odd (non-8-multiple) width
        (24, 9, 1, False, "f32", 3e-5),   # one fidelity head, no anchor term
        (20, 12, 3, False, "f32", 3e-5),  # all three heads observed, deep>ring
        (20, 5, 2, True, "bf16", 4e-2),   # bf16 tier of the step
    ],
)
def test_fused_step_edge_shapes(width, depth, n_true, has_anchor, precision, tol):
    """Oracle check across step-kernel edge shapes: odd widths, depths past
    the DMA ring, 1/3 fidelity heads, anchorless losses, the bf16 tier."""
    from pinn_depthestimation_tpu import physics
    from pinn_depthestimation_tpu.models import mlp_apply_with_tangents

    spec = MLPSpec(sizes=(2,) + (width,) * (depth + 1) + (3,), init_type="xavier")
    params = init_mlp_params(jax.random.PRNGKey(2), spec)
    rs = np.random.RandomState(7)
    n = 163
    coords = jnp.asarray(rs.uniform(-1, 1, (n, 2)), jnp.float32)
    trues = jnp.asarray(rs.randn(n, n_true).astype(np.float32) * 0.1)
    mask = jnp.asarray((rs.rand(n) > 0.1).astype(np.float32))
    sel = (coords[:, 0] < 0.3).astype(jnp.float32) * mask
    w_fid, w_res = 0.7, 1.3
    fidw = jnp.asarray(rs.uniform(0.5, 2.0, n_true), jnp.float32)

    def ref_loss(p):
        tang = jnp.stack(
            [jnp.zeros_like(coords).at[:, c].set(1.0) for c in range(2)]
        )
        y, dy = mlp_apply_with_tangents(p, coords, tang, spec)
        fields = {"U": y[:, 0], "V": y[:, 1], "h": y[:, 2]}
        grads = {
            "x": {"U": dy[0, :, 0], "V": dy[0, :, 1], "h": dy[0, :, 2]},
            "y": {"U": dy[1, :, 0], "V": dy[1, :, 1], "h": dy[1, :, 2]},
        }
        fc = physics.continuity_only_residuals(fields, grads)
        res = jnp.sum(fc**2 * mask) / jnp.sum(mask)
        if has_anchor:
            res = res + jnp.sum(sel * (fields["h"] - 0.6) ** 2) / jnp.sum(sel)
        err2 = (trues - y[:, :n_true]) ** 2
        fid = jnp.sum(fidw * jnp.sum(err2 * mask[:, None], 0) / jnp.sum(mask))
        return w_fid * fid + w_res * res, (fid, res)

    (t1, (f1, r1)), g1 = jax.value_and_grad(ref_loss, has_aux=True)(params)
    (t2, (f2, r2)), g2 = fused_loss_and_grad(
        params, coords, trues, sel, mask, fidw, spec, n_true, w_fid, w_res,
        anchor_depth=0.6, has_anchor=has_anchor, precision=precision,
        interpret=True,
    )
    rel = 1e-2 if precision == "bf16" else 1e-4
    assert float(t2) == pytest.approx(float(t1), rel=rel)
    assert float(f2) == pytest.approx(float(f1), rel=rel)
    assert float(r2) == pytest.approx(float(r1), rel=rel)
    _grads_close(g1, g2, tol)


def test_fused_step_rejects_anchored_three_heads():
    """The anchor selector shares the packed h obs column; an anchored
    3-head call must be refused loudly instead of silently corrupting the
    h fidelity term (build_value_and_grad_fn gates this to the generic
    path; the raw API raises)."""
    spec = MLPSpec(sizes=(2,) + (20,) * 4 + (3,), init_type="xavier")
    params = init_mlp_params(jax.random.PRNGKey(0), spec)
    n = 16
    coords = jnp.zeros((n, 2), jnp.float32)
    trues = jnp.zeros((n, 3), jnp.float32)
    ones = jnp.ones((n,), jnp.float32)
    with pytest.raises(ValueError, match="anchor selector"):
        fused_loss_and_grad(
            params, coords, trues, ones, ones, jnp.ones((3,), jnp.float32),
            spec, 3, 1.0, 1.0, has_anchor=True, interpret=True,
        )


def test_build_value_and_grad_fn_gating(tmp_path):
    """The one-kernel path declines unsupported configurations."""
    cfg = _newmethod_cfg(tmp_path)
    spec = MLPSpec.from_layers(cfg.layers)
    base = dict(fused_kernel=True, fused_interpret=True, fidelity_is_residual=True)
    assert build_value_and_grad_fn(cfg, spec, **base) is not None
    # fused kernels off
    assert build_value_and_grad_fn(
        cfg, spec, **{**base, "fused_kernel": False}) is None
    # separate fidelity points (CMB contract)
    assert build_value_and_grad_fn(
        cfg, spec, **{**base, "fidelity_is_residual": False}) is None
    # dropout
    spec_do = MLPSpec(sizes=spec.sizes, init_type=spec.init_type, dropout_rate=0.1)
    assert build_value_and_grad_fn(cfg, spec_do, **base) is None
    # unsupported physics
    cfg_ns = _newmethod_cfg(tmp_path, physics="navier_stokes")
    assert build_value_and_grad_fn(cfg_ns, spec, **base) is None


@pytest.mark.parametrize("n_dev", [5, 8])
def test_fused_step_sharded_matches_plain(tmp_path, n_dev):
    """The shard_map one-kernel step equals the plain single-device step —
    loss terms AND gradients (psum'd partial sums with global cotangent
    scales) — across mesh sizes with different padding remainders (the
    point count divides neither 5 nor 8)."""
    from pinn_depthestimation_tpu import parallel
    from pinn_depthestimation_tpu.training.loss import build_value_and_grad_fn

    if len(jax.devices()) < n_dev:
        pytest.skip("needs the 8-virtual-device CPU mesh")
    cfg = _newmethod_cfg(tmp_path)
    spec = MLPSpec.from_layers(cfg.layers)
    params = init_mlp_params(jax.random.PRNGKey(4), spec)
    td = data_mod.load_training_data(cfg)
    host_batch = {"fidelity_input": td.fidelity_input,
                  "fidelity_true": td.fidelity_true,
                  "residual_input": td.residual_input}
    assert td.residual_input.shape[0] % n_dev != 0  # padding exercised
    mesh = parallel.make_mesh(n_dev, devices=jax.devices()[:n_dev])
    sharded_batch = parallel.shard_batch(host_batch, mesh)
    plain_batch = {k: jnp.asarray(v) for k, v in host_batch.items()}

    base = dict(fused_kernel=True, fused_interpret=True,
                fidelity_is_residual=True, input_min_max=td.input_min_max)
    vg_plain = build_value_and_grad_fn(cfg, spec, **base)
    vg_shard = build_value_and_grad_fn(cfg, spec, **base, mesh=mesh)
    (t1, (f1, r1)), g1 = vg_plain(params, plain_batch)
    (t2, (f2, r2)), g2 = jax.jit(vg_shard)(params, sharded_batch)
    assert float(t2) == pytest.approx(float(t1), rel=1e-6)
    assert float(f2) == pytest.approx(float(f1), rel=1e-6)
    assert float(r2) == pytest.approx(float(r1), rel=1e-6)
    _grads_close(g1, g2, 1e-6)


def test_lbfgs_runner_accepts_value_and_grad_fn(tmp_path):
    """LBFGSRunner(value_and_grad_fn=...) reproduces the default path
    bit-for-bit when handed the same mathematical function."""
    from pinn_depthestimation_tpu.optim import lbfgs as lbfgs_mod

    cfg = _newmethod_cfg(tmp_path)
    spec = MLPSpec.from_layers(cfg.layers)
    td = data_mod.load_training_data(cfg)
    batch = {"fidelity_input": jnp.asarray(td.fidelity_input),
             "fidelity_true": jnp.asarray(td.fidelity_true),
             "residual_input": jnp.asarray(td.residual_input)}
    loss_fn = build_loss_fn(cfg, spec)
    params = init_mlp_params(jax.random.PRNGKey(2), spec)
    opts = lbfgs_mod.LBFGSOptions(lr=1.0, max_iter=5, max_eval=25,
                                  history_size=5, tolerance_grad=1e-12,
                                  tolerance_change=1e-14,
                                  line_search="strong_wolfe")

    def loss2(p, b):
        return loss_fn(p, b)

    vg = jax.value_and_grad(loss2, has_aux=True)
    r1 = lbfgs_mod.LBFGSRunner(loss_fn, params, opts)
    r2 = lbfgs_mod.LBFGSRunner(loss_fn, params, opts, value_and_grad_fn=vg)
    s1 = r1.init(params, batch)
    s2 = r2.init(params, batch)
    s1, _ = r1.run_chunk(s1, batch)
    s2, _ = r2.run_chunk(s2, batch)
    np.testing.assert_array_equal(np.asarray(s1.x), np.asarray(s2.x))
    np.testing.assert_array_equal(np.asarray(s1.records), np.asarray(s2.records))


def test_one_kernel_step_applicable_predicate(tmp_path):
    """The shared gating predicate (training/loss.py) drives BOTH
    build_value_and_grad_fn and the Trainer's path-aware fused-'auto'
    heuristic (round-4 depth sweeps: the one-kernel step wins at every
    depth, the generic two-kernel path only from ~16 layers)."""
    from pinn_depthestimation_tpu.training.loss import one_kernel_step_applicable

    cfg = _newmethod_cfg(tmp_path)
    spec = MLPSpec.from_layers(cfg.layers)
    assert one_kernel_step_applicable(cfg, spec, True)
    # separate-points pipelines never qualify
    assert not one_kernel_step_applicable(cfg, spec, False)
    # physics outside continuity doesn't qualify
    cfg_ns = _newmethod_cfg(tmp_path, physics="navier_stokes")
    assert not one_kernel_step_applicable(cfg_ns, spec, True)
    # dropout doesn't qualify
    spec_do = MLPSpec.from_layers(
        type(cfg.layers)(**{**cfg.layers.__dict__, "dropout_rate": 0.1})
    )
    assert not one_kernel_step_applicable(cfg, spec_do, True)
    # consistency: whenever the predicate says yes, the builder returns a fn
    kw = dict(fused_kernel=True, fused_interpret=True,
              fidelity_is_residual=True)
    assert (build_value_and_grad_fn(cfg, spec, **kw) is not None) == \
        one_kernel_step_applicable(cfg, spec, True)
    assert build_value_and_grad_fn(cfg_ns, spec, **kw) is None
