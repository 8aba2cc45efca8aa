"""Fused custom-VJP kernel vs jax.grad of the XLA reference (interpret mode)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pinn_depthestimation_tpu.models import MLPSpec, init_mlp_params, mlp_apply_with_tangents
from pinn_depthestimation_tpu.ops import kernels_vjp


def _coord_tangents(coords, k):
    return jnp.stack(
        [jnp.zeros_like(coords).at[:, c].set(1.0) for c in range(k)], axis=0
    )


def _losses(spec, coords, n_tangents, bwd_impl="auto"):
    def loss_ref(p):
        y, dy = mlp_apply_with_tangents(
            p, coords, _coord_tangents(coords, n_tangents), spec
        )
        return jnp.mean(jnp.sin(y)) + jnp.mean((dy - 0.3) ** 2)

    def loss_fused(p):
        y, dy = kernels_vjp.fused_apply_with_tangents(
            p, coords, spec, n_tangents, "f32", True, bwd_impl
        )
        return jnp.mean(jnp.sin(y)) + jnp.mean((dy - 0.3) ** 2)

    return loss_ref, loss_fused


def _assert_grads_close(g_ref, g_fused, rtol):
    for k in g_ref:
        a, b = np.asarray(g_ref[k]), np.asarray(g_fused[k])
        assert a.shape == b.shape, k
        if a.size == 0:
            continue
        scale = np.abs(a).max() + 1e-12
        np.testing.assert_allclose(b / scale, a / scale, atol=rtol, err_msg=k)


@pytest.mark.parametrize("impl", ["rebuild", "stream"])
@pytest.mark.parametrize("width,d_in,d_out,layers,kt", [
    (20, 2, 3, 5, 2),    # flagship shape
    (20, 2, 3, 23, 2),   # deep enough for several checkpoint segments
    (10, 2, 6, 4, 2),    # CMB shape
    (20, 3, 4, 6, 3),    # navier-stokes: 3 tangents
    (64, 2, 3, 3, 2),    # g = 2
    (17, 2, 3, 4, 2),    # odd width: aligned stride 24 != width, g = 5
])
def test_fused_vjp_matches_jax_grad(width, d_in, d_out, layers, kt, impl):
    spec = MLPSpec(sizes=(d_in,) + (width,) * layers + (d_out,), init_type="xavier")
    params = init_mlp_params(jax.random.PRNGKey(layers), spec)
    coords = jnp.asarray(
        np.random.RandomState(width).uniform(-1, 1, (257, d_in)), jnp.float32
    )
    loss_ref, loss_fused = _losses(spec, coords, kt, impl)
    assert float(loss_fused(params)) == pytest.approx(float(loss_ref(params)), rel=1e-5)
    _assert_grads_close(jax.grad(loss_ref)(params), jax.grad(loss_fused)(params), 1e-4)


@pytest.mark.parametrize("precision,tol", [("f32", 2e-6), ("f32x3", 2e-5), ("bf16", 3e-2)])
def test_stream_impl_matches_rebuild(precision, tol):
    """The HBM-streaming backward equals the segmented-rebuild backward per
    precision tier (same math, different state residency; tile partitions
    differ so accumulation order allows tier-scale rounding)."""
    spec = MLPSpec(sizes=(2,) + (20,) * 12 + (3,), init_type="xavier")
    params = init_mlp_params(jax.random.PRNGKey(2), spec)
    rs = np.random.RandomState(7)
    n = 531  # ragged across tiles
    coords = jnp.asarray(rs.uniform(-1, 1, (n, 2)), jnp.float32)
    ybar = jnp.asarray(rs.randn(n, 3), jnp.float32)
    dybar = jnp.asarray(rs.randn(2, n, 3), jnp.float32)
    kw = dict(precision=precision, interpret=True)
    g_re = kernels_vjp.packed_mlp_bwd(
        params, coords, ybar, dybar, spec, 2, rows_per_tile=16, impl="rebuild", **kw
    )
    g_st = kernels_vjp.packed_mlp_bwd(
        params, coords, ybar, dybar, spec, 2, rows_per_tile=24, impl="stream", **kw
    )
    _assert_grads_close(g_re, g_st, tol)


@pytest.mark.parametrize("sizes,kt", [
    ((2, 20, 3), 2),             # n_stack = 0: no hidden-stack streaming at all
    ((2, 20, 20, 3), 0),         # kt = 0: the fidelity (zero-tangent) pass
    ((2, 20, 20, 20, 20, 20, 20, 3), 2),  # deeper than the DMA ring
])
def test_stream_impl_edge_shapes(sizes, kt):
    spec = MLPSpec(sizes=sizes, init_type="xavier")
    params = init_mlp_params(jax.random.PRNGKey(3), spec)
    rs = np.random.RandomState(9)
    n = 77
    coords = jnp.asarray(rs.uniform(-1, 1, (n, sizes[0])), jnp.float32)
    ybar = jnp.asarray(rs.randn(n, sizes[-1]), jnp.float32)
    dybar = jnp.asarray(rs.randn(kt, n, sizes[-1]), jnp.float32)
    tang = _coord_tangents(coords, kt) if kt else None

    def loss(p):
        if kt == 0:
            from pinn_depthestimation_tpu.models import mlp_apply

            return jnp.vdot(ybar, mlp_apply(p, coords, spec))
        y, dy = mlp_apply_with_tangents(p, coords, tang, spec)
        return jnp.vdot(ybar, y) + sum(
            jnp.vdot(dybar[k], dy[k]) for k in range(kt)
        )

    g_ref = jax.grad(loss)(params)
    g_st = kernels_vjp.packed_mlp_bwd(
        params, coords, ybar, dybar, spec, kt, interpret=True, impl="stream"
    )
    _assert_grads_close(g_ref, g_st, 1e-4)


def test_unknown_bwd_impl_rejected():
    spec = MLPSpec(sizes=(2, 20, 3), init_type="xavier")
    params = init_mlp_params(jax.random.PRNGKey(0), spec)
    coords = jnp.zeros((8, 2), jnp.float32)
    with pytest.raises(ValueError, match="unknown bwd impl"):
        kernels_vjp.packed_mlp_bwd(
            params, coords, jnp.zeros((8, 3)), jnp.zeros((2, 8, 3)), spec, 2,
            interpret=True, impl="nope",
        )


def test_fused_vjp_zero_tangents_matches_jax_grad():
    """n_tangents=0: the plain fused forward with the custom-VJP backward —
    the path the loss builder uses for the separate fidelity term (the
    flagship's NaN-masked observation points differ from the collocation
    points, training/loss.py::fidelity_forward)."""
    spec = MLPSpec(sizes=(2,) + (20,) * 6 + (3,), init_type="xavier")
    params = init_mlp_params(jax.random.PRNGKey(0), spec)
    coords = jnp.asarray(
        np.random.RandomState(5).uniform(-1, 1, (137, 2)), jnp.float32
    )
    target = jnp.asarray(np.random.RandomState(6).normal(size=(137, 3)), jnp.float32)

    def loss_ref(p):
        from pinn_depthestimation_tpu.models import mlp_apply

        return jnp.mean((mlp_apply(p, coords, spec) - target) ** 2)

    def loss_fused(p):
        y, dy = kernels_vjp.fused_apply_with_tangents(p, coords, spec, 0, "f32", True)
        assert dy.shape == (0, 137, 3)
        return jnp.mean((y - target) ** 2)

    assert float(loss_fused(params)) == pytest.approx(float(loss_ref(params)), rel=1e-5)
    _assert_grads_close(jax.grad(loss_ref)(params), jax.grad(loss_fused)(params), 1e-4)


def test_fused_vjp_kaiming():
    spec = MLPSpec(sizes=(2, 16, 16, 16, 3), init_type="kaiming")
    params = init_mlp_params(jax.random.PRNGKey(7), spec)
    coords = jnp.asarray(np.random.RandomState(3).uniform(-1, 1, (130, 2)), jnp.float32)
    loss_ref, loss_fused = _losses(spec, coords, 2)
    _assert_grads_close(jax.grad(loss_ref)(params), jax.grad(loss_fused)(params), 1e-4)


def test_fused_vjp_single_hidden_stack_layer():
    # n_stack = 0: input layer -> output layer only
    spec = MLPSpec(sizes=(2, 20, 3), init_type="xavier")
    params = init_mlp_params(jax.random.PRNGKey(8), spec)
    coords = jnp.asarray(np.random.RandomState(4).uniform(-1, 1, (64, 2)), jnp.float32)
    loss_ref, loss_fused = _losses(spec, coords, 2)
    _assert_grads_close(jax.grad(loss_ref)(params), jax.grad(loss_fused)(params), 1e-4)


def test_coords_cotangent_is_zero_by_contract():
    """The VJP deliberately returns zero for coords (documented contract)."""
    spec = MLPSpec(sizes=(2, 12, 12, 3), init_type="xavier")
    params = init_mlp_params(jax.random.PRNGKey(9), spec)
    coords = jnp.asarray(np.random.RandomState(5).uniform(-1, 1, (40, 2)), jnp.float32)

    def loss(c):
        y, dy = kernels_vjp.fused_apply_with_tangents(params, c, spec, 2, "f32", True)
        return jnp.sum(y**2)

    g = jax.grad(loss)(coords)
    np.testing.assert_array_equal(np.asarray(g), 0.0)


def test_training_loss_through_physics_bridge():
    """End-to-end: the fused VJP slot into the continuity training loss."""
    from pinn_depthestimation_tpu import physics

    spec = MLPSpec(sizes=(2, 20, 20, 20, 3), init_type="xavier")
    params = init_mlp_params(jax.random.PRNGKey(10), spec)
    coords = jnp.asarray(np.random.RandomState(6).uniform(-1, 1, (96, 2)), jnp.float32)

    def bundle(awt):
        return physics.model_fields_and_grads(
            awt, coords, ["x", "y"], ["x", "y"], ["U", "V", "h"]
        )

    def loss_ref(p):
        awt = lambda x, t: mlp_apply_with_tangents(p, x, t, spec)  # noqa: E731
        return physics.continuity_only(*bundle(awt))

    def loss_fused(p):
        awt = lambda x, t: kernels_vjp.fused_apply_with_tangents(  # noqa: E731
            p, x, spec, t.shape[0], "f32", True
        )
        return physics.continuity_only(*bundle(awt))

    assert float(loss_fused(params)) == pytest.approx(float(loss_ref(params)), rel=1e-5)
    _assert_grads_close(jax.grad(loss_ref)(params), jax.grad(loss_fused)(params), 1e-4)


def test_fused_vjp_f32x3_grads_track_jax_grad():
    """Split-f32 training tier: gradients must track jax.grad to ~1e-5 rel
    (hundreds of times tighter than the bf16 tier)."""
    spec = MLPSpec(sizes=(2,) + (20,) * 6 + (3,), init_type="xavier")
    params = init_mlp_params(jax.random.PRNGKey(3), spec)
    coords = jnp.asarray(
        np.random.RandomState(7).uniform(-1, 1, (257, 2)), jnp.float32
    )

    def loss_ref(p):
        y, dy = mlp_apply_with_tangents(p, coords, _coord_tangents(coords, 2), spec)
        return jnp.mean(jnp.sin(y)) + jnp.mean((dy - 0.3) ** 2)

    def loss_f32x3(p):
        y, dy = kernels_vjp.fused_apply_with_tangents(
            p, coords, spec, 2, "f32x3", True
        )
        return jnp.mean(jnp.sin(y)) + jnp.mean((dy - 0.3) ** 2)

    assert float(loss_f32x3(params)) == pytest.approx(float(loss_ref(params)), rel=1e-4)
    _assert_grads_close(jax.grad(loss_ref)(params), jax.grad(loss_f32x3)(params), 5e-5)


def test_dropout_rejected():
    spec = MLPSpec(sizes=(2, 20, 20, 3), init_type="xavier", dropout_rate=0.3)
    params = init_mlp_params(jax.random.PRNGKey(11), spec)
    coords = jnp.zeros((8, 2))
    ybar = jnp.zeros((8, 3))
    dybar = jnp.zeros((2, 8, 3))
    with pytest.raises(ValueError, match="dropout"):
        kernels_vjp.packed_mlp_bwd(params, coords, ybar, dybar, spec, 2, interpret=True)


def test_strided_pack_roundtrip():
    spec = MLPSpec(sizes=(2, 20, 20, 3))
    s = kernels_vjp.aligned_stride(spec)
    g = kernels_vjp.packing_factor_aligned(spec)
    assert (s, g) == (24, 5)
    vals = jnp.asarray(np.random.RandomState(0).randn(33, 2), jnp.float32)
    packed, n = kernels_vjp.pack_values_strided(vals, 2, g, s, 8)
    assert n == 33 and packed.shape[1] == 128
    # padding rows are zero (critical: they must not pollute grad accumulators)
    grouped = np.asarray(packed)[:, : g * s].reshape(packed.shape[0], g, s)
    np.testing.assert_array_equal(grouped[:, :, 2:], 0.0)
    flat = grouped[:, :, :2].reshape(-1, 2)
    np.testing.assert_array_equal(flat[:33], np.asarray(vals))
    np.testing.assert_array_equal(flat[33:], 0.0)


def test_loss_builder_fused_matches_xla(tmp_path):
    """build_loss_fn(fused_kernel=True) == the XLA path, values and grads."""
    from pinn_depthestimation_tpu.config import parse_config
    from pinn_depthestimation_tpu.training import build_loss_fn
    from pinn_depthestimation_tpu.utils import synthetic
    from pinn_depthestimation_tpu import data as data_mod

    mat = str(tmp_path / "d.mat")
    synthetic.make_newmethod_mat(mat, nx=12, ny=10, nan_fraction=0.0, seed=1)
    cfg = parse_config({
        "layers": {"input_features": 2, "hidden_layers": 4, "hidden_width": 20,
                   "output_features": 3, "dropout_rate": 0.0, "init_type": "xavier"},
        "adam_optimizer": {"max_it": 1, "learning_rate": 1e-3,
                           "scheduler_step_size": 5, "scheduler_gamma": 0.8},
        "lbfgs_optimizer": {"max_it": 0, "learning_rate": 1, "max_evaluation": 0,
                            "history_size": 5, "tolerance_grad": 1e-9,
                            "tolerance_change": 1e-12, "line_search_fn": "strong_wolfe"},
        "loss": {"weight_fid_loss": 1, "weight_res_loss": 1},
        "data": {"file": mat,
                 "inputs": {"x": {"requires_grad": ["true"]},
                            "y": {"requires_grad": ["true"]}},
                 "trues": ["U", "V"], "unknowns": ["h"]},
    })
    spec = MLPSpec.from_layers(cfg.layers)
    params = init_mlp_params(jax.random.PRNGKey(0), spec)
    td = data_mod.load_training_data(cfg)
    batch = {"fidelity_input": jnp.asarray(td.fidelity_input),
             "fidelity_true": jnp.asarray(td.fidelity_true),
             "residual_input": jnp.asarray(td.residual_input)}

    loss_xla = build_loss_fn(cfg, spec)
    loss_fused = build_loss_fn(cfg, spec, fused_kernel=True, fused_interpret=True)
    (t1, _), g1 = jax.value_and_grad(loss_xla, has_aux=True)(params, batch)
    (t2, _), g2 = jax.value_and_grad(loss_fused, has_aux=True)(params, batch)
    assert float(t2) == pytest.approx(float(t1), rel=1e-5)
    _assert_grads_close(g1, g2, 1e-4)


@pytest.mark.parametrize("physics_name,tol", [
    ("continuity_only", 1e-4),
    # wave_averaged un-pinned (round 4): with the stable radiation-stress
    # formulation (physics._t_over_sinh) the f32 conditioning is bounded
    # (~0.01% typical, 0.19% worst measured — .soak/wave_grad_cond.py), so
    # fused-vs-XLA agreement at the same precision is meaningful; the looser
    # tolerance covers the 1/(rho*(eta+h)) pole amplifying f32 reorderings.
    ("wave_averaged", 1e-3),
])
def test_loss_builder_fused_separate_fidelity_matches_xla(
    tmp_path, monkeypatch, physics_name, tol
):
    """Fused == XLA on a CMB-shaped problem, where the observation points
    (fidelity CSV) genuinely differ from the collocation points (.mat grid):
    the fused path then runs the SEPARATE zero-tangent fidelity forward
    (training/loss.py::fidelity_forward) instead of sharing the residual
    forward. (The newmethod pipeline always shares: fidelity_is_residual,
    data.py::load_newmethod_training_data.) The size threshold is lowered so
    this CI-scale problem exercises the fused branch small sets skip."""
    from pinn_depthestimation_tpu.config import parse_config
    from pinn_depthestimation_tpu.training import build_loss_fn, loss as loss_mod
    from pinn_depthestimation_tpu.utils import synthetic
    from pinn_depthestimation_tpu import data as data_mod

    monkeypatch.setattr(loss_mod, "FUSED_FIDELITY_MIN_POINTS", 1)

    csv = str(tmp_path / "fid.csv")
    mat = str(tmp_path / "res.mat")
    synthetic.make_cmb_dataset(csv, mat, nx=15, ny=13, n_csv=77, seed=6,
                               nan_fraction=0.03)
    cfg = parse_config({
        "layers": {"input_features": 2, "hidden_layers": 3, "hidden_width": 20,
                   "output_features": 6, "dropout_rate": 0.0, "init_type": "xavier"},
        "adam_optimizer": {"max_it": 1, "learning_rate": 1e-3,
                           "scheduler_step_size": 5, "scheduler_gamma": 0.8},
        "lbfgs_optimizer": {"max_it": 0, "learning_rate": 1, "max_evaluation": 0,
                            "history_size": 5, "tolerance_grad": 1e-9,
                            "tolerance_change": 1e-12, "line_search_fn": "strong_wolfe"},
        "loss": {"weight_fid_loss": 1, "weight_res_loss": 1,
                 "weight_h_loss": 2, "weight_U_loss": 1, "weight_V_loss": 1,
                 "weight_eta_mean_loss": 1, "weight_Hrms_loss": 1, "weight_k_loss": 1},
        "data_fidelity": {"file": csv,
                          "inputs": ["x", "y"],
                          "outputs": ["h", "U", "V", "eta_mean", "Hrms", "k"],
                          "training_points": 60},
        "data_residual": {"file": mat,
                          "inputs": {"x": {"requires_grad": ["true"]},
                                     "y": {"requires_grad": ["true"]}},
                          "outputs": ["h", "U", "V", "eta_mean", "Hrms", "k"],
                          "interval_x": 1, "interval_y": 1},
        "physics": physics_name,
        "parity": False,  # corrected mode: radiation stresses active
    })
    spec = MLPSpec.from_layers(cfg.layers)
    params = dict(init_mlp_params(jax.random.PRNGKey(0), spec))
    # Shift the eta_mean head so the total water depth eta+h stays O(1)
    # positive (the physical training regime): at raw random init some
    # collocation point sits on the 1/(rho*(eta+h)) pole, which amplifies
    # f32 reordering differences unboundedly and makes ANY same-precision
    # comparison meaningless (the chaos result in .soak/cmb_f32_conv.py).
    params["b_out"] = params["b_out"].at[3].add(1.0)
    td = data_mod.load_training_data(cfg)
    assert td.fidelity_input.shape[0] != td.residual_input.shape[0]
    assert not td.fidelity_is_residual
    batch = {"fidelity_input": jnp.asarray(td.fidelity_input),
             "fidelity_true": jnp.asarray(td.fidelity_true),
             "residual_input": jnp.asarray(td.residual_input)}

    # corrected mode (parity=false) requires the loader's normalization
    # bounds so the continuity anchor threshold lands in normalized space
    # (loss.py::_anchor_kwargs fails loudly without them)
    mm = td.input_min_max
    loss_xla = build_loss_fn(cfg, spec, input_min_max=mm)
    loss_fused = build_loss_fn(cfg, spec, fused_kernel=True,
                               fused_interpret=True, input_min_max=mm)
    (t1, (f1, r1)), g1 = jax.value_and_grad(loss_xla, has_aux=True)(params, batch)
    (t2, (f2, r2)), g2 = jax.value_and_grad(loss_fused, has_aux=True)(params, batch)
    # the fidelity term's packed-lane forward reorders f32 sums vs
    # mlp_apply, same budget as grads
    assert float(t2) == pytest.approx(float(t1), rel=tol)
    assert float(f2) == pytest.approx(float(f1), rel=tol)
    assert float(r2) == pytest.approx(float(r1), rel=tol)
    _assert_grads_close(g1, g2, tol)

    # the fidelity term ALONE (the path this test exists for) must be tight
    # regardless of physics: grads of the packed zero-tangent forward vs
    # mlp_apply
    def fid_term(loss):
        def f(p):
            return loss(p, batch)[1][0]
        return f

    _assert_grads_close(
        jax.grad(fid_term(loss_xla))(params),
        jax.grad(fid_term(loss_fused))(params),
        1e-5,
    )


def test_fused_rejects_nonleading_grad_coords(tmp_path):
    from pinn_depthestimation_tpu.config import parse_config
    from pinn_depthestimation_tpu.training import build_loss_fn
    from scipy.io import savemat

    mat = str(tmp_path / "m.mat")
    savemat(mat, {"extra": np.zeros((4, 1)), "x": np.zeros((4, 1)),
                  "y": np.zeros((4, 1)), "U": np.zeros((4, 1)), "V": np.zeros((4, 1))})
    cfg = parse_config({
        "layers": {"input_features": 3, "hidden_layers": 2, "hidden_width": 8,
                   "output_features": 3, "dropout_rate": 0.0, "init_type": "xavier"},
        "data": {"file": mat,
                 "inputs": {"extra": {"requires_grad": ["false"]},
                            "x": {"requires_grad": ["true"]},
                            "y": {"requires_grad": ["true"]}},
                 "trues": ["U", "V"], "unknowns": ["h"]},
    })
    spec = MLPSpec.from_layers(cfg.layers)
    with pytest.raises(ValueError, match="leading residual inputs"):
        build_loss_fn(cfg, spec, fused_kernel=True)


def test_fused_shard_map_matches_single_device(tmp_path):
    """Fused kernel under an 8-device mesh (shard_map + psum'd stats) ==
    single-device fused loss, values and grads."""
    from pinn_depthestimation_tpu import data as data_mod, parallel
    from pinn_depthestimation_tpu.config import parse_config
    from pinn_depthestimation_tpu.training import build_loss_fn
    from pinn_depthestimation_tpu.utils import synthetic

    mat = str(tmp_path / "d.mat")
    synthetic.make_newmethod_mat(mat, nx=14, ny=13, nan_fraction=0.04, seed=2)
    cfg = parse_config({
        "layers": {"input_features": 2, "hidden_layers": 3, "hidden_width": 20,
                   "output_features": 3, "dropout_rate": 0.0, "init_type": "xavier"},
        "adam_optimizer": {"max_it": 1, "learning_rate": 1e-3,
                           "scheduler_step_size": 5, "scheduler_gamma": 0.8},
        "lbfgs_optimizer": {"max_it": 0, "learning_rate": 1, "max_evaluation": 0,
                            "history_size": 5, "tolerance_grad": 1e-9,
                            "tolerance_change": 1e-12, "line_search_fn": "strong_wolfe"},
        "loss": {"weight_fid_loss": 1, "weight_res_loss": 1},
        "data": {"file": mat,
                 "inputs": {"x": {"requires_grad": ["true"]},
                            "y": {"requires_grad": ["true"]}},
                 "trues": ["U", "V"], "unknowns": ["h"]},
    })
    spec = MLPSpec.from_layers(cfg.layers)
    params = init_mlp_params(jax.random.PRNGKey(0), spec)
    td = data_mod.load_training_data(cfg)

    # single-device fused reference
    batch_plain = {"fidelity_input": jnp.asarray(td.fidelity_input),
                   "fidelity_true": jnp.asarray(td.fidelity_true),
                   "residual_input": jnp.asarray(td.residual_input)}
    loss_single = build_loss_fn(cfg, spec, fused_kernel=True, fused_interpret=True)
    (t1, _), g1 = jax.value_and_grad(loss_single, has_aux=True)(params, batch_plain)

    # sharded fused
    mesh = parallel.make_mesh(8)
    batch_sh = parallel.shard_batch(
        {"fidelity_input": td.fidelity_input,
         "fidelity_true": td.fidelity_true,
         "residual_input": td.residual_input}, mesh)
    params_repl = parallel.replicate(params, mesh)
    loss_mesh = build_loss_fn(
        cfg, spec, fused_kernel=True, fused_interpret=True, mesh=mesh
    )
    (t2, _), g2 = jax.jit(jax.value_and_grad(loss_mesh, has_aux=True))(
        params_repl, batch_sh
    )
    assert float(t2) == pytest.approx(float(t1), rel=1e-5)
    _assert_grads_close(g1, g2, 2e-4)


@pytest.mark.parametrize("fused_precision", ["f32", "f32x3"])
def test_fused_shard_map_shared_forward_matches(tmp_path, fused_precision):
    """fidelity_is_residual=True routes fidelity through the SAME fused
    forward inside the single shard_map call; numerics must still equal the
    single-device (separate-forward) fused loss. Parametrized over the f32
    and split-f32 tiers (the latter exercises pass-axis packed weights
    through shard_map)."""
    from pinn_depthestimation_tpu import data as data_mod, parallel
    from pinn_depthestimation_tpu.config import parse_config
    from pinn_depthestimation_tpu.training import build_loss_fn
    from pinn_depthestimation_tpu.utils import synthetic

    mat = str(tmp_path / "d.mat")
    synthetic.make_newmethod_mat(mat, nx=11, ny=15, nan_fraction=0.06, seed=5)
    cfg = parse_config({
        "layers": {"input_features": 2, "hidden_layers": 3, "hidden_width": 20,
                   "output_features": 3, "dropout_rate": 0.0, "init_type": "xavier"},
        "adam_optimizer": {"max_it": 1, "learning_rate": 1e-3,
                           "scheduler_step_size": 5, "scheduler_gamma": 0.8},
        "lbfgs_optimizer": {"max_it": 0, "learning_rate": 1, "max_evaluation": 0,
                            "history_size": 5, "tolerance_grad": 1e-9,
                            "tolerance_change": 1e-12, "line_search_fn": "strong_wolfe"},
        "loss": {"weight_fid_loss": 1, "weight_res_loss": 1},
        "data": {"file": mat,
                 "inputs": {"x": {"requires_grad": ["true"]},
                            "y": {"requires_grad": ["true"]}},
                 "trues": ["U", "V"], "unknowns": ["h"]},
    })
    spec = MLPSpec.from_layers(cfg.layers)
    params = init_mlp_params(jax.random.PRNGKey(3), spec)
    td = data_mod.load_training_data(cfg)
    assert td.fidelity_is_residual  # newmethod loader certifies the contract

    batch_plain = {"fidelity_input": jnp.asarray(td.fidelity_input),
                   "fidelity_true": jnp.asarray(td.fidelity_true),
                   "residual_input": jnp.asarray(td.residual_input)}
    loss_single = build_loss_fn(cfg, spec, fused_kernel=True, fused_interpret=True,
                                fused_precision=fused_precision)
    (t1, (f1, r1)), g1 = jax.value_and_grad(loss_single, has_aux=True)(
        params, batch_plain)

    mesh = parallel.make_mesh(8)
    batch_sh = parallel.shard_batch(
        {"fidelity_input": td.fidelity_input,
         "fidelity_true": td.fidelity_true,
         "residual_input": td.residual_input}, mesh)
    params_repl = parallel.replicate(params, mesh)
    loss_mesh = build_loss_fn(cfg, spec, fused_kernel=True, fused_interpret=True,
                              mesh=mesh, fidelity_is_residual=True,
                              fused_precision=fused_precision)
    (t2, (f2, r2)), g2 = jax.jit(jax.value_and_grad(loss_mesh, has_aux=True))(
        params_repl, batch_sh)
    assert float(t2) == pytest.approx(float(t1), rel=1e-5)
    assert float(f2) == pytest.approx(float(f1), rel=1e-5)
    assert float(r2) == pytest.approx(float(r1), rel=1e-5)
    _assert_grads_close(g1, g2, 2e-4)


def test_fused_shard_map_cmb_unequal_sizes(tmp_path):
    """CMB-shaped sharded fused loss: fidelity and residual point sets have
    DIFFERENT sizes (separate padding/masks per array inside the single
    shard_map call); numerics must equal the single-device loss."""
    from pinn_depthestimation_tpu import data as data_mod, parallel
    from pinn_depthestimation_tpu.config import parse_config
    from pinn_depthestimation_tpu.training import build_loss_fn
    from pinn_depthestimation_tpu.utils import synthetic

    csv = str(tmp_path / "fid.csv")
    mat = str(tmp_path / "res.mat")
    synthetic.make_cmb_dataset(csv, mat, nx=15, ny=13, n_csv=77, seed=6,
                               nan_fraction=0.03)
    cfg = parse_config({
        "layers": {"input_features": 2, "hidden_layers": 3, "hidden_width": 20,
                   "output_features": 6, "dropout_rate": 0.0, "init_type": "xavier"},
        "adam_optimizer": {"max_it": 1, "learning_rate": 1e-3,
                           "scheduler_step_size": 5, "scheduler_gamma": 0.8},
        "lbfgs_optimizer": {"max_it": 0, "learning_rate": 1, "max_evaluation": 0,
                            "history_size": 5, "tolerance_grad": 1e-9,
                            "tolerance_change": 1e-12, "line_search_fn": "strong_wolfe"},
        "loss": {"weight_fid_loss": 1, "weight_res_loss": 1,
                 "weight_h_loss": 2, "weight_U_loss": 1, "weight_V_loss": 1,
                 "weight_eta_mean_loss": 1, "weight_Hrms_loss": 1, "weight_k_loss": 1},
        "data_fidelity": {"file": csv,
                          "inputs": ["x", "y"],
                          "outputs": ["h", "U", "V", "eta_mean", "Hrms", "k"],
                          "training_points": 60},
        "data_residual": {"file": mat,
                          "inputs": {"x": {"requires_grad": ["true"]},
                                     "y": {"requires_grad": ["true"]}},
                          "outputs": ["h", "U", "V", "eta_mean", "Hrms", "k"],
                          "interval_x": 1, "interval_y": 1},
        "physics": "wave_averaged",
    })
    spec = MLPSpec.from_layers(cfg.layers)
    params = init_mlp_params(jax.random.PRNGKey(1), spec)
    td = data_mod.load_training_data(cfg)
    assert td.fidelity_input.shape[0] != td.residual_input.shape[0]
    assert not td.fidelity_is_residual

    batch_plain = {"fidelity_input": jnp.asarray(td.fidelity_input),
                   "fidelity_true": jnp.asarray(td.fidelity_true),
                   "residual_input": jnp.asarray(td.residual_input)}
    loss_single = build_loss_fn(cfg, spec, fused_kernel=True, fused_interpret=True)
    (t1, (f1, r1)), g1 = jax.value_and_grad(loss_single, has_aux=True)(
        params, batch_plain)

    mesh = __import__("pinn_depthestimation_tpu").parallel.make_mesh(8)
    batch_sh = parallel.shard_batch(
        {"fidelity_input": td.fidelity_input,
         "fidelity_true": td.fidelity_true,
         "residual_input": td.residual_input}, mesh)
    params_repl = parallel.replicate(params, mesh)
    loss_mesh = build_loss_fn(cfg, spec, fused_kernel=True, fused_interpret=True,
                              mesh=mesh)
    (t2, (f2, r2)), g2 = jax.jit(jax.value_and_grad(loss_mesh, has_aux=True))(
        params_repl, batch_sh)
    assert float(t2) == pytest.approx(float(t1), rel=1e-5)
    assert float(f2) == pytest.approx(float(f1), rel=1e-5)
    assert float(r2) == pytest.approx(float(r1), rel=1e-5)
    _assert_grads_close(g1, g2, 2e-4)
