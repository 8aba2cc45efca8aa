"""Opt-in hardware smoke tests: compiled Mosaic kernels on a real TPU.

Run with ``PINN_TPU_TESTS=1 python -m pytest tests/test_tpu_smoke.py -q``.
The default suite pins the CPU backend (conftest), so these skip there.
"""

import os

import pytest

pytestmark = pytest.mark.skipif(
    os.environ.get("PINN_TPU_TESTS") != "1", reason="set PINN_TPU_TESTS=1 on a TPU host"
)


@pytest.fixture(scope="module")
def tpu():
    import jax

    if jax.devices()[0].platform != "tpu":
        pytest.skip("no TPU backend")
    from pinn_depthestimation_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    return jax.devices()[0]


def test_forward_kernel_compiled(tpu):
    import jax, jax.numpy as jnp, numpy as np  # noqa: E401

    from pinn_depthestimation_tpu.models import (
        MLPSpec, init_mlp_params, mlp_apply_with_tangents,
    )
    from pinn_depthestimation_tpu.ops import kernels

    spec = MLPSpec(sizes=(2,) + (20,) * 10 + (3,), init_type="xavier")
    params = init_mlp_params(jax.random.PRNGKey(0), spec)
    coords = jnp.asarray(np.random.RandomState(0).uniform(-1, 1, (4096, 2)), jnp.float32)
    y, dy = kernels.packed_mlp_fwd_tangents(params, coords, spec, 2)
    tangents = jnp.stack([jnp.zeros_like(coords).at[:, c].set(1.0) for c in range(2)])
    y_ref, dy_ref = mlp_apply_with_tangents(params, coords, tangents, spec)
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref), rtol=1e-4, atol=2e-5)
    np.testing.assert_allclose(np.asarray(dy), np.asarray(dy_ref), rtol=1e-4, atol=2e-5)


def test_vjp_kernel_compiled(tpu):
    import jax, jax.numpy as jnp, numpy as np  # noqa: E401

    from pinn_depthestimation_tpu.models import (
        MLPSpec, init_mlp_params, mlp_apply_with_tangents,
    )
    from pinn_depthestimation_tpu.ops import kernels_vjp

    spec = MLPSpec(sizes=(2,) + (20,) * 12 + (3,), init_type="xavier")
    params = init_mlp_params(jax.random.PRNGKey(1), spec)
    coords = jnp.asarray(np.random.RandomState(1).uniform(-1, 1, (2048, 2)), jnp.float32)

    def loss_fused(p):
        y, dy = kernels_vjp.fused_apply_with_tangents(p, coords, spec, 2, "f32", False)
        return jnp.mean(jnp.sin(y)) + jnp.mean((dy - 0.3) ** 2)

    def loss_ref(p):
        t = jnp.stack([jnp.zeros_like(coords).at[:, c].set(1.0) for c in range(2)])
        y, dy = mlp_apply_with_tangents(p, coords, t, spec)
        return jnp.mean(jnp.sin(y)) + jnp.mean((dy - 0.3) ** 2)

    g1 = jax.jit(jax.grad(loss_ref))(params)
    g2 = jax.jit(jax.grad(loss_fused))(params)
    for k in g1:
        a, b = np.asarray(g1[k]), np.asarray(g2[k])
        if a.size == 0:
            continue
        scale = np.abs(a).max() + 1e-12
        np.testing.assert_allclose(b / scale, a / scale, atol=2e-4, err_msg=k)


def test_vjp_kernel_zero_tangents_compiled(tpu):
    """The n_tangents=0 fused pass (separate fidelity forward,
    training/loss.py::fidelity_forward) compiles under Mosaic and its grads
    match jax.grad — only interpret-mode-validated until this runs."""
    import jax, jax.numpy as jnp, numpy as np  # noqa: E401

    from pinn_depthestimation_tpu.models import MLPSpec, init_mlp_params, mlp_apply
    from pinn_depthestimation_tpu.ops import kernels_vjp

    spec = MLPSpec(sizes=(2,) + (20,) * 12 + (3,), init_type="xavier")
    params = init_mlp_params(jax.random.PRNGKey(2), spec)
    coords = jnp.asarray(np.random.RandomState(2).uniform(-1, 1, (2048, 2)), jnp.float32)
    target = jnp.asarray(np.random.RandomState(3).normal(size=(2048, 3)), jnp.float32)

    def loss_fused(p):
        y, _ = kernels_vjp.fused_apply_with_tangents(p, coords, spec, 0, "f32", False)
        return jnp.mean((y - target) ** 2)

    def loss_ref(p):
        return jnp.mean((mlp_apply(p, coords, spec) - target) ** 2)

    g1 = jax.jit(jax.grad(loss_ref))(params)
    g2 = jax.jit(jax.grad(loss_fused))(params)
    for k in g1:
        a, b = np.asarray(g1[k]), np.asarray(g2[k])
        if a.size == 0:
            continue
        scale = np.abs(a).max() + 1e-12
        np.testing.assert_allclose(b / scale, a / scale, atol=2e-4, err_msg=k)


def test_one_kernel_step_compiled(tpu, tmp_path):
    """The train-epilogue one-kernel step (ops/kernels_step) compiles under
    Mosaic and matches plain jax.value_and_grad — plain AND through the
    sharded variant on a 1-chip TPU mesh (psum'd stats + grad partials)."""
    import jax, jax.numpy as jnp, numpy as np  # noqa: E401

    from pinn_depthestimation_tpu import data as data_mod, parallel
    from pinn_depthestimation_tpu.config import parse_config
    from pinn_depthestimation_tpu.models import MLPSpec, init_mlp_params
    from pinn_depthestimation_tpu.training.loss import (
        build_loss_fn, build_value_and_grad_fn,
    )

    mat = str(tmp_path / "d.mat")
    from pinn_depthestimation_tpu.utils import synthetic

    synthetic.make_newmethod_mat(mat, nx=40, ny=30, nan_fraction=0.05, seed=5)
    cfg = parse_config({
        "layers": {"input_features": 2, "hidden_layers": 12, "hidden_width": 20,
                   "output_features": 3, "dropout_rate": 0.0, "init_type": "xavier"},
        "adam_optimizer": {"max_it": 1, "learning_rate": 1e-3,
                           "scheduler_step_size": 100, "scheduler_gamma": 0.8},
        "lbfgs_optimizer": {"max_it": 0, "learning_rate": 1, "max_evaluation": 0,
                            "history_size": 10, "tolerance_grad": 1e-8,
                            "tolerance_change": 1e-11,
                            "line_search_fn": "strong_wolfe"},
        "loss": {"weight_fid_loss": 1, "weight_res_loss": 1},
        "data": {"file": mat, "inputs": {"x": {"requires_grad": ["true"]},
                                         "y": {"requires_grad": ["true"]}},
                 "trues": ["U", "V"], "unknowns": ["h"]},
    })
    spec = MLPSpec.from_layers(cfg.layers)
    params = init_mlp_params(jax.random.PRNGKey(7), spec)
    td = data_mod.load_training_data(cfg)
    batch = {"fidelity_input": jnp.asarray(td.fidelity_input),
             "fidelity_true": jnp.asarray(td.fidelity_true),
             "residual_input": jnp.asarray(td.residual_input)}
    base = dict(fused_kernel=True, fused_interpret=False,
                fidelity_is_residual=True, input_min_max=td.input_min_max)

    loss_fn = build_loss_fn(cfg, spec, fidelity_is_residual=True)
    (t_ref, _), g_ref = jax.jit(
        jax.value_and_grad(loss_fn, has_aux=True))(params, batch)

    def check(vg, b):
        (t, _), g = jax.jit(vg)(params, b)
        assert float(t) == pytest.approx(float(t_ref), rel=1e-5)
        for k in g_ref:
            a, c = np.asarray(g_ref[k]), np.asarray(g[k])
            if a.size == 0:
                continue
            scale = np.abs(a).max() + 1e-12
            np.testing.assert_allclose(c / scale, a / scale, atol=2e-4, err_msg=k)

    check(build_value_and_grad_fn(cfg, spec, **base), batch)
    mesh = parallel.make_mesh(1, devices=jax.devices()[:1])
    check(build_value_and_grad_fn(cfg, spec, **base, mesh=mesh),
          parallel.shard_batch({k: np.asarray(v) for k, v in batch.items()}, mesh))


def test_f64_polish_device_eval_on_tpu(tpu, tmp_path):
    """The ``f64_polish backend='device_eval'`` callback bridge on REAL
    hardware (round-4 VERDICT item 5). The bridge works around three
    thread-dependent JAX traps (driver.py::_make_device_eval_vg): callback
    outputs canonicalized f64->f32 on the runtime thread, thread-local
    ``enable_x64``, and 0-d ``ascontiguousarray`` promotion. A regression in
    any of them silently rounds every evaluation to f32 ON HARDWARE while
    passing all CPU tests (with no accelerator, device_eval degenerates to
    cpu semantics). This test asserts, on the chip:

    1. the values returned through the callback carry GENUINE f64 precision
       (bit-pattern check: mantissa bits beyond f32 survive the boundary),
    2. they match a pure host-CPU f64 evaluation of the same loss to f64
       tolerance (TPU f64 emulation is good to ~10 digits — CLAUDE.md), and
    3. a short end-to-end polish phase through the Trainer descends and
       lands where the bit-exact ``backend='cpu'`` polish lands.
    """
    import jax, jax.numpy as jnp, numpy as np  # noqa: E401

    from pinn_depthestimation_tpu.config import parse_config
    from pinn_depthestimation_tpu.training import Trainer, build_loss_fn
    from pinn_depthestimation_tpu.training.logging_utils import read_log
    from pinn_depthestimation_tpu.utils import synthetic

    mat = str(tmp_path / "d.mat")
    synthetic.make_newmethod_mat(mat, nx=30, ny=24, nan_fraction=0.02, seed=11)

    def make_cfg(backend):
        return parse_config({
            "layers": {"input_features": 2, "hidden_layers": 5,
                       "hidden_width": 20, "output_features": 3,
                       "dropout_rate": 0.0, "init_type": "xavier"},
            "adam_optimizer": {"max_it": 60, "learning_rate": 1e-3,
                               "scheduler_step_size": 100,
                               "scheduler_gamma": 0.8},
            "lbfgs_optimizer": {"max_it": 5, "learning_rate": 1,
                                "max_evaluation": 10, "history_size": 10,
                                "tolerance_grad": 1e-9,
                                "tolerance_change": 1e-12,
                                "line_search_fn": "strong_wolfe"},
            "loss": {"weight_fid_loss": 1, "weight_res_loss": 1},
            "f64_polish": {"max_it": 12, "max_evaluation": 20,
                           "backend": backend},
            "data": {"file": mat,
                     "inputs": {"x": {"requires_grad": ["true"]},
                                "y": {"requires_grad": ["true"]}},
                     "trues": ["U", "V"], "unknowns": ["h"]},
        })

    # --- run the device_eval arm (Adam -> f32 L-BFGS -> device_eval polish)
    run_dev = str(tmp_path / "run_dev"); os.makedirs(run_dev)
    tr = Trainer(make_cfg("device_eval"), run_dir=run_dev, echo_every=0)
    tr.train()
    _, _, _, totals_dev = read_log(run_dev)

    # --- 1+2: the raw callback bridge, checked value-by-value
    loss_fn = build_loss_fn(
        tr.config, tr.spec, input_min_max=tr.data.input_min_max,
        fidelity_is_residual=getattr(tr.data, "fidelity_is_residual", False),
    )
    cpu = jax.devices("cpu")[0]
    with jax.enable_x64():
        params64 = jax.tree.map(
            lambda a: jax.device_put(np.asarray(a, np.float64), cpu),
            tr.state.params,
        )
        batch64 = jax.tree.map(
            lambda a: jax.device_put(np.asarray(a, np.float64), cpu),
            {"fidelity_input": tr.data.fidelity_input,
             "fidelity_true": tr.data.fidelity_true,
             "residual_input": tr.data.residual_input},
        )
        vg = tr._make_device_eval_vg(loss_fn, params64, batch64)
        (total, (fid, res)), g = jax.jit(vg)(params64, batch64)
        # host-CPU f64 oracle of the exact same loss
        (t_ref, (f_ref, r_ref)), g_ref = jax.jit(
            jax.value_and_grad(loss_fn, has_aux=True), device=cpu
        )(params64, batch64)

    assert total.dtype == jnp.float64 and fid.dtype == jnp.float64
    for v in (float(total), float(fid), float(res)):
        # bit-pattern check: a silent f32 rounding anywhere across the
        # callback boundary makes the returned double exactly
        # f32-representable; genuine f64 values are not (P[coincidence]
        # ~ 2^-29 per value, and we check three)
        assert v != float(np.float64(np.float32(v))), (
            f"value {v!r} is exactly f32-representable — the device_eval "
            f"callback rounded to f32 on hardware (canonicalize/x64 trap)"
        )
    # TPU-f64 is emulated and the device program's reduction order differs
    # from the host's: measured agreement ~2e-9 rel (not bit-identical).
    # 1e-7 still cleanly separates genuine f64 compute from the trap's
    # silent f32 compute (~1e-5 at this conditioning); result-level f32
    # rounding is caught by the bit-pattern check above.
    np.testing.assert_allclose(float(total), float(t_ref), rtol=1e-7)
    np.testing.assert_allclose(float(fid), float(f_ref), rtol=1e-7)
    g_flat = np.concatenate([np.asarray(a).ravel() for a in jax.tree.leaves(g)])
    gr_flat = np.concatenate(
        [np.asarray(a).ravel() for a in jax.tree.leaves(g_ref)])
    scale = np.abs(gr_flat).max() + 1e-300
    np.testing.assert_allclose(g_flat / scale, gr_flat / scale, atol=1e-7)

    # --- 3: the phase descended and lands where the cpu-backend polish lands
    run_cpu = str(tmp_path / "run_cpu"); os.makedirs(run_cpu)
    tr2 = Trainer(make_cfg("cpu"), run_dir=run_cpu, echo_every=0)
    tr2.train()
    _, _, _, totals_cpu = read_log(run_cpu)
    assert min(totals_dev) <= totals_dev[0]
    gap = abs(np.log10(min(totals_dev)) - np.log10(min(totals_cpu)))
    assert gap < 0.02, (
        f"device_eval vs cpu polish terminal basins diverged: log10 gap "
        f"{gap:.4f} ({min(totals_dev):.6e} vs {min(totals_cpu):.6e})"
    )


def test_end_to_end_training_on_tpu(tpu, tmp_path):
    import numpy as np

    from pinn_depthestimation_tpu.config import parse_config
    from pinn_depthestimation_tpu.training import Trainer
    from pinn_depthestimation_tpu.training.logging_utils import read_log
    from pinn_depthestimation_tpu.utils import synthetic

    mat = str(tmp_path / "d.mat")
    synthetic.make_newmethod_mat(mat, nx=40, ny=30, nan_fraction=0.02, seed=0)
    cfg = parse_config({
        "layers": {"input_features": 2, "hidden_layers": 5, "hidden_width": 20,
                   "output_features": 3, "dropout_rate": 0.0, "init_type": "xavier"},
        "adam_optimizer": {"max_it": 200, "learning_rate": 1e-3,
                           "scheduler_step_size": 100, "scheduler_gamma": 0.8},
        "lbfgs_optimizer": {"max_it": 20, "learning_rate": 1, "max_evaluation": 40,
                            "history_size": 10, "tolerance_grad": 1e-8,
                            "tolerance_change": 1e-11, "line_search_fn": "strong_wolfe"},
        "loss": {"weight_fid_loss": 1, "weight_res_loss": 1},
        "fused_kernel": "on",
        "data": {"file": mat, "inputs": {"x": {"requires_grad": ["true"]},
                                         "y": {"requires_grad": ["true"]}},
                 "trues": ["U", "V"], "unknowns": ["h"]},
    })
    run_dir = str(tmp_path / "run"); os.makedirs(run_dir)
    tr = Trainer(cfg, run_dir=run_dir, echo_every=0)
    assert tr.use_fused_kernel
    tr.train()
    _, _, _, totals = read_log(run_dir)
    assert totals[-1] < totals[0] * 0.1
    assert all(np.isfinite(v) for v in totals)
