"""Data-parallel mesh tests on 8 fake CPU devices (SURVEY.md §4
'Distributed without a cluster')."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pinn_depthestimation_tpu import parallel
from pinn_depthestimation_tpu.config import parse_config
from pinn_depthestimation_tpu.models import MLPSpec, init_mlp_params
from pinn_depthestimation_tpu.training import Trainer, build_loss_fn
from pinn_depthestimation_tpu.training.logging_utils import read_log
from pinn_depthestimation_tpu.utils import synthetic


def _config(tmp_path, n_nan=0.0, adam_it=10, lbfgs_it=5):
    mat = str(tmp_path / "data.mat")
    synthetic.make_newmethod_mat(mat, nx=13, ny=17, nan_fraction=n_nan, seed=4)
    return parse_config({
        "layers": {"input_features": 2, "hidden_layers": 3, "hidden_width": 16,
                   "output_features": 3, "dropout_rate": 0.0, "init_type": "xavier"},
        "adam_optimizer": {"max_it": adam_it, "learning_rate": 1e-3,
                           "scheduler_step_size": 30, "scheduler_gamma": 0.8},
        "lbfgs_optimizer": {"max_it": lbfgs_it, "learning_rate": 1,
                            "max_evaluation": 4 * lbfgs_it if lbfgs_it else 0,
                            "history_size": 10, "tolerance_grad": 1e-9,
                            "tolerance_change": 1e-12, "line_search_fn": "strong_wolfe"},
        "loss": {"weight_fid_loss": 1, "weight_res_loss": 1},
        "data": {"file": mat,
                 "inputs": {"x": {"requires_grad": ["true"]},
                            "y": {"requires_grad": ["true"]}},
                 "trues": ["U", "V"], "unknowns": ["h"]},
    })


def test_make_mesh_shapes():
    mesh = parallel.make_mesh()
    assert mesh.shape == {"data": 8, "model": 1}
    mesh = parallel.make_mesh(4)
    assert mesh.shape == {"data": 4, "model": 1}
    mesh = parallel.make_mesh(4, 2)
    assert mesh.shape == {"data": 4, "model": 2}
    with pytest.raises(ValueError, match="devices"):
        parallel.make_mesh(16)


def test_pad_to_multiple():
    arr = np.arange(10, dtype=np.float32).reshape(5, 2)
    padded, mask = parallel.pad_to_multiple(arr, 8)
    assert padded.shape == (8, 2)
    np.testing.assert_array_equal(mask, [1, 1, 1, 1, 1, 0, 0, 0])
    np.testing.assert_array_equal(padded[5:], np.broadcast_to(arr[:1], (3, 2)))
    with pytest.raises(ValueError, match="empty"):
        parallel.pad_to_multiple(np.zeros((0, 2), np.float32), 8)


def test_sharded_loss_equals_unsharded(tmp_path):
    """The load-bearing property: sharding + masked means must reproduce the
    single-device full-batch loss and gradient exactly (up to f32 reduction
    order)."""
    cfg = _config(tmp_path, n_nan=0.07)  # odd row count -> padding exercised
    from pinn_depthestimation_tpu import data as data_mod

    td = data_mod.load_training_data(cfg)
    spec = MLPSpec.from_layers(cfg.layers)
    params = init_mlp_params(jax.random.PRNGKey(0), spec)
    loss_fn = build_loss_fn(cfg, spec)

    batch_plain = {
        "fidelity_input": jnp.asarray(td.fidelity_input),
        "fidelity_true": jnp.asarray(td.fidelity_true),
        "residual_input": jnp.asarray(td.residual_input),
    }
    (total_ref, (fid_ref, res_ref)), grads_ref = jax.value_and_grad(
        loss_fn, has_aux=True
    )(params, batch_plain)

    mesh = parallel.make_mesh(8)
    batch_sharded = parallel.shard_batch(
        {"fidelity_input": td.fidelity_input,
         "fidelity_true": td.fidelity_true,
         "residual_input": td.residual_input},
        mesh,
    )
    params_repl = parallel.replicate(params, mesh)
    (total_sh, (fid_sh, res_sh)), grads_sh = jax.jit(
        jax.value_and_grad(loss_fn, has_aux=True)
    )(params_repl, batch_sharded)

    np.testing.assert_allclose(float(total_sh), float(total_ref), rtol=2e-5)
    np.testing.assert_allclose(float(fid_sh), float(fid_ref), rtol=2e-5)
    np.testing.assert_allclose(float(res_sh), float(res_ref), rtol=2e-5)
    for k in grads_ref:
        np.testing.assert_allclose(
            np.asarray(grads_sh[k]), np.asarray(grads_ref[k]), rtol=1e-3, atol=1e-6
        )


def test_trainer_on_mesh_matches_single_device(tmp_path):
    cfg = _config(tmp_path, n_nan=0.05, adam_it=12, lbfgs_it=4)

    run_a = str(tmp_path / "single"); os.makedirs(run_a)
    tr_a = Trainer(cfg, run_dir=run_a, echo_every=0)
    tr_a.train()

    run_b = str(tmp_path / "mesh"); os.makedirs(run_b)
    mesh = parallel.make_mesh(8)
    tr_b = Trainer(cfg, run_dir=run_b, mesh=mesh, echo_every=0)
    tr_b.train()

    _, _, _, totals_a = read_log(run_a)
    _, _, _, totals_b = read_log(run_b)
    assert len(totals_a) == len(totals_b)
    # same full-batch numerics up to f32 reduction order
    np.testing.assert_allclose(totals_a, totals_b, rtol=2e-3)
    for k in tr_a.state.params:
        np.testing.assert_allclose(
            np.asarray(tr_a.state.params[k]),
            np.asarray(tr_b.state.params[k]),
            rtol=5e-2, atol=5e-4,  # trajectories drift slightly in f32
        )


def test_sharded_array_layout(tmp_path):
    cfg = _config(tmp_path)
    from pinn_depthestimation_tpu import data as data_mod

    td = data_mod.load_training_data(cfg)
    mesh = parallel.make_mesh(8)
    batch = parallel.shard_batch({"residual_input": td.residual_input}, mesh)
    arr = batch["residual_input"]
    assert arr.shape[0] % 8 == 0
    # actually distributed: each device holds 1/8 of the rows
    shard_rows = {s.data.shape[0] for s in arr.addressable_shards}
    assert shard_rows == {arr.shape[0] // 8}
    assert "residual_mask" in batch


def _cmb_config(tmp_path, *, adam_it=6, lbfgs_it=0):
    """CMB-pipeline config: separate fidelity CSV + residual .mat grid,
    wave_averaged corrected physics — the second pipeline's mesh coverage
    (VERDICT r3 item 3)."""
    csv = str(tmp_path / "fid.csv")
    mat = str(tmp_path / "res.mat")
    synthetic.make_cmb_dataset(csv, mat, nx=15, ny=13, n_csv=77, seed=6,
                               nan_fraction=0.03)
    return parse_config({
        "layers": {"input_features": 2, "hidden_layers": 3, "hidden_width": 16,
                   "output_features": 6, "dropout_rate": 0.0, "init_type": "xavier"},
        "adam_optimizer": {"max_it": adam_it, "learning_rate": 1e-4,
                           "scheduler_step_size": 100, "scheduler_gamma": 0.8},
        "lbfgs_optimizer": {"max_it": lbfgs_it, "learning_rate": 1,
                            "max_evaluation": 4 * lbfgs_it, "history_size": 10,
                            "tolerance_grad": 1e-9, "tolerance_change": 1e-12,
                            "line_search_fn": "strong_wolfe"},
        "loss": {"weight_fid_loss": 1, "weight_res_loss": 1,
                 "weight_h_loss": 2, "weight_U_loss": 1, "weight_V_loss": 1,
                 "weight_eta_mean_loss": 1, "weight_Hrms_loss": 0.5,
                 "weight_k_loss": 0.5},
        "data_fidelity": {"file": csv, "inputs": ["x", "y"],
                          "outputs": ["h", "U", "V", "eta_mean", "Hrms", "k"],
                          "training_points": 60},
        "data_residual": {"file": mat,
                          "inputs": {"x": {"requires_grad": ["true"]},
                                     "y": {"requires_grad": ["true"]}},
                          "outputs": ["h", "U", "V", "eta_mean", "Hrms", "k"],
                          "interval_x": 1, "interval_y": 1},
        "data_test": {"x_min": 25.0, "x_max": 33.0,
                      "y_min": -13.0, "y_max": 13.0},
        "physics": "wave_averaged",
        "parity": False,
    })


def _eta_shifted_params(spec, eta_col):
    """Random init with the eta_mean head shifted so eta+h stays O(1)
    positive (the physical regime; keeps the 1/(rho*(eta+h)) pole from
    amplifying f32 reduction-order differences into the comparison)."""
    params = dict(init_mlp_params(jax.random.PRNGKey(0), spec))
    params["b_out"] = params["b_out"].at[eta_col].add(1.0)
    return params


def test_sharded_cmb_separate_fidelity_matches_plain(tmp_path):
    """The CMB sharded path: ONE shard_map computing the per-shard fused
    residual stats AND the per-shard separate fidelity forward (observation
    points genuinely differ from collocation points), psum'd — loss and
    GRADIENTS must equal the plain single-device value_and_grad
    (training/loss.py fused+mesh branch with share_forward=False)."""
    from pinn_depthestimation_tpu import data as data_mod

    cfg = _cmb_config(tmp_path)
    td = data_mod.load_training_data(cfg)
    assert not td.fidelity_is_residual
    spec = MLPSpec.from_layers(cfg.layers)
    params = _eta_shifted_params(spec, eta_col=3)

    loss_plain = build_loss_fn(cfg, spec)
    batch_plain = {
        "fidelity_input": jnp.asarray(td.fidelity_input),
        "fidelity_true": jnp.asarray(td.fidelity_true),
        "residual_input": jnp.asarray(td.residual_input),
    }
    (t_ref, (f_ref, r_ref)), g_ref = jax.jit(
        jax.value_and_grad(loss_plain, has_aux=True)
    )(params, batch_plain)

    mesh = parallel.make_mesh(8)
    batch_sharded = parallel.shard_batch(
        {"fidelity_input": td.fidelity_input,
         "fidelity_true": td.fidelity_true,
         "residual_input": td.residual_input},
        mesh,
    )
    params_repl = parallel.replicate(params, mesh)
    loss_sharded = build_loss_fn(
        cfg, spec, fused_kernel=True, fused_interpret=True, mesh=mesh
    )
    (t_sh, (f_sh, r_sh)), g_sh = jax.jit(
        jax.value_and_grad(loss_sharded, has_aux=True)
    )(params_repl, batch_sharded)

    # 5e-4: the fused kernel's packed-lane forward reorders f32 sums and the
    # wave_averaged residual amplifies them moderately even in the shifted
    # regime; structural defects (head mix-ups, wrong psum) would be O(1)
    np.testing.assert_allclose(float(t_sh), float(t_ref), rtol=5e-4)
    np.testing.assert_allclose(float(f_sh), float(f_ref), rtol=5e-4)
    np.testing.assert_allclose(float(r_sh), float(r_ref), rtol=5e-4)
    for k in g_ref:
        a, b = np.asarray(g_ref[k]), np.asarray(g_sh[k])
        scale = np.abs(a).max() + 1e-12
        np.testing.assert_allclose(b / scale, a / scale, atol=5e-4, err_msg=k)


def test_trainer_on_mesh_cmb_matches_single_device(tmp_path):
    """Trainer wiring for the CMB pipeline on a mesh (separate fidelity and
    residual sets, different row counts, both padded+masked)."""
    cfg = _cmb_config(tmp_path, adam_it=6, lbfgs_it=2)

    run_a = str(tmp_path / "single"); os.makedirs(run_a)
    tr_a = Trainer(cfg, run_dir=run_a, echo_every=0)
    tr_a.train()

    run_b = str(tmp_path / "mesh"); os.makedirs(run_b)
    mesh = parallel.make_mesh(8)
    tr_b = Trainer(cfg, run_dir=run_b, mesh=mesh, echo_every=0)
    tr_b.train()

    _, fids_a, ress_a, totals_a = read_log(run_a)
    _, fids_b, ress_b, totals_b = read_log(run_b)
    assert len(totals_a) == len(totals_b)
    np.testing.assert_allclose(totals_a, totals_b, rtol=2e-3)
    np.testing.assert_allclose(fids_a, fids_b, rtol=2e-3)


def test_sharded_navier_stokes_matches_plain(tmp_path):
    """Sharded navier_stokes (t,x,y differentiated coordinates — the legacy
    numerical_model pipeline): loss and gradients on the 8-device mesh equal
    the plain single-device run, through BOTH the GSPMD jit path and the
    fused(interpret)+shard_map stats path."""
    from pinn_depthestimation_tpu import data as data_mod

    snap_dir, csv = synthetic.make_funwave_snapshot_dir(
        str(tmp_path / "beach2d"), nx=13, ny=11, dx=2.0, dy=2.0,
        snapshots=(200, 201), seed=3,
    )
    cfg = parse_config({
        "layers": {"input_features": 5, "hidden_layers": 3, "hidden_width": 16,
                   "output_features": 4, "dropout_rate": 0.0, "init_type": "xavier"},
        "adam_optimizer": {"max_it": 2, "learning_rate": 1e-3,
                           "scheduler_step_size": 100, "scheduler_gamma": 0.8},
        "lbfgs_optimizer": {"max_it": 0, "learning_rate": 1, "max_evaluation": 0,
                            "history_size": 10, "tolerance_grad": 1e-9,
                            "tolerance_change": 1e-12,
                            "line_search_fn": "strong_wolfe"},
        "loss": {"weight_fid_loss": 1, "weight_res_loss": 1},
        "data_fidelity": {"dir": csv,
                          "inputs": ["t", "x", "y", "u", "v"],
                          "outputs": ["h", "z", "u", "v"],
                          "training_points": 64},
        "data_residual": {
            "inputs": {"t": {"file": "t", "requires_grad": ["true"]},
                       "x": {"file": "X", "requires_grad": ["true"]},
                       "y": {"file": "Y", "requires_grad": ["true"]},
                       "u": {"file": "u", "requires_grad": ["false"]},
                       "v": {"file": "v", "requires_grad": ["false"]}},
            "outputs": {"h": {"file": "dep.out"}, "z": {"file": "eta"},
                        "u": {"file": "u"}, "v": {"file": "v"}},
            "numerical_model_snapshots": [200, 201],
        },
        "numerical_model": {"dir": snap_dir, "nx": 13, "ny": 11,
                            "dx": 2.0, "dy": 2.0,
                            "x_min": 0.0, "x_max": 24.0,
                            "y_min": 0.0, "y_max": 20.0,
                            "interval_x": 2, "interval_y": 2,
                            "dt": 1.0, "number_of_files": 501},
        "physics": "navier_stokes",
    })
    td = data_mod.load_training_data(cfg)
    spec = MLPSpec.from_layers(cfg.layers)
    params = init_mlp_params(jax.random.PRNGKey(0), spec)

    loss_plain = build_loss_fn(cfg, spec)
    batch_plain = {
        "fidelity_input": jnp.asarray(td.fidelity_input),
        "fidelity_true": jnp.asarray(td.fidelity_true),
        "residual_input": jnp.asarray(td.residual_input),
    }
    (t_ref, (f_ref, r_ref)), g_ref = jax.jit(
        jax.value_and_grad(loss_plain, has_aux=True)
    )(params, batch_plain)

    mesh = parallel.make_mesh(8)
    batch_sharded = parallel.shard_batch(
        {"fidelity_input": td.fidelity_input,
         "fidelity_true": td.fidelity_true,
         "residual_input": td.residual_input},
        mesh,
    )
    params_repl = parallel.replicate(params, mesh)

    # (a) GSPMD jit path (what a non-fused multi-chip run executes)
    (t_sh, _), g_sh = jax.jit(jax.value_and_grad(loss_plain, has_aux=True))(
        params_repl, batch_sharded
    )
    np.testing.assert_allclose(float(t_sh), float(t_ref), rtol=2e-5)
    for k in g_ref:
        a, b = np.asarray(g_ref[k]), np.asarray(g_sh[k])
        scale = np.abs(a).max() + 1e-12
        np.testing.assert_allclose(b / scale, a / scale, atol=1e-4, err_msg=k)

    # (b) fused(interpret)+shard_map stats path (three tangent streams t,x,y)
    loss_fused = build_loss_fn(
        cfg, spec, fused_kernel=True, fused_interpret=True, mesh=mesh
    )
    (t_f, _), g_f = jax.jit(jax.value_and_grad(loss_fused, has_aux=True))(
        params_repl, batch_sharded
    )
    np.testing.assert_allclose(float(t_f), float(t_ref), rtol=1e-4)
    for k in g_ref:
        a, b = np.asarray(g_ref[k]), np.asarray(g_f[k])
        scale = np.abs(a).max() + 1e-12
        np.testing.assert_allclose(b / scale, a / scale, atol=2e-4, err_msg=k)
