import json

import numpy as np
import pytest

from pinn_depthestimation_tpu import data as data_mod
from pinn_depthestimation_tpu.config import parse_config
from pinn_depthestimation_tpu.utils import synthetic


@pytest.fixture
def newmethod_config(tmp_path):
    mat = tmp_path / "data.mat"
    synthetic.make_newmethod_mat(str(mat), nx=21, ny=31, nan_fraction=0.1, seed=3)
    raw = {
        "layers": {"input_features": 2, "hidden_layers": 3, "hidden_width": 16,
                   "output_features": 3, "dropout_rate": 0.0, "init_type": "xavier"},
        "adam_optimizer": {"max_it": 10, "learning_rate": 1e-3,
                           "scheduler_step_size": 5, "scheduler_gamma": 0.8},
        "lbfgs_optimizer": {"max_it": 5, "learning_rate": 1, "max_evaluation": 10,
                            "history_size": 10, "tolerance_grad": 1e-7,
                            "tolerance_change": 1e-9, "line_search_fn": "strong_wolfe"},
        "loss": {"weight_fid_loss": 1, "weight_res_loss": 1},
        "data": {"file": str(mat),
                 "inputs": {"x": {"requires_grad": ["true"]},
                            "y": {"requires_grad": ["true"]}},
                 "trues": ["U", "V"], "unknowns": ["h"]},
        "data_test": {"file": str(mat),
                      "inputs": {"x": {"requires_grad": ["true"]},
                                 "y": {"requires_grad": ["true"]}},
                      "outputs": ["U", "V"], "nx": 21, "ny": 31,
                      "x_min": 25.0, "x_max": 33.0, "y_min": -13.0, "y_max": 13.0},
    }
    return parse_config(raw)


def test_newmethod_loader(newmethod_config):
    td = data_mod.load_newmethod_training_data(newmethod_config)
    n_total = 21 * 31
    n_nan = int(0.1 * n_total)
    assert td.fidelity_input.shape == (n_total - n_nan, 2)
    assert td.fidelity_true.shape == (n_total - n_nan, 2)
    # residual set == fidelity inputs in the newmethod pipeline
    np.testing.assert_array_equal(td.residual_input, td.fidelity_input)
    # inputs normalized with the config x/y bounds -> exactly [-1, 1]
    assert td.fidelity_input.min() >= -1.0 - 1e-6
    assert td.fidelity_input.max() <= 1.0 + 1e-6
    assert td.input_min_max["x"] == (25.0, 33.0)
    assert td.input_min_max["y"] == (-13.0, 13.0)
    # trues are raw (never normalized) and NaN-free after masking
    assert np.isfinite(td.fidelity_true).all()
    assert np.abs(td.fidelity_true).max() < 1.0  # synthetic velocities are small


@pytest.fixture
def cmb_config(tmp_path):
    csv = tmp_path / "fid.csv"
    mat = tmp_path / "res.mat"
    synthetic.make_cmb_dataset(str(csv), str(mat), nx=21, ny=31, n_csv=100, seed=5)
    raw = {
        "layers": {"input_features": 2, "hidden_layers": 3, "hidden_width": 16,
                   "output_features": 6, "dropout_rate": 0.0, "init_type": "xavier"},
        "adam_optimizer": {"max_it": 10, "learning_rate": 1e-3,
                           "scheduler_step_size": 5, "scheduler_gamma": 0.8},
        "lbfgs_optimizer": {"max_it": 5, "learning_rate": 1, "max_evaluation": 10,
                            "history_size": 10, "tolerance_grad": 1e-7,
                            "tolerance_change": 1e-9, "line_search_fn": "strong_wolfe"},
        "loss": {"weight_fid_loss": 1, "weight_res_loss": 1,
                 "weight_h_loss": 1, "weight_U_loss": 1, "weight_V_loss": 1,
                 "weight_eta_mean_loss": 1, "weight_Hrms_loss": 1, "weight_k_loss": 1},
        "data_fidelity": {"file": str(csv), "inputs": ["x", "y"],
                          "outputs": ["h", "U", "V", "eta_mean", "Hrms", "k"],
                          "training_points": 40},
        "data_residual": {"file": str(mat),
                          "inputs": {"x": {"requires_grad": ["true"]},
                                     "y": {"requires_grad": ["true"]}},
                          "outputs": ["h", "U", "V", "eta_mean", "Hrms", "k"],
                          "snapshots": [1], "interval_x": 2, "interval_y": 2},
        "data_test": {"file": str(mat),
                      "inputs": {"x": {"requires_grad": ["true"]},
                                 "y": {"requires_grad": ["true"]}},
                      "outputs": ["h", "U", "V"], "nx": 21, "ny": 31,
                      "x_min": 25.0, "x_max": 33.0, "y_min": -13.0, "y_max": 13.0},
    }
    return parse_config(raw)


def test_cmb_loader(cmb_config):
    td = data_mod.load_cmb_training_data(cmb_config)
    assert td.fidelity_input.shape == (40, 2)
    assert td.fidelity_true.shape == (40, 6)
    # strided grid is (ceil(31/2) x ceil(21/2)) minus NaN rows
    assert td.residual_input.shape[1] == 2
    assert td.residual_input.shape[0] <= 16 * 11
    assert np.isfinite(td.residual_input).all()
    # residual inputs normalized with the *fidelity* bounds (config override)
    assert td.input_min_max["x"] == (25.0, 33.0)


def test_cmb_loader_deterministic_subsample(cmb_config):
    a = data_mod.load_cmb_training_data(cmb_config, np.random.RandomState(1234))
    b = data_mod.load_cmb_training_data(cmb_config, np.random.RandomState(1234))
    np.testing.assert_array_equal(a.fidelity_input, b.fidelity_input)


def test_fortran_order_flatten():
    """The residual grid flatten must be Fortran order (reference train.py:265-267)."""
    arr = np.arange(6.0).reshape(2, 3)
    col = data_mod._fortran_column(arr)
    np.testing.assert_array_equal(col.ravel(), arr.flatten(order="F"))


def test_test_loader(newmethod_config):
    td = data_mod.load_test_data(newmethod_config)
    assert td.inputs.shape == (21 * 31, 2)
    assert set(td.trues) == {"U", "V"}
    # C-order flatten: first row of the grid comes first
    grid_x = synthetic.grid(21, 31)[0]
    expected_first = (2 * (grid_x.reshape(-1)[0] - 25.0) / 8.0) - 1.0
    assert td.inputs[0, 0] == pytest.approx(expected_first, rel=1e-6)


def test_dispatch_loader(newmethod_config, cmb_config):
    assert data_mod.load_training_data(newmethod_config).fidelity_true.shape[1] == 2
    assert data_mod.load_training_data(cmb_config).fidelity_true.shape[1] == 6


def test_config_roundtrip_through_json(tmp_path, newmethod_config):
    # configs serialized and reloaded must behave identically
    p = tmp_path / "cfg.json"
    p.write_text(json.dumps(newmethod_config.raw))
    from pinn_depthestimation_tpu.config import load_config

    cfg2 = load_config(str(p))
    assert cfg2.kind == newmethod_config.kind
    assert cfg2.layers == newmethod_config.layers


def test_cmb_training_points_zero_means_all_rows(tmp_path):
    """training_points=0/absent uses every fidelity row (the raw reference
    call would silently produce an EMPTY set), and an over-large request
    keeps all rows instead of raising."""
    from pinn_depthestimation_tpu.utils import synthetic

    csv = str(tmp_path / "fid.csv")
    mat = str(tmp_path / "res.mat")
    synthetic.make_cmb_dataset(csv, mat, nx=9, ny=7, n_csv=25, seed=0)
    base = {
        "layers": {"input_features": 2, "hidden_layers": 2, "hidden_width": 8,
                   "output_features": 6, "dropout_rate": 0.0,
                   "init_type": "xavier"},
        "adam_optimizer": {"max_it": 1, "learning_rate": 1e-4,
                           "scheduler_step_size": 5, "scheduler_gamma": 0.8},
        "lbfgs_optimizer": {"max_it": 0, "learning_rate": 1,
                            "max_evaluation": 0, "history_size": 5,
                            "tolerance_grad": 1e-9, "tolerance_change": 1e-12},
        "loss": {"weight_fid_loss": 1, "weight_res_loss": 1},
        "data_fidelity": {"file": csv, "inputs": ["x", "y"],
                          "outputs": ["h", "U", "V", "eta_mean", "Hrms", "k"]},
        "data_residual": {"file": mat,
                          "inputs": {"x": {"requires_grad": ["true"]},
                                     "y": {"requires_grad": ["true"]}},
                          "outputs": ["h", "U", "V", "eta_mean", "Hrms", "k"],
                          "interval_x": 1, "interval_y": 1},
        "data_test": {"x_min": 25.0, "x_max": 33.0,
                      "y_min": -13.0, "y_max": 13.0},
        "physics": "wave_averaged",
    }
    td = data_mod.load_cmb_training_data(parse_config(base))
    assert td.fidelity_input.shape[0] == 25     # all rows

    base["data_fidelity"]["training_points"] = 10_000
    td = data_mod.load_cmb_training_data(parse_config(base))
    assert td.fidelity_input.shape[0] == 25     # clamped, not an error

    base["data_fidelity"]["training_points"] = 10
    td = data_mod.load_cmb_training_data(parse_config(base))
    assert td.fidelity_input.shape[0] == 10     # the reference subsample
