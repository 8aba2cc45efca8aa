"""Time-dependent (t, x, y) Navier-Stokes training — the capability of the
legacy ``config.json``/``config_txyz.json`` era (reference ``physics.py:50-88``),
expressed in the current schema. The legacy configs themselves are stale and
cannot run even in the reference (SURVEY.md §5 quirk 5); this framework keeps
the equation fully operational through the generic loss builder."""

import os

import numpy as np
import pytest
from scipy.io import savemat

from pinn_depthestimation_tpu.config import parse_config
from pinn_depthestimation_tpu.training import Trainer
from pinn_depthestimation_tpu.training.logging_utils import read_log


@pytest.fixture
def txyz_config(tmp_path):
    rs = np.random.RandomState(9)
    n = 600
    t = rs.uniform(0, 10, (n, 1))
    x = rs.uniform(0, 500, (n, 1))
    y = rs.uniform(0, 1000, (n, 1))
    z = 0.1 * np.sin(0.05 * x + 0.3 * t)
    u = 0.2 * np.cos(0.05 * x + 0.3 * t)
    v = 0.05 * np.sin(0.01 * y)
    h = 2.0 - 0.002 * x
    mat = str(tmp_path / "txyz.mat")
    savemat(mat, {"t": t, "x": x, "y": y, "z": z, "u": u, "v": v, "h": h})
    raw = {
        "layers": {"input_features": 3, "hidden_layers": 3, "hidden_width": 20,
                   "output_features": 4, "dropout_rate": 0.0, "init_type": "xavier"},
        "adam_optimizer": {"max_it": 25, "learning_rate": 1e-3,
                           "scheduler_step_size": 10000, "scheduler_gamma": 0.8},
        "lbfgs_optimizer": {"max_it": 5, "learning_rate": 1, "max_evaluation": 15,
                            "history_size": 10, "tolerance_grad": 1e-9,
                            "tolerance_change": 1e-12, "line_search_fn": "strong_wolfe"},
        "loss": {"weight_fid_loss": 1, "weight_res_loss": 100000},  # config.json:28
        "physics": "navier_stokes",
        "data": {"file": mat,
                 "inputs": {"t": {"requires_grad": ["true"]},
                            "x": {"requires_grad": ["true"]},
                            "y": {"requires_grad": ["true"]}},
                 "trues": ["h", "z", "u"], "unknowns": ["v"]},
        "data_test": {"x_min": 0, "x_max": 500, "y_min": 0, "y_max": 1000},
    }
    return parse_config(raw)


def test_navier_stokes_training_runs(txyz_config, tmp_path):
    run_dir = str(tmp_path / "run"); os.makedirs(run_dir)
    tr = Trainer(txyz_config, run_dir=run_dir, echo_every=0)
    tr.train()
    epochs, fids, ress, totals = read_log(run_dir)
    assert len(epochs) >= 26
    assert all(np.isfinite(v) for v in totals)
    assert totals[-1] < totals[0]


def test_navier_stokes_requires_t_grad(txyz_config):
    raw = dict(txyz_config.raw)
    raw["data"] = dict(raw["data"])
    raw["data"]["inputs"] = {"t": {"requires_grad": ["false"]},
                             "x": {"requires_grad": ["true"]},
                             "y": {"requires_grad": ["true"]}}
    cfg = parse_config(raw)
    from pinn_depthestimation_tpu.models import MLPSpec
    from pinn_depthestimation_tpu.training import build_loss_fn

    with pytest.raises(ValueError, match="requires_grad=false"):
        build_loss_fn(cfg, MLPSpec.from_layers(cfg.layers))
