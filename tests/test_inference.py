import os

import numpy as np
import pytest

from pinn_depthestimation_tpu.config import parse_config
from pinn_depthestimation_tpu.inference import Predictor
from pinn_depthestimation_tpu.training import Trainer
from pinn_depthestimation_tpu.utils import synthetic


@pytest.fixture
def trained_run(tmp_path):
    mat = str(tmp_path / "data.mat")
    synthetic.make_newmethod_mat(mat, nx=12, ny=10, nan_fraction=0.0, seed=6)
    raw = {
        "layers": {"input_features": 2, "hidden_layers": 2, "hidden_width": 12,
                   "output_features": 3, "dropout_rate": 0.0, "init_type": "xavier"},
        "adam_optimizer": {"max_it": 30, "learning_rate": 1e-3,
                           "scheduler_step_size": 20, "scheduler_gamma": 0.8},
        "lbfgs_optimizer": {"max_it": 0, "learning_rate": 1, "max_evaluation": 0,
                            "history_size": 10, "tolerance_grad": 1e-9,
                            "tolerance_change": 1e-12, "line_search_fn": "strong_wolfe"},
        "loss": {"weight_fid_loss": 1, "weight_res_loss": 1},
        "data": {"file": mat,
                 "inputs": {"x": {"requires_grad": ["true"]},
                            "y": {"requires_grad": ["true"]}},
                 "trues": ["U", "V"], "unknowns": ["h"]},
        "data_test": {"file": mat,
                      "inputs": {"x": {"requires_grad": ["true"]},
                                 "y": {"requires_grad": ["true"]}},
                      "outputs": ["U", "V", "h"], "nx": 12, "ny": 10,
                      "x_min": 25.0, "x_max": 33.0, "y_min": -13.0, "y_max": 13.0},
    }
    cfg = parse_config(raw)
    run_dir = str(tmp_path / "run"); os.makedirs(run_dir)
    tr = Trainer(cfg, run_dir=run_dir, echo_every=0)
    tr.train()
    return cfg, tr, os.path.join(run_dir, "model.msgpack"), raw


def test_predictor_restores_and_predicts(trained_run):
    cfg, trainer, ckpt, raw = trained_run
    pred = Predictor(cfg, checkpoint_path=ckpt)
    # restored params equal trained params
    for k in trainer.state.params:
        np.testing.assert_array_equal(
            np.asarray(pred.params[k]), np.asarray(trainer.state.params[k])
        )
    result = pred.run()
    assert set(result.pred) == {"U", "V", "h"}
    assert result.pred["U"].shape == (10, 12)           # reshaped (ny, nx)
    assert set(result.true) == {"U", "V", "h"}
    # inputs come back denormalized to physical coordinates
    assert result.inputs["x"].min() == pytest.approx(25.0, abs=1e-4)
    assert result.inputs["x"].max() == pytest.approx(33.0, abs=1e-4)
    assert not result.adapted


def test_predictions_match_trainer(trained_run):
    cfg, trainer, ckpt, raw = trained_run
    pred = Predictor(cfg, checkpoint_path=ckpt)
    from pinn_depthestimation_tpu import data as data_mod

    td = data_mod.load_test_data(cfg)
    via_predictor = pred.predict(td.inputs)
    via_trainer = trainer.predict(td.inputs)
    np.testing.assert_array_equal(via_predictor, via_trainer)


def test_test_time_adaptation_changes_params(trained_run):
    cfg, trainer, ckpt, raw = trained_run
    raw = dict(raw)
    raw["perform_optimization"] = True
    cfg2 = parse_config(raw)
    pred = Predictor(cfg2, checkpoint_path=ckpt)
    before = {k: np.asarray(v).copy() for k, v in pred.params.items()}
    result = pred.run()
    assert result.adapted
    changed = any(
        not np.array_equal(before[k], np.asarray(pred.params[k])) for k in before
    )
    assert changed, "1-step physics L-BFGS must move the parameters"


def test_adapt_respects_eval_budget(trained_run):
    cfg, trainer, ckpt, raw = trained_run
    pred = Predictor(cfg, checkpoint_path=ckpt)
    from pinn_depthestimation_tpu import data as data_mod

    td = data_mod.load_test_data(cfg)
    evals = pred.adapt(td.inputs, max_iter=1, max_eval=2)
    # reference TTA: max_iter=1, max_eval=2 (test.py:48-49); line search may
    # consume the post-iteration budget check's slack
    assert 2 <= evals <= 2 + 26


def test_missing_checkpoint_errors(trained_run):
    cfg, trainer, ckpt, raw = trained_run
    with pytest.raises(Exception):
        Predictor(cfg, checkpoint_path=ckpt + ".nope")
