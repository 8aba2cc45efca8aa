"""Golden test against the ACTUAL reference implementation.

Runs the reference's own ``train_newmethod.py`` (the one shipped pipeline that
executes without crashing — the CMB script hits the stale 2-arg
``get_min_max``, SURVEY.md §5 quirk 4) in a sandbox with a small config and
synthetic data, then runs this framework's Trainer on the same data with the
reference's exact torch-seeded initial weights injected. Per-iteration losses
from the two ``log.txt`` files must agree.

The reference sources are copied from the read-only mount into a temp dir at
test time (never into this repo); the test skips if the mount is absent.
"""

import json
import os
import shutil
import subprocess
import sys

import numpy as np
import pytest

REFERENCE = "/root/reference"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REFERENCE), reason="reference mount not available"
)

ADAM_IT = 40
LBFGS_IT = 8


def _reference_config(mat_path):
    return {
        "layers": {"input_features": 2, "hidden_layers": 3, "hidden_width": 16,
                   "output_features": 3, "dropout_rate": 0.0, "init_type": "xavier"},
        "adam_optimizer": {"max_it": ADAM_IT, "learning_rate": 1e-3,
                           "scheduler_step_size": 20, "scheduler_gamma": 0.8},
        "lbfgs_optimizer": {"max_it": LBFGS_IT, "learning_rate": 1,
                            "max_evaluation": LBFGS_IT * 3, "history_size": 10,
                            "tolerance_grad": 1e-10, "tolerance_change": 1e-13,
                            "line_search_fn": "strong_wolfe"},
        "loss": {"weight_fid_loss": 1, "weight_res_loss": 1},
        "data": {"file": mat_path,
                 "inputs": {"x": {"requires_grad": ["true"]},
                            "y": {"requires_grad": ["true"]}},
                 "trues": ["U", "V"], "unknowns": ["h"]},
        "data_test": {"model": "unused", "file": mat_path,
                      "inputs": {"x": {"requires_grad": ["true"]},
                                 "y": {"requires_grad": ["true"]}},
                      "outputs": ["U", "V", "h"], "nx": 16, "ny": 14,
                      "dx": 0.1, "dy": 0.1,
                      "x_min": 25.0, "x_max": 33.0, "y_min": -13.0, "y_max": 13.0,
                      "dt": 1.0},
        "plot": {"font_size": 14, "x_limits": [25, 33], "y_limits": [-13, 13],
                 "c_limits": [-1, 1], "eta_limits": [-1, 1], "dir": "plots"},
    }


def _read_reference_log(log_root):
    runs = sorted(os.listdir(log_root))
    assert runs, "reference produced no log dir"
    path = os.path.join(log_root, runs[-1], "log.txt")
    totals, fids, ress = [], [], []
    with open(path) as f:
        next(f)
        for line in f:
            _, fid, res, tot = line.split(", ")
            fids.append(float(fid)); ress.append(float(res)); totals.append(float(tot))
    return fids, ress, totals


@pytest.fixture(scope="module")
def golden(tmp_path_factory):
    """Run the actual reference training script in a sandbox."""
    from pinn_depthestimation_tpu.utils import synthetic

    tmp = tmp_path_factory.mktemp("golden")
    workdir = tmp / "ref"
    workdir.mkdir()
    for name in ("train_newmethod.py", "dnn.py", "physics.py", "operations.py"):
        shutil.copy(os.path.join(REFERENCE, name), workdir / name)

    mat = str(tmp / "data.mat")
    synthetic.make_newmethod_mat(mat, nx=16, ny=14, nan_fraction=0.05, seed=21)
    (workdir / "config_CMB_h.json").write_text(json.dumps(_reference_config(mat)))

    env = dict(os.environ, CUDA_VISIBLE_DEVICES="")
    proc = subprocess.run(
        [sys.executable, "train_newmethod.py"],
        cwd=workdir, env=env, capture_output=True, text=True, timeout=600,
    )
    assert proc.returncode == 0, f"reference failed:\n{proc.stdout}\n{proc.stderr}"
    fids, ress, totals = _read_reference_log(str(tmp / "log"))

    # the reference's exact initial weights: replay its seeding + DNN build
    import torch

    sys.path.insert(0, str(workdir))
    try:
        import importlib

        dnn_mod = importlib.import_module("dnn")
        importlib.reload(dnn_mod)
        torch.manual_seed(1234)
        layers = [2] + [16] * 3 + [3]
        ref_model = dnn_mod.DNN(layers, 0.0, "xavier")
    finally:
        sys.path.pop(0)

    linears = [m for m in ref_model.layers if isinstance(m, torch.nn.Linear)]
    import jax.numpy as jnp

    params = {
        "w_in": jnp.asarray(linears[0].weight.detach().numpy().T),
        "b_in": jnp.asarray(linears[0].bias.detach().numpy()),
        "w_hidden": jnp.stack(
            [jnp.asarray(l.weight.detach().numpy().T) for l in linears[1:-1]]
        ),
        "b_hidden": jnp.stack(
            [jnp.asarray(l.bias.detach().numpy()) for l in linears[1:-1]]
        ),
        "w_out": jnp.asarray(linears[-1].weight.detach().numpy().T),
        "b_out": jnp.asarray(linears[-1].bias.detach().numpy()),
    }
    return mat, params, (fids, ress, totals)


def test_framework_tracks_actual_reference_run(golden, tmp_path):
    from pinn_depthestimation_tpu.config import parse_config
    from pinn_depthestimation_tpu.training import Trainer
    from pinn_depthestimation_tpu.training.logging_utils import read_log

    mat, params, (ref_fids, ref_ress, ref_totals) = golden
    cfg = parse_config(_reference_config(mat))
    run_dir = str(tmp_path / "ours"); os.makedirs(run_dir)
    tr = Trainer(cfg, run_dir=run_dir, echo_every=0, initial_params=params)
    tr.train()
    _, fids, ress, totals = read_log(run_dir)

    assert len(ref_totals) >= ADAM_IT + 1
    assert len(totals) >= ADAM_IT + 1

    # initial evaluation: same weights, same data -> tight agreement
    np.testing.assert_allclose(totals[0], ref_totals[0], rtol=2e-4)
    np.testing.assert_allclose(fids[0], ref_fids[0], rtol=2e-4)
    np.testing.assert_allclose(ress[0], ref_ress[0], rtol=2e-3)

    # whole Adam phase tracks the genuine reference run (f32 both sides)
    np.testing.assert_allclose(
        totals[:ADAM_IT], ref_totals[:ADAM_IT], rtol=5e-3,
        err_msg="per-iteration losses diverged from the actual reference run",
    )


def test_reference_cmb_script_is_stale_as_documented(golden):
    """SURVEY.md §5 quirk 4: the reference's own CMB pipeline crashes on the
    2-arg get_min_max call — confirming it here guards the survey claim."""
    import importlib

    sys.path.insert(0, REFERENCE)
    try:
        op = importlib.import_module("operations")
        importlib.reload(op)
        with pytest.raises(TypeError):
            op.get_min_max({"x": np.zeros(3)}, {"data_test": {}})  # 2-arg call
    finally:
        sys.path.pop(0)


def test_f64_polish_reaches_at_least_the_reference_minimum(golden, tmp_path):
    """The f64 polish phase, appended after the same schedule, descends to at
    least the executed reference's terminal loss: the reference stops where
    f32 line-search noise stops it (PARITY_LBFGS_WARM.md), the polish keeps
    descending in f64 — so the framework's best must not sit above the
    reference's best (small margin for the forked f32 micro-path)."""
    from pinn_depthestimation_tpu.config import parse_config
    from pinn_depthestimation_tpu.training import Trainer
    from pinn_depthestimation_tpu.training.logging_utils import read_log

    mat, params, (_, _, ref_totals) = golden
    raw = _reference_config(mat)
    raw["f64_polish"] = {"max_it": 25}
    cfg = parse_config(raw)
    run_dir = str(tmp_path / "ours_polish")
    os.makedirs(run_dir)
    tr = Trainer(cfg, run_dir=run_dir, echo_every=0, initial_params=params)
    tr.train()
    _, _, _, totals = read_log(run_dir)
    assert min(totals) <= min(ref_totals) * 1.02
