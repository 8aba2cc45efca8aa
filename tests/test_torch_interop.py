"""Reference ``.pth`` checkpoint interop (reference train.py:178 saves whole
pickled ``dnn.DNN`` modules; test.py:35-42 reloads them). A migrating user's
trained models must load into the framework without retraining."""

import sys
import types

import jax
import numpy as np
import pytest
import torch

from pinn_depthestimation_tpu.models import MLPSpec, init_mlp_params, mlp_apply
from pinn_depthestimation_tpu.utils import torch_interop
from tests.oracles.torch_reference import build_torch_mlp

SPEC = MLPSpec(sizes=(2, 12, 12, 12, 3), init_type="xavier")


def _reference_style_module(params):
    """An instance pickled as class ``dnn.DNN`` (the reference's stream
    layout) wrapping the oracle Sequential."""
    mod = types.ModuleType("dnn")

    class DNN(torch.nn.Module):
        pass

    DNN.__module__ = "dnn"
    DNN.__qualname__ = "DNN"  # pickled by reference, resolved via sys.modules
    mod.DNN = DNN
    sys.modules["dnn"] = mod
    net = DNN()
    net.layers = build_torch_mlp(jax.tree.map(np.asarray, params)).float()
    return net


@pytest.fixture
def saved_pth(tmp_path):
    params = init_mlp_params(jax.random.PRNGKey(3), SPEC)
    net = _reference_style_module(params)
    path = str(tmp_path / "model_5000.pth")
    torch.save(net, path)
    yield params, net, path
    sys.modules.pop("dnn", None)


def test_whole_module_pth_roundtrip(saved_pth):
    params, _, path = saved_pth
    loaded = torch_interop.params_from_torch_file(path, spec=SPEC)
    x = np.random.RandomState(0).uniform(-1, 1, (17, 2)).astype(np.float32)
    y_ref = mlp_apply(params, x, SPEC)
    y_loaded = mlp_apply(jax.tree.map(np.asarray, loaded), x, SPEC)
    np.testing.assert_allclose(np.asarray(y_loaded), np.asarray(y_ref),
                               rtol=1e-5, atol=1e-6)


def test_whole_module_pth_without_reference_source(saved_pth):
    """The unpickle must succeed even when module ``dnn`` is not importable
    (the migrating user does not carry the reference's sources): the loader
    registers a stub class."""
    params, _, path = saved_pth
    sys.modules.pop("dnn", None)
    loaded = torch_interop.params_from_torch_file(path, spec=SPEC)
    np.testing.assert_allclose(
        loaded["w_in"], np.asarray(params["w_in"]), rtol=1e-6, atol=1e-7
    )


def test_state_dict_pth(tmp_path, saved_pth):
    params, net, _ = saved_pth
    path = str(tmp_path / "sd.pth")
    torch.save(net.state_dict(), path)
    loaded = torch_interop.params_from_torch_file(path, spec=SPEC)
    np.testing.assert_allclose(
        loaded["w_out"], np.asarray(params["w_out"]), rtol=1e-6, atol=1e-7
    )


def test_missing_file_raises_io_error_without_unsafe_retry(tmp_path, capsys):
    """IO failures (missing/unreadable file) must propagate from the safe
    weights_only load — not be misread as 'whole-module pickle' and retried
    through the arbitrary-code-execution path with an alarming warning."""
    with pytest.raises(FileNotFoundError):
        torch_interop.params_from_torch_file(str(tmp_path / "typo.pth"))
    assert "full unpickling" not in capsys.readouterr().err


def test_architecture_mismatch_raises(saved_pth):
    _, _, path = saved_pth
    wrong = MLPSpec(sizes=(2, 20, 20, 3))
    with pytest.raises(ValueError, match="does not match the config"):
        torch_interop.params_from_torch_file(path, spec=wrong)


def test_predictor_accepts_pth(tmp_path, saved_pth):
    from pinn_depthestimation_tpu.config import parse_config
    from pinn_depthestimation_tpu.inference import Predictor
    from pinn_depthestimation_tpu.utils import synthetic

    params, _, path = saved_pth
    mat = str(tmp_path / "data.mat")
    synthetic.make_newmethod_mat(mat, nx=8, ny=6, nan_fraction=0.0, seed=5)
    cfg = parse_config({
        "layers": {"input_features": 2, "hidden_layers": 3, "hidden_width": 12,
                   "output_features": 3, "dropout_rate": 0.0, "init_type": "xavier"},
        "adam_optimizer": {"max_it": 1, "learning_rate": 1e-3,
                           "scheduler_step_size": 10, "scheduler_gamma": 0.8},
        "lbfgs_optimizer": {"max_it": 1, "learning_rate": 1, "max_evaluation": 2,
                            "history_size": 5, "tolerance_grad": 1e-9,
                            "tolerance_change": 1e-12,
                            "line_search_fn": "strong_wolfe"},
        "loss": {"weight_fid_loss": 1, "weight_res_loss": 1},
        "data": {"file": mat,
                 "inputs": {"x": {"requires_grad": ["true"]},
                            "y": {"requires_grad": ["true"]}},
                 "trues": ["U", "V"], "unknowns": ["h"]},
        "data_test": {"file": mat,
                      "inputs": {"x": {"requires_grad": ["true"]},
                                 "y": {"requires_grad": ["true"]}},
                      "outputs": ["U", "V", "h"], "nx": 8, "ny": 6,
                      "x_min": 25.0, "x_max": 33.0,
                      "y_min": -13.0, "y_max": 13.0},
    })
    predictor = Predictor(cfg, checkpoint_path=path)
    np.testing.assert_allclose(
        np.asarray(predictor.params["w_in"]), np.asarray(params["w_in"]),
        rtol=1e-6, atol=1e-7,
    )
    result = predictor.run()
    assert result.pred["h"].shape == (6, 8)
    assert np.isfinite(result.pred["h"]).all()


def test_train_init_from_pth(tmp_path, saved_pth):
    """`pinn-tpu train --init-from model.pth` warm-starts from a
    reference-trained checkpoint (migrate a run to TPU mid-training)."""
    from pinn_depthestimation_tpu.cli import main
    from pinn_depthestimation_tpu.training import checkpoint as ckpt_mod
    from pinn_depthestimation_tpu.utils import synthetic

    params, _, path = saved_pth
    mat = str(tmp_path / "tr.mat")
    synthetic.make_newmethod_mat(mat, nx=8, ny=6, nan_fraction=0.0, seed=6)
    import json

    cfg = {
        "layers": {"input_features": 2, "hidden_layers": 3, "hidden_width": 12,
                   "output_features": 3, "dropout_rate": 0.0, "init_type": "xavier"},
        "adam_optimizer": {"max_it": 0, "learning_rate": 1e-3,
                           "scheduler_step_size": 10, "scheduler_gamma": 0.8},
        "lbfgs_optimizer": {"max_it": 0, "learning_rate": 1, "max_evaluation": 2,
                            "history_size": 5, "tolerance_grad": 1e-9,
                            "tolerance_change": 1e-12,
                            "line_search_fn": "strong_wolfe"},
        "loss": {"weight_fid_loss": 1, "weight_res_loss": 1},
        "data": {"file": mat,
                 "inputs": {"x": {"requires_grad": ["true"]},
                            "y": {"requires_grad": ["true"]}},
                 "trues": ["U", "V"], "unknowns": ["h"]},
    }
    cfgp = tmp_path / "cfg.json"
    cfgp.write_text(json.dumps(cfg))
    rc = main(["train", "--config", str(cfgp), "--log-root", str(tmp_path / "log"),
               "--run-name", "warm", "--init-from", path])
    assert rc == 0
    saved = ckpt_mod.load_raw(str(tmp_path / "log" / "warm" / "model.msgpack"))
    # a 0-iteration schedule leaves the warm-start weights untouched
    np.testing.assert_allclose(
        np.asarray(saved["params"]["w_in"]), np.asarray(params["w_in"]),
        rtol=1e-6, atol=1e-7,
    )


def test_train_init_from_bad_file(tmp_path):
    from pinn_depthestimation_tpu.cli import main
    from pinn_depthestimation_tpu.utils import synthetic
    import json

    mat = str(tmp_path / "tr.mat")
    synthetic.make_newmethod_mat(mat, nx=8, ny=6, nan_fraction=0.0, seed=6)
    bad = tmp_path / "garbage.pth"
    bad.write_bytes(b"not a checkpoint")
    cfg = {
        "layers": {"input_features": 2, "hidden_layers": 3, "hidden_width": 12,
                   "output_features": 3, "dropout_rate": 0.0, "init_type": "xavier"},
        "adam_optimizer": {"max_it": 1, "learning_rate": 1e-3,
                           "scheduler_step_size": 10, "scheduler_gamma": 0.8},
        "lbfgs_optimizer": {"max_it": 0, "learning_rate": 1, "max_evaluation": 2,
                            "history_size": 5, "tolerance_grad": 1e-9,
                            "tolerance_change": 1e-12,
                            "line_search_fn": "strong_wolfe"},
        "loss": {"weight_fid_loss": 1, "weight_res_loss": 1},
        "data": {"file": mat,
                 "inputs": {"x": {"requires_grad": ["true"]},
                            "y": {"requires_grad": ["true"]}},
                 "trues": ["U", "V"], "unknowns": ["h"]},
    }
    cfgp = tmp_path / "cfg.json"
    cfgp.write_text(json.dumps(cfg))
    rc = main(["train", "--config", str(cfgp), "--log-root", str(tmp_path / "log"),
               "--run-name", "bad", "--init-from", str(bad)])
    assert rc == 1  # clean error exit, no traceback


def test_export_state_dict_reference_layout(saved_pth):
    """torch_state_dict_from_params exports in the reference's key layout:
    loadable strict=True into a module with the reference's Sequential
    naming, forward-equal to the framework, and round-trippable."""
    from collections import OrderedDict

    params, _, _ = saved_pth
    sd = torch_interop.torch_state_dict_from_params(params)
    assert set(k.split(".")[1] for k in sd) == {f"layer_{i}" for i in range(4)}

    # a module with the reference's naming contract (dnn.py:35-38)
    items = []
    for i in range(4):
        lin = torch.nn.Linear(sd[f"layers.layer_{i}.weight"].shape[1],
                              sd[f"layers.layer_{i}.weight"].shape[0])
        items.append((f"layer_{i}", lin))
        if i < 3:
            items.append((f"activation_{i}", torch.nn.Tanh()))
            items.append((f"dropout_{i}", torch.nn.Dropout(0.0)))

    class Net(torch.nn.Module):
        def __init__(self):
            super().__init__()
            self.layers = torch.nn.Sequential(OrderedDict(items))

    net = Net()
    net.load_state_dict(sd, strict=True)
    x = np.random.RandomState(1).uniform(-1, 1, (9, 2)).astype(np.float32)
    with torch.no_grad():
        y_torch = net.layers(torch.tensor(x)).numpy()
    y_jax = np.asarray(mlp_apply(params, x, SPEC))
    np.testing.assert_allclose(y_torch, y_jax, rtol=2e-5, atol=2e-6)

    # round trip back through the importer
    back = torch_interop.params_from_torch_linears(
        [(sd[f"layers.layer_{i}.weight"], sd[f"layers.layer_{i}.bias"])
         for i in range(4)]
    )
    np.testing.assert_allclose(back["w_in"], np.asarray(params["w_in"]),
                               rtol=1e-6, atol=1e-7)


def test_state_dict_key_order_permutation(tmp_path, saved_pth):
    """A re-serialized state_dict with permuted key order (sorted keys,
    safetensors round-trip) must still load layers in index order — uniform
    hidden widths would otherwise let scrambled layers pass every shape
    check silently."""
    params, net, _ = saved_pth
    sd = net.state_dict()
    # lexicographic sort puts layer_10-style keys before layer_2; with only
    # 4 layers, reverse order is an equally index-breaking permutation
    permuted = dict(sorted(sd.items(), reverse=True))
    assert list(permuted) != list(sd)
    path = str(tmp_path / "permuted.pth")
    torch.save(permuted, path)
    loaded = torch_interop.params_from_torch_file(path, spec=SPEC)
    np.testing.assert_allclose(
        loaded["w_in"], np.asarray(params["w_in"]), rtol=1e-6, atol=1e-7
    )
    np.testing.assert_allclose(
        loaded["w_out"], np.asarray(params["w_out"]), rtol=1e-6, atol=1e-7
    )


def test_stub_module_removed_after_load(saved_pth):
    """The unpickling stub must not linger in sys.modules where it would
    shadow a later real `import dnn`."""
    _, _, path = saved_pth
    sys.modules.pop("dnn", None)
    torch_interop.params_from_torch_file(path, spec=SPEC)
    assert "dnn" not in sys.modules


def test_export_zero_hidden_raises():
    degenerate = {
        "w_in": np.zeros((2, 0), np.float32), "b_in": np.zeros((0,), np.float32),
        "w_hidden": np.zeros((0, 0, 0), np.float32),
        "b_hidden": np.zeros((0, 0), np.float32),
        "w_out": np.zeros((2, 3), np.float32), "b_out": np.zeros((3,), np.float32),
    }
    with pytest.raises(ValueError, match="zero-hidden-layer"):
        torch_interop.torch_state_dict_from_params(degenerate)


def test_init_from_with_resume_refused(tmp_path, saved_pth):
    from pinn_depthestimation_tpu.cli import main

    _, _, path = saved_pth
    import json
    from pinn_depthestimation_tpu.utils import synthetic

    mat = str(tmp_path / "d.mat")
    synthetic.make_newmethod_mat(mat, nx=8, ny=6, nan_fraction=0.0, seed=6)
    cfg = {
        "layers": {"input_features": 2, "hidden_layers": 3, "hidden_width": 12,
                   "output_features": 3, "dropout_rate": 0.0, "init_type": "xavier"},
        "adam_optimizer": {"max_it": 1, "learning_rate": 1e-3,
                           "scheduler_step_size": 10, "scheduler_gamma": 0.8},
        "lbfgs_optimizer": {"max_it": 0, "learning_rate": 1, "max_evaluation": 2,
                            "history_size": 5, "tolerance_grad": 1e-9,
                            "tolerance_change": 1e-12,
                            "line_search_fn": "strong_wolfe"},
        "loss": {"weight_fid_loss": 1, "weight_res_loss": 1},
        "data": {"file": mat,
                 "inputs": {"x": {"requires_grad": ["true"]},
                            "y": {"requires_grad": ["true"]}},
                 "trues": ["U", "V"], "unknowns": ["h"]},
    }
    cfgp = tmp_path / "cfg.json"
    cfgp.write_text(json.dumps(cfg))
    rc = main(["train", "--config", str(cfgp), "--log-root", str(tmp_path / "log"),
               "--init-from", path, "--resume", "ckpt.msgpack"])
    assert rc == 1


def test_foreign_module_attr_removed_after_load(saved_pth):
    """When a module named 'dnn' already exists WITHOUT the DNN class, the
    loader must not leave its stub attribute behind (permanent mutation of a
    foreign module)."""
    import types

    _, _, path = saved_pth
    foreign = types.ModuleType("dnn")
    sys.modules["dnn"] = foreign
    try:
        torch_interop.params_from_torch_file(path, spec=SPEC)
        assert not hasattr(foreign, "DNN")
        assert sys.modules["dnn"] is foreign  # module itself untouched
    finally:
        sys.modules.pop("dnn", None)


def test_inconsistent_output_layer_raises():
    """w_out whose input side disagrees with the hidden width must fail at
    conversion time, not later at apply time."""
    wb = [
        (np.zeros((8, 2)), np.zeros(8)),    # torch (out,in): in layer 2->8
        (np.zeros((8, 8)), np.zeros(8)),    # hidden 8->8
        (np.zeros((3, 5)), np.zeros(3)),    # out claims 5 inputs: mismatch
    ]
    with pytest.raises(ValueError, match="inconsistent"):
        torch_interop.params_from_torch_linears(wb)


def test_state_dict_load_avoids_full_unpickling(tmp_path, saved_pth, capsys):
    """state_dict saves load via weights_only=True (no warning); whole-module
    pickles fall back with a loud warning naming the file."""
    import io
    from contextlib import redirect_stderr

    params, model, path = saved_pth
    sd_path = str(tmp_path / "sd.pth")
    torch.save(model.state_dict(), sd_path)

    buf = io.StringIO()
    with redirect_stderr(buf):
        torch_interop.params_from_torch_file(sd_path)
    assert "falling back" not in buf.getvalue()

    buf = io.StringIO()
    with redirect_stderr(buf):
        torch_interop.params_from_torch_file(path)
    assert "falling back" in buf.getvalue() and path in buf.getvalue()
