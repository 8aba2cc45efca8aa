import json

import pytest

from pinn_depthestimation_tpu.config import ConfigError, load_config, parse_config

REFERENCE_CONFIGS = [
    "/root/reference/config_CMB.json",
    "/root/reference/config_CMB_h.json",
    "/root/reference/config.json",
    "/root/reference/config_txyz.json",
]


@pytest.mark.parametrize("path", REFERENCE_CONFIGS)
def test_reference_configs_parse_verbatim(path):
    cfg = load_config(path)
    assert cfg.layers.sizes[0] == cfg.layers.input_features
    assert cfg.lbfgs.max_it == 50_000
    assert cfg.lbfgs.max_evaluation == 62_500
    assert cfg.lbfgs.line_search_fn == "strong_wolfe"


def test_cmb_config_fields():
    cfg = load_config("/root/reference/config_CMB.json")
    assert cfg.kind == "cmb"
    assert cfg.layers.sizes == [2] + [10] * 10 + [6]
    assert cfg.data_fidelity.inputs == ("x", "y")
    assert cfg.data_fidelity.training_points == 12
    assert cfg.data_residual.requires_grad == (True, True)
    assert cfg.data_residual.interval_x == 10
    assert cfg.output_weight("eta_mean") == 1.0
    assert cfg.physics == "wave_averaged"
    assert cfg.snapshot_iteration is None


def test_newmethod_config_fields():
    cfg = load_config("/root/reference/config_CMB_h.json")
    assert cfg.kind == "newmethod"
    assert cfg.layers.sizes == [2] + [20] * 100 + [3]
    assert cfg.data.trues == ("U", "V")
    assert cfg.data.unknowns == ("h",)
    assert cfg.data.outputs == ("U", "V", "h")  # true heads then unknown heads
    assert cfg.physics == "continuity_only"
    # reference snapshots at iteration 50,000 (train_newmethod.py:141)
    assert cfg.snapshot_iteration == 50_000


def test_legacy_config_dir_key_tolerated():
    cfg = load_config("/root/reference/config.json")
    assert cfg.data_fidelity.file.endswith("beach2d_irr.csv")
    assert cfg.layers.dropout_rate == 0.0          # default for legacy configs
    assert cfg.layers.init_type == "xavier"
    assert cfg.data_residual.inputs == ("t", "x", "y", "u", "v")
    assert cfg.data_residual.requires_grad == (True, True, True, False, False)
    assert cfg.data_residual.outputs == ("h", "z", "u", "v")
    assert cfg.weight_residual == 100000


def test_scientific_notation_ints():
    cfg = load_config("/root/reference/config_txyz.json")
    assert cfg.lbfgs.max_it == 50_000
    assert isinstance(cfg.lbfgs.max_it, int)


def _minimal_raw():
    return {
        "layers": {
            "input_features": 2,
            "hidden_layers": 2,
            "hidden_width": 8,
            "output_features": 3,
        },
        "data": {
            "file": "d.mat",
            "inputs": {"x": {"requires_grad": ["true"]}, "y": {"requires_grad": ["true"]}},
            "trues": ["U", "V"],
            "unknowns": ["h"],
        },
    }


def test_validation_catches_head_mismatch():
    raw = _minimal_raw()
    raw["layers"]["output_features"] = 4
    with pytest.raises(ConfigError, match="trues\\+unknowns"):
        parse_config(raw)


def test_validation_catches_bad_init_type():
    raw = _minimal_raw()
    raw["layers"]["init_type"] = "magic"
    with pytest.raises(ConfigError, match="init_type"):
        parse_config(raw)


def test_validation_catches_bad_physics():
    raw = _minimal_raw()
    raw["physics"] = "warp_drive"
    with pytest.raises(ConfigError, match="physics"):
        parse_config(raw)


def test_bad_json_reports_path(tmp_path):
    p = tmp_path / "broken.json"
    p.write_text("{nope")
    with pytest.raises(ConfigError, match="broken.json"):
        load_config(str(p))


def test_extensions(tmp_path):
    raw = _minimal_raw()
    raw["parity"] = False
    raw["physics"] = "continuity_ftemp"
    raw["parallel"] = {"data": 4}
    raw["seed"] = 7
    p = tmp_path / "c.json"
    p.write_text(json.dumps(raw))
    cfg = load_config(str(p))
    assert cfg.parity is False
    assert cfg.physics == "continuity_ftemp"
    assert cfg.parallel.data == 4
    assert cfg.seed == 7


def test_example_configs_parse():
    """Every shipped example config parses (catches schema drift)."""
    import glob
    import os

    from pinn_depthestimation_tpu.config import load_config

    examples = sorted(glob.glob("/root/repo/examples/*.json"))
    assert len(examples) >= 4
    for path in examples:
        cfg = load_config(path)
        assert cfg.physics  # resolved
        if os.path.basename(path) == "legacy.json":
            assert cfg.numerical_model is not None
            assert cfg.data_residual.snapshots


def test_kernel_precision_auto_policy():
    """'auto' (the default) resolves to TRUE f32 in both parity and corrected
    mode: the f32x3 tier's ~5e-6 gradient noise floors corrected-mode
    convergence during the Adam phase (4.1e-5 vs f32's 1.25e-5 on the 50k
    flagship A/B soak), so faster tiers are explicit opt-ins. Explicit tiers
    win, uniformly across phases."""
    from pinn_depthestimation_tpu.config import parse_config

    base = {
        "layers": {"input_features": 2, "hidden_layers": 2, "hidden_width": 8,
                   "output_features": 3},
        "data": {"file": "x.mat",
                 "inputs": {"x": {}, "y": {}},
                 "trues": ["U", "V"], "unknowns": ["h"]},
    }
    cfg = parse_config(dict(base))
    assert cfg.kernel_precision == "auto" and cfg.parity is True
    assert cfg.resolved_kernel_precision() == "f32"

    cfg = parse_config({**base, "parity": False})
    assert cfg.resolved_kernel_precision() == "f32"  # auto == f32 both modes

    cfg = parse_config({**base, "parity": False, "kernel_precision": "f32"})
    assert cfg.resolved_kernel_precision() == "f32"
    cfg = parse_config({**base, "parity": False, "kernel_precision": "f32x3"})
    assert cfg.resolved_kernel_precision() == "f32x3"  # explicit wins
    cfg = parse_config({**base, "kernel_precision": "bf16"})
    assert cfg.resolved_kernel_precision() == "bf16"


def test_f64_polish_config():
    """The `f64_polish` extension block: absent/false -> disabled, true ->
    defaults, dict -> field overrides with torch's max_it*5//4 eval budget,
    unknown keys and bad backends rejected."""
    from pinn_depthestimation_tpu.config import ConfigError, parse_config

    base = {
        "layers": {"input_features": 2, "hidden_layers": 2, "hidden_width": 8,
                   "output_features": 3},
        "data": {"file": "x.mat",
                 "inputs": {"x": {}, "y": {}},
                 "trues": ["U", "V"], "unknowns": ["h"]},
    }
    assert parse_config(dict(base)).f64_polish is None
    assert parse_config({**base, "f64_polish": False}).f64_polish is None

    p = parse_config({**base, "f64_polish": True}).f64_polish
    assert p is not None and p.max_it == 1000 and p.backend == "device_eval"
    assert p.tolerance_grad == 1e-10 and p.tolerance_change == 1e-13

    p = parse_config({**base, "f64_polish": {"max_it": 200}}).f64_polish
    assert p.max_it == 200 and p.max_evaluation == 250  # torch 5//4 rule

    p = parse_config(
        {**base, "f64_polish": {"max_it": 10, "max_evaluation": 99,
                                "backend": "default", "history_size": 7}}
    ).f64_polish
    assert (p.max_evaluation, p.backend, p.history_size) == (99, "default", 7)

    import pytest as _pytest
    with _pytest.raises(ConfigError, match="unknown keys"):
        parse_config({**base, "f64_polish": {"max_iterations": 5}})
    with _pytest.raises(ConfigError, match="backend"):
        parse_config({**base, "f64_polish": {"backend": "gpu"}})
    with _pytest.raises(ConfigError, match="line_search_fn"):
        parse_config({**base, "f64_polish": {"line_search_fn": "weak"}})
