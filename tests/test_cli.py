import json
import os

import numpy as np
import pytest

from pinn_depthestimation_tpu.cli import main
from pinn_depthestimation_tpu.utils import synthetic


@pytest.fixture
def config_file(tmp_path):
    mat = str(tmp_path / "data.mat")
    synthetic.make_newmethod_mat(mat, nx=10, ny=8, nan_fraction=0.0, seed=8)
    raw = {
        "layers": {"input_features": 2, "hidden_layers": 2, "hidden_width": 8,
                   "output_features": 3, "dropout_rate": 0.0, "init_type": "xavier"},
        "adam_optimizer": {"max_it": 5, "learning_rate": 1e-3,
                           "scheduler_step_size": 5, "scheduler_gamma": 0.8},
        "lbfgs_optimizer": {"max_it": 2, "learning_rate": 1, "max_evaluation": 5,
                            "history_size": 5, "tolerance_grad": 1e-9,
                            "tolerance_change": 1e-12, "line_search_fn": "strong_wolfe"},
        "loss": {"weight_fid_loss": 1, "weight_res_loss": 1},
        "data": {"file": mat,
                 "inputs": {"x": {"requires_grad": ["true"]},
                            "y": {"requires_grad": ["true"]}},
                 "trues": ["U", "V"], "unknowns": ["h"]},
        "data_test": {"file": mat,
                      "inputs": {"x": {"requires_grad": ["true"]},
                                 "y": {"requires_grad": ["true"]}},
                      "outputs": ["U", "V", "h"], "nx": 10, "ny": 8,
                      "x_min": 25.0, "x_max": 33.0, "y_min": -13.0, "y_max": 13.0},
    }
    p = tmp_path / "config.json"
    p.write_text(json.dumps(raw))
    return str(p), tmp_path


def test_train_then_test_roundtrip(config_file, capsys):
    config, tmp_path = config_file
    rc = main(["train", "--config", config,
               "--log-root", str(tmp_path / "log"), "--run-name", "r1"])
    assert rc == 0
    out = capsys.readouterr().out
    assert "Training time:" in out  # reference train.py:286 contract

    run_dir = tmp_path / "log" / "r1"
    assert (run_dir / "log.txt").exists()
    assert (run_dir / "model.msgpack").exists()

    save = str(tmp_path / "preds.mat")
    rc = main(["test", "--config", config,
               "--model", str(run_dir / "model.msgpack"), "--save", save])
    assert rc == 0
    out = capsys.readouterr().out
    assert "Prediction done!" in out  # reference test_newmethod.py:119 contract
    from scipy.io import loadmat

    preds = loadmat(save)
    assert preds["pred_h"].shape == (8, 10)


def test_resume_flag(config_file, capsys):
    config, tmp_path = config_file
    main(["train", "--config", config, "--log-root", str(tmp_path / "log"),
          "--run-name", "a"])
    ckpt = str(tmp_path / "log" / "a" / "model.msgpack")
    rc = main(["train", "--config", config, "--log-root", str(tmp_path / "log"),
               "--run-name", "b", "--resume", ckpt])
    assert rc == 0
    assert "Resumed from" in capsys.readouterr().out


def test_bad_config_exits_nonzero(config_file, tmp_path, capsys):
    bad = tmp_path / "bad.json"
    bad.write_text("{")
    rc = main(["test", "--config", str(bad)])
    assert rc == 1
    assert "Error reading config file" in capsys.readouterr().out


def test_missing_model_exits_nonzero(config_file, capsys):
    config, tmp_path = config_file
    rc = main(["test", "--config", config, "--model", "/nonexistent.msgpack"])
    assert rc == 1
    assert "Error loading model" in capsys.readouterr().out


def test_synth_command(tmp_path, capsys):
    rc = main(["synth", "--out", str(tmp_path / "synth"), "--nx", "9", "--ny", "7"])
    assert rc == 0
    assert (tmp_path / "synth" / "input_fid.csv").exists()
    assert (tmp_path / "synth" / "input_res.mat").exists()


def test_plot_log_command(config_file, capsys):
    pytest.importorskip("matplotlib")
    config, tmp_path = config_file
    main(["train", "--config", config, "--log-root", str(tmp_path / "log"),
          "--run-name", "c"])
    run_dir = str(tmp_path / "log" / "c")
    rc = main(["plot-log", "--run-dir", run_dir])
    assert rc == 0
    assert os.path.exists(os.path.join(run_dir, "log.png"))


def test_mesh_flag(config_file):
    config, tmp_path = config_file
    rc = main(["train", "--config", config, "--log-root", str(tmp_path / "log"),
               "--run-name", "m", "--mesh", "8"])
    assert rc == 0
    epochs = (tmp_path / "log" / "m" / "log.txt").read_text().splitlines()
    assert len(epochs) >= 6
    vals = [float(line.split(", ")[3]) for line in epochs[1:]]
    assert all(np.isfinite(v) for v in vals)


def test_test_plot_flag_writes_reference_products(config_file, capsys):
    """`pinn-tpu test --plot DIR` wires InferenceResult into the reference
    plot products (reference test.py:110-130, shipped commented-out) with the
    reference filename patterns."""
    config, tmp_path = config_file
    rc = main(["train", "--config", config,
               "--log-root", str(tmp_path / "log"), "--run-name", "rp"])
    assert rc == 0
    capsys.readouterr()

    plot_dir = tmp_path / "plots"
    rc = main(["test", "--config", config,
               "--model", str(tmp_path / "log" / "rp" / "model.msgpack"),
               "--plot", str(plot_dir)])
    assert rc == 0
    out = capsys.readouterr().out
    assert "Wrote" in out
    names = sorted(os.listdir(plot_dir))
    # quiver of U/V (true+pred available) and the predicted-depth map
    assert any(n.startswith("quiver_") and n.endswith("sec.png") for n in names)
    assert any(n.startswith("depth_") and n.endswith("sec.png") for n in names)


def test_test_plot_without_grid_errors_cleanly(config_file, tmp_path, capsys):
    """--plot on a config without nx/ny grid info exits nonzero with a clear
    message instead of a traceback."""
    config, base = config_file
    raw = json.loads(open(config).read())
    raw["data_test"].pop("nx"); raw["data_test"].pop("ny")
    bad = base / "config_nogrid.json"
    bad.write_text(json.dumps(raw))
    rc = main(["train", "--config", config,
               "--log-root", str(base / "log"), "--run-name", "rg"])
    assert rc == 0
    capsys.readouterr()
    rc = main(["test", "--config", str(bad),
               "--model", str(base / "log" / "rg" / "model.msgpack"),
               "--plot", str(base / "plots2")])
    assert rc == 1
    assert "Error making plots" in capsys.readouterr().out


def test_synth_legacy_flag(tmp_path, capsys):
    rc = main(["synth", "--out", str(tmp_path / "d"), "--legacy",
               "--nx", "12", "--ny", "10", "--snapshots", "3"])
    assert rc == 0
    snap = tmp_path / "d" / "beach2d"
    assert (snap / "dep.out").exists()
    assert (snap / "eta_00200").exists() and (snap / "u_00202").exists()
    assert (snap / "fidelity.csv").exists()


def test_train_f64_polish_flag(config_file, capsys):
    """--f64-polish N appends the polish phase; --f64-polish 0 disables a
    JSON-configured one."""
    config, tmp_path = config_file

    rc = main(["train", "--config", config,
               "--log-root", str(tmp_path / "log"), "--run-name", "p1",
               "--f64-polish", "5"])
    assert rc == 0
    assert "f64 polish" in capsys.readouterr().out

    # JSON enables it, flag 0 disables
    raw = json.loads(open(config).read())
    raw["f64_polish"] = {"max_it": 5}
    cfg2 = tmp_path / "config2.json"
    cfg2.write_text(json.dumps(raw))
    rc = main(["train", "--config", str(cfg2),
               "--log-root", str(tmp_path / "log"), "--run-name", "p2",
               "--f64-polish", "0"])
    assert rc == 0
    assert "f64 polish" not in capsys.readouterr().out


def test_f64_polish_flag_merges_json_fields(config_file, monkeypatch):
    """--f64-polish N re-budgets max_it but preserves the JSON block's other
    fields (tolerances, history, backend) and re-derives the eval budget."""
    import types

    import pinn_depthestimation_tpu.training as training_mod

    config, tmp_path = config_file
    raw = json.loads(open(config).read())
    raw["f64_polish"] = {"max_it": 3, "history_size": 7,
                         "tolerance_grad": 1e-12, "max_evaluation": 4}
    cfg2 = tmp_path / "config_merge.json"
    cfg2.write_text(json.dumps(raw))

    captured = {}

    class StubTrainer:
        def __init__(self, cfg, **kw):
            captured["cfg"] = cfg
            self.state = types.SimpleNamespace(iteration=0)

        def train(self):
            pass

    monkeypatch.setattr(training_mod, "Trainer", StubTrainer)
    rc = main(["train", "--config", str(cfg2),
               "--log-root", str(tmp_path / "log"), "--run-name", "merge",
               "--f64-polish", "40"])
    assert rc == 0
    p = captured["cfg"].f64_polish
    assert p.max_it == 40
    assert p.max_evaluation == 50      # re-derived from the new max_it
    assert p.history_size == 7         # JSON fields preserved
    assert p.tolerance_grad == 1e-12


def test_parity_subcommand_forwards_all_flags(monkeypatch):
    """Every flag the parity module CLI accepts must survive the `pinn-tpu
    parity` wrapper — PARITY_LBFGS_WARM.md documents invocations with
    --tol-grad/--tol-change/--f64-polish through the wrapper."""
    captured = {}

    def fake_main(argv):
        captured["argv"] = argv
        return 0

    monkeypatch.setattr("pinn_depthestimation_tpu.parity.main", fake_main)
    rc = main([
        "parity", "--iters", "5000", "--lbfgs", "4000",
        "--tol-grad", "1e-9", "--tol-change", "1e-12",
        "--hidden-layers", "100", "--width", "20",
        "--nx", "81", "--ny", "261", "--nan-fraction", "0.408",
        "--f64-polish", "300", "--ref-cache", "/tmp/c.npz", "--ref-only",
        "--out", "R.md",
    ])
    assert rc == 0
    argv = captured["argv"]

    def val(flag):
        return argv[argv.index(flag) + 1]

    assert val("--tol-grad") == "1e-09" and val("--tol-change") == "1e-12"
    assert val("--f64-polish") == "300"
    assert val("--ref-cache") == "/tmp/c.npz" and "--ref-only" in argv
    assert val("--iters") == "5000" and val("--lbfgs") == "4000"
    assert val("--hidden-layers") == "100" and val("--width") == "20"
    assert val("--nx") == "81" and val("--ny") == "261"
    assert val("--nan-fraction") == "0.408" and val("--out") == "R.md"


def _pin_relay(monkeypatch, dead: bool):
    from pinn_depthestimation_tpu.utils import relay

    monkeypatch.setattr(relay, "pin_cpu_if_relay_dead", lambda *a, **k: dead)


def test_bench_step_flag(capsys, monkeypatch):
    """`pinn-tpu bench --step` prints one JSON line with the deployed
    Adam-step time (measurement stubbed; the real path is covered by
    test_benchmarks.py::test_run_train_step_bench_contract)."""
    from pinn_depthestimation_tpu import benchmarks

    _pin_relay(monkeypatch, dead=False)
    monkeypatch.setattr(benchmarks, "run_train_step_bench", lambda **kw: 5.11)
    assert main(["bench", "--step"]) == 0
    out = capsys.readouterr().out.strip().splitlines()
    rec = json.loads(out[-1])
    assert rec == {"metric": "flagship_adam_step_ms", "value": 5.11,
                   "unit": "ms/iteration (shipped defaults)"}


def test_bench_suite_flag(capsys, monkeypatch):
    """`pinn-tpu bench --suite` prints the driver record line."""
    from pinn_depthestimation_tpu import benchmarks

    _pin_relay(monkeypatch, dead=False)
    monkeypatch.setattr(
        benchmarks, "run_bench_suite",
        lambda **kw: {"metric": "m", "value": 1.0, "unit": "u",
                      "vs_baseline": 2.0, "extras": {"adam_step_ms": 5.1}},
    )
    assert main(["bench", "--suite"]) == 0
    rec = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rec["extras"]["adam_step_ms"] == 5.1


def test_bench_dead_relay_fallback_all_modes(capsys, monkeypatch):
    """With the tunnel relay dead, every `pinn-tpu bench` mode emits the
    SAME tagged reduced CPU record as bench.py — never the full-size suite
    on a silently pinned CPU backend, and never an untagged record."""
    from pinn_depthestimation_tpu import benchmarks

    _pin_relay(monkeypatch, dead=True)
    monkeypatch.setattr(
        benchmarks, "dead_relay_record",
        lambda: {"metric": "m[cpu-fallback:dead-tpu-relay]", "value": 1.0,
                 "unit": "u", "vs_baseline": 0.001,
                 "extras": {"tpu_relay_dead": True}},
    )
    fail = lambda **kw: (_ for _ in ()).throw(AssertionError("full bench ran"))
    monkeypatch.setattr(benchmarks, "run_bench_suite", fail)
    monkeypatch.setattr(benchmarks, "run_residual_bench", fail)
    monkeypatch.setattr(benchmarks, "run_train_step_bench", fail)
    for mode in ([], ["--suite"], ["--step"]):
        assert main(["bench", *mode]) == 0
        rec = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert rec["extras"]["tpu_relay_dead"] is True


def test_train_precision_schedule_flag(config_file, monkeypatch):
    """--precision-schedule PREFIX_ITERS[:TIER] merges onto/overrides the
    JSON block; 0 disables; malformed values error cleanly."""
    import pinn_depthestimation_tpu.training as training_mod

    config, tmp_path = config_file
    seen = {}

    class SpyTrainer:
        def __init__(self, cfg, **kw):
            seen["sched"] = cfg.precision_schedule
            self.state = type("S", (), {"iteration": 0})()

        def train(self):
            pass

        def save(self, *a, **k):
            return str(tmp_path / "ckpt.msgpack")

    monkeypatch.setattr(training_mod, "Trainer", SpyTrainer)

    rc = main(["train", "--config", config,
               "--log-root", str(tmp_path / "log"), "--run-name", "s1",
               "--precision-schedule", "7:f32x3"])
    assert rc == 0
    assert seen["sched"].prefix_iters == 7
    assert seen["sched"].prefix_precision == "f32x3"

    rc = main(["train", "--config", config,
               "--log-root", str(tmp_path / "log"), "--run-name", "s2",
               "--precision-schedule", "9"])
    assert rc == 0
    assert (seen["sched"].prefix_iters, seen["sched"].prefix_precision) == (9, "bf16")

    # JSON enables it, flag 0 disables
    raw = json.loads(open(config).read())
    raw["precision_schedule"] = {"prefix_precision": "bf16", "prefix_iters": 5}
    cfg2 = tmp_path / "config_sched.json"
    cfg2.write_text(json.dumps(raw))
    rc = main(["train", "--config", str(cfg2),
               "--log-root", str(tmp_path / "log"), "--run-name", "s3",
               "--precision-schedule", "0"])
    assert rc == 0
    assert seen["sched"] is None
    # and the JSON tier is preserved when the flag only re-budgets iters
    rc = main(["train", "--config", str(cfg2),
               "--log-root", str(tmp_path / "log"), "--run-name", "s4",
               "--precision-schedule", "11"])
    assert rc == 0
    assert (seen["sched"].prefix_iters, seen["sched"].prefix_precision) == (11, "bf16")

    rc = main(["train", "--config", config,
               "--log-root", str(tmp_path / "log"), "--run-name", "s5",
               "--precision-schedule", "many:bf16"])
    assert rc == 1

    # negative values are typos, not disable requests (that is 0)
    rc = main(["train", "--config", config,
               "--log-root", str(tmp_path / "log"), "--run-name", "s6",
               "--precision-schedule=-5:bf16"])
    assert rc == 1
