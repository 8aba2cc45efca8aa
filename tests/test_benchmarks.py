"""The driver-facing benchmark contract: one parseable JSON record."""

import json

from pinn_depthestimation_tpu import benchmarks


def test_run_residual_bench_contract():
    result = benchmarks.run_residual_bench(
        n_points=4096, backend="xla", reps=1
    )
    # exact keys the driver records into BENCH_r{N}.json
    assert set(result) == {"metric", "value", "unit", "vs_baseline"}
    assert result["value"] > 0
    assert result["vs_baseline"] > 0
    assert "residual_evals_per_sec_per_chip" in result["metric"]
    json.dumps(result)  # serializable


def _pin_relay(monkeypatch, dead: bool):
    from pinn_depthestimation_tpu.utils import relay

    monkeypatch.setattr(relay, "pin_cpu_if_relay_dead", lambda *a, **k: dead)


def test_bench_main_prints_single_json_line(capsys, monkeypatch):
    _pin_relay(monkeypatch, dead=False)
    monkeypatch.setattr(
        benchmarks, "run_residual_bench", lambda **kw: {"metric": "m", "value": 1.0,
                                                        "unit": "u", "vs_baseline": 2.0}
    )
    benchmarks.main()
    out = capsys.readouterr().out.strip().splitlines()
    assert len(out) == 1
    parsed = json.loads(out[0])
    assert parsed["vs_baseline"] == 2.0


def test_bench_main_dead_relay_fallback(capsys, monkeypatch):
    """With the tunnel relay provably dead, main() must still print ONE
    JSON line — a reduced-size CPU record tagged so it can never be
    mistaken for a TPU measurement — instead of hanging on backend init."""
    _pin_relay(monkeypatch, dead=True)
    seen = {}

    def fake_bench(**kw):
        seen.update(kw)
        return {"metric": "residual_evals_per_sec_per_chip[xla]", "value": 7.0,
                "unit": "u", "vs_baseline": 0.001}

    monkeypatch.setattr(benchmarks, "run_residual_bench", fake_bench)
    benchmarks.main()
    out = capsys.readouterr().out.strip().splitlines()
    assert len(out) == 1
    parsed = json.loads(out[0])
    assert parsed["metric"].endswith("[cpu-fallback:dead-tpu-relay]")
    assert parsed["extras"] == {"tpu_relay_dead": True}
    assert seen["backend"] == "xla"  # never touches the pallas/TPU path
    assert seen["n_points"] <= 1_000_000  # reduced size, CPU-feasible


def test_backend_selection():
    from pinn_depthestimation_tpu.models import MLPSpec

    spec = MLPSpec(sizes=(2, 20, 20, 3))
    _, name = benchmarks.residual_eval_fn(spec, "xla")
    assert name == "xla"
    _, name = benchmarks.residual_eval_fn(spec, "pallas", precision="bf16")
    assert name == "pallas-bf16"


def test_bench_suite_contract(monkeypatch):
    calls = []

    def fake_bench(**kw):
        calls.append(kw)
        backend = kw.get("backend", "auto")
        name = {"auto": "pallas-f32", "pallas": "pallas-bf16", "xla": "xla"}[backend]
        return {"metric": f"residual_evals_per_sec_per_chip[{name}]",
                "value": 5.0, "unit": "u", "vs_baseline": 1.0}

    monkeypatch.setattr(benchmarks, "run_residual_bench", fake_bench)
    monkeypatch.setattr(benchmarks, "run_train_step_bench", lambda **kw: 5.1)
    result = benchmarks.run_bench_suite(n_points=1000, reps=3)
    assert set(result) == {"metric", "value", "unit", "vs_baseline", "extras"}
    assert set(result["extras"]) == {"f32x3", "bf16", "xla", "adam_step_ms", "cmb_step_ms",
                                     "adam_step_ms_f32x3", "adam_step_ms_bf16"}
    assert result["extras"]["adam_step_ms"] == 5.1
    json.dumps(result)
    # headline stays the honest f32 tier
    assert "pallas-f32" in result["metric"]


def test_run_train_step_bench_contract():
    """Tiny-shape run of the deployed-Adam-step benchmark (same code path
    the TPU suite uses at the flagship shape)."""
    ms = benchmarks.run_train_step_bench(
        n_iters=3, reps=1, nx=6, ny=8, hidden_layers=2, width=8
    )
    assert isinstance(ms, float) and ms > 0
    json.dumps(ms)


def test_bench_suite_single_line(capsys, monkeypatch):
    _pin_relay(monkeypatch, dead=False)
    monkeypatch.setattr(
        benchmarks, "run_bench_suite",
        lambda **kw: {"metric": "m", "value": 1.0, "unit": "u",
                      "vs_baseline": 2.0, "extras": {"bf16": 3.0, "xla": 0.5}},
    )
    benchmarks.main()
    out = capsys.readouterr().out.strip().splitlines()
    assert len(out) == 1
    parsed = json.loads(out[0])
    assert parsed["extras"]["bf16"] == 3.0
