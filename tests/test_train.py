"""End-to-end training-driver tests on synthetic data (SURVEY.md §7 step 4)."""

import json
import os

import numpy as np
import pytest

from pinn_depthestimation_tpu import data as data_mod
from pinn_depthestimation_tpu.config import parse_config
from pinn_depthestimation_tpu.training import Trainer
from pinn_depthestimation_tpu.training.logging_utils import read_log
from pinn_depthestimation_tpu.utils import synthetic


def _newmethod_raw(mat, adam_it=60, lbfgs_it=15, width=16, layers=3):
    return {
        "layers": {"input_features": 2, "hidden_layers": layers, "hidden_width": width,
                   "output_features": 3, "dropout_rate": 0.0, "init_type": "xavier"},
        "adam_optimizer": {"max_it": adam_it, "learning_rate": 1e-3,
                           "scheduler_step_size": 30, "scheduler_gamma": 0.8},
        "lbfgs_optimizer": {"max_it": lbfgs_it, "learning_rate": 1,
                            "max_evaluation": round(lbfgs_it * 1.25), "history_size": 10,
                            "tolerance_grad": 1e-9, "tolerance_change": 1e-12,
                            "line_search_fn": "strong_wolfe"},
        "loss": {"weight_fid_loss": 1, "weight_res_loss": 1},
        "data": {"file": mat,
                 "inputs": {"x": {"requires_grad": ["true"]},
                            "y": {"requires_grad": ["true"]}},
                 "trues": ["U", "V"], "unknowns": ["h"]},
    }


@pytest.fixture
def newmethod_setup(tmp_path):
    mat = str(tmp_path / "data.mat")
    synthetic.make_newmethod_mat(mat, nx=16, ny=20, nan_fraction=0.05, seed=2)
    return mat, tmp_path


def test_newmethod_end_to_end(newmethod_setup):
    mat, tmp_path = newmethod_setup
    cfg = parse_config(_newmethod_raw(mat))
    run_dir = str(tmp_path / "run")
    os.makedirs(run_dir)
    tr = Trainer(cfg, run_dir=run_dir, echo_every=0)
    tr.train()

    epochs, fids, ress, totals = read_log(run_dir)
    # one row per loss evaluation: 60 adam + >= 1 lbfgs evals
    assert epochs[0] == 1 and len(epochs) >= 61
    assert epochs == list(range(1, len(epochs) + 1))
    assert all(np.isfinite(v) for v in totals)
    # training actually reduces the loss
    assert totals[-1] < totals[0] * 0.9
    # L-BFGS phase improves on the Adam phase result
    assert min(totals[61:]) <= totals[59]
    # final model saved (reference train.py:288)
    assert os.path.exists(os.path.join(run_dir, "model.msgpack"))


def test_log_schema_matches_reference(newmethod_setup):
    mat, tmp_path = newmethod_setup
    cfg = parse_config(_newmethod_raw(mat, adam_it=5, lbfgs_it=0))
    run_dir = str(tmp_path / "runlog")
    os.makedirs(run_dir)
    Trainer(cfg, run_dir=run_dir, echo_every=0).train()
    with open(os.path.join(run_dir, "log.txt")) as f:
        lines = f.readlines()
    assert lines[0] == "Epoch, Fidelity Loss, Residual Loss, Total Loss\n"
    parts = lines[1].split(", ")
    assert parts[0] == "1"
    for p in parts[1:]:
        float(p)  # %.5e formatted
        assert "e" in p


def test_snapshot_written_at_configured_iteration(newmethod_setup):
    mat, tmp_path = newmethod_setup
    raw = _newmethod_raw(mat, adam_it=20, lbfgs_it=5)
    raw["snapshot_iteration"] = 20  # analog of the reference's 50,000
    cfg = parse_config(raw)
    run_dir = str(tmp_path / "runsnap")
    os.makedirs(run_dir)
    tr = Trainer(cfg, run_dir=run_dir, echo_every=0)
    tr.train()
    from scipy.io import loadmat

    snap = loadmat(os.path.join(run_dir, "data_at20.mat"))
    # keys pred_<var> for trues then unknowns (reference train_newmethod.py:144-148)
    for key in ("pred_U", "pred_V", "pred_h"):
        assert key in snap
        assert snap[key].shape == (tr.data.residual_input.shape[0], 1)
        assert np.isfinite(snap[key]).all()


def test_checkpoint_resume_bit_identical(newmethod_setup):
    mat, tmp_path = newmethod_setup
    # run A: 40 adam steps straight through
    cfg = parse_config(_newmethod_raw(mat, adam_it=40, lbfgs_it=0))
    run_a = str(tmp_path / "a"); os.makedirs(run_a)
    tr_a = Trainer(cfg, run_dir=run_a, echo_every=0)
    tr_a.train_adam()

    # run B: 40 steps with a save/restore roundtrip at step 20
    cfg_b1 = parse_config(_newmethod_raw(mat, adam_it=20, lbfgs_it=0))
    run_b = str(tmp_path / "b"); os.makedirs(run_b)
    tr_b = Trainer(cfg_b1, run_dir=run_b, echo_every=0)
    tr_b.train_adam()
    path = tr_b.save("model_20")

    cfg_b2 = parse_config(_newmethod_raw(mat, adam_it=40, lbfgs_it=0))
    tr_b2 = Trainer(cfg_b2, run_dir=run_b, echo_every=0)
    tr_b2.restore(path)
    assert tr_b2.state.iteration == 20
    tr_b2.train_adam()

    pa = tr_a.state.params
    pb = tr_b2.state.params
    for ka in pa:
        np.testing.assert_array_equal(np.asarray(pa[ka]), np.asarray(pb[ka]))


def test_lbfgs_records_flow_into_log(newmethod_setup):
    mat, tmp_path = newmethod_setup
    cfg = parse_config(_newmethod_raw(mat, adam_it=0, lbfgs_it=10))
    run_dir = str(tmp_path / "runl")
    os.makedirs(run_dir)
    tr = Trainer(cfg, run_dir=run_dir, echo_every=0)
    tr.train()
    epochs, fids, ress, totals = read_log(run_dir)
    # lbfgs-only: at least initial eval + some line-search evals
    assert len(epochs) >= 2
    assert totals[-1] <= totals[0]


def _cmb_setup(tmp_path, **kw):
    csv = str(tmp_path / "fid.csv")
    mat = str(tmp_path / "res.mat")
    synthetic.make_cmb_dataset(csv, mat, nx=15, ny=19, n_csv=80, seed=7)
    raw = {
        "layers": {"input_features": 2, "hidden_layers": 3, "hidden_width": 12,
                   "output_features": 6, "dropout_rate": 0.0, "init_type": "xavier"},
        "adam_optimizer": {"max_it": kw.get("adam_it", 30), "learning_rate": 1e-3,
                           "scheduler_step_size": 20, "scheduler_gamma": 0.8},
        "lbfgs_optimizer": {"max_it": kw.get("lbfgs_it", 5), "learning_rate": 1,
                            "max_evaluation": 20, "history_size": 10,
                            "tolerance_grad": 1e-9, "tolerance_change": 1e-12,
                            "line_search_fn": "strong_wolfe"},
        "loss": {"weight_fid_loss": 1, "weight_res_loss": 1,
                 "weight_h_loss": 2, "weight_U_loss": 1, "weight_V_loss": 1,
                 "weight_eta_mean_loss": 1, "weight_Hrms_loss": 0.5, "weight_k_loss": 1},
        "data_fidelity": {"file": csv, "inputs": ["x", "y"],
                          "outputs": ["h", "U", "V", "eta_mean", "Hrms", "k"],
                          "training_points": 50},
        "data_residual": {"file": mat,
                          "inputs": {"x": {"requires_grad": ["true"]},
                                     "y": {"requires_grad": ["true"]}},
                          "outputs": ["h", "U", "V", "eta_mean", "Hrms", "k"],
                          "snapshots": [1], "interval_x": 2, "interval_y": 2},
        "data_test": {"file": mat, "inputs": {"x": {"requires_grad": ["true"]},
                                              "y": {"requires_grad": ["true"]}},
                      "outputs": ["h", "U", "V"], "nx": 15, "ny": 19,
                      "x_min": 25.0, "x_max": 33.0, "y_min": -13.0, "y_max": 13.0},
    }
    raw.update(kw.get("extra", {}))
    return parse_config(raw)


def test_cmb_end_to_end(tmp_path):
    cfg = _cmb_setup(tmp_path)
    assert cfg.physics == "wave_averaged"
    run_dir = str(tmp_path / "run")
    os.makedirs(run_dir)
    tr = Trainer(cfg, run_dir=run_dir, echo_every=0)
    tr.train()
    epochs, fids, ress, totals = read_log(run_dir)
    assert len(epochs) >= 31
    assert all(np.isfinite(v) for v in totals)
    assert totals[-1] < totals[0]


def test_empty_batch_refused(tmp_path):
    from scipy.io import savemat

    mat = str(tmp_path / "empty.mat")
    savemat(mat, {"x": np.zeros((4, 1)), "y": np.zeros((4, 1)),
                  "U": np.full((4, 1), np.nan), "V": np.full((4, 1), np.nan)})
    cfg = parse_config(_newmethod_raw(mat))
    with pytest.raises(ValueError, match="empty"):
        Trainer(cfg, run_dir=str(tmp_path), echo_every=0)


def test_dropout_training_runs(newmethod_setup):
    mat, tmp_path = newmethod_setup
    raw = _newmethod_raw(mat, adam_it=10, lbfgs_it=0)
    raw["layers"]["dropout_rate"] = 0.2
    cfg = parse_config(raw)
    run_dir = str(tmp_path / "rundrop")
    os.makedirs(run_dir)
    tr = Trainer(cfg, run_dir=run_dir, echo_every=0)
    tr.train_adam()
    epochs, *_ , totals = read_log(run_dir)
    assert len(epochs) == 10 and all(np.isfinite(v) for v in totals)


def test_lbfgs_phase_checkpoints_use_live_params(newmethod_setup):
    """Snapshots/checkpoints cut during the L-BFGS phase must reflect the
    current L-BFGS iterate, not the Adam-final parameters (regression:
    self.state.params used to be synced only after the whole phase)."""
    import jax
    from pinn_depthestimation_tpu.models import init_mlp_params, MLPSpec, mlp_apply

    mat, tmp_path = newmethod_setup
    raw = _newmethod_raw(mat, adam_it=0, lbfgs_it=25)
    raw["snapshot_iteration"] = 2  # fires inside the L-BFGS phase
    cfg = parse_config(raw)
    run_dir = str(tmp_path / "live"); os.makedirs(run_dir)
    tr = Trainer(cfg, run_dir=run_dir, echo_every=0)
    initial = jax.tree.map(np.asarray, tr.state.params)
    tr.train()

    from scipy.io import loadmat

    snap = loadmat(os.path.join(run_dir, "data_at2.mat"))
    spec = MLPSpec.from_layers(cfg.layers)
    pred_initial = np.asarray(
        mlp_apply(initial, tr.data.residual_input, spec)
    )
    # the snapshot must NOT be the initial/Adam-final prediction
    assert not np.allclose(snap["pred_U"].ravel(), pred_initial[:, 0], atol=1e-7)


def test_resume_past_adam_restarts_lbfgs_from_checkpoint(newmethod_setup):
    """A resume whose counter exceeds adam.max_it skips Adam and warm-restarts
    the L-BFGS phase from the checkpointed parameters (documented semantics)."""
    mat, tmp_path = newmethod_setup
    cfg = parse_config(_newmethod_raw(mat, adam_it=10, lbfgs_it=15))
    run_a = str(tmp_path / "ra"); os.makedirs(run_a)
    tr = Trainer(cfg, run_dir=run_a, echo_every=0)
    tr.train()
    assert tr.state.iteration > 10  # entered the L-BFGS phase
    path = tr.save("model_mid")

    run_b = str(tmp_path / "rb"); os.makedirs(run_b)
    tr2 = Trainer(cfg, run_dir=run_b, echo_every=0)
    tr2.restore(path)
    start_it = tr2.state.iteration
    assert start_it > 10
    tr2.train()  # adam phase is a no-op; lbfgs restarts from restored params
    epochs, *_, totals = read_log(run_b)
    assert epochs[0] == start_it + 1  # counting continues, no reset
    assert all(np.isfinite(v) for v in totals)


def test_training_is_deterministic(newmethod_setup):
    """Same config + data + seed -> bit-identical loss logs and parameters."""
    mat, tmp_path = newmethod_setup
    cfg = parse_config(_newmethod_raw(mat, adam_it=30, lbfgs_it=5))
    results = []
    for name in ("d1", "d2"):
        run_dir = str(tmp_path / name); os.makedirs(run_dir)
        tr = Trainer(cfg, run_dir=run_dir, echo_every=0)
        tr.train()
        _, _, _, totals = read_log(run_dir)
        results.append((totals, {k: np.asarray(v) for k, v in tr.state.params.items()}))
    (t1, p1), (t2, p2) = results
    assert t1 == t2
    for k in p1:
        np.testing.assert_array_equal(p1[k], p2[k])


def test_lbfgs_state_checkpoint_exact_continuation(newmethod_setup):
    """A checkpoint cut DURING the L-BFGS phase carries the full optimizer
    state (s/y ring buffers, direction, counters); resuming from it replays
    the uninterrupted run's remaining loss rows bit-for-bit."""
    mat, tmp_path = newmethod_setup
    cfg = parse_config(_newmethod_raw(mat, adam_it=10, lbfgs_it=40))

    saved = {}

    class MidPhaseSaver(Trainer):
        def _record(self, losses):
            super()._record(losses)
            # snag the first checkpoint opportunity inside the L-BFGS phase
            if (
                "path" not in saved
                and self._live_lbfgs_state is not None
                and int(self._live_lbfgs_state.reason) == 0  # RUNNING
            ):
                saved["path"] = self.save("model_midphase")
                saved["iteration"] = self.state.iteration

    run_a = str(tmp_path / "full"); os.makedirs(run_a)
    # tiny record buffer -> several host re-entries inside the L-BFGS phase
    tr_a = MidPhaseSaver(cfg, run_dir=run_a, echo_every=0,
                         lbfgs_record_capacity=40)
    tr_a.train()
    assert "path" in saved, "no mid-phase chunk boundary hit; enlarge budget"
    epochs_a, fid_a, res_a, tot_a = read_log(run_a)

    run_b = str(tmp_path / "resumed"); os.makedirs(run_b)
    tr_b = Trainer(cfg, run_dir=run_b, echo_every=0, lbfgs_record_capacity=40)
    tr_b.restore(saved["path"])
    assert tr_b._pending_lbfgs_resume is not None  # state section present
    tr_b.train()
    epochs_b, fid_b, res_b, tot_b = read_log(run_b)

    # B's log must be exactly A's tail from the checkpoint iteration on
    k = saved["iteration"]
    assert epochs_b == epochs_a[k:]
    assert tot_b == tot_a[k:]
    assert fid_b == fid_a[k:]
    # and the final parameters must agree bit-for-bit
    for key in tr_a.state.params:
        np.testing.assert_array_equal(
            np.asarray(tr_a.state.params[key]), np.asarray(tr_b.state.params[key])
        )


def test_lbfgs_runner_export_restore_roundtrip(newmethod_setup):
    """LBFGSRunner.export_state/restore_state: shape validation + exact
    trajectory equivalence at the runner level."""
    import jax

    from pinn_depthestimation_tpu.models import MLPSpec, init_mlp_params
    from pinn_depthestimation_tpu.optim import lbfgs as lbfgs_mod
    from pinn_depthestimation_tpu.training import build_loss_fn

    mat, tmp_path = newmethod_setup
    cfg = parse_config(_newmethod_raw(mat, adam_it=0, lbfgs_it=30))
    td = data_mod.load_training_data(cfg)
    spec = MLPSpec.from_layers(cfg.layers)
    params = init_mlp_params(jax.random.PRNGKey(0), spec)
    loss_fn = build_loss_fn(cfg, spec, fidelity_is_residual=True)
    batch = {k: np.asarray(v) for k, v in {
        "fidelity_input": td.fidelity_input, "fidelity_true": td.fidelity_true,
        "residual_input": td.residual_input}.items()}
    opts = lbfgs_mod.LBFGSOptions(max_iter=30, max_eval=60, history_size=10,
                                  tolerance_grad=1e-11, tolerance_change=1e-14)

    def run_to_end(runner, state):
        rows = []
        while not runner.finished(state):
            state, rec = runner.run_chunk(state, batch)
            rows.append(rec)
        return state, np.concatenate(rows) if rows else np.zeros((0, 3))

    # uninterrupted
    r1 = lbfgs_mod.LBFGSRunner(loss_fn, params, opts, record_capacity=64)
    s1 = r1.init(params, batch)
    s1_end, rows_full = run_to_end(r1, s1)

    # interrupted after the first chunk, serialized through export/restore
    r2 = lbfgs_mod.LBFGSRunner(loss_fn, params, opts, record_capacity=64)
    s2 = r2.init(params, batch)
    s2, rows_head = r2.run_chunk(s2, batch)
    blob = r2.export_state(s2)
    assert "records" not in blob and "rec_count" not in blob
    r3 = lbfgs_mod.LBFGSRunner(loss_fn, params, opts, record_capacity=64)
    s3 = r3.restore_state(blob)
    s3_end, rows_tail = run_to_end(r3, s3)

    np.testing.assert_array_equal(
        np.concatenate([rows_head, rows_tail]), rows_full
    )
    np.testing.assert_array_equal(np.asarray(s1_end.x), np.asarray(s3_end.x))
    assert int(s1_end.reason) == int(s3_end.reason)
    assert int(s1_end.func_evals) == int(s3_end.func_evals)

    # validation errors
    import pytest as _pytest

    bad = dict(blob); bad.pop("rho")
    with _pytest.raises(ValueError, match="missing fields"):
        r3.restore_state(bad)
    bad = dict(blob); bad["rho"] = np.zeros((3,), np.float32)
    with _pytest.raises(ValueError, match="history_size"):
        r3.restore_state(bad)


def test_resume_past_snapshot_does_not_rewrite(newmethod_setup):
    """Resuming a run whose counter is already past snapshot_iteration must
    NOT rewrite the prediction snapshot with later-iteration parameters."""
    from scipy.io import loadmat

    mat, tmp_path = newmethod_setup
    raw = _newmethod_raw(mat, adam_it=20, lbfgs_it=5)
    raw["snapshot_iteration"] = 10
    run_dir = str(tmp_path / "runsnap_resume"); os.makedirs(run_dir)
    tr = Trainer(parse_config(raw), run_dir=run_dir, echo_every=0)
    tr.train()
    snap_path = os.path.join(run_dir, "data_at10.mat")
    snap0 = loadmat(snap_path)["pred_h"].copy()

    tr2 = Trainer(parse_config(raw), run_dir=run_dir, echo_every=0)
    tr2.restore(os.path.join(run_dir, "model.msgpack"))
    assert tr2.state.iteration > 10
    tr2.train()
    np.testing.assert_array_equal(snap0, loadmat(snap_path)["pred_h"])


def test_multi_point_block_writes_lbfgs_state_once(newmethod_setup, monkeypatch):
    """When one record block crosses several cadence points, only the LAST
    point's checkpoint carries the L-BFGS s/y history (earlier points in the
    block would embed byte-identical multi-MB copies)."""
    from pinn_depthestimation_tpu.training import driver as driver_mod

    mat, tmp_path = newmethod_setup
    cfg = parse_config(_newmethod_raw(mat, adam_it=5, lbfgs_it=25))
    calls = []

    class Spy(Trainer):
        def save(self, name, include_lbfgs=True):
            state = self._checkpoint_state(include_lbfgs=include_lbfgs)
            mid_lbfgs = self._live_lbfgs_state is not None and int(
                self._live_lbfgs_state.reason) == 0
            calls.append((name, include_lbfgs, "lbfgs" in state, mid_lbfgs))
            return super().save(name, include_lbfgs=include_lbfgs)

    # pretend every >=2-eval record block crosses two cadence points
    monkeypatch.setattr(
        driver_mod.ckpt_mod, "checkpoint_points",
        lambda start, end, kind: [start + 1, end] if end - start >= 2 else [],
    )
    run = str(tmp_path / "spyblocks"); os.makedirs(run)
    tr = Spy(cfg, run_dir=run, echo_every=0, lbfgs_record_capacity=10)
    tr.train()

    cadence = [c for c in calls if c[0].startswith("model_")]
    assert len(cadence) >= 2 and len(cadence) % 2 == 0
    for first, last in zip(cadence[::2], cadence[1::2]):
        assert first[1] is False and not first[2]  # early point: params only
        assert last[1] is True
        if last[3]:  # mid-L-BFGS block-end point carries the full state
            assert last[2]
    assert any(c[2] for c in cadence), "no mid-phase state checkpoint exercised"


def test_f64_polish_phase(newmethod_setup):
    """The f64 polish phase (framework extension, config.F64PolishConfig)
    runs after the f32 L-BFGS phase, logs every evaluation through the same
    log.txt stream, improves the loss beyond the f32 phases' best, and hands
    back f32 parameters with x64 mode left disabled."""
    import jax
    import jax.numpy as jnp

    mat, tmp_path = newmethod_setup
    raw = _newmethod_raw(mat, adam_it=40, lbfgs_it=10)

    run_a = str(tmp_path / "runA")
    os.makedirs(run_a)
    tr_a = Trainer(parse_config(raw), run_dir=run_a, echo_every=0)
    tr_a.train()
    _, _, _, totals_a = read_log(run_a)

    raw_b = dict(raw)
    raw_b["f64_polish"] = {"max_it": 25}
    run_b = str(tmp_path / "runB")
    os.makedirs(run_b)
    tr_b = Trainer(parse_config(raw_b), run_dir=run_b, echo_every=0)
    tr_b.train()
    epochs_b, _, _, totals_b = read_log(run_b)

    # identical f32 prefix (the polish phase only appends), then extra rows
    n = len(totals_a)
    assert totals_b[:n] == totals_a
    assert len(totals_b) > n
    assert epochs_b == list(range(1, len(epochs_b) + 1))
    # the polish improves on everything the f32 phases reached
    assert min(totals_b[n:]) < min(totals_a)
    # model contract: f32 params, x64 left off, phase timing recorded
    for leaf in jax.tree_util.tree_leaves(tr_b.state.params):
        assert leaf.dtype == jnp.float32
    assert "f64_polish_seconds" in tr_b.stats
    assert jax.config.jax_enable_x64 is False


def test_f64_polish_checkpoint_exact_continuation(newmethod_setup):
    """A checkpoint cut DURING the f64 polish phase carries the full f64
    optimizer state (section 'lbfgs64'); resuming replays the uninterrupted
    run's remaining rows bit-for-bit WITHOUT re-running the f32 L-BFGS phase,
    and lands on identical final parameters.

    backend='cpu': bit-exact replay is guaranteed only when evaluations run
    inside the single optimizer program. The default 'device_eval' dispatches
    each evaluation as a separate executable through a callback, whose f64
    reductions can differ by ~1 ulp run-to-run under a contended host thread
    pool — amplified by line-search decisions into occasional extra
    evaluations (same-basin; see test_f64_polish_device_eval_resume)."""
    mat, tmp_path = newmethod_setup
    raw = _newmethod_raw(mat, adam_it=10, lbfgs_it=5)
    raw["f64_polish"] = {"max_it": 60, "backend": "cpu"}
    cfg = parse_config(raw)

    saved = {}

    class MidPolishSaver(Trainer):
        def _record(self, losses):
            super()._record(losses)
            if (
                "path" not in saved
                and self._live_lbfgs64_state is not None
                and int(self._live_lbfgs64_state.reason) == 0  # RUNNING
            ):
                saved["path"] = self.save("model_midpolish")
                saved["iteration"] = self.state.iteration

    run_a = str(tmp_path / "full")
    os.makedirs(run_a)
    # tiny record buffer -> several host re-entries inside the polish phase
    tr_a = MidPolishSaver(cfg, run_dir=run_a, echo_every=0,
                          lbfgs_record_capacity=40)
    tr_a.train()
    assert "path" in saved, "no mid-polish chunk boundary hit; enlarge budget"
    epochs_a, fid_a, _, tot_a = read_log(run_a)

    run_b = str(tmp_path / "resumed")
    os.makedirs(run_b)
    tr_b = Trainer(cfg, run_dir=run_b, echo_every=0, lbfgs_record_capacity=40)
    tr_b.restore(saved["path"])
    assert tr_b._pending_lbfgs64_resume is not None
    n_before = saved["iteration"]
    tr_b.train()
    epochs_b, fid_b, _, tot_b = read_log(run_b)

    # B logs ONLY the remaining polish rows: the f32 L-BFGS phase must not
    # have warm-restarted (that would interleave extra rows first)
    assert epochs_b == epochs_a[n_before:]
    assert tot_b == tot_a[n_before:]
    assert fid_b == fid_a[n_before:]
    for key in tr_a.state.params:
        np.testing.assert_array_equal(
            np.asarray(tr_a.state.params[key]), np.asarray(tr_b.state.params[key])
        )


def test_f64_polish_device_eval_resume(newmethod_setup):
    """Resume under the default 'device_eval' backend: the restored run
    continues the polish (no f32 re-run), descends, and lands in the same
    basin as the uninterrupted run. Bit-exactness is NOT asserted — the
    per-evaluation callback executable's f64 reductions can differ by ~1 ulp
    under host-load, which line searches amplify into occasional extra
    evaluations (the 'cpu' backend keeps the bit-exact guarantee)."""
    mat, tmp_path = newmethod_setup
    raw = _newmethod_raw(mat, adam_it=10, lbfgs_it=5)
    raw["f64_polish"] = {"max_it": 60}
    cfg = parse_config(raw)
    assert cfg.f64_polish.backend == "device_eval"

    saved = {}

    class MidPolishSaver(Trainer):
        def _record(self, losses):
            super()._record(losses)
            if (
                "path" not in saved
                and self._live_lbfgs64_state is not None
                and int(self._live_lbfgs64_state.reason) == 0  # RUNNING
            ):
                saved["path"] = self.save("model_midpolish")
                saved["iteration"] = self.state.iteration

    run_a = str(tmp_path / "full_de")
    os.makedirs(run_a)
    tr_a = MidPolishSaver(cfg, run_dir=run_a, echo_every=0,
                          lbfgs_record_capacity=40)
    tr_a.train()
    assert "path" in saved
    _, _, _, tot_a = read_log(run_a)

    run_b = str(tmp_path / "resumed_de")
    os.makedirs(run_b)
    tr_b = Trainer(cfg, run_dir=run_b, echo_every=0, lbfgs_record_capacity=40)
    tr_b.restore(saved["path"])
    assert tr_b._pending_lbfgs64_resume is not None
    n_before = saved["iteration"]
    tr_b.train()
    _, _, _, tot_b = read_log(run_b)

    # B logs only polish rows (no f32 interleave) and keeps descending
    assert len(tot_b) >= 1
    assert tot_b[0] <= tot_a[n_before - 1] * 1.5  # continues, not restarts
    # same terminal basin as the uninterrupted run
    assert min(tot_b) <= min(tot_a[n_before:]) * 1.05
    # parameters land near A's (forked polish endpoints differ by the extra
    # line-search wander — basin-scale agreement, not bit equality)
    for key in tr_a.state.params:
        np.testing.assert_allclose(
            np.asarray(tr_a.state.params[key]),
            np.asarray(tr_b.state.params[key]),
            rtol=5e-2, atol=5e-3,
        )


def test_f64_polish_with_mesh(newmethod_setup):
    """The polish phase composes with a data-parallel mesh: the f32 phases
    run sharded, the polish runs single-device f64 from the gathered params
    (it is host-local by construction) and still improves the loss."""
    from pinn_depthestimation_tpu import parallel

    mat, tmp_path = newmethod_setup
    raw = _newmethod_raw(mat, adam_it=30, lbfgs_it=5)
    raw["f64_polish"] = {"max_it": 15}
    run_dir = str(tmp_path / "run_mesh")
    os.makedirs(run_dir)
    tr = Trainer(parse_config(raw), run_dir=run_dir, echo_every=0,
                 mesh=parallel.make_mesh(2))
    tr.train()
    _, _, _, totals = read_log(run_dir)
    n_f32 = int(tr.stats["loss_evaluations"])
    assert len(totals) > n_f32          # polish rows appended
    assert min(totals[n_f32:]) < min(totals[:n_f32])


def test_f64_polish_extension_resumes_from_f64_iterate(newmethod_setup):
    """Checkpoints written once the polish has run carry the flat f64
    iterate ('params64') even after the phase finishes; a later run that
    extends the polish starts from that exact iterate — its first evaluation
    equals the prior run's terminal f64 loss — instead of re-paying the
    f32-rounding perturbation of the shadow params."""
    import numpy as np

    mat, tmp_path = newmethod_setup
    raw = _newmethod_raw(mat, adam_it=20, lbfgs_it=0)
    raw["f64_polish"] = {"max_it": 12}
    cfg = parse_config(raw)

    run_a = str(tmp_path / "polishA")
    os.makedirs(run_a)
    tr_a = Trainer(cfg, run_dir=run_a, echo_every=0)
    tr_a.train()
    f_final = float(tr_a._live_lbfgs64_state.f)

    from pinn_depthestimation_tpu.training import checkpoint as ckpt_mod

    ckpt = os.path.join(run_a, "model.msgpack")
    assert "params64" in ckpt_mod.load_raw(ckpt)

    run_b = str(tmp_path / "polishB")
    os.makedirs(run_b)
    tr_b = Trainer(cfg, run_dir=run_b, echo_every=0)
    tr_b.restore(ckpt)
    assert tr_b._pending_params64 is not None
    tr_b.train()
    _, _, _, totals_b = read_log(run_b)
    # first polish evaluation of B == A's terminal f64 loss (to the log's
    # %.5e precision through the f32 record buffer) — evidence the seed is
    # the exact f64 iterate, not its f32-rounded shadow
    assert totals_b[0] == float("%.5e" % np.float32(f_final))
    # and the extension keeps descending from there
    assert min(totals_b) <= totals_b[0]


# ------------------------------------------------- staged precision schedule


def test_precision_schedule_config_parses(newmethod_setup):
    mat, _ = newmethod_setup
    raw = _newmethod_raw(mat)
    raw["precision_schedule"] = {"prefix_precision": "bf16", "prefix_iters": 7}
    cfg = parse_config(raw)
    assert cfg.precision_schedule.prefix_precision == "bf16"
    assert cfg.precision_schedule.prefix_iters == 7
    raw["precision_schedule"] = True
    assert parse_config(raw).precision_schedule.prefix_iters == 35_000
    raw["precision_schedule"] = False
    assert parse_config(raw).precision_schedule is None
    from pinn_depthestimation_tpu.config import ConfigError

    for bad in ({"prefix_precision": "f16"}, {"prefix_iters": -1}, {"x": 1}, 3):
        raw["precision_schedule"] = bad
        with pytest.raises(ConfigError):
            parse_config(raw)


def test_precision_schedule_splits_chunks_and_matches_unstaged(newmethod_setup):
    """The staged Adam prefix must (a) never let a scan chunk straddle the
    tier boundary — absolute-iteration keyed, so the switch lands exactly at
    ``prefix_iters`` — and (b) be bit-identical to the unstaged run when the
    prefix tier resolves to the same program (the CPU/XLA case; the real
    cheap-tier numerics are exercised on hardware,
    ``.soak/staged_precision_r5.py``)."""
    mat, tmp_path = newmethod_setup
    raw = _newmethod_raw(mat, adam_it=20, lbfgs_it=3)
    run_plain = str(tmp_path / "plain"); os.makedirs(run_plain)
    tr0 = Trainer(parse_config(raw), run_dir=run_plain, echo_every=0)
    tr0.train()

    raw["precision_schedule"] = {"prefix_precision": "bf16", "prefix_iters": 7}
    run_staged = str(tmp_path / "staged"); os.makedirs(run_staged)
    tr = Trainer(parse_config(raw), run_dir=run_staged, echo_every=0)
    # on the CPU/XLA path the schedule is inert (warning) but the boundary
    # logic still runs: the prefix chunk fn is the main program
    assert tr._adam_chunk_prefix is not None and tr._prefix_iters == 7

    calls = []
    orig_prefix, orig_main = tr._adam_chunk_prefix, tr._adam_chunk
    tr._adam_chunk_prefix = lambda p, o, b, k, s, n: (
        calls.append(("prefix", int(s), n)), orig_prefix(p, o, b, k, s, n))[1]
    tr._adam_chunk = lambda p, o, b, k, s, n: (
        calls.append(("main", int(s), n)), orig_main(p, o, b, k, s, n))[1]
    tr.train()

    assert calls == [("prefix", 0, 7), ("main", 7, 13)], calls
    # identical trajectories (same program both tiers here)
    _, _, _, totals_plain = read_log(run_plain)
    _, _, _, totals_staged = read_log(run_staged)
    assert totals_staged == totals_plain


def test_precision_schedule_resume_lands_in_correct_tier(newmethod_setup):
    """A resume from inside the prefix must continue prefix-tier chunks up to
    the boundary, then switch — keyed on the checkpoint's absolute counter."""
    mat, tmp_path = newmethod_setup
    raw = _newmethod_raw(mat, adam_it=20, lbfgs_it=0)
    raw["lbfgs_optimizer"]["max_evaluation"] = 0
    raw["precision_schedule"] = {"prefix_precision": "bf16", "prefix_iters": 7}
    run_dir = str(tmp_path / "resume"); os.makedirs(run_dir)
    tr = Trainer(parse_config(raw), run_dir=run_dir, echo_every=0)
    # stop mid-prefix: run only the first chunk by shrinking max_it
    raw_pre = dict(raw); raw_pre["adam_optimizer"] = dict(raw["adam_optimizer"])
    raw_pre["adam_optimizer"]["max_it"] = 4
    tr_pre = Trainer(parse_config(raw_pre), run_dir=run_dir, echo_every=0,
                     initial_params=tr.state.params)
    tr_pre.train_adam()
    ckpt = tr_pre.save("mid_prefix")

    tr2 = Trainer(parse_config(raw), run_dir=run_dir, echo_every=0)
    tr2.restore(ckpt)
    assert tr2.state.iteration == 4
    calls = []
    orig_prefix, orig_main = tr2._adam_chunk_prefix, tr2._adam_chunk
    tr2._adam_chunk_prefix = lambda p, o, b, k, s, n: (
        calls.append(("prefix", int(s), n)), orig_prefix(p, o, b, k, s, n))[1]
    tr2._adam_chunk = lambda p, o, b, k, s, n: (
        calls.append(("main", int(s), n)), orig_main(p, o, b, k, s, n))[1]
    tr2.train_adam()
    assert calls == [("prefix", 4, 3), ("main", 7, 13)], calls
