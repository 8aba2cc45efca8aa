"""Legacy `numerical_model` FUNWAVE-snapshot pipeline (reference
config.json:38-69 / config_txyz.json).

The reference's own train.py cannot run these configs (it expects
data_fidelity.file + a .mat residual; SURVEY.md §5 quirk 5) — this rebuilds
the described capability: snapshot-directory ingestion into a (t,x,y,...)
collocation set feeding navier_stokes, end to end.
"""

import json
import os

import numpy as np
import pytest

from pinn_depthestimation_tpu import data as data_mod
from pinn_depthestimation_tpu.config import load_config, parse_config
from pinn_depthestimation_tpu.training import Trainer
from pinn_depthestimation_tpu.training.logging_utils import read_log
from pinn_depthestimation_tpu.utils import synthetic

NX, NY, DX, DY = 25, 21, 2.0, 2.0
SNAPS = (200, 201, 202)


def _legacy_raw(snap_dir, csv_path, *, interval=2, adam_it=8, lbfgs_it=3):
    """config.json-shaped raw dict (5 inputs t,x,y,u,v; 4 outputs h,z,u,v)."""
    return {
        "layers": {"input_features": 5, "hidden_layers": 3, "hidden_width": 16,
                   "output_features": 4, "dropout_rate": 0.0, "init_type": "xavier"},
        "adam_optimizer": {"max_it": adam_it, "learning_rate": 1e-3,
                           "scheduler_step_size": 100, "scheduler_gamma": 0.8},
        "lbfgs_optimizer": {"max_it": lbfgs_it, "learning_rate": 1,
                            "max_evaluation": 4 * max(lbfgs_it, 1),
                            "history_size": 10, "tolerance_grad": 1e-9,
                            "tolerance_change": 1e-12,
                            "line_search_fn": "strong_wolfe"},
        "loss": {"weight_fid_loss": 1, "weight_res_loss": 1},
        "data_fidelity": {"dir": csv_path,
                          "inputs": ["t", "x", "y", "u", "v"],
                          "outputs": ["h", "z", "u", "v"],
                          "training_points": 200},
        "data_residual": {
            "inputs": {"t": {"file": "t", "requires_grad": ["true"]},
                       "x": {"file": "X", "requires_grad": ["true"]},
                       "y": {"file": "Y", "requires_grad": ["true"]},
                       "u": {"file": "u", "requires_grad": ["false"]},
                       "v": {"file": "v", "requires_grad": ["false"]}},
            "outputs": {"h": {"file": "dep.out"}, "z": {"file": "eta"},
                        "u": {"file": "u"}, "v": {"file": "v"}},
            "numerical_model_snapshots": list(SNAPS),
        },
        "numerical_model": {"dir": snap_dir, "nx": NX, "ny": NY,
                            "dx": DX, "dy": DY,
                            "x_min": 0.0, "x_max": DX * (NX - 1),
                            "y_min": 0.0, "y_max": DY * (NY - 1),
                            "interval_x": interval, "interval_y": interval,
                            "dt": 1.0, "number_of_files": 501},
        "physics": "navier_stokes",
    }


@pytest.fixture
def snapshot_setup(tmp_path):
    snap_dir, csv = synthetic.make_funwave_snapshot_dir(
        str(tmp_path / "beach2d"), nx=NX, ny=NY, dx=DX, dy=DY,
        snapshots=SNAPS, seed=3,
    )
    return snap_dir, csv, tmp_path


def test_legacy_loader_shapes_and_values(snapshot_setup):
    snap_dir, csv, tmp_path = snapshot_setup
    cfg = parse_config(_legacy_raw(snap_dir, csv))
    td = data_mod.load_training_data(cfg)

    assert td.fidelity_input.shape == (200, 5)
    assert td.fidelity_true.shape == (200, 4)
    # 3 snapshots x subsampled grid (ceil(25/2) x ceil(21/2) = 13 x 11)
    assert td.residual_input.shape == (3 * 13 * 11, 5)
    assert np.isfinite(td.residual_input).all()
    assert not td.fidelity_is_residual

    # inputs normalized with the FIDELITY bounds (reference train.py:263):
    # the random fidelity subsample's range can undershoot the grid extremes,
    # so field channels may overshoot [-1,1] slightly — but the coordinate
    # channels (t exactly shared; x/y endpoints nearly sampled) stay tight
    assert np.abs(td.residual_input[:, :3]).max() <= 1.0 + 0.1
    assert np.abs(td.residual_input).max() <= 2.0
    # t channel: one constant value per snapshot block, ascending
    t_col = td.residual_input[:, 0]
    blocks = t_col.reshape(3, -1)
    for b in blocks:
        assert np.all(b == b[0])
    assert blocks[0, 0] < blocks[1, 0] < blocks[2, 0]


def test_legacy_loader_static_file_and_missing_snapshot(snapshot_setup):
    snap_dir, csv, tmp_path = snapshot_setup
    raw = _legacy_raw(snap_dir, csv)
    # dep.out resolves as a static grid channel
    raw["data_residual"]["inputs"]["u"] = {"file": "dep.out",
                                           "requires_grad": ["false"]}
    td = data_mod.load_training_data(parse_config(raw))
    u = td.residual_input[:, 3].reshape(3, -1)
    np.testing.assert_array_equal(u[0], u[1])  # static across snapshots

    raw = _legacy_raw(snap_dir, csv)
    raw["data_residual"]["inputs"]["u"] = {"file": "nosuch",
                                           "requires_grad": ["false"]}
    with pytest.raises(FileNotFoundError, match="nosuch"):
        data_mod.load_training_data(parse_config(raw))


def test_legacy_loader_snapshot_out_of_range(snapshot_setup):
    snap_dir, csv, tmp_path = snapshot_setup
    raw = _legacy_raw(snap_dir, csv)
    raw["data_residual"]["numerical_model_snapshots"] = [200, 999]
    raw["numerical_model"]["number_of_files"] = 501
    with pytest.raises(ValueError, match="999"):
        data_mod.load_training_data(parse_config(raw))


def test_legacy_nan_masking(tmp_path):
    snap_dir, csv = synthetic.make_funwave_snapshot_dir(
        str(tmp_path / "nan"), nx=NX, ny=NY, snapshots=SNAPS,
        nan_fraction=0.05, seed=7,
    )
    cfg = parse_config(_legacy_raw(snap_dir, csv))
    td = data_mod.load_training_data(cfg)
    assert td.residual_input.shape[0] < 3 * 13 * 11  # NaN rows dropped
    assert np.isfinite(td.residual_input).all()


def test_legacy_end_to_end_training(snapshot_setup):
    """The capability the reference describes but never achieved: a
    config.json-style run trains navier_stokes end to end."""
    snap_dir, csv, tmp_path = snapshot_setup
    cfg_path = tmp_path / "config_legacy.json"
    cfg_path.write_text(json.dumps(_legacy_raw(snap_dir, csv)))
    cfg = load_config(str(cfg_path))
    assert cfg.physics == "navier_stokes"

    run_dir = str(tmp_path / "run"); os.makedirs(run_dir)
    tr = Trainer(cfg, run_dir=run_dir, echo_every=0)
    tr.train()
    epochs, fids, ress, totals = read_log(run_dir)
    assert len(epochs) >= 9  # 8 adam + L-BFGS evals
    assert all(np.isfinite(v) for v in totals)
    assert totals[-1] < totals[0]  # optimizing
    assert os.path.exists(os.path.join(run_dir, "model.msgpack"))


def test_reference_legacy_configs_remain_parseable():
    for name in ("config.json", "config_txyz.json"):
        cfg = load_config(os.path.join("/root/reference", name))
        assert cfg.numerical_model is not None
        assert cfg.data_residual.snapshots == tuple(range(200, 221))
        assert cfg.data_residual.output_files[0] == "dep.out"


def test_legacy_fused_kernel_matches_xla(snapshot_setup):
    """navier_stokes over (t,x,y) tangents + u/v as extra non-grad inputs
    routes through the fused kernels (n_tangents=3, d_in=5) and matches the
    XLA loss path, values and grads."""
    import jax
    import jax.numpy as jnp

    from pinn_depthestimation_tpu.models import MLPSpec, init_mlp_params
    from pinn_depthestimation_tpu.training import build_loss_fn

    snap_dir, csv, tmp_path = snapshot_setup
    cfg = parse_config(_legacy_raw(snap_dir, csv))
    td = data_mod.load_training_data(cfg)
    spec = MLPSpec.from_layers(cfg.layers)
    params = init_mlp_params(jax.random.PRNGKey(2), spec)
    batch = {"fidelity_input": jnp.asarray(td.fidelity_input),
             "fidelity_true": jnp.asarray(td.fidelity_true),
             "residual_input": jnp.asarray(td.residual_input)}

    loss_xla = build_loss_fn(cfg, spec)
    loss_fused = build_loss_fn(cfg, spec, fused_kernel=True, fused_interpret=True)
    (t1, (f1, r1)), g1 = jax.value_and_grad(loss_xla, has_aux=True)(params, batch)
    (t2, (f2, r2)), g2 = jax.value_and_grad(loss_fused, has_aux=True)(params, batch)
    assert float(t2) == pytest.approx(float(t1), rel=2e-4)
    assert float(r2) == pytest.approx(float(r1), rel=2e-3)
    for k in g1:
        np.testing.assert_allclose(
            np.asarray(g2[k]), np.asarray(g1[k]), rtol=2e-3, atol=2e-6
        )


def test_legacy_fidelity_csv_nan_first_row_is_headerless(tmp_path):
    """FUNWAVE dry-gauge rows print literal 'nan'; a headerless CSV whose
    FIRST row contains one must still be detected as headerless (the old
    sniffer saw the letters of 'nan' and consumed the row as a header)."""
    path = str(tmp_path / "fid.csv")
    rows = [
        "0.00 25.00 -13.00 nan nan nan nan",
        "0.05 25.00 -13.00 0.75 0.01 0.02 0.03",
    ]
    with open(path, "w") as f:
        f.write("\n".join(rows) + "\n")
    frame = data_mod._read_legacy_fidelity_csv(path)
    assert list(frame.columns) == ["t", "x", "y", "h", "z", "u", "v"]
    assert len(frame) == 2
    assert np.isnan(frame["h"].iloc[0]) and frame["h"].iloc[1] == 0.75


def test_legacy_fidelity_csv_comma_separated_headerless(tmp_path):
    """A comma-separated headerless numeric CSV parses via delimiter
    sniffing (the sniffer normalizes commas for the header decision; the
    parse must handle them too)."""
    path = str(tmp_path / "fid_comma.csv")
    with open(path, "w") as f:
        f.write("0.00,25.00,-13.00,0.75,0.01,0.02,0.03\n")
        f.write("0.05,25.00,-12.00,0.74,0.02,0.03,0.04\n")
    frame = data_mod._read_legacy_fidelity_csv(path)
    assert list(frame.columns) == ["t", "x", "y", "h", "z", "u", "v"]
    assert len(frame) == 2 and frame["y"].iloc[1] == -12.0


def test_legacy_fidelity_csv_space_padded_columns(tmp_path):
    """Fortran/hand-aligned files pad columns with RUNS of spaces; the
    delimiter sniffer would pick a single space and invent empty columns
    ('got 15'); whitespace-regex parsing must handle them."""
    path = str(tmp_path / "fid_padded.csv")
    rows = [
        " 0.00  25.00  -13.00   0.75  0.01  0.02  0.03",
        " 0.05  25.00  -12.00   0.74  0.02  0.03  0.04",
    ]
    with open(path, "w") as f:
        f.write("\n".join(rows) + "\n")
    frame = data_mod._read_legacy_fidelity_csv(path)
    assert list(frame.columns) == ["t", "x", "y", "h", "z", "u", "v"]
    assert len(frame) == 2 and frame["y"].iloc[1] == -12.0


def test_legacy_dry_gauge_rows_are_masked(snapshot_setup):
    """A FUNWAVE dry-gauge fidelity row (literal 'nan' outputs) must be
    dropped BEFORE normalization bounds and training — one surviving NaN
    poisons the u/v min/max and makes the fidelity MSE (and every gradient)
    NaN from iteration 1."""
    snap_dir, csv, tmp_path = snapshot_setup
    with open(csv) as f:
        n_rows = sum(1 for line in f if line.strip()) - 1  # header
    with open(csv, "a") as f:
        f.write("0.00 25.00 -13.00 nan nan nan nan\n")

    cfg = parse_config(_legacy_raw(snap_dir, csv))
    td = data_mod.load_legacy_training_data(cfg)
    assert np.isfinite(td.fidelity_input).all()
    assert np.isfinite(td.fidelity_true).all()
    # the dry row is gone; the clean rows (subsampled to training_points cap)
    # are still there
    assert 0 < td.fidelity_input.shape[0] <= n_rows
    # and the normalization bounds stayed finite (u/v come from the data)
    for k, (lo, hi) in td.input_min_max.items():
        assert np.isfinite(lo) and np.isfinite(hi), k

    # an all-dry file fails loudly, not with a NaN loss
    all_dry = str(tmp_path / "dry.csv")
    with open(all_dry, "w") as f:
        f.write("0.00 25.00 -13.00 nan nan nan nan\n")
    cfg2 = parse_config(_legacy_raw(snap_dir, all_dry))
    with pytest.raises(ValueError, match="non-finite"):
        data_mod.load_legacy_training_data(cfg2)
