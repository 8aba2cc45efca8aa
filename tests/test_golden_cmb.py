"""Golden test against the ACTUAL reference CMB pipeline (train.py).

The reference's own ``train.py`` crashes as checked in on the stale 2-arg
``get_min_max`` call (``train.py:228`` vs ``operations.py:16`` — SURVEY.md §5
quirk 4), so it had never been executed against this framework until round 4.
This test runs it in a sandbox with the minimal shim ``parity.py`` ships
(a dispatching wrapper appended to the COPIED operations.py serving the
dict-wide behavior ``train.py`` expects), on synthetic CSV + ``.mat`` data,
with non-uniform per-output fidelity weights — then checks the framework's
CMB path (wave_averaged physics, separate fidelity/residual sets) tracks it
per-iteration from the reference's exact torch-seeded initial weights.

The full-schedule experiment is ``pinn-tpu parity --pipeline cmb``
(PARITY_CMB.md); this is its CI-sized form.
"""

import os

import numpy as np
import pytest

REFERENCE = "/root/reference"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REFERENCE), reason="reference mount not available"
)

ADAM_IT = 40
LBFGS_IT = 8


@pytest.fixture(scope="module")
def golden_cmb(tmp_path_factory):
    """Execute the shimmed reference train.py; return everything the
    framework run needs for the comparison."""
    from pinn_depthestimation_tpu import parity
    from pinn_depthestimation_tpu.config import parse_config
    from pinn_depthestimation_tpu.data import load_cmb_training_data
    from pinn_depthestimation_tpu.utils import synthetic

    tmp = tmp_path_factory.mktemp("golden_cmb")
    workdir = tmp / "ref"
    workdir.mkdir()
    csv = str(tmp / "input_fid.csv")
    mat = str(tmp / "input_res.mat")
    synthetic.make_cmb_dataset(csv, mat, nx=41, ny=51, nan_fraction=0.02,
                               seed=21)
    cfg_raw = parity.make_cmb_config(
        csv, mat, ADAM_IT, LBFGS_IT, tol_grad=1e-10, tol_change=1e-13,
        hidden_layers=3, hidden_width=16, nx=41, ny=51,
    )
    # the framework loader's residual rows double as the h-field evaluation
    # grid; their byte-parity with the reference's own loader is implied by
    # the first-evaluation loss equality asserted below
    res_rows = load_cmb_training_data(parse_config(cfg_raw)).residual_input
    fids, ress, totals, ref_h, _wall = parity.run_reference_cmb(
        str(workdir), cfg_raw, res_rows
    )
    params = parity.reference_initial_params(str(workdir), 3, 16, n_out=6)
    return cfg_raw, params, (fids, ress, totals), ref_h


def test_framework_tracks_actual_reference_cmb_run(golden_cmb, tmp_path):
    from pinn_depthestimation_tpu.config import parse_config
    from pinn_depthestimation_tpu.training import Trainer
    from pinn_depthestimation_tpu.training.logging_utils import read_log

    cfg_raw, params, (ref_fids, ref_ress, ref_totals), ref_h = golden_cmb
    cfg = parse_config(cfg_raw)
    assert cfg.physics == "wave_averaged"  # train.py:17 imports physics_equation
    run_dir = str(tmp_path / "ours")
    os.makedirs(run_dir)
    tr = Trainer(cfg, run_dir=run_dir, echo_every=0, initial_params=params)
    tr.train()
    _, fids, ress, totals = read_log(run_dir)

    assert len(ref_totals) >= ADAM_IT + 1
    assert len(totals) >= ADAM_IT + 1

    # initial evaluation: same weights, same data -> tight agreement, for the
    # weighted-fidelity and wave_averaged-residual components separately
    # (reference train.py:136-141, 154)
    np.testing.assert_allclose(totals[0], ref_totals[0], rtol=2e-4)
    np.testing.assert_allclose(fids[0], ref_fids[0], rtol=2e-4)
    np.testing.assert_allclose(ress[0], ref_ress[0], rtol=2e-3)

    # whole Adam phase tracks the genuine reference run (f32 both sides)
    np.testing.assert_allclose(
        totals[:ADAM_IT], ref_totals[:ADAM_IT], rtol=5e-3,
        err_msg="per-iteration losses diverged from the actual reference CMB run",
    )

    # L-BFGS rows (everything after the Adam schedule — torch logs one row
    # per closure evaluation, reference train.py:195-200). At 40 Adam
    # iterations the chaotic fork is still small (the 5e-3 Adam tracking
    # above), so the first strong-Wolfe evaluation from the ~shared warm
    # point must agree, and both optimizers must descend into the same
    # basin. Per-evaluation tracking from an EXACTLY shared warm point is
    # the dedicated experiment PARITY_CMB_LBFGS.md (.soak/cmb_warm_lbfgs.py).
    lb_ref = np.asarray(ref_totals[ADAM_IT:])
    lb_our = np.asarray(totals[ADAM_IT:])
    assert lb_ref.size >= 1 and lb_our.size >= 1
    np.testing.assert_allclose(
        lb_our[0], lb_ref[0], rtol=1e-2,
        err_msg="first L-BFGS evaluation diverged from the reference's",
    )
    gap = abs(np.log10(lb_our.min()) - np.log10(lb_ref.min()))
    assert gap < 0.1, (
        f"L-BFGS terminal basins diverged: log10 gap {gap:.3f} "
        f"(reference {lb_ref.min():.6e}, framework {lb_our.min():.6e})"
    )

    # recovered h on the shared collocation rows agrees at the field level
    our_h = np.asarray(tr.predict(tr.data.residual_input))[:, 0]
    rmse = float(np.sqrt(np.mean((our_h - ref_h) ** 2)))
    scale = float(np.ptp(ref_h)) + 1e-12
    assert rmse <= 0.01 * scale, (rmse, scale)


def test_cmb_shim_preserves_three_arg_calls(golden_cmb, tmp_path):
    """The sandbox shim only ADDS the stale dict-wide call pattern; the
    checked-in 3-arg per-key behavior must pass through unchanged (the
    newmethod scripts call it that way, train_newmethod.py:231)."""
    import importlib
    import sys

    cfg_raw, *_ = golden_cmb
    # the golden fixture's sandbox was handed to run_reference_cmb, which
    # appended the shim to the copied operations.py; import that copy
    workdir = os.path.dirname(cfg_raw["data_fidelity"]["file"]) + "/ref"
    sys.path.insert(0, workdir)
    try:
        op = importlib.import_module("operations")
        importlib.reload(op)
        data = {"x": np.asarray([1.0, 2.0, np.nan]), "q": np.asarray([3.0, 9.0])}
        config = {"data_test": {"x_min": 0.0, "x_max": 4.0}}
        # 3-arg per-key (checked-in signature, train_newmethod.py:231)
        assert op.get_min_max(data, "x", config)["x"] == (0.0, 4.0)
        assert op.get_min_max(data, "q", config)["q"] == (3.0, 9.0)
        # 2-arg dict-wide (the stale call train.py:228 makes)
        mm = op.get_min_max(data, config)
        assert mm["x"] == (0.0, 4.0) and mm["q"] == (3.0, 9.0)
    finally:
        sys.path.pop(0)
