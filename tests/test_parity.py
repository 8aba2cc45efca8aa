"""Golden parity: the full training loop vs a PyTorch replica of the
reference pipeline, with identical injected weights and identical data.

This is SURVEY.md §4's "Parity (the real harness)": the torch side reproduces
the reference's exact training semantics (full-batch Adam + StepLR stepped
per iteration, unweighted per-output ``mse_loss`` fidelity, ``continuity_only``
residual on the same points, then strong-Wolfe L-BFGS), and the JAX side is
the shipped Trainer. Per-iteration losses must track to f32 tolerance.
"""

import os

import jax
import numpy as np
import pytest
import torch

from pinn_depthestimation_tpu.config import parse_config
from pinn_depthestimation_tpu.models import MLPSpec, init_mlp_params
from pinn_depthestimation_tpu.training import Trainer
from pinn_depthestimation_tpu.training.logging_utils import read_log
from pinn_depthestimation_tpu.utils import synthetic
from tests.oracles.torch_reference import build_torch_mlp, loss_continuity_only

ADAM_STEPS = 60
LR = 1e-3
SCHED_STEP, SCHED_GAMMA = 25, 0.8


def _torch_reference_training(params, coords, trues, adam_steps, *, dtype=torch.float64):
    """The reference's training loop, reassembled for oracle purposes
    (reference train_newmethod.py:120-209): full-batch Adam + StepLR with
    fidelity = sum of per-output mse_loss and residual = continuity_only."""
    model = build_torch_mlp(jax.tree.map(np.asarray, params))
    if dtype == torch.float32:
        model = model.float()
    x = torch.tensor(coords[:, 0:1], dtype=dtype, requires_grad=True)
    y = torch.tensor(coords[:, 1:2], dtype=dtype, requires_grad=True)
    true_t = torch.tensor(trues, dtype=dtype)

    opt = torch.optim.Adam(model.parameters(), lr=LR)
    sched = torch.optim.lr_scheduler.StepLR(opt, step_size=SCHED_STEP, gamma=SCHED_GAMMA)

    def loss_fn():
        pred = model(torch.cat([x, y], dim=-1))
        U, V, h = pred[:, 0:1], pred[:, 1:2], pred[:, 2:3]
        fid = torch.nn.functional.mse_loss(U, true_t[:, 0:1]) + \
              torch.nn.functional.mse_loss(V, true_t[:, 1:2])
        res = loss_continuity_only(x, y, h, U, V)
        return fid + res, fid, res

    totals = []
    for _ in range(adam_steps):
        opt.zero_grad()
        total, fid, res = loss_fn()
        total.backward()
        opt.step()
        sched.step()
        totals.append(float(total))
    return model, totals, loss_fn, opt


@pytest.fixture(scope="module")
def setup(tmp_path_factory):
    tmp_path = tmp_path_factory.mktemp("parity")
    mat = str(tmp_path / "data.mat")
    synthetic.make_newmethod_mat(mat, nx=14, ny=12, nan_fraction=0.0, seed=11)
    raw = {
        "layers": {"input_features": 2, "hidden_layers": 3, "hidden_width": 16,
                   "output_features": 3, "dropout_rate": 0.0, "init_type": "xavier"},
        "adam_optimizer": {"max_it": ADAM_STEPS, "learning_rate": LR,
                           "scheduler_step_size": SCHED_STEP,
                           "scheduler_gamma": SCHED_GAMMA},
        "lbfgs_optimizer": {"max_it": 0, "learning_rate": 1, "max_evaluation": 0,
                            "history_size": 10, "tolerance_grad": 1e-9,
                            "tolerance_change": 1e-12,
                            "line_search_fn": "strong_wolfe"},
        "loss": {"weight_fid_loss": 1, "weight_res_loss": 1},
        "data": {"file": mat,
                 "inputs": {"x": {"requires_grad": ["true"]},
                            "y": {"requires_grad": ["true"]}},
                 "trues": ["U", "V"], "unknowns": ["h"]},
    }
    cfg = parse_config(raw)
    spec = MLPSpec.from_layers(cfg.layers)
    params = init_mlp_params(jax.random.PRNGKey(123), spec)

    run_dir = str(tmp_path / "run"); os.makedirs(run_dir)
    trainer = Trainer(cfg, run_dir=run_dir, echo_every=0, initial_params=params)
    coords = trainer.data.fidelity_input.astype(np.float64)
    trues = trainer.data.fidelity_true.astype(np.float64)
    return cfg, params, trainer, run_dir, coords, trues, raw, tmp_path


def test_adam_phase_tracks_reference(setup):
    cfg, params, trainer, run_dir, coords, trues, raw, tmp_path = setup
    _, torch_totals, _, _ = _torch_reference_training(params, coords, trues, ADAM_STEPS)

    trainer.train_adam()
    _, _, _, jax_totals = read_log(run_dir)

    assert len(jax_totals) == ADAM_STEPS == len(torch_totals)
    torch_totals = np.asarray(torch_totals)
    jax_totals = np.asarray(jax_totals)
    # identical weights + identical data + identical optimizer semantics:
    # per-iteration totals agree to f32 tolerance (torch side is f64 truth)
    np.testing.assert_allclose(jax_totals, torch_totals, rtol=2e-3)
    # and tightly at the start, before roundoff accumulates
    np.testing.assert_allclose(jax_totals[:10], torch_totals[:10], rtol=2e-4)


def test_lbfgs_phase_tracks_reference(setup):
    cfg, params, trainer, run_dir, coords, trues, raw, tmp_path = setup
    # warm both sides identically with torch-f64 Adam... instead: cold-start
    # L-BFGS from the SAME injected weights on both sides.
    lbfgs_iters = 60

    model, _, loss_fn, _ = _torch_reference_training(params, coords, trues, 0)
    opt = torch.optim.LBFGS(
        model.parameters(), lr=1, max_iter=lbfgs_iters,
        max_eval=round(lbfgs_iters * 2.5), history_size=10,
        tolerance_grad=1e-12, tolerance_change=1e-14,
        line_search_fn="strong_wolfe",
    )
    torch_evals = []

    def closure():
        opt.zero_grad()
        total, fid, res = loss_fn()
        total.backward()
        torch_evals.append(float(total))
        return total

    opt.step(closure)

    raw2 = {k: (dict(v) if isinstance(v, dict) else v) for k, v in raw.items()}
    raw2["adam_optimizer"]["max_it"] = 0
    raw2["lbfgs_optimizer"] = {
        "max_it": lbfgs_iters, "learning_rate": 1,
        "max_evaluation": round(lbfgs_iters * 2.5), "history_size": 10,
        "tolerance_grad": 1e-12, "tolerance_change": 1e-14,
        "line_search_fn": "strong_wolfe",
    }
    cfg2 = parse_config(raw2)
    run2 = str(tmp_path / "run_lbfgs"); os.makedirs(run2, exist_ok=True)
    tr2 = Trainer(cfg2, run_dir=run2, echo_every=0, initial_params=params)
    tr2.train_lbfgs()
    _, _, _, jax_evals = read_log(run2)

    # initial evaluation must agree tightly
    np.testing.assert_allclose(jax_evals[0], torch_evals[0], rtol=1e-4)
    # per-eval trajectory tracking: measure the longest prefix where every
    # evaluation agrees to 5e-3 relative (line-search decisions identical).
    # Measured on this setup: 33 consecutive evals before f32 roundoff
    # amplification forks the search; require a robust floor of 20.
    n = min(len(jax_evals), len(torch_evals))
    rel = np.abs(np.asarray(jax_evals[:n]) - np.asarray(torch_evals[:n])) / np.maximum(
        np.abs(np.asarray(torch_evals[:n])), 1e-12
    )
    tracked = 0
    while tracked < n and rel[tracked] <= 5e-3:
        tracked += 1
    assert tracked >= 20, f"trajectory forked after {tracked} evals (rel head {rel[:8]})"
    # both optimizers reach the same basin: terminal minima within 0.1 in
    # log10 (measured gap on this setup: ~0.002)
    assert min(jax_evals) < torch_evals[0] * 0.5
    assert abs(np.log10(min(jax_evals)) - np.log10(min(torch_evals))) < 0.1


def test_snapshot_schema_matches_reference_artifact(setup):
    """Our snapshot writer produces the exact key/shape/dtype layout of the
    reference's shipped data_at50k.mat artifact."""
    from scipy.io import loadmat, whosmat

    ref = whosmat("/root/reference/data_at50k.mat")
    ref_info = {name: (shape, dtype) for name, shape, dtype in ref}
    assert set(ref_info) == {"pred_U", "pred_V", "pred_h"}

    cfg, params, trainer, run_dir, coords, trues, raw, tmp_path = setup
    trainer.config.snapshot_iteration = trainer.state.iteration or 1
    trainer._snapshot_done = False
    if trainer.state.iteration == 0:
        trainer.state.iteration = 1
    trainer._maybe_snapshot()
    fname = [f for f in os.listdir(run_dir) if f.startswith("data_at")][0]
    ours = loadmat(os.path.join(run_dir, fname))
    for key, (shape, dtype) in ref_info.items():
        assert key in ours
        assert ours[key].ndim == 2 and ours[key].shape[1] == 1  # column vectors
        assert ours[key].dtype == np.float32 == np.dtype(dtype)


def _make_raw(mat, *, init_type="xavier", dropout=0.0, adam_steps=ADAM_STEPS):
    return {
        "layers": {"input_features": 2, "hidden_layers": 3, "hidden_width": 16,
                   "output_features": 3, "dropout_rate": dropout,
                   "init_type": init_type},
        "adam_optimizer": {"max_it": adam_steps, "learning_rate": LR,
                           "scheduler_step_size": SCHED_STEP,
                           "scheduler_gamma": SCHED_GAMMA},
        "lbfgs_optimizer": {"max_it": 0, "learning_rate": 1, "max_evaluation": 0,
                            "history_size": 10, "tolerance_grad": 1e-9,
                            "tolerance_change": 1e-12,
                            "line_search_fn": "strong_wolfe"},
        "loss": {"weight_fid_loss": 1, "weight_res_loss": 1},
        "data": {"file": mat,
                 "inputs": {"x": {"requires_grad": ["true"]},
                            "y": {"requires_grad": ["true"]}},
                 "trues": ["U", "V"], "unknowns": ["h"]},
    }


def test_kaiming_adam_phase_tracks_reference(tmp_path):
    """LeakyReLU(0.01)+kaiming training parity (reference dnn.py:18-23,44-47):
    the non-default activation/init pairing through full Adam dynamics,
    including the residual's LeakyReLU derivative."""
    mat = str(tmp_path / "data.mat")
    synthetic.make_newmethod_mat(mat, nx=14, ny=12, nan_fraction=0.0, seed=17)
    cfg = parse_config(_make_raw(mat, init_type="kaiming"))
    spec = MLPSpec.from_layers(cfg.layers)
    params = init_mlp_params(jax.random.PRNGKey(321), spec)

    run_dir = str(tmp_path / "run"); os.makedirs(run_dir)
    trainer = Trainer(cfg, run_dir=run_dir, echo_every=0, initial_params=params)
    coords = trainer.data.fidelity_input.astype(np.float64)
    trues = trainer.data.fidelity_true.astype(np.float64)

    from tests.oracles.torch_reference import build_torch_mlp as _build

    model = _build(jax.tree.map(np.asarray, params), init_type="kaiming")
    x = torch.tensor(coords[:, 0:1], dtype=torch.float64, requires_grad=True)
    y = torch.tensor(coords[:, 1:2], dtype=torch.float64, requires_grad=True)
    true_t = torch.tensor(trues, dtype=torch.float64)
    opt = torch.optim.Adam(model.parameters(), lr=LR)
    sched = torch.optim.lr_scheduler.StepLR(opt, step_size=SCHED_STEP,
                                            gamma=SCHED_GAMMA)
    torch_totals = []
    for _ in range(ADAM_STEPS):
        opt.zero_grad()
        pred = model(torch.cat([x, y], dim=-1))
        U, V, h = pred[:, 0:1], pred[:, 1:2], pred[:, 2:3]
        fid = torch.nn.functional.mse_loss(U, true_t[:, 0:1]) + \
              torch.nn.functional.mse_loss(V, true_t[:, 1:2])
        total = fid + loss_continuity_only(x, y, h, U, V)
        total.backward()
        opt.step(); sched.step()
        torch_totals.append(float(total))

    trainer.train_adam()
    _, _, _, jax_totals = read_log(run_dir)
    assert len(jax_totals) == ADAM_STEPS
    np.testing.assert_allclose(np.asarray(jax_totals), np.asarray(torch_totals),
                               rtol=2e-3)
    np.testing.assert_allclose(np.asarray(jax_totals[:10]),
                               np.asarray(torch_totals[:10]), rtol=2e-4)


class _FixedMask(torch.nn.Module):
    """Stands in for torch.nn.Dropout with an externally injected mask (so
    both frameworks see the SAME Bernoulli draw; mask already carries the
    1/keep inverted scaling)."""

    def __init__(self):
        super().__init__()
        self.mask = None

    def forward(self, x):
        return x if self.mask is None else x * self.mask


def test_dropout_adam_phase_tracks_reference(tmp_path):
    """Dropout>0 training parity (reference dnn.py:38: Dropout after every
    hidden activation, inverted scaling). Masks are drawn once per iteration
    from the framework's RNG chain (fold_in(base_key, iter) -> per-layer
    split -> bernoulli) and injected into the torch oracle, which mirrors the
    framework's documented semantics: dropout on the fidelity forward,
    deterministic residual forward (models/mlp.py:249 — the tangent fusion is
    eval-mode; both shipped reference configs set dropout_rate=0.0)."""
    rate, keep = 0.25, 0.75
    mat = str(tmp_path / "data.mat")
    synthetic.make_newmethod_mat(mat, nx=14, ny=12, nan_fraction=0.0, seed=19)
    cfg = parse_config(_make_raw(mat, dropout=rate))
    spec = MLPSpec.from_layers(cfg.layers)
    params = init_mlp_params(jax.random.PRNGKey(77), spec)

    run_dir = str(tmp_path / "run"); os.makedirs(run_dir)
    trainer = Trainer(cfg, run_dir=run_dir, echo_every=0, initial_params=params)
    coords = trainer.data.fidelity_input.astype(np.float64)
    trues = trainer.data.fidelity_true.astype(np.float64)
    n_pts, width, n_stack = coords.shape[0], spec.width, spec.n_hidden - 1

    # torch oracle: Linear->Tanh->mask chain for the fidelity forward, plus a
    # mask-free eval forward for the residual (two forwards, shared weights)
    np_params = jax.tree.map(np.asarray, params)
    from tests.oracles.torch_reference import build_torch_mlp as _build

    model = _build(np_params)  # eval-mode chain (residual path)
    linears = [m for m in model if isinstance(m, torch.nn.Linear)]
    masks = [_FixedMask() for _ in range(n_stack + 1)]

    def fid_forward(inp):
        a = masks[0](torch.tanh(linears[0](inp)))
        for lin, mk in zip(linears[1:-1], masks[1:]):
            a = mk(torch.tanh(lin(a)))
        return linears[-1](a)

    x = torch.tensor(coords[:, 0:1], dtype=torch.float64, requires_grad=True)
    y = torch.tensor(coords[:, 1:2], dtype=torch.float64, requires_grad=True)
    true_t = torch.tensor(trues, dtype=torch.float64)
    opt = torch.optim.Adam(model.parameters(), lr=LR)
    sched = torch.optim.lr_scheduler.StepLR(opt, step_size=SCHED_STEP,
                                            gamma=SCHED_GAMMA)

    base_key = jax.random.PRNGKey(cfg.seed + 1)  # driver.py:240
    torch_totals = []
    for it in range(ADAM_STEPS):
        keys = jax.random.split(jax.random.fold_in(base_key, it), n_stack + 1)
        for mk, key in zip(masks, keys):
            bern = np.asarray(jax.random.bernoulli(key, keep, (n_pts, width)))
            mk.mask = torch.tensor(bern.astype(np.float64) / keep)
        opt.zero_grad()
        pred_fid = fid_forward(torch.cat([x, y], dim=-1))
        fid = torch.nn.functional.mse_loss(pred_fid[:, 0:1], true_t[:, 0:1]) + \
              torch.nn.functional.mse_loss(pred_fid[:, 1:2], true_t[:, 1:2])
        pred_res = model(torch.cat([x, y], dim=-1))
        U, V, h = pred_res[:, 0:1], pred_res[:, 1:2], pred_res[:, 2:3]
        total = fid + loss_continuity_only(x, y, h, U, V)
        total.backward()
        opt.step(); sched.step()
        torch_totals.append(float(total))

    trainer.train_adam()
    _, _, _, jax_totals = read_log(run_dir)
    assert len(jax_totals) == ADAM_STEPS
    np.testing.assert_allclose(np.asarray(jax_totals), np.asarray(torch_totals),
                               rtol=2e-3)
    np.testing.assert_allclose(np.asarray(jax_totals[:10]),
                               np.asarray(torch_totals[:10]), rtol=3e-4)


def test_warm_lbfgs_field_level_parity(tmp_path):
    """Warm-start L-BFGS parity with a FIELD-level criterion: both sides run
    the same Adam warm phase from identical weights, then a deep L-BFGS with
    tight tolerances (so the optimizer does substantial work, unlike the
    reference tolerances which terminate in ~3 evals after a warm start) —
    and the recovered depth fields must agree at the end, regardless of
    where the f32 line-search trajectories forked."""
    warm_steps, lbfgs_iters = 300, 150
    mat = str(tmp_path / "data.mat")
    synthetic.make_newmethod_mat(mat, nx=14, ny=12, nan_fraction=0.0, seed=23)
    raw = _make_raw(mat, adam_steps=warm_steps)
    raw["lbfgs_optimizer"] = {
        "max_it": lbfgs_iters, "learning_rate": 1,
        "max_evaluation": round(lbfgs_iters * 2.5), "history_size": 20,
        "tolerance_grad": 1e-10, "tolerance_change": 1e-12,
        "line_search_fn": "strong_wolfe",
    }
    cfg = parse_config(raw)
    spec = MLPSpec.from_layers(cfg.layers)
    params = init_mlp_params(jax.random.PRNGKey(55), spec)

    run_dir = str(tmp_path / "run"); os.makedirs(run_dir)
    trainer = Trainer(cfg, run_dir=run_dir, echo_every=0, initial_params=params)
    coords = trainer.data.fidelity_input.astype(np.float64)
    trues = trainer.data.fidelity_true.astype(np.float64)

    # torch side: same warm Adam, then deep L-BFGS
    model, _, loss_fn, _ = _torch_reference_training(params, coords, trues, warm_steps)
    opt = torch.optim.LBFGS(
        model.parameters(), lr=1, max_iter=lbfgs_iters,
        max_eval=round(lbfgs_iters * 2.5), history_size=20,
        tolerance_grad=1e-10, tolerance_change=1e-12,
        line_search_fn="strong_wolfe",
    )
    n_evals = [0]

    def closure():
        opt.zero_grad()
        total, _, _ = loss_fn()
        total.backward()
        n_evals[0] += 1
        return total

    opt.step(closure)
    assert n_evals[0] >= 50, (
        f"torch L-BFGS did only {n_evals[0]} evals — warm-start experiment "
        "did not exercise substantial optimization"
    )
    with torch.no_grad():
        torch_h = model(torch.tensor(coords)).numpy()[:, 2]

    trainer.train()  # Adam warm phase + L-BFGS phase, same schedule
    jax_h = np.asarray(trainer.predict(trainer.data.residual_input))[:, 2]

    # Denominator: the TRUE synthetic depth range over this grid (0.16 m for
    # the 0.02-slope beach) — the physical field scale of the problem. The
    # PREDICTED range is degenerate at CI-scale training budgets (a few mm:
    # h structure emerges over tens of thousands of iterations; see
    # PARITY_LBFGS.md's flat-field discussion), which would make a
    # range-relative bound vacuous noise-vs-noise.
    from scipy.io import loadmat

    truth = loadmat(mat)["h"]
    h_range = float(np.nanmax(truth) - np.nanmin(truth))
    assert h_range > 0.1  # the scale the criterion is anchored to
    rmse = float(np.sqrt(np.mean((jax_h - torch_h) ** 2)))
    # BASELINE.md acceptance criterion at field level: within 1% of range
    assert rmse <= 0.01 * h_range, (
        f"h-field RMSE {rmse:.3e} exceeds 1% of truth range {h_range:.3e}"
    )


def test_ref_only_requires_ref_cache():
    """--ref-only without --ref-cache must be rejected at argparse time:
    otherwise a multi-hour reference run completes and is discarded with
    the mkdtemp sandbox (the loss mode recover_ref_25k.py once undid)."""
    from pinn_depthestimation_tpu import parity

    with pytest.raises(SystemExit) as ei:
        parity.main(["--iters", "5", "--ref-only", "--out", "/tmp/x.md"])
    assert ei.value.code == 2  # argparse usage error, before any work


def test_ref_cache_meta_validation(tmp_path, capsys):
    """--ref-cache composition refuses a cache produced by different
    experiment flags (the mat is regenerated from the CLI flags, so a silent
    mismatch would yield a garbage comparison); caches written before the
    meta field existed only warn."""
    import argparse

    from pinn_depthestimation_tpu import parity

    flags = dict(iters=100, lbfgs=10, tol_grad=1e-5, tol_change=1e-7,
                 hidden_layers=3, width=16, nx=16, ny=14, nan_fraction=0.05,
                 fields="plane", pipeline="newmethod", training_points=0)
    args = argparse.Namespace(**flags)
    path = str(tmp_path / "c.npz")
    np.savez(path, meta=parity._cache_meta(args))
    with np.load(path) as z:
        parity._check_cache_meta(path, z, args)  # matching: no raise

    other = argparse.Namespace(**{**flags, "ny": 261, "nan_fraction": 0.408})
    with np.load(path) as z, pytest.raises(SystemExit, match="ny.*261"):
        parity._check_cache_meta(path, z, other)

    # categorical flags are part of the descriptor too
    other = argparse.Namespace(**{**flags, "fields": "structured"})
    with np.load(path) as z, pytest.raises(SystemExit, match="fields"):
        parity._check_cache_meta(path, z, other)
    other = argparse.Namespace(**{**flags, "pipeline": "cmb"})
    with np.load(path) as z, pytest.raises(SystemExit, match="pipeline"):
        parity._check_cache_meta(path, z, other)

    # a cache written before the newest meta fields existed (shorter vector)
    # composes against default encodings (plane/newmethod) without raising
    short = str(tmp_path / "short.npz")
    np.savez(short, meta=parity._cache_meta(args)[:9], totals=np.zeros(3))
    with np.load(short) as z:
        parity._check_cache_meta(short, z, args)
    with np.load(short) as z, pytest.raises(SystemExit, match="fields"):
        parity._check_cache_meta(
            short, z, argparse.Namespace(**{**flags, "fields": "structured"}))

    legacy = str(tmp_path / "old.npz")
    np.savez(legacy, totals=np.zeros(3))
    with np.load(legacy) as z:
        parity._check_cache_meta(legacy, z, args)
    assert "no experiment metadata" in capsys.readouterr().out


@pytest.mark.skipif(
    not os.path.isdir("/root/reference"), reason="reference mount not available"
)
def test_parity_ref_only_then_compose_roundtrip(tmp_path):
    """End-to-end `parity.main` round trip at toy scale: a --ref-only run
    executes the actual torch reference and persists the cache (a path that
    must stay JAX-free — a dead TPU tunnel once crashed the old jnp-based
    conversion AFTER a 4.5 h reference run, losing it); a second invocation
    composes the framework side from that cache and writes the report."""
    from pinn_depthestimation_tpu import parity

    cache = str(tmp_path / "ref.npz")
    report = str(tmp_path / "report.md")
    flags = ["--iters", "25", "--lbfgs", "4",
             "--hidden-layers", "3", "--width", "16",
             "--nx", "12", "--ny", "10", "--nan-fraction", "0.05",
             "--ref-cache", cache]

    assert parity.main(flags + ["--ref-only", "--out", report]) == 0
    assert not os.path.exists(report)  # ref-only stops before composing
    with np.load(cache) as z:
        assert {"totals", "h", "wall", "meta"} <= set(z.files)
        assert any(k.startswith("p_") for k in z.files)
        assert len(z["totals"]) >= 25
        # params persist as raw numpy (the JAX-free contract of the
        # reference phase, parity.reference_initial_params)
        assert z["p_w_hidden"].shape == (2, 16, 16)

    assert parity.main(flags + ["--out", report]) == 0
    text = open(report).read()
    assert "reference phase loaded from cache" not in text  # stdout, not report
    assert "## Per-iteration total loss" in text
    assert "## Recovered depth field (h) at end of training" in text


def test_fw_cache_binds_to_reference_initial_weights(tmp_path, monkeypatch):
    """--fw-cache recompose must refuse a framework cache trained from
    DIFFERENT initial weights than the loaded reference phase provides
    (flags alone cannot catch a ref-cache swap at the same recipe)."""
    import numpy as np

    from pinn_depthestimation_tpu import parity

    monkeypatch.chdir(tmp_path)
    fw = str(tmp_path / "fw.npz")
    args = ["--iters", "4", "--lbfgs", "2", "--nx", "10", "--ny", "8",
            "--hidden-layers", "2", "--width", "8",
            "--out", str(tmp_path / "R.md"), "--fw-cache", fw]
    assert parity.main(args) == 0          # writes the cache + fingerprint
    z = np.load(fw)
    assert "init_fingerprint" in z.files
    assert parity.main(args) == 0          # recomposes from it

    # corrupt the fingerprint -> the pair must be refused loudly
    data = {k: z[k] for k in z.files}
    data["init_fingerprint"] = "0" * 64
    np.savez(fw, **data)
    with pytest.raises(SystemExit, match="different initial weights"):
        parity.main(args)
