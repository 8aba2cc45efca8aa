"""Warm-point L-BFGS tracking on wave_averaged physics (VERDICT r4 item 2).

The PARITY_CMB*.md full-schedule reports necessarily show a tracked L-BFGS
prefix of 0: the chaotic Adam phase (1/(rho*(eta+h)) pole, Lyapunov
amplification at the f32 noise floor — .soak/cmb_f32_conv.py) has already
forked the two warm points before L-BFGS starts. This experiment removes the
fork: train ONE warm point, then hand the identical f32 weights to

  * torch.optim.LBFGS over a torch-f32 replica of the reference's exact CMB
    closure (weighted per-output fidelity MSE + physics_equation residual in
    the reference's verbatim parity form — reference train.py:128-160,
    physics.py:91-120), and
  * the framework's on-device L-BFGS (`Trainer.train_lbfgs`), same
    tolerances/budget,

and measure per-evaluation tracking: first-eval equality, tracked prefix
(consecutive evals within 5e-3 relative), terminal basin, and h-field
agreement. This is the PARITY_LBFGS_WARM.md analog for the CMB pipeline —
the strong-Wolfe path over the pole-bearing loss validated per-evaluation
rather than only by terminal basin.

Problem: the PARITY_CMB.md "tight" recipe (2->[10]x10->6, 81x261 grid,
training_points=12, data seed 21), initial weights = the reference's own
torch-seeded init (cached in .soak/ref_50k_cmb_tight.npz).

Usage: python .soak/cmb_warm_lbfgs.py [--warm 20000] [--budget 2000]
       (TPU for the warm Adam + framework arm; torch arm is a small CPU job)
Writes PARITY_CMB_LBFGS.md and .soak/cmb_warm_point.npz.
"""
import argparse
import os
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, "/root/repo")
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pinn_depthestimation_tpu.utils.cache import enable_compilation_cache  # noqa: E402

enable_compilation_cache()

import jax  # noqa: E402
import torch  # noqa: E402

from cmb_seed_spread import RECIPE, build_problem  # noqa: E402
from pinn_depthestimation_tpu import parity  # noqa: E402
from pinn_depthestimation_tpu.config import parse_config  # noqa: E402
from pinn_depthestimation_tpu.training import Trainer  # noqa: E402
from pinn_depthestimation_tpu.training.logging_utils import read_log  # noqa: E402
from tests.oracles.torch_reference import build_torch_mlp, loss_wave_averaged  # noqa: E402

SOAK = os.path.dirname(os.path.abspath(__file__))
WARM_CACHE = os.path.join(SOAK, "cmb_warm_point.npz")
OUT = "/root/repo/PARITY_CMB_LBFGS.md"


def torch_closure_factory(model, data, weights, dtype=torch.float32):
    """The reference's loss_func (train.py:128-160), reassembled for weight
    injection: weighted per-output fidelity MSE over the 12 fidelity rows +
    physics_equation on the residual rows (verbatim parity form)."""
    fid_in = torch.tensor(data.fidelity_input, dtype=dtype)
    fid_true = torch.tensor(data.fidelity_true, dtype=dtype)
    x = torch.tensor(data.residual_input[:, 0:1], dtype=dtype, requires_grad=True)
    y = torch.tensor(data.residual_input[:, 1:2], dtype=dtype, requires_grad=True)

    def loss_fn():
        pred_f = model(fid_in)
        fid = sum(
            w * torch.mean((fid_true[:, i : i + 1] - pred_f[:, i : i + 1]) ** 2)
            for i, w in enumerate(weights)
        )
        pred_r = model(torch.cat([x, y], dim=-1))
        res = loss_wave_averaged(
            x, y, *(pred_r[:, i : i + 1] for i in range(6)), corrected=False
        )
        return fid + res, fid, res

    return loss_fn, (x, y)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--warm", type=int, default=20_000)
    ap.add_argument("--budget", type=int, default=2_000,
                    help="L-BFGS max_it; max_eval = 1.25x")
    ap.add_argument("--training-points", type=int,
                    default=RECIPE["training_points"],
                    help="fidelity observation rows (12 = the reference's "
                         "own recipe, h underdetermined — measured intrinsic "
                         "spread 7.6-10.2%% of truth scale; 500 pins h so "
                         "the field criterion is discriminating)")
    ap.add_argument("--out", default=OUT)
    ap.add_argument("--f64-polish", type=int, default=1_500,
                    help="extra arm: the same framework L-BFGS followed by "
                         "the shipped f64 polish (the product's answer to "
                         "the f32 noise-floor stall — PARITY_LBFGS_WARM.md); "
                         "0 disables")
    args = ap.parse_args()

    tp = args.training_points
    if tp != RECIPE["training_points"]:
        RECIPE["training_points"] = tp  # build_problem reads the module dict
    warm_cache = (WARM_CACHE if tp == 12
                  else WARM_CACHE.replace(".npz", f"_t{tp}.npz"))
    tmp = tempfile.mkdtemp()
    cfg_raw, mat = build_problem(tmp)
    base = np.load(os.path.join(SOAK, "ref_50k_cmb_tight.npz"))
    init = {k[2:]: base[k] for k in base.files if k.startswith("p_")}

    # ---- phase 1: ONE warm point (framework Adam from the torch-seeded init)
    if os.path.exists(warm_cache):
        z = np.load(warm_cache)
        assert int(z["warm_iters"]) == args.warm, (
            f"cached warm point has warm_iters={int(z['warm_iters'])}, "
            f"requested {args.warm}; delete {warm_cache} to regenerate")
        warm = {k[2:]: z[k] for k in z.files if k.startswith("p_")}
        print(f"warm point loaded from {warm_cache}", flush=True)
    else:
        cfg_warm_raw = {k: (dict(v) if isinstance(v, dict) else v)
                        for k, v in cfg_raw.items()}
        cfg_warm_raw["adam_optimizer"]["max_it"] = args.warm
        cfg_warm_raw["lbfgs_optimizer"]["max_it"] = 0
        cfg_warm_raw["lbfgs_optimizer"]["max_evaluation"] = 0
        cfg_warm = parse_config(cfg_warm_raw)
        run_dir = os.path.join(tmp, "warm")
        os.makedirs(run_dir)
        t0 = time.time()
        tr = Trainer(cfg_warm, run_dir=run_dir, echo_every=0,
                     initial_params=init)
        tr.train_adam()
        warm = jax.tree.map(np.asarray, tr.state.params)
        print(f"warm Adam {args.warm} iters in {time.time() - t0:.0f}s, "
              f"loss {read_log(run_dir)[3][-1]:.4e}", flush=True)
        np.savez(warm_cache, warm_iters=args.warm,
                 **{f"p_{k}": v for k, v in warm.items()})

    # ---- phase 2: torch arm (f32 replica of the reference closure)
    cfg = parse_config(cfg_raw)
    from pinn_depthestimation_tpu.data import load_cmb_training_data
    data = load_cmb_training_data(cfg)
    weights = parity._CMB_WEIGHTS

    model = build_torch_mlp(warm).float()
    loss_fn, _ = torch_closure_factory(model, data, weights)

    # conditioning at the warm point: how close does eta+h pass to the pole?
    with torch.no_grad():
        pr = model(torch.tensor(data.residual_input, dtype=torch.float32))
        eta_plus_h = (pr[:, 3] + pr[:, 0]).numpy()
    print(f"warm-point conditioning: eta+h in [{eta_plus_h.min():.4f}, "
          f"{eta_plus_h.max():.4f}] over residual rows", flush=True)

    opt = torch.optim.LBFGS(
        model.parameters(), lr=1, max_iter=args.budget,
        max_eval=round(args.budget * 1.25), history_size=100,
        tolerance_grad=1e-9, tolerance_change=1e-12,
        line_search_fn="strong_wolfe",
    )
    torch_evals = []

    def closure():
        opt.zero_grad()
        total, fid, res = loss_fn()
        total.backward()
        torch_evals.append(float(total))
        return total

    t0 = time.time()
    opt.step(closure)
    torch_wall = time.time() - t0
    with torch.no_grad():
        torch_h = model(torch.tensor(data.residual_input,
                                     dtype=torch.float32)).numpy()[:, 0]
    print(f"torch arm: {len(torch_evals)} evals in {torch_wall:.0f}s, "
          f"terminal {min(torch_evals):.6e}", flush=True)

    # ---- phase 3: framework arm (same warm weights, same budget/tolerances)
    cfg_lb_raw = {k: (dict(v) if isinstance(v, dict) else v)
                  for k, v in cfg_raw.items()}
    cfg_lb_raw["adam_optimizer"]["max_it"] = 0
    cfg_lb_raw["lbfgs_optimizer"].update(
        max_it=args.budget, max_evaluation=round(args.budget * 1.25),
        tolerance_grad=1e-9, tolerance_change=1e-12)
    cfg_lb = parse_config(cfg_lb_raw)
    run2 = os.path.join(tmp, "ours")
    os.makedirs(run2)
    t0 = time.time()
    tr2 = Trainer(cfg_lb, run_dir=run2, echo_every=0, initial_params=warm)
    tr2.train_lbfgs()
    our_wall = time.time() - t0
    _, _, _, our_evals = read_log(run2)
    our_h = np.asarray(tr2.predict(tr2.data.residual_input))[:, 0]
    print(f"framework arm: {len(our_evals)} evals in {our_wall:.0f}s, "
          f"terminal {min(our_evals):.6e}", flush=True)

    # ---- phase 3b: framework + the shipped f64 polish (same warm weights).
    # The bare-f32 arm is expected to stall above torch's terminal (the
    # measured f32 loss-noise floor, PARITY_LBFGS_WARM.md); the polish is
    # the product setting that removes the floor.
    polish = None
    if args.f64_polish:
        cfg_p_raw = {k: (dict(v) if isinstance(v, dict) else v)
                     for k, v in cfg_lb_raw.items()}
        cfg_p_raw["f64_polish"] = {"max_it": args.f64_polish}
        run3 = os.path.join(tmp, "ours_polish")
        os.makedirs(run3)
        t0 = time.time()
        tr3 = Trainer(parse_config(cfg_p_raw), run_dir=run3, echo_every=0,
                      initial_params=warm)
        tr3.train()
        polish_wall = time.time() - t0
        _, _, _, polish_evals = read_log(run3)
        polish_h = np.asarray(tr3.predict(tr3.data.residual_input))[:, 0]
        polish = dict(evals=polish_evals, h=polish_h, wall=polish_wall)
        print(f"framework+f64-polish arm: {len(polish_evals)} evals in "
              f"{polish_wall:.0f}s, terminal {min(polish_evals):.6e}",
              flush=True)

    # ---- compare
    n = min(len(torch_evals), len(our_evals))
    te, oe = np.asarray(torch_evals[:n]), np.asarray(our_evals[:n])
    rel = np.abs(oe - te) / np.maximum(np.abs(te), 1e-12)
    tracked = 0
    while tracked < n and rel[tracked] <= 5e-3:
        tracked += 1
    t_min, o_min = min(torch_evals), min(our_evals)
    gap = abs(np.log10(t_min) - np.log10(o_min))
    h_rmse = float(np.sqrt(np.mean((our_h - torch_h) ** 2)))
    from scipy.io import loadmat
    d = loadmat(mat)
    ix = cfg_raw["data_residual"]["interval_x"]
    iy = cfg_raw["data_residual"]["interval_y"]
    msk = np.isfinite(d["x"][::ix, ::iy]).ravel()
    scale = float(np.ptp(d["h"][::ix, ::iy].ravel()[msk]) + 1e-12)

    polish_section = ""
    if polish is not None:
        p_min = min(polish["evals"])
        p_gap = abs(np.log10(t_min) - np.log10(p_min))
        p_h_rmse = float(np.sqrt(np.mean((polish["h"] - torch_h) ** 2)))
        polish_section = f"""
## With the shipped f64 polish (same warm point)

The bare-f32 arm stalls at the measured f32 loss-noise floor (the
PARITY_LBFGS_WARM.md mechanism: restarts exhaust once every available
decrement is sub-noise, while torch's f32 micro-path happens to keep
finding certifiable decrements longer). The product's answer is the f64
polish phase (`--f64-polish`, default backend `device_eval`):

* terminal minimum: **{p_min:.6e}** vs torch {t_min:.6e}
  (log10 gap {p_gap:.3f}{', framework LOWER' if p_min < t_min else ''})
* evaluations: {len(polish['evals'])} (f32 phase + polish), wall {polish['wall']:.0f}s
* h-field RMSE vs torch: {p_h_rmse:.3e} m = {p_h_rmse / scale:.2%} of the
  truth depth scale (bare f32: {h_rmse / scale:.2%})
"""
    else:
        p_gap = None
        p_h_rmse = None

    report = f"""# PARITY — warm-point L-BFGS tracking on wave_averaged physics (CMB)

The full-schedule CMB reports (PARITY_CMB*.md) cannot track the L-BFGS phase
per-evaluation: the Adam phase is chaotic at the f32 noise floor (the
`1/(rho*(eta+h))` pole Lyapunov-amplifies ULP-scale differences —
`.soak/cmb_f32_conv.py`), so the two optimizers reach different warm points
before L-BFGS starts. Here the fork is removed: ONE warm point (framework
Adam, {args.warm} iterations from the reference's torch-seeded init on the
PARITY_CMB.md tight recipe) is handed as identical f32 weights to

* `torch.optim.LBFGS` over a torch-f32 replica of the reference's exact CMB
  closure (weighted per-output fidelity + `physics_equation` in its verbatim
  parity form — reference `train.py:128-160`, `physics.py:91-120`), and
* the framework's on-device L-BFGS (`Trainer.train_lbfgs`),

with identical tolerances (1e-9/1e-12) and budget ({args.budget} iterations /
{round(args.budget * 1.25)} evaluations).

## Setup

* problem: 2->[{RECIPE['width']}]x{RECIPE['hidden_layers']}->6,
  {RECIPE['nx']}x{RECIPE['ny']} grid, training_points={tp},
  data seed 21 (identical rows via the framework loader — byte-parity proven
  by `tests/test_golden_cmb.py` iteration-1 equality)
* warm-point conditioning: eta+h spans [{eta_plus_h.min():.4f},
  {eta_plus_h.max():.4f}] over the residual rows (the pole at 0 stays
  {'well clear' if eta_plus_h.min() > 0.1 or eta_plus_h.max() < -0.1 else 'CLOSE'})

## Per-evaluation tracking

* first evaluation: torch {torch_evals[0]:.6e}, framework {our_evals[0]:.6e}
  (rel {rel[0]:.2e})
* tracked prefix (consecutive evals within 5e-3 relative): **{tracked}** of {n}
* median relative diff over the shared prefix: {np.median(rel):.2e}
* evaluations executed: torch {len(torch_evals)}, framework {len(our_evals)}
* terminal minima (bare f32): torch {t_min:.6e}, framework {o_min:.6e}
  (log10 gap {gap:.3f})

## Recovered h on the shared collocation rows (bare f32)

* RMSE(framework, torch): {h_rmse:.3e} m = {h_rmse / scale:.2%} of the truth
  depth scale ({scale:.4f} m)
{polish_section}
## Criteria

* first-eval equality (<= 2e-4 rel): {'PASS' if rel[0] <= 2e-4 else 'FAIL'}
  — validates the loss/gradient/line-search entry on the pole-bearing
  physics from an exactly shared point
* tracked prefix >= 10: {'PASS' if tracked >= 10 else 'FAIL'} ({tracked})
  — validates consecutive strong-Wolfe decisions per-evaluation
* same-basin terminal, f64-polish arm (log10 gap < 0.1): {
    ('PASS' if p_gap < 0.1 else 'FAIL') if polish is not None else 'n/a'} {
    f'({p_gap:.3f})' if polish is not None else ''}
  — the terminal-accuracy product setting; the bare-f32 gap ({gap:.3f})
  is the known f32 noise-floor stall, diagnosed in PARITY_LBFGS_WARM.md
* h-field agreement <= 1% of truth scale (f64-polish arm): {
    ('PASS' if p_h_rmse / scale <= 0.01 else 'FAIL') if polish is not None else 'n/a'} {
    f'({p_h_rmse / scale:.2%})' if polish is not None else ''}{"""
  — at the reference's own 12-row recipe h is underdetermined: two
  REFERENCE runs differing only in seed disagree by 7.6-10.2% of truth
  scale (measured, .soak/cmb_seed_spread.py / PARITY_CMB.md), so matching
  losses (the 0.002 log10 gap above) do not pin the h-interior; the
  criterion is discriminating at --training-points 500
  (PARITY_CMB_LBFGS_T500.md)""" if tp <= 12 else ""}

Wall: torch CPU {torch_wall:.0f}s, framework {our_wall:.0f}s. Reproduce with
`python .soak/cmb_warm_lbfgs.py --warm {args.warm} --budget {args.budget} --training-points {tp} --f64-polish {args.f64_polish}`.
"""
    with open(args.out, "w") as f:
        f.write(report)
    print(report)


if __name__ == "__main__":
    main()
