"""Structured-parity recipe pilot (VERDICT r4 item 3) — framework-only, TPU.

PARITY_STRUCTURED_50K.md judged the structured problem at an unconverged
2.8e-3 plateau and the bare f32-vs-f32 field criterion missed at 1.28%.
Before spending hours of 1-core torch CPU on a re-run, this pilot answers on
the fast side (TPU, minutes) for a CANDIDATE recipe:

  1. DRAIN: does the plateau drain (tight L-BFGS tolerances) and does the
     recovered structure rise well above the round-4 46-49%?
  2. FORK BOUND: the same recipe run twice from the same init, one arm
     kicked by +1e-7 on one weight — the terminal h-field spread bounds what
     ANY f32-vs-f32 comparison (torch-vs-framework included) can achieve at
     this state. If the bound is > 1%, the ≤1% criterion cannot pass at this
     recipe regardless of implementation quality, and the honest deliverable
     is the measured fork-noise attribution.

Round-5 pilot findings (81x87 grid, tight L-BFGS tol 1e-9/1e-12 budget 2500):
  * baseline recipe (weight_res=1, nan 0.408): L-BFGS exits after ~50 evals
    having moved the loss 2.8426e-3 -> 2.8415e-3 (the f32 noise-floor stall,
    PARITY_LBFGS_WARM.md) — the plateau does NOT drain; structure stays
    48-51%; FORK BOUND 3.29% >> 1%. Tolerance tightening alone cannot
    produce a bare f32-vs-f32 pass; the round-4 1.28% gap was BELOW the
    problem's own fork noise.

Usage: python .soak/structured_pilot_r5.py [--ny 87] [--adam 50000]
         [--lbfgs 2000] [--weight-res 1] [--nan-fraction 0.408] [--tag name]
Writes .soak/structured_pilot_<tag>_{base,kick}.npz and prints the verdict.
"""
import argparse
import os
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, "/root/repo")

from pinn_depthestimation_tpu.utils.cache import enable_compilation_cache  # noqa: E402

enable_compilation_cache()

import jax  # noqa: E402

from pinn_depthestimation_tpu import parity  # noqa: E402
from pinn_depthestimation_tpu.config import parse_config  # noqa: E402
from pinn_depthestimation_tpu.models.mlp import MLPSpec, init_mlp_params  # noqa: E402
from pinn_depthestimation_tpu.training import Trainer  # noqa: E402
from pinn_depthestimation_tpu.training.logging_utils import read_log  # noqa: E402
from pinn_depthestimation_tpu.utils import synthetic  # noqa: E402

SOAK = os.path.dirname(os.path.abspath(__file__))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--nx", type=int, default=81)
    ap.add_argument("--ny", type=int, default=87)
    ap.add_argument("--adam", type=int, default=50_000)
    ap.add_argument("--lbfgs", type=int, default=2_000)
    ap.add_argument("--weight-res", type=float, default=1.0)
    ap.add_argument("--nan-fraction", type=float, default=0.408)
    ap.add_argument("--tag", default="")
    args = ap.parse_args()
    tag = args.tag or f"w{args.weight_res:g}_ny{args.ny}"

    tmp = tempfile.mkdtemp()
    mat = os.path.join(tmp, "data.mat")
    synthetic.make_newmethod_mat(mat, nx=args.nx, ny=args.ny,
                                 nan_fraction=args.nan_fraction,
                                 seed=21, fields="structured")
    cfg_raw = parity.make_config(mat, args.adam, args.lbfgs,
                                 tol_grad=1e-9, tol_change=1e-12,
                                 hidden_layers=100, hidden_width=20,
                                 weight_res=args.weight_res)
    cfg = parse_config(cfg_raw)
    spec = MLPSpec.from_layers(cfg.layers)
    params0 = init_mlp_params(jax.random.PRNGKey(cfg.seed), spec)

    from scipy.io import loadmat
    d = loadmat(mat)
    mask = np.isfinite(d["U"]).ravel()
    h_truth = d["h"].ravel()[mask]
    truth_scale = float(np.ptp(h_truth))
    print(f"[{tag}] grid {args.nx}x{args.ny}, observed {int(mask.sum())} pts, "
          f"truth h range {truth_scale:.4f} m, weight_res {args.weight_res:g}",
          flush=True)

    results = {}
    for arm in ("base", "kick"):
        params = jax.tree.map(lambda x: x, params0)
        if arm == "kick":
            w = np.asarray(params["w_in"]).copy()
            w[0, 0] += 1e-7
            params = dict(params, w_in=w)
        run_dir = os.path.join(tmp, arm)
        os.makedirs(run_dir)
        t0 = time.time()
        tr = Trainer(cfg, run_dir=run_dir, echo_every=0, initial_params=params)
        tr.train()
        wall = time.time() - t0
        _, _, _, totals = read_log(run_dir)
        h = np.asarray(tr.predict(tr.data.residual_input)[:, 2])
        np.savez(os.path.join(SOAK, f"structured_pilot_{tag}_{arm}.npz"),
                 totals=np.asarray(totals), h=h, wall=wall)
        lb = totals[args.adam:]
        results[arm] = (totals, h, wall)
        print(f"[{tag}/{arm}] wall {wall:.0f}s, evals {len(totals)} "
              f"(L-BFGS {len(lb)}), adam-end {totals[args.adam - 1]:.4e}, "
              f"final {min(totals):.4e}, "
              f"structure {np.ptp(h) / truth_scale:.1%}, "
              f"h-RMSE vs truth {np.sqrt(np.mean((h - h_truth) ** 2)) / truth_scale:.2%}",
              flush=True)

    hb, hk = results["base"][1], results["kick"][1]
    rmse = float(np.sqrt(np.mean((hb - hk) ** 2)))
    print(f"\n[{tag}] FORK BOUND (1e-7 kick, full schedule): h RMSE "
          f"{rmse:.4e} m = {rmse / truth_scale:.2%} of truth scale "
          f"(criterion needs <= 1%)", flush=True)
    print(f"[{tag}] terminal losses: base {min(results['base'][0]):.6e}, "
          f"kick {min(results['kick'][0]):.6e}", flush=True)


if __name__ == "__main__":
    main()
