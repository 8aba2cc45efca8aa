"""Precision-staged training schedule A/B (VERDICT r4 item 5/perf).

Full-schedule bf16 reaches 122.7 s but lands in a slightly worse basin
(4.4479e-5 vs f32's 3.99872e-5 — STATUS.md round-5 soak). Hypothesis: a
STAGED schedule — cheap-precision Adam prefix, f32 Adam tail, f32 L-BFGS —
buys back most of the 2.2-3.4x wall gap while ending in the f32 basin (the
prefix only has to carry the trajectory through the large-loss region where
the basin is not yet decided).

Protocol: the exact reference recipe (50k Adam + strong-Wolfe L-BFGS under
reference tolerances, config_CMB_h shape, 20,084 pts — same workload as
.soak/full_default_r5.py). Staged arms train the prefix with
kernel_precision=<tier>, checkpoint, then RESUME the same run with
kernel_precision=f32 (the Adam moments/iteration carry over, so the LR
staircase and optimizer trajectory continue exactly; only the loss+grad
evaluation tier changes).

Usage: python .soak/staged_precision_r5.py [--prefix 35000] [--arms f32,bf16_staged,f32x3_staged]
"""
import argparse
import json
import os
import shutil
import time

import numpy as np

from pinn_depthestimation_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

from pinn_depthestimation_tpu.config import parse_config  # noqa: E402
from pinn_depthestimation_tpu.training import Trainer  # noqa: E402
from pinn_depthestimation_tpu.training.logging_utils import read_log  # noqa: E402
from pinn_depthestimation_tpu.utils import synthetic  # noqa: E402

ROOT = os.path.dirname(os.path.abspath(__file__))
DATA = os.path.join(ROOT, "data_synth.mat")
if not os.path.exists(DATA):
    synthetic.make_newmethod_mat(DATA, nx=81, ny=261, seed=0)


def base_raw():
    with open(os.path.join(ROOT, "..", "examples", "newmethod.json")) as f:
        raw = json.load(f)
    raw["adam_optimizer"]["max_it"] = 50_000
    raw["adam_optimizer"]["scheduler_step_size"] = 10_000
    raw["lbfgs_optimizer"]["max_it"] = 50_000
    raw["lbfgs_optimizer"]["max_evaluation"] = 62_500
    raw["snapshot_iteration"] = 50_000
    raw["data"]["file"] = DATA
    raw["data_test"]["file"] = DATA
    return raw


def run_arm(tag, prefix_precision=None, prefix_iters=0):
    run_dir = os.path.join(ROOT, f"run_staged_{tag}")
    shutil.rmtree(run_dir, ignore_errors=True)
    os.makedirs(run_dir)
    walls = {}
    if prefix_precision:
        raw1 = base_raw()
        raw1["kernel_precision"] = prefix_precision
        raw1["adam_optimizer"]["max_it"] = prefix_iters
        raw1["lbfgs_optimizer"]["max_it"] = 0
        raw1["lbfgs_optimizer"]["max_evaluation"] = 0
        t0 = time.time()
        tr1 = Trainer(parse_config(raw1), run_dir=run_dir, echo_every=0)
        tr1.train_adam()
        ckpt = tr1.save(f"prefix_{prefix_iters}", include_lbfgs=False)
        walls["prefix"] = time.time() - t0
        print(f"[{tag}] {prefix_precision} prefix {prefix_iters} iters: "
              f"{walls['prefix']:.1f}s, loss {read_log(run_dir)[3][-1]:.4e}",
              flush=True)
    raw2 = base_raw()
    raw2["kernel_precision"] = "f32"
    t0 = time.time()
    tr2 = Trainer(parse_config(raw2), run_dir=run_dir, echo_every=0)
    if prefix_precision:
        tr2.restore(ckpt)
        assert tr2.state.iteration == prefix_iters
    tr2.train()
    walls["f32"] = time.time() - t0
    _, _, _, totals = read_log(run_dir)
    h = np.asarray(tr2.predict(tr2.data.residual_input)[:, 2])
    wall = sum(walls.values())
    print(f"[{tag}] TOTAL {wall:.1f}s ({walls}), {len(totals)} evals, "
          f"final {totals[-1]:.6e}, min {min(totals):.6e}", flush=True)
    return {"wall": wall, "final": totals[-1], "min": min(totals), "h": h}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--prefix", type=int, default=35_000)
    ap.add_argument("--arms", default="f32,bf16_staged,f32x3_staged")
    args = ap.parse_args()

    results = {}
    for arm in args.arms.split(","):
        if arm == "f32":
            results[arm] = run_arm("f32")
        elif arm.endswith("_staged"):
            results[arm] = run_arm(arm, prefix_precision=arm.split("_")[0],
                                   prefix_iters=args.prefix)
        else:
            raise SystemExit(f"unknown arm {arm}")

    print("\n=== SUMMARY (prefix", args.prefix, "iters) ===")
    ref = results.get("f32")
    for tag, r in results.items():
        extra = ""
        if ref is not None and tag != "f32":
            rmse = float(np.sqrt(np.mean((r["h"] - ref["h"]) ** 2)))
            extra = (f", h-RMSE vs f32 {rmse:.2e} m, "
                     f"basin log10 gap {abs(np.log10(r['min'] / ref['min'])):.3f}, "
                     f"wall {r['wall'] / ref['wall']:.2f}x f32")
        print(f"{tag:14s} wall {r['wall']:7.1f}s  final {r['final']:.6e}  "
              f"min {r['min']:.6e}{extra}", flush=True)


if __name__ == "__main__":
    main()
