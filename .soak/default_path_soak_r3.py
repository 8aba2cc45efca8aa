"""Round-3 default-path soak: the AUTO kernel-precision policy end-to-end.

Corrected-mode (parity=false) flagship schedule with NO explicit
kernel_precision — the shipped default resolves to f32x3 — A/B'd in the same
process against an explicit-f32 run of the identical config. Certifies the
promoted default converges like f32 on the path users actually get.
"""

import json
import os
import time

from pinn_depthestimation_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

from pinn_depthestimation_tpu.config import load_config
from pinn_depthestimation_tpu.training import Trainer
from pinn_depthestimation_tpu.training.logging_utils import read_log
from pinn_depthestimation_tpu.utils import synthetic

ROOT = os.path.dirname(os.path.abspath(__file__))
DATA = os.path.join(ROOT, "data_synth.mat")
if not os.path.exists(DATA):
    synthetic.make_newmethod_mat(DATA, nx=81, ny=261, seed=0)

with open(os.path.join(ROOT, "..", "examples", "newmethod.json")) as f:
    base = json.load(f)
base["adam_optimizer"]["max_it"] = 50000
base["adam_optimizer"]["scheduler_step_size"] = 10000
base["lbfgs_optimizer"]["max_it"] = 50000
base["lbfgs_optimizer"]["max_evaluation"] = 62500
base["snapshot_iteration"] = 50000
base["data"]["file"] = DATA
base["data_test"]["file"] = DATA
base["parity"] = False          # corrected mode: the auto->f32x3 branch

for name, kprec in (("auto_default", None), ("explicit_f32", "f32")):
    raw = dict(base)
    raw.pop("kernel_precision", None)
    if kprec:
        raw["kernel_precision"] = kprec
    cfg_path = os.path.join(ROOT, f"default_soak_{name}.json")
    with open(cfg_path, "w") as f:
        json.dump(raw, f)
    run_dir = os.path.join(ROOT, f"run_default_soak_{name}")
    os.makedirs(run_dir, exist_ok=True)
    for stale in ("log.txt",):
        p = os.path.join(run_dir, stale)
        if os.path.exists(p):
            os.remove(p)
    cfg = load_config(cfg_path)
    resolved = cfg.resolved_kernel_precision()
    t0 = time.time()
    trainer = Trainer(cfg, run_dir=run_dir, echo_every=0)
    trainer.train()
    dt = time.time() - t0
    _, fids, ress, totals = read_log(run_dir)
    print(f"{name} (resolved={resolved}): wall {dt:.1f}s, {len(totals)} evals, "
          f"final total {totals[-1]:.6e}, min {min(totals):.6e}", flush=True)
