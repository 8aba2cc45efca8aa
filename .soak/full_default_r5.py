"""Round-5 final integration soak: the exact reference recipe (50k Adam +
strong-Wolfe L-BFGS under the reference's own tolerances, config_CMB_h
shape) through the SHIPPED DEFAULTS with the one-kernel training step —
same protocol as the round-2/3 final soaks (final total 4.0038e-5, wall
444-820 s), so convergence and wall-clock regressions surface.

Usage: python .soak/full_default_r5.py [--precision f32x3|bf16]
(default: the shipped auto policy -> f32)
"""

import json
import os
import sys
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
if "--precision" in sys.argv:
    base["kernel_precision"] = sys.argv[sys.argv.index("--precision") + 1]

cfg_path = os.path.join(ROOT, "full_default_r5.json")
with open(cfg_path, "w") as f:
    json.dump(base, f)
run_dir = os.path.join(ROOT, "run_full_default_r5")
os.makedirs(run_dir, exist_ok=True)
for stale in os.listdir(run_dir):
    os.remove(os.path.join(run_dir, stale))

cfg = load_config(cfg_path)
t0 = time.time()
trainer = Trainer(cfg, run_dir=run_dir, echo_every=0)
print(
    f"fused={trainer.use_fused_kernel}, "
    f"one_kernel_step={trainer.fused_step_fn is not None}, "
    f"precision={cfg.resolved_kernel_precision()}, "
    f"{trainer.batch['residual_input'].shape[0]} pts",
    flush=True,
)
trainer.train()
dt = time.time() - t0
_, fids, ress, totals = read_log(run_dir)
ckpts = sorted(
    f for f in os.listdir(run_dir) if f.startswith("model_")
)
print(
    f"RESULT wall {dt:.1f}s, {len(totals)} loss evals, "
    f"final total {totals[-1]:.6e}, min {min(totals):.6e}, "
    f"{len(ckpts)} cadence checkpoints, "
    f"snapshot={'data_at50k.mat' in os.listdir(run_dir)}",
    flush=True,
)
