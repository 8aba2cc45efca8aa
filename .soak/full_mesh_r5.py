"""Round-5 sharded-path full-schedule soak: the exact reference recipe
(50k Adam + strong-Wolfe L-BFGS under reference tolerances, config_CMB_h
shape) through the SHARDED ONE-KERNEL training step on a 1-chip TPU mesh,
A/B'd against the plain-path run of the identical config
(.soak/full_default_r5.py wrote run_full_default_r5/log.txt) — upgrades
the 500-iteration mesh-vs-plain trajectory check (.soak/shard_ab_r5.py)
to the full 50k schedule. Mirrors the round-2 shard-path stability soak
(<=9.9e-6 rel, same final loss).

Usage: python .soak/full_mesh_r5.py
"""

import json
import os
import time

import numpy as np

from pinn_depthestimation_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

import jax  # noqa: E402

from pinn_depthestimation_tpu.config import load_config  # noqa: E402
from pinn_depthestimation_tpu.parallel import make_mesh  # noqa: E402
from pinn_depthestimation_tpu.training import Trainer  # noqa: E402
from pinn_depthestimation_tpu.training.logging_utils import read_log  # noqa: E402
from pinn_depthestimation_tpu.utils import synthetic  # noqa: E402

assert jax.devices()[0].platform == "tpu", "this soak needs the real chip"

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

cfg_path = os.path.join(ROOT, "full_mesh_r5.json")
with open(cfg_path, "w") as f:
    json.dump(base, f)
run_dir = os.path.join(ROOT, "run_full_mesh_r5")
os.makedirs(run_dir, exist_ok=True)
for stale in os.listdir(run_dir):
    os.remove(os.path.join(run_dir, stale))

cfg = load_config(cfg_path)
mesh = make_mesh(1, devices=jax.devices()[:1])
t0 = time.time()
trainer = Trainer(cfg, run_dir=run_dir, echo_every=0, mesh=mesh)
print(
    f"fused={trainer.use_fused_kernel}, "
    f"one_kernel_step={trainer.fused_step_fn is not None}, "
    f"mesh={dict(mesh.shape)}, "
    f"{trainer.batch['residual_input'].shape[0]} pts",
    flush=True,
)
trainer.train()
dt = time.time() - t0
_, fids, ress, totals = read_log(run_dir)
print(
    f"RESULT mesh wall {dt:.1f}s, {len(totals)} loss evals, "
    f"final total {totals[-1]:.6e}, min {min(totals):.6e}",
    flush=True,
)

plain_dir = os.path.join(ROOT, "run_full_default_r5")
if os.path.exists(os.path.join(plain_dir, "log.txt")):
    _, _, _, plain_totals = read_log(plain_dir)
    n = min(len(totals), len(plain_totals))
    a = np.asarray(totals[:n])
    b = np.asarray(plain_totals[:n])
    rel = np.abs(a - b) / np.maximum(np.abs(b), 1e-300)
    print(
        f"RESULT mesh vs plain over {n} evals: median rel "
        f"{np.median(rel):.3e}, max rel {np.max(rel):.3e}, "
        f"final {a[-1]:.6e} vs {b[-1]:.6e}",
        flush=True,
    )
else:
    print("plain run log missing — run .soak/full_default_r5.py first",
          flush=True)
