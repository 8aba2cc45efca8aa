"""Full 50k reference recipe through the SHIPPED precision_schedule option
(single Trainer run, bf16 prefix 35k -> f32 tail + L-BFGS) — the product
form of the .soak/staged_precision_r5.py two-phase measurement."""
import json, os, shutil, time
import numpy as np
from pinn_depthestimation_tpu.utils.cache import enable_compilation_cache
enable_compilation_cache()
from pinn_depthestimation_tpu.config import parse_config
from pinn_depthestimation_tpu.training import Trainer
from pinn_depthestimation_tpu.training.logging_utils import read_log
from pinn_depthestimation_tpu.utils import synthetic

ROOT = os.path.dirname(os.path.abspath(__file__))
DATA = os.path.join(ROOT, "data_synth.mat")
if not os.path.exists(DATA):
    synthetic.make_newmethod_mat(DATA, nx=81, ny=261, seed=0)
raw = json.load(open(os.path.join(ROOT, "..", "examples", "newmethod.json")))
raw["adam_optimizer"]["max_it"] = 50_000
raw["adam_optimizer"]["scheduler_step_size"] = 10_000
raw["lbfgs_optimizer"]["max_it"] = 50_000
raw["lbfgs_optimizer"]["max_evaluation"] = 62_500
raw["snapshot_iteration"] = 50_000
raw["data"]["file"] = DATA
raw["data_test"]["file"] = DATA
raw["precision_schedule"] = {"prefix_precision": "bf16", "prefix_iters": 35_000}
run_dir = os.path.join(ROOT, "run_staged_product")
shutil.rmtree(run_dir, ignore_errors=True); os.makedirs(run_dir)
t0 = time.time()
tr = Trainer(parse_config(raw), run_dir=run_dir, echo_every=0)
assert tr._adam_chunk_prefix is not None and tr.use_fused_kernel
tr.train()
wall = time.time() - t0
_, _, _, totals = read_log(run_dir)
print(f"staged-product: wall {wall:.1f}s, {len(totals)} evals, "
      f"final {totals[-1]:.6e}, min {min(totals):.6e}")
