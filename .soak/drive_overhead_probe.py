"""Deployed-drive-loop overhead probe: same process, flagship workload.

Measures, back-to-back: (a) raw _adam_chunk wall (value-fetch sync),
(b) _record() wall for a chunk's losses, (c) a full train_adam() segment via
Trainer timing. Separates real device step time from host bookkeeping so the
7.61 ms/iter (step_profile.py, possibly contended) vs ~5.0 ms/step
(shard_ab_r3.py) discrepancy gets attributed. Run ONLY with an idle host
(no concurrent torch/TPU processes — CLAUDE.md tunnel-sensitivity rule).
"""
import json, os, time
import numpy as np
import jax, jax.numpy as jnp
from pinn_depthestimation_tpu.utils.cache import enable_compilation_cache
enable_compilation_cache()
from pinn_depthestimation_tpu.config import load_config
from pinn_depthestimation_tpu.training import Trainer

SOAK = os.path.dirname(os.path.abspath(__file__))
raw = json.load(open(os.path.join(SOAK, "full_f32x3.json")))
raw.pop("fused_kernel", None); raw.pop("kernel_precision", None)
raw["adam_optimizer"]["max_it"] = 3000
raw["lbfgs_optimizer"]["max_it"] = 0
raw["snapshot_iteration"] = None
cfg_path = os.path.join(SOAK, "drive_probe.json"); json.dump(raw, open(cfg_path, "w"))
run_dir = os.path.join(SOAK, "run_drive_probe"); os.makedirs(run_dir, exist_ok=True)
cfg = load_config(cfg_path)
tr = Trainer(cfg, run_dir=run_dir, echo_every=0)
print("fused:", tr.use_fused_kernel, flush=True)

key = jax.random.PRNGKey(0)
N = 1000
# compile
p, o, losses = tr._adam_chunk(tr.state.params, tr.state.opt_state, tr.batch,
                              key, jnp.int32(0), N)
arr = np.asarray(losses)

for rep in range(3):
    t0 = time.time()
    p, o, losses = tr._adam_chunk(p, o, tr.batch, key, jnp.int32(0), N)
    arr = np.asarray(losses)
    t1 = time.time()
    tr._record(arr)
    t2 = time.time()
    print(f"rep {rep}: chunk {1e3*(t1-t0)/N:.3f} ms/iter, "
          f"_record {1e3*(t2-t1)/N:.3f} ms/iter", flush=True)

t0 = time.time()
tr.state.iteration = 0
tr.train_adam()
dt = time.time() - t0
print(f"train_adam 3000 iters (warm-compiled): {dt:.2f}s -> "
      f"{dt/3000*1e3:.3f} ms/iter", flush=True)
