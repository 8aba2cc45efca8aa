"""Decisive deployed-vs-raw Adam attribution (round 3, idle-host re-run).

Round-3 anomaly: the deployed drive loop measured 7.61 ms/iter
(step_profile.py, drive_overhead_probe.py) while the raw A/B step measured
~5.0-5.1 ms (shard_ab_r3.py) — but the two used DIFFERENT synthetic mats:

* step_profile/drive_overhead_probe: data_synth.mat, nan_fraction 0.05
  -> ~20,084 fidelity points (residual 21,141)
* shard_ab_r3: data_warm_f64.mat, nan_fraction 0.408 -> ~12,516 fidelity
  points == the flagship config_CMB_h workload (residual 21,141)

and the drive-probe run was also host-contended (nice-19 torch resident;
CLAUDE.md tunnel-contention rule). This script separates the two factors in
ONE process on an IDLE host:

  [a] raw _adam_chunk ms/iter on data_warm_f64 (flagship fidelity count)
  [b] raw _adam_chunk ms/iter on data_synth   (20k fidelity count)
  [c] deployed train_adam() ms/iter on data_warm_f64 (records + checkpoints)

If [b] ~ 7.6 and [a] ~ 5.1, the "overhead" was a workload difference; if
[c] ~ [a], the drive loop itself is free (as drive_overhead_probe's
_record timing already suggested).
"""
import json, os, time
import numpy as np
import jax, jax.numpy as jnp
from pinn_depthestimation_tpu.utils.cache import enable_compilation_cache
enable_compilation_cache()
from pinn_depthestimation_tpu.config import parse_config
from pinn_depthestimation_tpu.parity import make_config
from pinn_depthestimation_tpu.training import Trainer

SOAK = os.path.dirname(os.path.abspath(__file__))


def raw_chunk_rate(mat, label, n=500, reps=3):
    raw = make_config(mat, 1000, 0, hidden_layers=100, hidden_width=20)
    raw["fused_kernel"] = "on"   # kernel_precision auto -> true f32
    cfg = parse_config(raw)
    run_dir = os.path.join(SOAK, f"run_probe2_{label}")
    os.makedirs(run_dir, exist_ok=True)
    tr = Trainer(cfg, run_dir=run_dir, echo_every=0)
    key = jax.random.PRNGKey(0)
    p, o, losses = tr._adam_chunk(tr.state.params, tr.state.opt_state,
                                  tr.batch, key, jnp.int32(0), n)
    _ = np.asarray(losses)  # value fetch = sync through the tunnel
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        p, o, losses = tr._adam_chunk(p, o, tr.batch, key, jnp.int32(0), n)
        _ = np.asarray(losses)
        ts.append((time.perf_counter() - t0) / n)
    med = sorted(ts)[reps // 2]
    nf = tr.data.fidelity_input.shape[0]
    nr = tr.data.residual_input.shape[0]
    print(f"[{label}] fidelity {nf} pts, residual {nr} pts: "
          f"{med * 1e3:.3f} ms/iter raw chunk (reps {[f'{t*1e3:.3f}' for t in ts]})",
          flush=True)
    return tr, med


def deployed_rate(tr, iters=2000):
    tr.state.iteration = 0
    t0 = time.perf_counter()
    tr.train_adam()
    dt = time.perf_counter() - t0
    print(f"[deployed] train_adam {iters} iters: {dt:.2f}s -> "
          f"{dt / iters * 1e3:.3f} ms/iter", flush=True)


tr_flag, _ = raw_chunk_rate(os.path.join(SOAK, "data_warm_f64.mat"), "flagship")
raw_chunk_rate(os.path.join(SOAK, "data_synth.mat"), "nan05")

# deployed loop on the flagship workload (fresh trainer, 2000-iter budget)
raw = make_config(os.path.join(SOAK, "data_warm_f64.mat"), 2000, 0,
                  hidden_layers=100, hidden_width=20)
raw["fused_kernel"] = "on"
cfg = parse_config(raw)
run_dir = os.path.join(SOAK, "run_probe2_deployed")
os.makedirs(run_dir, exist_ok=True)
tr = Trainer(cfg, run_dir=run_dir, echo_every=0)
# warm the chunk compile outside the timed region (train_adam reuses it:
# same static length for the 1000-iter chunks)
p, o, losses = tr._adam_chunk(tr.state.params, tr.state.opt_state, tr.batch,
                              jax.random.PRNGKey(0), jnp.int32(0), 1000)
_ = np.asarray(losses)
deployed_rate(tr, 2000)
