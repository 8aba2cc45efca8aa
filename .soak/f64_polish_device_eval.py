"""f64-polish backend A/B at flagship shape (VERDICT r3 item 5).

Times per-evaluation cost of the f64 polish under backend='cpu' (round-3
behavior: whole loop + evals on the host CPU backend) vs the new
backend='device_eval' (loop on CPU, each loss+grad evaluation dispatched to
the real TPU through a callback). ONE process, sequential (TPU hygiene).

Usage: python .soak/f64_polish_device_eval.py [n_evals]
"""

import os
import sys
import tempfile
import time

import numpy as np

from pinn_depthestimation_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

import jax  # noqa: E402

from pinn_depthestimation_tpu.config import parse_config  # noqa: E402
from pinn_depthestimation_tpu.training import Trainer  # noqa: E402
from pinn_depthestimation_tpu.training.logging_utils import read_log  # noqa: E402
from pinn_depthestimation_tpu.utils import synthetic  # noqa: E402

assert jax.devices()[0].platform == "tpu", "A/B needs the real chip"

N_EVALS = int(sys.argv[1]) if len(sys.argv) > 1 else 30

mat = tempfile.mktemp(suffix=".mat")
synthetic.make_newmethod_mat(mat, nx=81, ny=261, nan_fraction=0.408, seed=21)


def run(backend):
    cfg = parse_config({
        "layers": {"input_features": 2, "hidden_layers": 100,
                   "hidden_width": 20, "output_features": 3,
                   "dropout_rate": 0.0, "init_type": "xavier"},
        "adam_optimizer": {"max_it": 50, "learning_rate": 1e-4,
                           "scheduler_step_size": 10000,
                           "scheduler_gamma": 0.8},
        "lbfgs_optimizer": {"max_it": 0, "learning_rate": 1,
                            "max_evaluation": 0, "history_size": 100,
                            "tolerance_grad": 1e-5, "tolerance_change": 1e-7,
                            "line_search_fn": "strong_wolfe"},
        "loss": {"weight_fid_loss": 1, "weight_res_loss": 1},
        "data": {"file": mat,
                 "inputs": {"x": {"requires_grad": ["true"]},
                            "y": {"requires_grad": ["true"]}},
                 "trues": ["U", "V"], "unknowns": ["h"]},
        "data_test": {"x_min": 25.0, "x_max": 33.0,
                      "y_min": -13.0, "y_max": 13.0},
        "f64_polish": {"max_it": N_EVALS, "max_evaluation": N_EVALS + 5,
                       "backend": backend},
    })
    run_dir = tempfile.mkdtemp()
    tr = Trainer(cfg, run_dir=run_dir, echo_every=0,
                 lbfgs_record_capacity=40)
    tr.train_adam()  # short warm phase so the polish starts from sane params
    n0 = tr.state.iteration
    # chunked polish: the record capacity forces several host re-entries, so
    # per-chunk walls separate first-compile from steady-state
    marks = []
    orig_record = tr._record

    def _record(losses):
        marks.append((time.time(), tr.state.iteration))
        return orig_record(losses)

    tr._record = _record
    t0 = time.time()
    tr.train_f64_polish()
    wall = time.time() - t0
    n = tr.state.iteration - n0
    _, _, _, totals = read_log(run_dir)
    steady = ""
    if len(marks) >= 2:
        (t1, i1), (t2, i2) = marks[0], marks[-1]
        if i2 > i1:
            steady = f"; steady {(t2 - t1) / (i2 - i1):.2f} s/eval post-compile"
    print(f"{backend}: {n} f64 evals in {wall:.1f} s = {wall / max(n, 1):.2f} "
          f"s/eval incl. compile{steady} "
          f"(first {totals[n0]:.6e} -> last {totals[-1]:.6e})", flush=True)
    return wall / max(n, 1), totals[-1]


per_de, last_de = run("device_eval")
per_cpu, last_cpu = run("cpu")
print(f"RESULT f64 polish: device_eval {per_de:.2f} s/eval vs cpu "
      f"{per_cpu:.2f} s/eval = {per_cpu / per_de:.1f}x faster; terminal "
      f"loss rel diff {abs(last_de - last_cpu) / abs(last_cpu):.2e}",
      flush=True)
