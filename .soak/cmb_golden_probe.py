"""Probe: shim-execute the reference CMB pipeline (train.py) on synthetic
data and check the framework's CMB path tracks it per-iteration.

The reference's train.py crashes as checked in on the stale 2-arg
get_min_max (SURVEY.md quirk 4); the sandbox appends a dispatching wrapper
to the copied operations.py (dict-wide behavior train.py:228 expects) —
the same dual-signature behavior the framework's ops.get_min_max ships.
"""

import json
import os
import shutil
import subprocess
import sys
import tempfile

import numpy as np

REFERENCE = "/root/reference"

SHIM = '''

# --- sandbox shim (parity harness only): serve the stale 2-arg dict-wide
# call train.py:228 makes alongside the 3-arg per-key definition above.
_get_min_max_3arg = get_min_max
def get_min_max(data, key_or_config, config=None):
    if config is None:
        out = {}
        for k in data:
            out.update(_get_min_max_3arg(data, k, key_or_config))
        return out
    return _get_min_max_3arg(data, key_or_config, config)
'''


def make_cmb_config(csv, mat, adam_it=40, lbfgs_it=8, hidden=3, width=16,
                    training_points=200, interval=2):
    outs = ["h", "U", "V", "eta_mean", "Hrms", "k"]
    return {
        "layers": {"input_features": 2, "hidden_layers": hidden,
                   "hidden_width": width, "output_features": 6,
                   "dropout_rate": 0.0, "init_type": "xavier"},
        "adam_optimizer": {"max_it": adam_it, "learning_rate": 1e-3,
                           "scheduler_step_size": 20, "scheduler_gamma": 0.8},
        "lbfgs_optimizer": {"max_it": lbfgs_it, "learning_rate": 1,
                            "max_evaluation": lbfgs_it * 3, "history_size": 10,
                            "tolerance_grad": 1e-10, "tolerance_change": 1e-13,
                            "line_search_fn": "strong_wolfe"},
        "loss": {**{f"weight_{k}_loss": w for k, w in
                    zip(outs, [1, 2, 2, 1, 0.5, 0.5])},
                 "weight_fid_loss": 1, "weight_res_loss": 1},
        "data_fidelity": {"file": csv, "inputs": ["x", "y"], "outputs": outs,
                          "training_points": training_points},
        "data_residual": {"file": mat,
                          "inputs": {"x": {"requires_grad": ["true"]},
                                     "y": {"requires_grad": ["true"]}},
                          "outputs": outs, "snapshots": [1],
                          "interval_x": interval, "interval_y": interval},
        "data_test": {"model": "unused", "file": mat,
                      "inputs": {"x": {"requires_grad": ["true"]},
                                 "y": {"requires_grad": ["true"]}},
                      "outputs": outs, "nx": 16, "ny": 14, "dx": 0.1, "dy": 0.1,
                      "x_min": 25.0, "x_max": 33.0,
                      "y_min": -13.0, "y_max": 13.0, "dt": 1.0},
        "plot": {"font_size": 14, "x_limits": [25, 33], "y_limits": [-13, 13],
                 "c_limits": [-1, 1], "eta_limits": [-1, 1], "dir": "plots"},
    }


def run_reference_cmb(tmp, cfg):
    workdir = os.path.join(tmp, "ref")
    os.makedirs(workdir, exist_ok=True)
    for name in ("train.py", "dnn.py", "physics.py", "operations.py", "plots.py"):
        shutil.copy(os.path.join(REFERENCE, name), os.path.join(workdir, name))
    with open(os.path.join(workdir, "operations.py"), "a") as f:
        f.write(SHIM)
    with open(os.path.join(workdir, "config_CMB.json"), "w") as f:
        json.dump(cfg, f)
    env = dict(os.environ, CUDA_VISIBLE_DEVICES="")
    proc = subprocess.run([sys.executable, "train.py"], cwd=workdir, env=env,
                          capture_output=True, text=True, timeout=3600)
    if proc.returncode != 0:
        raise RuntimeError(f"reference failed:\n{proc.stdout}\n{proc.stderr}")
    log_root = os.path.join(tmp, "log")
    run = sorted(os.listdir(log_root))[-1]
    fids, ress, tots = [], [], []
    with open(os.path.join(log_root, run, "log.txt")) as f:
        next(f)
        for line in f:
            _, a, b, c = line.split(", ")
            fids.append(float(a)); ress.append(float(b)); tots.append(float(c))
    return workdir, fids, ress, tots


def main():
    sys.path.insert(0, "/root/repo")
    from pinn_depthestimation_tpu.utils import synthetic

    tmp = tempfile.mkdtemp()
    csv = os.path.join(tmp, "input_fid.csv")
    mat = os.path.join(tmp, "input_res.mat")
    synthetic.make_cmb_dataset(csv, mat, nx=16, ny=14, n_csv=400, seed=7,
                               nan_fraction=0.02)
    cfg = make_cmb_config(csv, mat)
    workdir, fids, ress, tots = run_reference_cmb(tmp, cfg)
    print(f"reference ran: {len(tots)} evals, first {tots[0]:.6e}, "
          f"last {tots[-1]:.6e}")

    # framework with identical torch-seeded weights
    import torch
    sys.path.insert(0, workdir)
    import importlib
    dnn_mod = importlib.import_module("dnn")
    importlib.reload(dnn_mod)
    torch.manual_seed(1234)
    model = dnn_mod.DNN([2] + [16] * 3 + [6], 0.0, "xavier")
    sys.path.pop(0)
    linears = [m for m in model.layers if isinstance(m, torch.nn.Linear)]
    params = {
        "w_in": linears[0].weight.detach().numpy().T.copy(),
        "b_in": linears[0].bias.detach().numpy().copy(),
        "w_hidden": np.stack([l.weight.detach().numpy().T for l in linears[1:-1]]),
        "b_hidden": np.stack([l.bias.detach().numpy() for l in linears[1:-1]]),
        "w_out": linears[-1].weight.detach().numpy().T.copy(),
        "b_out": linears[-1].bias.detach().numpy().copy(),
    }

    import jax
    jax.config.update("jax_platforms", "cpu")
    from pinn_depthestimation_tpu.config import parse_config
    from pinn_depthestimation_tpu.training import Trainer
    from pinn_depthestimation_tpu.training.logging_utils import read_log

    config = parse_config(cfg)
    run_dir = os.path.join(tmp, "ours")
    os.makedirs(run_dir)
    tr = Trainer(config, run_dir=run_dir, echo_every=0, initial_params=params)
    tr.train()
    _, ofids, oress, otots = read_log(run_dir)
    print(f"framework ran: {len(otots)} evals, first {otots[0]:.6e}, "
          f"last {otots[-1]:.6e}")

    n = min(len(tots), len(otots), 40)
    rt, ot = np.asarray(tots[:n]), np.asarray(otots[:n])
    rel = np.abs(ot - rt) / np.maximum(np.abs(rt), 1e-12)
    print(f"adam-phase rel diff: first {rel[0]:.2e}, median {np.median(rel):.2e}, "
          f"max {np.max(rel):.2e}")
    rf = np.abs(np.asarray(ofids[:n]) - np.asarray(fids[:n])) / np.maximum(np.abs(fids[:n]), 1e-12)
    rr = np.abs(np.asarray(oress[:n]) - np.asarray(ress[:n])) / np.maximum(np.abs(ress[:n]), 1e-12)
    print(f"fid rel: median {np.median(rf):.2e}; res rel: median {np.median(rr):.2e}")
    print("tmp:", tmp)


if __name__ == "__main__":
    main()
