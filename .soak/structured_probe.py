"""Validate the structured-bathymetry parity problem (VERDICT r3 weak #4):
run the EXECUTED reference (train_newmethod.py) on the new
beach_fields_structured data at a small shape and check the recovered h is
structured (predicted range >~10% of truth range) rather than near-flat.

Usage: python .soak/structured_probe.py [adam_it] [hidden] [width] [nx] [ny]
"""

import json
import os
import shutil
import subprocess
import sys
import tempfile

import numpy as np

REFERENCE = "/root/reference"
sys.path.insert(0, "/root/repo")


def main():
    adam_it = int(sys.argv[1]) if len(sys.argv) > 1 else 3000
    hidden = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    width = int(sys.argv[3]) if len(sys.argv) > 3 else 20
    nx = int(sys.argv[4]) if len(sys.argv) > 4 else 33
    ny = int(sys.argv[5]) if len(sys.argv) > 5 else 41
    lr = float(sys.argv[6]) if len(sys.argv) > 6 else 1e-3

    from pinn_depthestimation_tpu.utils import synthetic

    tmp = tempfile.mkdtemp()
    workdir = os.path.join(tmp, "ref")
    os.makedirs(workdir)
    mat = os.path.join(tmp, "data.mat")
    synthetic.make_newmethod_mat(mat, nx=nx, ny=ny, nan_fraction=0.05,
                                 seed=21, fields="structured")
    cfg = {
        "layers": {"input_features": 2, "hidden_layers": hidden,
                   "hidden_width": width, "output_features": 3,
                   "dropout_rate": 0.0, "init_type": "xavier"},
        "adam_optimizer": {"max_it": adam_it, "learning_rate": lr,
                           "scheduler_step_size": 10000, "scheduler_gamma": 0.8},
        "lbfgs_optimizer": {"max_it": 200, "learning_rate": 1,
                            "max_evaluation": 250, "history_size": 100,
                            "tolerance_grad": 1e-5, "tolerance_change": 1e-7,
                            "line_search_fn": "strong_wolfe"},
        "loss": {"weight_fid_loss": 1, "weight_res_loss": 1},
        "data": {"file": mat,
                 "inputs": {"x": {"requires_grad": ["true"]},
                            "y": {"requires_grad": ["true"]}},
                 "trues": ["U", "V"], "unknowns": ["h"]},
        "data_test": {"x_min": 25.0, "x_max": 33.0,
                      "y_min": -13.0, "y_max": 13.0},
    }
    for name in ("train_newmethod.py", "dnn.py", "physics.py", "operations.py"):
        shutil.copy(os.path.join(REFERENCE, name), os.path.join(workdir, name))
    with open(os.path.join(workdir, "config_CMB_h.json"), "w") as f:
        json.dump(cfg, f)
    env = dict(os.environ, CUDA_VISIBLE_DEVICES="")
    proc = subprocess.run([sys.executable, "train_newmethod.py"], cwd=workdir,
                          env=env, capture_output=True, text=True, timeout=7200)
    if proc.returncode != 0:
        raise RuntimeError(f"reference failed:\n{proc.stdout[-2000:]}\n{proc.stderr[-2000:]}")

    log_root = os.path.join(tmp, "log")
    run = sorted(os.listdir(log_root))[-1]
    totals = []
    with open(os.path.join(log_root, run, "log.txt")) as f:
        next(f)
        for line in f:
            totals.append(float(line.split(", ")[3]))

    import torch
    sys.path.insert(0, workdir)
    model = torch.load(os.path.join(log_root, run, "model.pth"), weights_only=False)
    model.eval()
    from scipy.io import loadmat
    d = loadmat(mat)
    x, y, u, h_true = d["x"], d["y"], d["U"], d["h"]
    mask = np.isfinite(u).ravel()
    xn = 2 * (x - 25.0) / 8.0 - 1
    yn = 2 * (y + 13.0) / 26.0 - 1
    inp = torch.tensor(np.hstack([xn, yn])[mask], dtype=torch.float32)
    with torch.no_grad():
        pred = model(inp).numpy()
    h_pred = pred[:, 2]
    ht = h_true.ravel()[mask]
    truth_range = float(np.ptp(ht))
    pred_range = float(np.ptp(h_pred))
    rmse = float(np.sqrt(np.mean((h_pred - ht) ** 2)))
    corr = float(np.corrcoef(h_pred, ht)[0, 1])
    print(f"evals {len(totals)}, first {totals[0]:.4e}, last {totals[-1]:.4e}")
    print(f"h truth range {truth_range:.4f} m; PRED range {pred_range:.4f} m "
          f"({pred_range / truth_range:.1%} of truth)")
    print(f"RMSE(pred, truth) {rmse:.4f} m ({rmse / truth_range:.1%} of truth range); corr {corr:.3f}")
    print(f"pred h in [{h_pred.min():.4f}, {h_pred.max():.4f}]; "
          f"truth in [{ht.min():.4f}, {ht.max():.4f}]")
    print("tmp:", tmp)


if __name__ == "__main__":
    main()
