"""Rebuild .soak/ref_25k.npz from the crashed ref-only run's surviving sandbox.

The 2026-08-17 25k-iteration reference run (torch CPU, ~4.5 h) completed
training and wrote log.txt + model.pth, but the parity driver process then
crashed in reference_initial_params -> jnp.asarray: the axon TPU tunnel was
wedged (by an unrelated killed process) and backend init raised after a
20-minute hang — BEFORE np.savez wrote the cache. Everything the cache
needs survives on disk (tempfile.mkdtemp is not auto-deleted):

  sandbox: /tmp/tmpx8e44eez/{data.mat, ref/, log/20260817_1552/}

This script reproduces parity.py's cache fields exactly (totals from
log.txt, h via the pickled reference module on the masked mat points,
initial params from the reference's own DNN under torch.manual_seed(1234))
WITHOUT importing jax, and approximates the training wall from file mtimes
(config write -> final model.pth write; accurate to seconds on a 16,000 s
run). It refuses to write if the regenerated synthetic mat (seed 21)
differs from the sandbox's — the guarantee the cache's meta block encodes.
"""
import os
import sys

import numpy as np

SANDBOX = "/tmp/tmpx8e44eez"
RUN = os.path.join(SANDBOX, "log", "20260817_1552")
OUT = "/root/repo/.soak/ref_25k.npz"
META_FIELDS = dict(iters=25000, lbfgs=500, tol_grad=1e-5, tol_change=1e-7,
                   hidden_layers=100, width=20, nx=81, ny=261,
                   nan_fraction=0.408)

# 1. the regenerated mat must equal the sandbox's (same seed/flags)
import tempfile

from pinn_depthestimation_tpu.utils import synthetic
from scipy.io import loadmat

with tempfile.TemporaryDirectory() as td:
    regen = os.path.join(td, "data.mat")
    synthetic.make_newmethod_mat(
        regen, nx=META_FIELDS["nx"], ny=META_FIELDS["ny"],
        nan_fraction=META_FIELDS["nan_fraction"], seed=21,
    )
    a, b = loadmat(regen), loadmat(os.path.join(SANDBOX, "data.mat"))
    for k in ("x", "y", "U", "V", "h"):
        np.testing.assert_array_equal(a[k], b[k], err_msg=f"mat field {k}")
print("regenerated mat == sandbox mat (seed 21): OK")

# 2. totals from the reference's log.txt (parity.run_reference's parse)
totals = []
with open(os.path.join(RUN, "log.txt")) as f:
    next(f)
    for line in f:
        totals.append(float(line.split(", ")[3]))
print(f"totals: {len(totals)} rows, final {totals[-1]:.6e}, "
      f"min {min(totals):.6e}")

# 3. h field via the reference's own pickled module (parity.run_reference)
import torch

sys.path.insert(0, os.path.join(SANDBOX, "ref"))
model = torch.load(os.path.join(RUN, "model.pth"), weights_only=False)
model.eval()
d = loadmat(os.path.join(SANDBOX, "data.mat"))
x, y, u = d["x"], d["y"], d["U"]
mask = np.isfinite(u).ravel()
xn = 2 * (x - 25.0) / 8.0 - 1
yn = 2 * (y + 13.0) / 26.0 - 1
inp = torch.tensor(np.hstack([xn, yn])[mask], dtype=torch.float32)
with torch.no_grad():
    pred = model(inp).numpy()
h_field = pred[:, 2]
print(f"h field: {h_field.shape[0]} pts, mean {h_field.mean():.5f}, "
      f"range [{h_field.min():.5f}, {h_field.max():.5f}]")

# 4. initial params exactly as reference_initial_params builds them
import importlib

dnn_mod = importlib.import_module("dnn")
torch.manual_seed(1234)
init = dnn_mod.DNN([2] + [20] * 100 + [3], 0.0, "xavier")
linears = [m for m in init.layers if isinstance(m, torch.nn.Linear)]
params = {
    "w_in": linears[0].weight.detach().numpy().T,
    "b_in": linears[0].bias.detach().numpy(),
    "w_hidden": np.stack([l.weight.detach().numpy().T for l in linears[1:-1]]),
    "b_hidden": np.stack([l.bias.detach().numpy() for l in linears[1:-1]]),
    "w_out": linears[-1].weight.detach().numpy().T,
    "b_out": linears[-1].bias.detach().numpy(),
}
sys.path.pop(0)

# 5. wall from file mtimes (config written at subprocess launch; model.pth is
#    the reference's last write)
t0 = os.path.getmtime(os.path.join(SANDBOX, "ref", "config_CMB_h.json"))
t1 = os.path.getmtime(os.path.join(RUN, "model.pth"))
wall = t1 - t0
print(f"wall (mtime-derived): {wall:.0f} s")

meta = np.asarray([float(META_FIELDS[k]) for k in (
    "iters", "lbfgs", "tol_grad", "tol_change",
    "hidden_layers", "width", "nx", "ny", "nan_fraction")])

np.savez(OUT, totals=np.asarray(totals), h=h_field, wall=wall, meta=meta,
         **{f"p_{k}": np.asarray(v) for k, v in params.items()})
print(f"cache written: {OUT}")
