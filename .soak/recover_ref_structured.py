"""Rebuild .soak/ref_50k_structured.npz from the ref-only run's sandbox.

The 2026-08-19 structured-fields 50k reference run was launched from a
work-in-progress parity.py whose in-memory ``_CACHE_META_FIELDS`` already
listed ``pipeline`` while ``main()`` did not yet define ``--pipeline`` —
so its cache write crashes in ``_cache_meta`` (AttributeError) AFTER the
multi-hour torch training completes. Everything the cache needs survives
in the mkdtemp sandbox (same failure mode recover_ref_25k.py undid):

  sandbox: /tmp/tmplks1yddp/{data.mat, ref/, log/<run>/}

This script reproduces parity.py's cache fields exactly (totals from
log.txt, h via the pickled reference module on the masked mat points,
initial params from the reference's own DNN under torch.manual_seed(1234))
WITHOUT importing jax, and approximates the training wall from file mtimes.
It refuses to write if the regenerated synthetic mat (seed 21, structured
fields) differs from the sandbox's — the guarantee the cache's meta block
encodes. Meta uses the CURRENT parity._cache_meta so the compose phase
validates cleanly.
"""
import os
import sys
import tempfile
from types import SimpleNamespace

import numpy as np
from scipy.io import loadmat

from pinn_depthestimation_tpu import parity
from pinn_depthestimation_tpu.utils import synthetic

SANDBOX = sys.argv[1] if len(sys.argv) > 1 else "/tmp/tmplks1yddp"
OUT = "/root/repo/.soak/ref_50k_structured.npz"
ARGS = SimpleNamespace(iters=50000, lbfgs=500, tol_grad=1e-5, tol_change=1e-7,
                       hidden_layers=100, width=20, nx=81, ny=261,
                       nan_fraction=0.408, fields="structured",
                       pipeline="newmethod")

log_root = os.path.join(SANDBOX, "log")
RUN = os.path.join(log_root, sorted(os.listdir(log_root))[-1])

# 1. the regenerated mat must equal the sandbox's (same seed/flags)
with tempfile.TemporaryDirectory() as td:
    regen = os.path.join(td, "data.mat")
    synthetic.make_newmethod_mat(
        regen, nx=ARGS.nx, ny=ARGS.ny, nan_fraction=ARGS.nan_fraction,
        seed=21, fields=ARGS.fields,
    )
    a, b = loadmat(regen), loadmat(os.path.join(SANDBOX, "data.mat"))
    for k in ("x", "y", "U", "V", "h"):
        np.testing.assert_array_equal(a[k], b[k], err_msg=f"mat field {k}")
print("regenerated mat == sandbox mat (seed 21, structured): OK")

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
init = dnn_mod.DNN([2] + [ARGS.width] * ARGS.hidden_layers + [3], 0.0, "xavier")
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

np.savez(OUT, totals=np.asarray(totals), h=h_field, wall=wall,
         meta=parity._cache_meta(ARGS),
         **{f"p_{k}": np.asarray(v) for k, v in params.items()})
print(f"cache written: {OUT}")
