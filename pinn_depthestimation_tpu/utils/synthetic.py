"""Synthetic nearshore datasets in the reference's exact file schemas.

The reference consumes private FUNWAVE-TVD products (``../data/G1a/...``,
reference ``config_CMB.json:40,47``) that are not shipped. These generators
produce physically-plausible stand-ins with identical layout so every pipeline
(training, inference, benchmarks, tests) can run end-to-end:

* newmethod ``.mat``: columns ``x, y, U, V`` of shape ``(N, 1)`` on an
  ``ny x nx`` grid with optional NaN rows (shape/keys as consumed by reference
  ``train_newmethod.py:226-250``);
* CMB fidelity CSV with columns ``x, y, h, U, V, eta_mean, Hrms, k`` (reference
  ``train.py:217``) and residual ``.mat`` with 2-D grid variables (reference
  ``train.py:258-260``).

The flow field is a divergence-free-ish longshore current over a planar beach:
``h(x) = h0 - slope * (x - x0)``, ``U = -q_y``, ``V = q_x`` for a streamfunction
``q`` — so the continuity residual ``d(hU)/dx + d(hV)/dy`` is small but
nonzero, which is what a PINN training loop wants to see.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from scipy.io import savemat


def beach_fields(x: np.ndarray, y: np.ndarray, *, h0=0.75, slope=0.02, x0=25.0):
    """Analytic depth + velocity + wave fields on arbitrary coordinates."""
    h = h0 - slope * (x - x0)
    psi = 0.05 * np.sin(0.5 * (x - x0)) * np.cos(0.3 * y)
    U = -(-0.3 * 0.05 * np.sin(0.5 * (x - x0)) * np.sin(0.3 * y))  # -dpsi/dy
    V = 0.5 * 0.05 * np.cos(0.5 * (x - x0)) * np.cos(0.3 * y)      # dpsi/dx
    eta_mean = 0.01 * np.cos(0.4 * (x - x0))
    hrms = 0.2 + 0.05 * np.tanh(0.3 * (x - x0))
    k = 1.5 + 0.2 * np.sin(0.2 * y)
    del psi
    return {"h": h, "U": U, "V": V, "eta_mean": eta_mean, "Hrms": hrms, "k": k}


def grid(nx=81, ny=261, x_min=25.0, x_max=33.0, y_min=-13.0, y_max=13.0):
    """Meshgrid in the reference test geometry (reference config_CMB.json:66-73)."""
    xs = np.linspace(x_min, x_max, nx)
    ys = np.linspace(y_min, y_max, ny)
    return np.meshgrid(xs, ys)  # shapes (ny, nx)


def make_newmethod_mat(
    path: str,
    *,
    nx=81,
    ny=261,
    nan_fraction=0.05,
    seed=0,
    x_min=25.0,
    x_max=33.0,
    y_min=-13.0,
    y_max=13.0,
) -> dict[str, np.ndarray]:
    """Write a ``data_60percent.mat``-style file: ``x, y, U, V, h`` columns."""
    rng = np.random.RandomState(seed)
    X, Y = grid(nx, ny, x_min, x_max, y_min, y_max)
    f = beach_fields(X, Y)
    cols = {
        "x": X.reshape(-1, 1),
        "y": Y.reshape(-1, 1),
        "U": f["U"].reshape(-1, 1),
        "V": f["V"].reshape(-1, 1),
        "h": f["h"].reshape(-1, 1),
    }
    n = cols["x"].shape[0]
    n_nan = int(nan_fraction * n)
    if n_nan:
        nan_rows = rng.choice(n, n_nan, replace=False)
        for key in ("U", "V"):  # NaNs live in the observed fields
            cols[key] = cols[key].copy()
            cols[key][nan_rows] = np.nan
    savemat(path, cols)
    return cols


def make_cmb_dataset(
    csv_path: str,
    mat_path: str,
    *,
    nx=81,
    ny=261,
    n_csv=400,
    seed=0,
    x_min=25.0,
    x_max=33.0,
    y_min=-13.0,
    y_max=13.0,
    nan_fraction=0.02,
):
    """Write an ``input_fid.csv`` + ``input_res.mat`` pair."""
    rng = np.random.RandomState(seed)

    xs = rng.uniform(x_min, x_max, n_csv)
    ys = rng.uniform(y_min, y_max, n_csv)
    f = beach_fields(xs, ys)
    frame = pd.DataFrame({"x": xs, "y": ys, **f})
    frame.to_csv(csv_path, index=False)

    X, Y = grid(nx, ny, x_min, x_max, y_min, y_max)
    gridded = beach_fields(X, Y)
    mat = {"x": X, "y": Y, **gridded}
    n_nan = int(nan_fraction * X.size)
    if n_nan:
        flat_rows = rng.choice(X.size, n_nan, replace=False)
        xg = mat["x"].copy().reshape(-1)
        xg[flat_rows] = np.nan
        mat["x"] = xg.reshape(X.shape)
    savemat(mat_path, mat)
    return frame, mat
