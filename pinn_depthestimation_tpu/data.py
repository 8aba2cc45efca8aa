"""Host-side data ingestion matching the reference pipelines byte-for-byte.

CSV and ``.mat`` loading stays on the host (pandas / scipy.io exactly as the
reference uses them, ``train.py:217``, ``train.py:258``); arrays cross to the
TPU once, as a single device_put of the assembled full batch — versus the
reference's per-iteration ``loss.item()`` host sync (``train.py:170``).

Three loaders:

* :func:`load_cmb_training_data` — CSV fidelity set (round(3), normalize with
  dict-wide min/max, random subsample of ``training_points`` rows; reference
  ``train.py:216-240``) plus ``.mat`` residual/collocation grid (per-variable
  load, ``[::interval_x, ::interval_y]`` stride, normalization with the
  *fidelity* bounds, Fortran-order flatten, NaN-row mask; reference
  ``train.py:246-277``).
* :func:`load_newmethod_training_data` — single ``.mat`` supplying inputs
  (normalized per-key with config x/y bounds) and true fields (raw), with the
  NaN mask of the trues applied to both (reference
  ``train_newmethod.py:226-255``).
* :func:`load_test_data` — full-grid inputs normalized dict-wide and flattened
  C-order (reference ``test.py:156-183``; note the train-time residual flatten
  is Fortran-order while the test flatten is C-order — both reproduced).
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field

import numpy as np
import pandas as pd
from scipy.io import loadmat

from pinn_depthestimation_tpu import ops
from pinn_depthestimation_tpu.config import Config


@dataclass
class TrainingData:
    """Assembled full-batch training arrays (host NumPy, float32)."""

    fidelity_input: np.ndarray          # (Nf, d_in) normalized
    fidelity_true: np.ndarray           # (Nf, n_true_outputs)
    residual_input: np.ndarray          # (Nr, d_in) normalized
    input_min_max: dict[str, tuple[float, float]] = field(default_factory=dict)
    # Loader-asserted contract: the fidelity rows ARE the residual rows (the
    # newmethod pipeline slices one forward for both, reference
    # train_newmethod.py:126-156). Only when this flag is True may the loss
    # reuse the residual forward for the fidelity term — never inferred from
    # shape equality, which a custom TrainingData could satisfy by accident.
    fidelity_is_residual: bool = False


def _fortran_column(arr: np.ndarray) -> np.ndarray:
    """reshape(-1, shape[1]) -> transpose -> reshape(-1, 1), exactly as the
    reference flattens residual grids (reference ``train.py:265-267``)."""
    tmp = arr.reshape(-1, arr.shape[1])
    tmp = np.transpose(tmp)
    return tmp.reshape(-1, 1)


def load_mat_var(path: str, key: str) -> np.ndarray:
    data = loadmat(path, variable_names=key)
    if key not in data:
        raise KeyError(f"{path!r} has no variable {key!r}")
    return data[key]


def load_cmb_training_data(config: Config, rng: np.random.RandomState | None = None) -> TrainingData:
    fd = config.data_fidelity
    rd = config.data_residual
    assert fd is not None and rd is not None, "CMB loader needs data_fidelity/data_residual"
    if rng is None:
        rng = np.random.RandomState(config.seed)

    # --- fidelity: CSV -> round(3) -> column dicts (reference train.py:216-225)
    frame = pd.read_csv(fd.file)
    frame = frame.round(3)
    fidelity_input = {k: frame[k].to_numpy() for k in frame.columns if k in fd.inputs}
    fidelity_true = {k: frame[k].to_numpy() for k in frame.columns if k in fd.outputs}

    # dict-wide min/max with the x/y config override (reference train.py:228)
    input_min_max = ops.get_min_max(fidelity_input, config.raw)
    for key in fidelity_input:
        lo, hi = input_min_max[key]
        fidelity_input[key] = ops.normalize(fidelity_input[key], lo, hi)

    fid_in = np.column_stack([fidelity_input[k] for k in fd.inputs])
    fid_true = np.column_stack([fidelity_true[k] for k in fd.outputs])

    # random subsample of training_points rows (reference train.py:237-240).
    # 0/absent means "use all rows" (matching the legacy loader's semantics;
    # the raw reference call would silently produce an EMPTY fidelity set),
    # and a request >= the row count keeps all rows instead of raising.
    if fd.training_points and fd.training_points < fid_in.shape[0]:
        idx = rng.choice(fid_in.shape[0], fd.training_points, replace=False)
        fid_in, fid_true = fid_in[idx, :], fid_true[idx, :]

    # --- residual: per-variable .mat -> stride -> normalize with fidelity
    # bounds -> Fortran-order column -> hstack (reference train.py:257-273)
    columns = []
    for key in rd.inputs:
        arr = load_mat_var(rd.file, key)
        arr = arr[:: rd.interval_x, :: rd.interval_y]
        lo, hi = input_min_max[key]
        arr = ops.normalize(arr, lo, hi)
        columns.append(_fortran_column(arr))
    residual_input = columns[0] if len(columns) == 1 else np.hstack(columns)

    # NaN-row mask (reference train.py:276-277)
    mask = np.isnan(residual_input).any(axis=1)
    residual_input = residual_input[~mask]

    return TrainingData(
        fidelity_input=np.asarray(fid_in, dtype=np.float32),
        fidelity_true=np.asarray(fid_true, dtype=np.float32),
        residual_input=np.asarray(residual_input, dtype=np.float32),
        input_min_max=dict(input_min_max),
    )


def load_newmethod_training_data(config: Config) -> TrainingData:
    dc = config.data
    assert dc is not None, "newmethod loader needs a 'data' section"

    input_min_max: dict[str, tuple[float, float]] = {}
    input_cols = []
    for key in dc.inputs:
        arr = load_mat_var(dc.file, key)
        # per-key 3-arg min/max with config x/y override
        # (reference train_newmethod.py:231-232)
        mm = ops.get_min_max({key: arr}, key, config.raw)
        lo, hi = mm[key]
        input_min_max[key] = (lo, hi)
        input_cols.append(ops.normalize(arr, lo, hi))
    data_input = input_cols[0] if len(input_cols) == 1 else np.hstack(input_cols)

    # trues are used raw — never normalized (reference train_newmethod.py:241-250)
    true_cols = [load_mat_var(dc.file, key) for key in dc.trues]
    data_true = true_cols[0] if len(true_cols) == 1 else np.hstack(true_cols)

    # NaN mask from the trues, applied to both (reference train_newmethod.py:252-255)
    mask = np.isnan(data_true).any(axis=1)
    data_input = data_input[~mask]
    data_true = data_true[~mask]

    # The newmethod pipeline has no separate collocation set: residual loss is
    # evaluated on the same (masked) inputs (reference train_newmethod.py:156).
    return TrainingData(
        fidelity_input=np.asarray(data_input, dtype=np.float32),
        fidelity_true=np.asarray(data_true, dtype=np.float32),
        residual_input=np.asarray(data_input, dtype=np.float32),
        input_min_max=input_min_max,
        fidelity_is_residual=True,
    )


def _read_legacy_fidelity_csv(path: str) -> pd.DataFrame:
    """Read the legacy FUNWAVE-extracted fidelity CSV.

    The reference's prep script writes it space-separated with NO header in
    the fixed column order ``t x y h z u v`` (reference
    ``utilities/input_prep_B2d.py:4,59``), while ``train.py:217`` reads it as
    if it had one — part of why the legacy configs cannot run upstream
    (SURVEY.md §5 quirk 5). Here: a header row is used when present,
    otherwise the prep script's column order is assumed.
    """
    with open(path) as f:
        first = f.readline()

    def _is_number(tok: str) -> bool:
        try:
            float(tok)  # accepts 1.5e-3, nan, inf (dry-gauge rows print 'nan')
            return True
        except ValueError:
            return False

    tokens = first.replace(",", " ").split()
    has_header = not all(_is_number(t) for t in tokens)
    if has_header:
        return pd.read_csv(path, sep=None, engine="python")
    # Whitespace-delimited headerless files (the prep script's format, incl.
    # hand/Fortran-padded column alignment with runs of spaces) need
    # sep=r"\s+" — the sniffer would pick a single space and invent empty
    # columns. Only fall back to sniffing when the row contains commas.
    if "," in first:
        frame = pd.read_csv(path, sep=None, engine="python", header=None)
    else:
        frame = pd.read_csv(path, sep=r"\s+", header=None)
    legacy_cols = ["t", "x", "y", "h", "z", "u", "v"]
    if frame.shape[1] != len(legacy_cols):
        raise ValueError(
            f"{path!r}: headerless legacy fidelity CSV must have the "
            f"{len(legacy_cols)} columns {legacy_cols} "
            f"(input_prep_B2d.py order), got {frame.shape[1]}"
        )
    frame.columns = legacy_cols
    return frame


def _read_funwave_grid(path: str, nx: int, ny: int) -> np.ndarray:
    """One whitespace-ASCII FUNWAVE grid file -> (ny, nx) float array
    (the ``dep.out`` layout read by reference ``input_prep_B2d.py:41-44``)."""
    arr = np.loadtxt(path, dtype=np.float64)
    arr = np.atleast_2d(arr)
    if arr.shape != (ny, nx):
        raise ValueError(
            f"{path!r}: expected a ({ny}, {nx}) grid, got {arr.shape}"
        )
    return arr


def load_legacy_training_data(
    config: Config, rng: np.random.RandomState | None = None
) -> TrainingData:
    """The legacy ``numerical_model`` pipeline (reference ``config.json:38-69``):
    fidelity from the FUNWAVE-extracted CSV, residual collocation points from
    a directory of time-indexed snapshot grids.

    The reference's own ``train.py`` cannot run this schema (it expects
    ``data_fidelity.file`` and a ``.mat`` residual; the legacy configs are
    stale upstream — SURVEY.md §5 quirk 5), so this loader reconstructs the
    *described* capability:

    * coordinate channels ``t``/``X``/``Y`` are synthesized from the
      ``numerical_model`` grid block (``t = dt * snapshot_index``);
    * field channels (stems like ``eta``/``u``/``v``) load
      ``<dir>/<stem>_<snap:05d>`` (FUNWAVE-TVD ASCII snapshot naming);
      a stem that names an existing file (``dep.out``) loads once and tiles
      across snapshots;
    * grids subsample ``[::interval_y, ::interval_x]`` (x strides columns —
      the dimensionally consistent reading of the reference's lost slicing);
    * inputs normalize with the FIDELITY min/max when the key exists there
      (reference ``train.py:263``), else their own range;
    * per-snapshot Fortran-column flattening and NaN-row masking follow the
      CMB residual conventions (reference ``train.py:265-277``).
    """
    fd, rd, nm = config.data_fidelity, config.data_residual, config.numerical_model
    assert fd is not None and rd is not None and nm is not None
    if not rd.snapshots:
        raise ValueError(
            "legacy numerical_model pipeline needs data_residual."
            "numerical_model_snapshots"
        )
    if rng is None:
        rng = np.random.RandomState(config.seed)

    # --- fidelity: legacy CSV (round(3) like reference train.py:218)
    frame = _read_legacy_fidelity_csv(fd.file).round(3)
    missing = [k for k in (*fd.inputs, *fd.outputs) if k not in frame.columns]
    if missing:
        raise KeyError(f"{fd.file!r} is missing fidelity columns {missing}")
    # Drop non-finite rows FIRST: FUNWAVE gauge files carry 'nan' rows for
    # dry gauges (anticipated by the CSV sniffer above). Done before the
    # min/max so one dry gauge can neither poison the normalization bounds
    # nor make the fidelity MSE (and every gradient) NaN from iteration 1.
    # (Our defined semantics: the reference cannot run this pipeline at all,
    # SURVEY §5 quirk 5; mirrors the residual-grid NaN mask.)
    used_cols = list(dict.fromkeys((*fd.inputs, *fd.outputs)))
    finite = np.isfinite(
        np.column_stack([frame[k].to_numpy(np.float64) for k in used_cols])
    ).all(axis=1)
    frame = frame[finite]
    if not frame.shape[0]:
        raise ValueError(
            f"{fd.file!r}: every fidelity row has a non-finite value in "
            f"{used_cols} — nothing to train on"
        )
    fidelity_input = {k: frame[k].to_numpy(np.float64) for k in fd.inputs}
    fidelity_true = {k: frame[k].to_numpy(np.float64) for k in fd.outputs}
    input_min_max = ops.get_min_max(fidelity_input, config.raw)
    for key in fidelity_input:
        lo, hi = input_min_max[key]
        fidelity_input[key] = ops.normalize(fidelity_input[key], lo, hi)
    fid_in = np.column_stack([fidelity_input[k] for k in fd.inputs])
    fid_true = np.column_stack([fidelity_true[k] for k in fd.outputs])
    if fd.training_points and fd.training_points < fid_in.shape[0]:
        idx = rng.choice(fid_in.shape[0], fd.training_points, replace=False)
        fid_in, fid_true = fid_in[idx, :], fid_true[idx, :]

    # --- residual: snapshot-grid channels
    ix, iy = nm.interval_x, nm.interval_y
    xs = nm.x_min + nm.dx * np.arange(nm.nx)
    ys = nm.y_min + nm.dy * np.arange(nm.ny)
    X, Y = np.meshgrid(xs, ys)                      # (ny, nx)
    X, Y = X[::iy, ::ix], Y[::iy, ::ix]
    pts_per_snap = X.size
    snaps = list(rd.snapshots)
    if nm.number_of_files is not None:
        bad = [s for s in snaps if not (0 <= s < nm.number_of_files)]
        if bad:
            raise ValueError(
                f"snapshots {bad} outside numerical_model.number_of_files="
                f"{nm.number_of_files}"
            )

    def channel(stem: str) -> np.ndarray:
        """(n_snaps * pts, 1) Fortran-flattened stacked channel."""
        low = stem.lower()
        if low == "t":
            t_vals = np.asarray([nm.dt * s for s in snaps], np.float64)
            return np.repeat(t_vals, pts_per_snap).reshape(-1, 1)
        if low == "x":
            return np.concatenate([_fortran_column(X)] * len(snaps))
        if low == "y":
            return np.concatenate([_fortran_column(Y)] * len(snaps))
        static_path = os.path.join(nm.dir, stem)
        if os.path.exists(static_path):
            g = _read_funwave_grid(static_path, nm.nx, nm.ny)[::iy, ::ix]
            return np.concatenate([_fortran_column(g)] * len(snaps))
        cols = []
        for s in snaps:
            snap_path = os.path.join(nm.dir, f"{stem}_{s:05d}")
            if not os.path.exists(snap_path):
                raise FileNotFoundError(
                    f"snapshot file {snap_path!r} not found (stem {stem!r}, "
                    f"snapshot {s}; expected FUNWAVE '<stem>_NNNNN' naming "
                    f"or a static file named {stem!r})"
                )
            cols.append(
                _fortran_column(_read_funwave_grid(snap_path, nm.nx, nm.ny)[::iy, ::ix])
            )
        return np.concatenate(cols)

    columns = []
    for key, stem in zip(rd.inputs, rd.input_files):
        col = channel(stem)
        if key in input_min_max:
            lo, hi = input_min_max[key]          # reference train.py:263
        else:
            mm = ops.get_min_max({key: col}, config.raw)
            lo, hi = mm[key]
        columns.append(ops.normalize(col, lo, hi))
        input_min_max.setdefault(key, (lo, hi))
    residual_input = np.hstack(columns)
    mask = np.isnan(residual_input).any(axis=1)
    residual_input = residual_input[~mask]

    return TrainingData(
        fidelity_input=np.asarray(fid_in, dtype=np.float32),
        fidelity_true=np.asarray(fid_true, dtype=np.float32),
        residual_input=np.asarray(residual_input, dtype=np.float32),
        input_min_max={k: (float(lo), float(hi)) for k, (lo, hi) in input_min_max.items()},
    )


def load_training_data(config: Config, rng: np.random.RandomState | None = None) -> TrainingData:
    if config.kind == "newmethod":
        return load_newmethod_training_data(config)
    if (
        config.numerical_model is not None
        and config.data_residual is not None
        and config.data_residual.snapshots
        and not config.data_residual.file
    ):
        return load_legacy_training_data(config, rng)
    return load_cmb_training_data(config, rng)


@dataclass
class TestData:
    inputs: np.ndarray                               # (N, d_in) normalized, C-order flatten
    trues: dict[str, np.ndarray]                     # raw grids by output name
    input_min_max: dict[str, tuple[float, float]]


def load_test_data(config: Config) -> TestData:
    td = config.data_test
    assert td is not None and td.file, "config needs a data_test section with a file"

    raw_inputs = {key: load_mat_var(td.file, key) for key in td.inputs}
    # dict-wide min/max (reference test.py:161); the newmethod test script uses
    # the per-key form (test_newmethod.py:100) — identical bounds either way.
    input_min_max = ops.get_min_max(raw_inputs, config.raw)
    cols = []
    for key in td.inputs:
        lo, hi = input_min_max[key]
        normalized = ops.normalize(raw_inputs[key], lo, hi)
        cols.append(normalized.reshape(-1, 1))  # C-order (reference test.py:178)
    inputs = cols[0] if len(cols) == 1 else np.hstack(cols)

    trues = {key: load_mat_var(td.file, key) for key in td.outputs}
    return TestData(
        inputs=np.asarray(inputs, dtype=np.float32),
        trues=trues,
        input_min_max=dict(input_min_max),
    )
