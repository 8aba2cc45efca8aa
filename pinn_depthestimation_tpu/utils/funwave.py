"""FUNWAVE-TVD gauge-output ETL (capability of reference
``utilities/input_prep_B1d.py`` / ``input_prep_B2d.py``).

Builds the training CSVs the PINN pipelines consume from raw FUNWAVE-TVD
products: per-station time series ``sta_%04d`` with columns ``t, z, u, v``,
a ``gauges.txt`` of 1-based (x, y) grid indices, and a ``dep.out`` depth
grid. Output rows are ``t x y h z u v`` space-separated with no header —
byte-compatible with the reference generators so both codebases consume
identical inputs (BASELINE.md requirement).

The two reference scripts differ only in parameters: B1d uses 20 stations,
rows ``5092:10190``, ``dx = dy = 1``; B2d uses 12 stations, rows
``201:1001``, ``dx = dy = 2`` (reference ``input_prep_B1d.py:15-58``,
``input_prep_B2d.py:9-10,17-59``). One parameterized function covers both;
the module-level presets reproduce each script exactly.
"""

from __future__ import annotations

import os

import pandas as pd


def prepare_station_csv(
    directory: str,
    output_csv: str,
    *,
    n_stations: int,
    row_start: int,
    row_stop: int,
    dx: float = 1.0,
    dy: float = 1.0,
    gauges_file: str = "gauges.txt",
    depth_file: str = "dep.out",
    station_pattern: str = "sta_%04d",
) -> pd.DataFrame:
    """Assemble the ``t x y h z u v`` training CSV from FUNWAVE outputs."""
    gauges = pd.read_csv(
        os.path.join(directory, gauges_file), sep=r"\s+", header=None
    )
    depth = pd.read_csv(
        os.path.join(directory, depth_file), sep=r"\s+", header=None
    )

    frames = []
    for i in range(1, n_stations + 1):
        station_path = os.path.join(directory, station_pattern % i)
        data = pd.read_csv(
            station_path, sep=r"\s+", header=None, names=["t", "z", "u", "v"]
        )
        # rounding exactly as the reference: t to 0.01, fields to 0.001
        data["t"] = data["t"].round(2)
        for col in ("z", "u", "v"):
            data[col] = data[col].round(3)
        data = data.iloc[row_start:row_stop]

        idx_x, idx_y = (int(v) for v in gauges.iloc[i - 1, :2])
        h = round(float(depth.iloc[idx_y - 1, idx_x - 1]), 2)

        data = data.copy()
        data.insert(1, "y", (idx_y - 1) * dy)
        data.insert(1, "x", (idx_x - 1) * dx)
        data.insert(3, "h", h)
        frames.append(data)

    combined = pd.concat(frames, ignore_index=True)
    combined.to_csv(output_csv, sep=" ", index=False, header=False)
    return combined


def prepare_beach1d(directory: str, output_csv: str | None = None) -> pd.DataFrame:
    """The B1d preset: 20 stations, rows 5092:10190, unit grid spacing."""
    output_csv = output_csv or os.path.join(directory, "beach1d_2.csv")
    return prepare_station_csv(
        directory, output_csv, n_stations=20, row_start=5092, row_stop=10190,
        dx=1.0, dy=1.0,
    )


def prepare_beach2d_irr(directory: str, output_csv: str | None = None) -> pd.DataFrame:
    """The B2d preset: 12 stations, rows 201:1001, 2 m grid spacing."""
    output_csv = output_csv or os.path.join(directory, "beach2d_irr.csv")
    return prepare_station_csv(
        directory, output_csv, n_stations=12, row_start=201, row_stop=1001,
        dx=2.0, dy=2.0,
    )
