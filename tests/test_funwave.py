import os

import numpy as np
import pandas as pd
import pytest

from pinn_depthestimation_tpu.utils import funwave


@pytest.fixture
def funwave_dir(tmp_path):
    """Fabricate a FUNWAVE-TVD output directory: stations + gauges + depth."""
    rs = np.random.RandomState(0)
    n_stations, n_rows = 4, 50
    nx, ny = 10, 8
    for i in range(1, n_stations + 1):
        t = np.arange(n_rows) * 0.05
        z = rs.randn(n_rows) * 0.123456
        u = rs.randn(n_rows) * 0.654321
        v = rs.randn(n_rows) * 0.2
        arr = np.column_stack([t, z, u, v])
        np.savetxt(tmp_path / f"sta_{i:04d}", arr, fmt="%.6f")
    gauges = np.column_stack([rs.randint(1, nx + 1, n_stations),
                              rs.randint(1, ny + 1, n_stations)])
    np.savetxt(tmp_path / "gauges.txt", gauges, fmt="%d")
    depth = rs.uniform(0.5, 2.0, (ny, nx))
    np.savetxt(tmp_path / "dep.out", depth, fmt="%.4f")
    return str(tmp_path), gauges, depth


def test_prepare_station_csv(funwave_dir):
    directory, gauges, depth = funwave_dir
    out = os.path.join(directory, "out.csv")
    df = funwave.prepare_station_csv(
        directory, out, n_stations=4, row_start=10, row_stop=30, dx=2.0, dy=2.0
    )
    assert list(df.columns) == ["t", "x", "y", "h", "z", "u", "v"]
    assert len(df) == 4 * 20

    # output file: space-separated, no header (reference CSV contract)
    with open(out) as f:
        first = f.readline().split(" ")
    assert len(first) == 7
    float(first[0])

    # station 1 geometry: (idX-1)*dx, (idY-1)*dy, depth at [idY-1, idX-1]
    idx_x, idx_y = gauges[0]
    row = df.iloc[0]
    assert row["x"] == (idx_x - 1) * 2.0
    assert row["y"] == (idx_y - 1) * 2.0
    assert row["h"] == round(float(depth[idx_y - 1, idx_x - 1]), 2)

    # rounding: t to 2 decimals, fields to 3
    assert np.allclose(df["t"], df["t"].round(2))
    assert np.allclose(df["z"], df["z"].round(3))


def test_row_windowing(funwave_dir):
    directory, _, _ = funwave_dir
    out = os.path.join(directory, "win.csv")
    df = funwave.prepare_station_csv(
        directory, out, n_stations=2, row_start=5, row_stop=9
    )
    assert len(df) == 2 * 4
    # first retained t is row 5 of the series (0.05 s cadence)
    assert df.iloc[0]["t"] == pytest.approx(0.25)


def test_reference_presets(tmp_path):
    """The two preset entry points reproduce the reference prep scripts'
    exact constants (input_prep_B1d.py / input_prep_B2d.py): station count,
    row window, grid spacing, default output filename."""
    rs = np.random.RandomState(1)
    n_rows = 10_200  # > B1d's row_stop
    for i in range(1, 21):
        arr = np.column_stack([
            np.arange(n_rows) * 0.05,
            rs.randn(n_rows), rs.randn(n_rows), rs.randn(n_rows),
        ])
        np.savetxt(tmp_path / f"sta_{i:04d}", arr, fmt="%.4f")
    gauges = np.column_stack([rs.randint(1, 11, 20), rs.randint(1, 9, 20)])
    np.savetxt(tmp_path / "gauges.txt", gauges, fmt="%d")
    np.savetxt(tmp_path / "dep.out", rs.uniform(0.5, 2.0, (8, 10)), fmt="%.4f")

    df1 = funwave.prepare_beach1d(str(tmp_path))
    assert os.path.exists(tmp_path / "beach1d_2.csv")      # B1d default name
    assert len(df1) == 20 * (10_190 - 5_092)               # 20 stations, B1d window
    assert df1.iloc[0]["x"] == (gauges[0][0] - 1) * 1.0    # unit spacing

    df2 = funwave.prepare_beach2d_irr(str(tmp_path))
    assert os.path.exists(tmp_path / "beach2d_irr.csv")    # B2d default name
    assert len(df2) == 12 * (1_001 - 201)                  # 12 stations, B2d window
    assert df2.iloc[0]["x"] == (gauges[0][0] - 1) * 2.0    # 2 m spacing
