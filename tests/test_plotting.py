import os

import numpy as np
import pytest

pytest.importorskip("matplotlib")

from pinn_depthestimation_tpu import plotting  # noqa: E402


@pytest.fixture
def grids():
    x, y = np.meshgrid(np.linspace(25, 33, 20), np.linspace(-13, 13, 30))
    u = np.sin(x) * 0.1
    v = np.cos(y) * 0.1
    return x, y, u, v


@pytest.fixture
def config(tmp_path):
    return {
        "plot": {
            "font_size": 14,
            "x_limits": [25, 33],
            "y_limits": [-13, 13],
            "dir": str(tmp_path / "plots"),
        }
    }


def test_plot_quiver(grids, config):
    x, y, u, v = grids
    t = np.zeros((1, 1))
    path = plotting.plot_quiver(t, x, y, u, v, u * 1.1, v * 0.9, config)
    assert os.path.exists(path)
    # str(0.0).zfill(4) == '00.0' — the reference's exact suffix logic
    assert path.endswith("quiver_00.0sec.png")


def test_plot_cmap(grids, config):
    x, y, u, _ = grids
    path = plotting.plot_cmap(np.zeros((1, 1)), x, y, u, config, "depth", -2, 1)
    assert os.path.exists(path)
    assert "depth_" in os.path.basename(path)


def test_plot_cmap_2column(grids, config):
    x, y, u, v = grids
    path = plotting.plot_cmap_2column(np.zeros((1, 1)), x, y, u, u * 1.05, config, "eta", -1, 1)
    assert os.path.exists(path)


def test_plot_2lines(grids, config):
    x, y, u, _ = grids
    path = plotting.plot_2lines(
        np.array([1.5]), x[0], y[0], u[0], u[0] * 1.1, config, "u", -3, 3, 131
    )
    assert os.path.exists(path)
    assert "CS131" in path


def test_plot_log(tmp_path, config):
    run_dir = tmp_path / "run"
    run_dir.mkdir()
    (run_dir / "log.txt").write_text(
        "Epoch, Fidelity Loss, Residual Loss, Total Loss\n"
        + "".join(f"{i}, {1/i:.5e}, {0.5/i:.5e}, {1.5/i:.5e}\n" for i in range(1, 50))
    )
    path = plotting.plot_log(str(run_dir), str(tmp_path / "out"))
    assert os.path.exists(path)


def test_images_to_video_requires_images(tmp_path):
    with pytest.raises(ValueError, match="no .png"):
        plotting.images_to_video(str(tmp_path), str(tmp_path / "o.avi"))


def test_images_to_video(tmp_path, grids, config):
    pytest.importorskip("cv2")
    x, y, u, _ = grids
    # two frames
    for t in (0.0, 1.0):
        plotting.plot_cmap(np.array([[t]]), x, y, u * (1 + t), config, "h", -1, 1)
    out = str(tmp_path / "out.avi")
    path = plotting.images_to_video(config["plot"]["dir"], out, frame_rate=2)
    assert os.path.exists(path)
    assert os.path.getsize(path) > 1000


def test_make_result_plots_cross_section_out_of_range(grids, config):
    """A cross-section row beyond the grid (e.g. the reference's hardcoded
    131 on a smaller grid) must raise a clean ValueError, not IndexError."""
    from pinn_depthestimation_tpu.inference import InferenceResult

    x, y, u, v = grids
    result = InferenceResult(
        pred={"u": u, "v": v}, true={"u": u, "v": v}, inputs={"x": x, "y": y}
    )
    with pytest.raises(ValueError, match="out of range"):
        plotting.make_result_plots(result, config, cross_section=131)
    with pytest.raises(ValueError, match="out of range"):
        plotting.make_result_plots(result, config, cross_section=-1)
    # the default mid-row still works on the same grid
    assert plotting.make_result_plots(result, config)
