"""Host-side visualization (capability parity with reference ``plots.py``).

Same five plot products, same filenames, same consumption contract (reads the
``log.txt`` schema written by the trainer):

* :func:`plot_quiver`         — exact-vs-predicted current overlay, every
  10th grid point (reference ``plots.py:5-34``)
* :func:`plot_cmap`           — single pcolor field map (``:38-66``)
* :func:`plot_cmap_2column`   — true/pred side-by-side maps (``:69-107``)
* :func:`plot_2lines`         — 1-D cross-shore exact-vs-pred profile
  (``:110-139``)
* :func:`plot_log`            — loss curves from ``log.txt``, log-scale y
  (``:142-176``)

matplotlib is imported lazily so headless/TPU-only installs don't pay for it.
All functions take device-agnostic NumPy arrays — call ``jax.device_get``
upstream.
"""

from __future__ import annotations

import os

import numpy as np


def _plt():
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    return plt


def _plot_dir(config) -> str:
    raw = config.raw if hasattr(config, "raw") else config
    folder = raw.get("plot", {}).get("dir", ".")
    os.makedirs(folder, exist_ok=True)
    return folder


def _limits(config):
    raw = config.raw if hasattr(config, "raw") else config
    p = raw.get("plot", {})
    return (
        p.get("font_size", 14),
        p.get("x_limits"),
        p.get("y_limits"),
    )


def _timestamp_suffix(t) -> str:
    t = np.asarray(t)
    while t.ndim > 0:
        t = t[0]
    return str(t).zfill(4)


def plot_quiver(t, x, y, u_true, v_true, u_pred, v_pred, config, *, stride=10, scale=25):
    plt = _plt()
    font_size, x_limits, y_limits = _limits(config)
    s = slice(None, None, stride)
    fig, ax = plt.subplots(figsize=(6, 6))
    ax.quiver(x[s, s], y[s, s], u_true[s, s], v_true[s, s], color="black", alpha=0.5, scale=scale)
    ax.quiver(x[s, s], y[s, s], u_pred[s, s], v_pred[s, s], color="red", alpha=0.5, scale=scale)
    ax.set_xlabel("X (m)", fontsize=font_size)
    ax.set_ylabel("Y (m)", fontsize=font_size)
    if x_limits:
        ax.set_xlim(x_limits)
    if y_limits:
        ax.set_ylim(y_limits)
    path = os.path.join(_plot_dir(config), f"quiver_{_timestamp_suffix(t)}sec.png")
    plt.savefig(path, dpi=300)
    plt.tight_layout()
    plt.close(fig)
    return path


def plot_cmap(t, x, y, field, config, var_name, v_min, v_max):
    plt = _plt()
    font_size, x_limits, y_limits = _limits(config)
    fig, ax = plt.subplots(figsize=(6, 6))
    pc = ax.pcolor(x, y, field, shading="auto", vmin=v_min, vmax=v_max)
    cbar = fig.colorbar(pc, ax=ax)
    cbar.set_label(f"{var_name} (m)")
    ax.set_xlabel("X (m)", fontsize=font_size)
    ax.set_ylabel("Y (m)", fontsize=font_size)
    if x_limits:
        ax.set_xlim(x_limits)
    if y_limits:
        ax.set_ylim(y_limits)
    path = os.path.join(_plot_dir(config), f"{var_name}_{_timestamp_suffix(t)}sec.png")
    plt.savefig(path, dpi=300)
    plt.tight_layout()
    plt.close(fig)
    return path


def plot_cmap_2column(t, x, y, field_true, field_pred, config, var_name, v_min, v_max):
    plt = _plt()
    font_size, x_limits, y_limits = _limits(config)
    fig, axs = plt.subplots(1, 2, figsize=(12, 6))
    for ax, field, label_cbar in ((axs[0], field_true, False), (axs[1], field_pred, True)):
        pc = ax.pcolor(x, y, field, shading="auto")
        cbar = fig.colorbar(pc, ax=ax)
        if label_cbar:
            cbar.set_label(f"{var_name} (m)")
        ax.set_xlabel("X (m)", fontsize=font_size)
        if x_limits:
            ax.set_xlim(x_limits)
        if y_limits:
            ax.set_ylim(y_limits)
    axs[0].set_ylabel("Y (m)", fontsize=font_size)
    path = os.path.join(_plot_dir(config), f"{var_name}_{_timestamp_suffix(t)}sec.png")
    plt.savefig(path, dpi=300, bbox_inches="tight")
    plt.close(fig)
    return path


def plot_2lines(t, x, y, line_true, line_pred, config, var_name, v_min, v_max, cross_section):
    plt = _plt()
    _, x_limits, _ = _limits(config)
    t0 = np.asarray(t).reshape(-1)[0]
    plt.figure(figsize=(10, 6))
    plt.plot(x, line_true, label="exact")
    plt.plot(x, line_pred, label="Predicted")
    plt.xlabel("Cross-Shore (m)")
    plt.ylabel(f"{var_name}, m")
    if x_limits:
        plt.xlim([x_limits[0], x_limits[1]])
    plt.ylim([v_min, v_max])
    plt.title(f"{var_name}")
    plt.legend()
    suffix = f"{t0:.3f}"
    path = os.path.join(
        _plot_dir(config), f"{var_name}_CS{cross_section}_{suffix}sec.png"
    )
    plt.savefig(path, dpi=300, bbox_inches="tight")
    plt.close()
    return path


def plot_log(log_path, plot_path, *, x_max=50_000, y_limits=(0.001, 10)):
    from pinn_depthestimation_tpu.training.logging_utils import read_log

    plt = _plt()
    iterations, fid, res, total = read_log(log_path)
    plt.figure(figsize=(10, 6))
    plt.plot(iterations, fid, label="Fidelity Loss")
    plt.plot(iterations, res, label="Residual Loss")
    plt.plot(iterations, total, label="Total Loss")
    plt.xlabel("Iteration")
    plt.ylabel("Loss")
    plt.xlim([0, x_max])
    plt.ylim(list(y_limits))
    plt.title("Loss Values Over Iterations")
    plt.yscale("log")
    plt.legend()
    os.makedirs(plot_path, exist_ok=True)
    path = os.path.join(plot_path, "log.png")
    plt.savefig(path, dpi=300, bbox_inches="tight")
    plt.close()
    return path


def make_result_plots(result, config, *, cross_section: int | None = None) -> list:
    """Wire an :class:`~pinn_depthestimation_tpu.inference.InferenceResult`
    into the reference's plot products.

    The reference ships this wiring commented out (reference
    ``test.py:110-130``): quiver of exact-vs-predicted currents, pcolor map
    of predicted depth, true/pred two-column map, and cross-shore 1-D
    exact-vs-pred profiles at a fixed row (the reference hardcodes CS=131;
    here it defaults to the mid row). Which products fire is data-driven:
    each needs its variables present in both ``result.pred`` and
    ``result.true`` (the quiver/profiles) or in ``result.pred`` alone (the
    depth map). Returns the list of written paths.
    """
    paths: list = []
    x, y = result.inputs.get("x"), result.inputs.get("y")
    if x is None or y is None or np.ndim(x) != 2:
        raise ValueError(
            "plotting needs 2-D x/y input grids — set nx/ny in data_test"
        )
    t = result.inputs.get("t")
    if t is None or np.ndim(t) != 2:
        t = np.zeros_like(x)

    def grid(arr):
        arr = np.asarray(arr, np.float64)
        if arr.shape == x.shape:
            return arr
        if arr.size == x.size:
            return arr.reshape(x.shape)
        return None

    def paired(key):
        if key in result.pred and key in result.true:
            tr, pr = grid(result.true[key]), grid(result.pred[key])
            if tr is not None and pr is not None:
                return tr, pr
        return None

    # exact vs predicted currents (reference test.py:111)
    for ukey, vkey in (("U", "V"), ("u", "v")):
        uu, vv = paired(ukey), paired(vkey)
        if uu and vv:
            paths.append(
                plot_quiver(t, x, y, uu[0], vv[0], uu[1], vv[1], config)
            )
            break

    # predicted water depth map (reference test.py:114)
    if "h" in result.pred:
        h_pred = grid(result.pred["h"])
        if h_pred is not None:
            paths.append(plot_cmap(t, x, y, h_pred, config, "depth", -2, 1))

    # true-vs-pred eta comparison map (reference test.py:117)
    for key in ("eta_mean", "eta", "z"):
        pair = paired(key)
        if pair:
            paths.append(
                plot_cmap_2column(t, x, y, pair[0], pair[1], config, "eta", -1, 1)
            )
            break

    # cross-shore 1-D profiles (reference test.py:120-130; CS=131 there)
    cs = cross_section if cross_section is not None else x.shape[0] // 2
    if not 0 <= cs < x.shape[0]:
        raise ValueError(
            f"cross_section row {cs} out of range for the data_test grid "
            f"(ny={x.shape[0]} rows; the reference's hardcoded 131 only fits "
            f"grids with ny > 131)"
        )
    profile_specs = (
        ("z", "eta", 1.0, (-0.5, 1.5)),
        ("u", "u", 1.0, (-3, 3)),
        ("v", "v", 1.0, (-3, 3)),
        ("h", "depth", -1.0, (-1, 0)),  # depth plotted negative-down
    )
    for key, var_name, sign, (v_min, v_max) in profile_specs:
        pair = paired(key)
        if pair:
            paths.append(
                plot_2lines(
                    t[cs, :], x[cs, :], y[cs, :],
                    sign * pair[0][cs, :], sign * pair[1][cs, :],
                    config, var_name, v_min, v_max, cs,
                )
            )
    return paths


def images_to_video(image_folder: str, output_path: str, *, frame_rate: int = 5) -> str:
    """PNG sequence -> XVID AVI (capability of ``utilities/imgtovid.py``).

    Uses OpenCV when available, else falls back to a clear error.
    """
    import glob

    files = sorted(glob.glob(os.path.join(image_folder, "*.png")))
    if not files:
        raise ValueError(f"no .png images found in {image_folder!r}")
    try:
        import cv2
    except ImportError as e:  # pragma: no cover - cv2 optional
        raise RuntimeError("images_to_video requires opencv-python") from e

    frame = cv2.imread(files[0])
    height, width, _ = frame.shape
    writer = cv2.VideoWriter(
        output_path, cv2.VideoWriter_fourcc(*"XVID"), frame_rate, (width, height)
    )
    for name in files:
        writer.write(cv2.imread(name))
    writer.release()
    return output_path
