"""Device-mesh utilities: data-parallel sharding of collocation batches.

The reference is single-process, single-device, full-batch (reference
``train.py:25-32``; no ``torch.distributed`` anywhere — SURVEY.md §2). The
TPU-native scaling strategy is *within-step* data parallelism over points:

* parameters replicate across the mesh;
* fidelity and collocation batches shard along their leading (points) axis;
* every loss is a (masked) mean, so under ``jit`` XLA inserts the ``psum``
  reductions over ICI automatically — full-batch numerics are preserved
  exactly (each optimizer step sees the global batch, unlike minibatch DP).

Mesh axes are ``('data', 'model')``. The model axis exists for generality and
is 1 in practice: a width-20 MLP has nothing to tensor-parallelize
(documented non-goal, SURVEY.md §2). Batches that don't divide the data-axis
size are padded and masked; the physics/fidelity losses renormalize by mask.
"""

from __future__ import annotations

from typing import Any, Mapping

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    n_data: int | None = None,
    n_model: int = 1,
    *,
    devices=None,
) -> Mesh:
    """Build a ``('data', 'model')`` mesh over the visible devices.

    ``n_data=None`` uses every visible device on the data axis.
    """
    if devices is None:
        devices = jax.devices()
    if n_data is None:
        if len(devices) % n_model:
            raise ValueError(f"{len(devices)} devices not divisible by model={n_model}")
        n_data = len(devices) // n_model
    need = n_data * n_model
    if need > len(devices):
        raise ValueError(f"mesh {n_data}x{n_model} needs {need} devices, have {len(devices)}")
    grid = np.asarray(devices[:need]).reshape(n_data, n_model)
    return Mesh(grid, axis_names=("data", "model"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Rows sharded over the data axis, features replicated."""
    return NamedSharding(mesh, P("data"))


def replicate(tree: Any, mesh: Mesh):
    """Replicate a pytree (parameters, optimizer state) across the mesh."""
    sharding = NamedSharding(mesh, P())
    return jax.device_put(tree, sharding)


def pad_to_multiple(arr: np.ndarray, multiple: int) -> tuple[np.ndarray, np.ndarray]:
    """Pad the leading axis to a multiple; returns ``(padded, valid_mask)``.

    Padding repeats the first row (not zeros) so padded rows stay in-domain
    and cannot generate inf/nan that would poison masked means through
    ``0 * inf``.
    """
    n = arr.shape[0]
    if n == 0:
        raise ValueError("cannot shard an empty batch — no data rows survived loading")
    rem = (-n) % multiple
    mask = np.ones(n + rem, dtype=np.float32)
    if rem:
        pad = np.broadcast_to(arr[:1], (rem,) + arr.shape[1:])
        arr = np.concatenate([arr, pad], axis=0)
        mask[n:] = 0.0
    return arr, mask


def shard_batch(batch: Mapping[str, np.ndarray], mesh: Mesh) -> dict[str, jax.Array]:
    """Pad + mask + device_put every array in a batch dict.

    Arrays named ``*_input``/``*_true`` gain a companion ``*_mask`` entry
    (one per distinct prefix). All leading axes are sharded over ``data``.
    """
    n_data = mesh.shape["data"]
    sharding = batch_sharding(mesh)
    out: dict[str, jax.Array] = {}
    masks: dict[str, np.ndarray] = {}
    for name, arr in batch.items():
        padded, mask = pad_to_multiple(np.asarray(arr), n_data)
        out[name] = jax.device_put(padded, sharding)
        prefix = name.split("_")[0]
        masks[f"{prefix}_mask"] = mask
    for name, mask in masks.items():
        out[name] = jax.device_put(mask, sharding)
    return out
