"""Checkpointing: params + optimizer state, with an actual resume path.

The reference pickles the whole ``nn.Module`` every 1000 iterations
(``model_<iter>.pth``, reference ``train.py:175-179``) and never saves
optimizer state — L-BFGS history is lost on restart, and there is no resume
code at all (SURVEY.md §5). This module keeps the ``model_<iter>`` naming and
cadence but checkpoints the full training state as a pytree:

* default backend: flax msgpack serialization (single ``.msgpack`` file,
  deterministic, dependency-free restore);
* optional backend: orbax ``StandardCheckpointer`` for async multi-host runs
  (``backend='orbax'``).

A checkpoint restores bit-identically: parameters, Adam optimizer state and
the iteration/eval counters. Adam-phase resumes continue exactly. Checkpoints
cut during the L-BFGS phase additionally carry the full ``LBFGSState`` (flat
iterate, s/y ring buffers, rho, head/num, step/direction, counters), so a
mid-L-BFGS resume continues the exact trajectory instead of warm-restarting
with rebuilt history.
"""

from __future__ import annotations

import os
import re
from typing import Any

import jax
import numpy as np


def _to_numpy_tree(tree: Any):
    return jax.tree.map(lambda x: np.asarray(x), tree)


def save_checkpoint(path: str, state: Any, backend: str = "msgpack") -> str:
    """Serialize a pytree training state. ``path`` excludes the extension."""
    if backend == "msgpack":
        from flax import serialization

        blob = serialization.to_bytes(_to_numpy_tree(state))
        full = path + ".msgpack"
        tmp = full + ".tmp"
        with open(tmp, "wb") as f:
            f.write(blob)
        os.replace(tmp, full)  # atomic: no torn checkpoints on crash
        return full
    if backend == "orbax":
        import orbax.checkpoint as ocp

        ckptr = ocp.StandardCheckpointer()
        full = os.path.abspath(path + ".orbax")
        ckptr.save(full, _to_numpy_tree(state), force=True)
        ckptr.wait_until_finished()
        return full
    raise ValueError(f"unknown checkpoint backend {backend!r}")


def restore_checkpoint(path: str, target: Any, backend: str | None = None) -> Any:
    """Restore into the structure of ``target`` (a template pytree)."""
    if backend is None:
        backend = "orbax" if path.endswith(".orbax") else "msgpack"
    if backend == "msgpack":
        from flax import serialization

        with open(path, "rb") as f:
            return serialization.from_bytes(target, f.read())
    if backend == "orbax":
        import orbax.checkpoint as ocp

        ckptr = ocp.StandardCheckpointer()
        return ckptr.restore(os.path.abspath(path), _to_numpy_tree(target))
    raise ValueError(f"unknown checkpoint backend {backend!r}")


def load_raw(path: str, backend: str | None = None) -> Any:
    """Deserialize a checkpoint into raw nested containers (no template).

    Lets callers restore structure-dependent sections selectively (e.g. the
    optional ``lbfgs`` state written by mid-L-BFGS-phase checkpoints) instead
    of requiring an exact-template match for the whole file.
    """
    if backend is None:
        backend = "orbax" if path.endswith(".orbax") else "msgpack"
    if backend == "msgpack":
        from flax import serialization

        with open(path, "rb") as f:
            return serialization.msgpack_restore(f.read())
    if backend == "orbax":
        import orbax.checkpoint as ocp

        return ocp.StandardCheckpointer().restore(os.path.abspath(path))
    raise ValueError(f"unknown checkpoint backend {backend!r}")


def restore_params(path: str, params_template: Any, backend: str | None = None) -> Any:
    """Restore just the model parameters from a checkpoint that is either a
    full training state (``{'params', 'opt_state', 'iteration'}``) or a
    bare-params tree.

    Unlike a try-full-then-retry-bare fallback, this inspects the serialized
    structure, so a corrupt/truncated file surfaces as ONE deserialization
    error instead of a misleading second-attempt failure (and a structurally
    wrong checkpoint can never silently restore through the wrong branch).
    """
    if backend is None:
        backend = "orbax" if path.endswith(".orbax") else "msgpack"
    if backend == "msgpack":
        from flax import serialization

        with open(path, "rb") as f:
            raw = serialization.msgpack_restore(f.read())
        tree = raw["params"] if isinstance(raw, dict) and "params" in raw else raw
        return serialization.from_state_dict(params_template, tree)
    if backend == "orbax":
        import orbax.checkpoint as ocp

        ckptr = ocp.StandardCheckpointer()
        raw = ckptr.restore(os.path.abspath(path))
        tree = raw["params"] if isinstance(raw, dict) and "params" in raw else raw
        return jax.tree.map(
            lambda t, r: np.asarray(r, dtype=np.asarray(t).dtype),
            params_template,
            tree,
        )
    raise ValueError(f"unknown checkpoint backend {backend!r}")


def restore_params_any(path: str, params_template: Any, spec=None) -> Any:
    """Restore bare model parameters from ANY supported weights file: the
    framework's msgpack/orbax checkpoints (full training-state or
    bare-params, via :func:`restore_params`) or a reference torch
    ``.pth``/``.pt`` (whole pickled ``dnn.DNN`` module or state_dict, via
    ``utils.torch_interop``). The single dispatch point shared by
    ``Predictor`` and ``pinn-tpu train --init-from`` so the two surfaces
    cannot drift."""
    if path.endswith((".pth", ".pt")):
        from pinn_depthestimation_tpu.utils.torch_interop import (
            params_from_torch_file,
        )

        return params_from_torch_file(path, spec=spec)
    return restore_params(path, params_template)


def latest_checkpoint(run_dir: str, prefix: str = "model_") -> str | None:
    """Find the highest-iteration ``model_<iter>.msgpack`` in a run dir."""
    best, best_it = None, -1
    pat = re.compile(re.escape(prefix) + r"(\d+)\.(msgpack|orbax)$")
    if not os.path.isdir(run_dir):
        return None
    for name in os.listdir(run_dir):
        m = pat.match(name)
        if m and int(m.group(1)) > best_it:
            best_it = int(m.group(1))
            best = os.path.join(run_dir, name)
    return best


def checkpoint_due(iteration: int, kind: str) -> bool:
    """Reference checkpoint cadence.

    CMB: every 1000 iterations (reference ``train.py:175``). newmethod:
    every 10000 until 45000, then every 1000 (reference
    ``train_newmethod.py:181-188``).
    """
    if iteration <= 0:
        return False
    if kind == "newmethod":
        if iteration <= 45_000:
            return iteration % 10_000 == 0
        return iteration % 1000 == 0
    return iteration % 1000 == 0


def checkpoint_points(start: int, end: int, kind: str) -> list[int]:
    """All cadence points in ``(start, end]``, in order.

    One record block can cross several cadence points (L-BFGS chunks of
    ~1000+ evaluations under the CMB every-1000 cadence); the trainer writes
    one ``model_<point>`` per crossed point so the reference's naming
    contract stays tight (each file holds the block-end state — mid-block
    iterates are not materialized on host by design).
    """
    return [i for i in range(start + 1, end + 1) if checkpoint_due(i, kind)]
