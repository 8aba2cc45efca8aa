"""Persistent XLA compilation cache.

First-time compilation of the training programs (1000-step scanned Adam
chunks, the L-BFGS while-loop program) intermittently takes minutes through
the remote-TPU tunnel in this environment. Enabling JAX's persistent
compilation cache makes that a once-per-machine cost instead of
once-per-process. Entry points (CLI, bench, driver harness) call this early.
"""

from __future__ import annotations

import os


def enable_compilation_cache(path: str | None = None) -> None:
    import jax

    path = path or os.environ.get(
        "PINN_TPU_COMPILE_CACHE", os.path.expanduser("~/.cache/pinn_tpu_xla")
    )
    try:
        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass  # cache is an optimization, never a hard requirement
