"""Test harness configuration.

Tests run on CPU with 8 fake devices so device-mesh/sharding logic is
exercised without TPU hardware (the standard JAX testing recipe; SURVEY.md §4).

Note: the TPU-tunnel plugin in this environment force-appends itself to
``jax_platforms`` regardless of the ``JAX_PLATFORMS`` env var, so the CPU
pin must go through ``jax.config`` after import — env alone silently leaves
tests running on the real chip over the network.
"""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# PINN_TPU_TESTS=1 leaves the default (TPU) backend active so the opt-in
# hardware smoke tests (test_tpu_smoke.py) can exercise compiled kernels.
_TPU_MODE = os.environ.get("PINN_TPU_TESTS") == "1"
if not _TPU_MODE:
    jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


def pytest_sessionstart(session):
    if _TPU_MODE:
        return
    devices = jax.devices()
    assert devices[0].platform == "cpu", f"tests must run on CPU, got {devices}"
    assert len(devices) == 8, f"expected 8 fake CPU devices, got {len(devices)}"


@pytest.fixture
def rng():
    return np.random.RandomState(0)
