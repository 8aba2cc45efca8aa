import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pinn_depthestimation_tpu.training import checkpoint as ckpt


@pytest.fixture
def state():
    return {
        "params": {"w": jnp.arange(12.0).reshape(3, 4), "b": jnp.ones(4)},
        "opt_state": {"mu": jnp.zeros((3, 4)), "count": jnp.asarray(7, jnp.int32)},
        "iteration": np.asarray(4321, np.int64),
    }


def test_msgpack_roundtrip(tmp_path, state):
    path = ckpt.save_checkpoint(str(tmp_path / "model_10"), state)
    assert path.endswith("model_10.msgpack")
    template = jax.tree.map(jnp.zeros_like, state)
    restored = ckpt.restore_checkpoint(path, template)
    for a, b in zip(jax.tree.leaves(state), jax.tree.leaves(restored)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_orbax_roundtrip(tmp_path, state):
    pytest.importorskip("orbax.checkpoint")
    path = ckpt.save_checkpoint(str(tmp_path / "model_20"), state, backend="orbax")
    assert path.endswith("model_20.orbax")
    template = jax.tree.map(jnp.zeros_like, state)
    restored = ckpt.restore_checkpoint(path, template)
    for a, b in zip(jax.tree.leaves(state), jax.tree.leaves(restored)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_latest_checkpoint(tmp_path, state):
    ckpt.save_checkpoint(str(tmp_path / "model_100"), state)
    ckpt.save_checkpoint(str(tmp_path / "model_2000"), state)
    ckpt.save_checkpoint(str(tmp_path / "model_900"), state)
    latest = ckpt.latest_checkpoint(str(tmp_path))
    assert latest.endswith("model_2000.msgpack")
    assert ckpt.latest_checkpoint(str(tmp_path / "missing")) is None


def test_atomic_write_no_tmp_left(tmp_path, state):
    ckpt.save_checkpoint(str(tmp_path / "model_1"), state)
    assert not any(f.endswith(".tmp") for f in os.listdir(tmp_path))


def test_checkpoint_cadence():
    # CMB: every 1000 (reference train.py:175)
    assert ckpt.checkpoint_due(1000, "cmb")
    assert not ckpt.checkpoint_due(1500, "cmb")
    # newmethod: every 10k until 45k, then every 1k (train_newmethod.py:181-188)
    assert ckpt.checkpoint_due(10_000, "newmethod")
    assert not ckpt.checkpoint_due(11_000, "newmethod")
    assert ckpt.checkpoint_due(40_000, "newmethod")
    assert ckpt.checkpoint_due(46_000, "newmethod")
    assert not ckpt.checkpoint_due(0, "newmethod")
