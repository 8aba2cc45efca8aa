import numpy as np
import pytest

from pinn_depthestimation_tpu import ops


def test_normalize_roundtrip():
    data = np.linspace(-3.0, 7.0, 11)
    lo, hi = -3.0, 7.0
    n = ops.normalize(data, lo, hi)
    assert n.min() == pytest.approx(-1.0)
    assert n.max() == pytest.approx(1.0)
    back = ops.denormalize(n, lo, hi)
    np.testing.assert_allclose(back, data, rtol=1e-12)


def test_normalize_degenerate_range_returns_zeros():
    # reference operations.py:5-6
    data = np.full(5, 3.3)
    out = ops.normalize(data, 3.3, 3.3)
    np.testing.assert_array_equal(out, np.zeros(5))
    out = ops.denormalize(data, 3.3, 3.3)
    np.testing.assert_array_equal(out, np.zeros(5))


def test_get_min_max_per_key_config_override():
    # 3-arg form: x/y bounds come from config.data_test (reference operations.py:19-24)
    config = {"data_test": {"x_min": 25.0, "x_max": 33.0, "y_min": -13.0, "y_max": 13.0}}
    data = {"x": np.array([1.0, 2.0]), "y": np.array([0.0, 9.0]), "U": np.array([0.5, np.nan, -2.0])}
    assert ops.get_min_max(data, "x", config) == {"x": (25.0, 33.0)}
    assert ops.get_min_max(data, "y", config) == {"y": (-13.0, 13.0)}
    # other keys: nan-aware data min/max (reference operations.py:26-28)
    assert ops.get_min_max(data, "U", config) == {"U": (-2.0, 0.5)}


def test_get_min_max_dict_wide():
    # 2-arg form used by the CMB pipeline (reference train.py:228)
    config = {"data_test": {"x_min": 25.0, "x_max": 33.0, "y_min": -13.0, "y_max": 13.0}}
    data = {"x": np.array([1.0, 2.0]), "y": np.array([0.0, 9.0]), "k": np.array([1.0, 4.0])}
    mm = ops.get_min_max(data, config)
    assert mm == {"x": (25.0, 33.0), "y": (-13.0, 13.0), "k": (1.0, 4.0)}


def test_get_min_max_no_override_without_data_test():
    data = {"x": np.array([1.0, 2.0])}
    assert ops.get_min_max(data, {}) == {"x": (1.0, 2.0)}


def test_normalize_works_on_jax_arrays():
    import jax.numpy as jnp

    data = jnp.array([0.0, 5.0, 10.0])
    out = ops.normalize(data, 0.0, 10.0)
    np.testing.assert_allclose(np.asarray(out), [-1.0, 0.0, 1.0])
