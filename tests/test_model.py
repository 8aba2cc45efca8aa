import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from pinn_depthestimation_tpu.models import (
    MLPSpec,
    init_mlp_params,
    mlp_apply,
    mlp_apply_with_tangents,
    num_params,
)
from tests.oracles.torch_reference import build_torch_mlp


def _spec(sizes=(2, 8, 8, 8, 3), init_type="xavier", dropout=0.0):
    return MLPSpec(sizes=tuple(sizes), init_type=init_type, dropout_rate=dropout)


def test_param_shapes_and_count():
    spec = _spec((2, 20, 20, 20, 3))
    params = init_mlp_params(jax.random.PRNGKey(0), spec)
    assert params["w_in"].shape == (2, 20)
    assert params["w_hidden"].shape == (2, 20, 20)
    assert params["w_out"].shape == (20, 3)
    # torch count for the same architecture: sum((in+1)*out per Linear)
    expected = (2 + 1) * 20 + 2 * (20 + 1) * 20 + (20 + 1) * 3
    assert num_params(params) == expected


def test_bias_init_zero_except_final():
    # reference dnn.py:33,51-52: zero_bias on all layers but the last
    spec = _spec((2, 16, 16, 16, 4))
    params = init_mlp_params(jax.random.PRNGKey(1), spec)
    assert np.all(np.asarray(params["b_in"]) == 0.0)
    assert np.all(np.asarray(params["b_hidden"]) == 0.0)
    assert np.any(np.asarray(params["b_out"]) != 0.0)
    bound = 1.0 / np.sqrt(16)
    assert np.all(np.abs(np.asarray(params["b_out"])) <= bound)


@pytest.mark.parametrize("init_type,bound_fn", [
    ("xavier", lambda fi, fo: np.sqrt(6.0 / (fi + fo))),     # torch xavier_uniform_
    ("kaiming", lambda fi, fo: np.sqrt(6.0 / fi)),           # torch kaiming_uniform_ (leaky_relu)
])
def test_weight_init_bounds(init_type, bound_fn):
    # n_stack >= 2 guards against the stack dim being miscounted as fan
    spec = MLPSpec(sizes=(4, 64, 64, 64, 64, 5), init_type=init_type)
    params = init_mlp_params(jax.random.PRNGKey(2), spec)
    for w, (fi, fo) in [
        (params["w_in"], (4, 64)),
        (params["w_hidden"][0], (64, 64)),
        (params["w_hidden"][2], (64, 64)),
        (params["w_out"], (64, 5)),
    ]:
        w = np.asarray(w)
        b = bound_fn(fi, fo)
        assert np.abs(w).max() <= b + 1e-6
        assert np.abs(w).max() > 0.5 * b  # uniform support actually reached


@pytest.mark.parametrize("init_type", ["xavier", "kaiming"])
@pytest.mark.parametrize("sizes", [(2, 8, 8, 8, 3), (2, 20, 3), (5, 10, 10, 10, 10, 4)])
def test_forward_matches_torch(init_type, sizes):
    spec = MLPSpec(sizes=sizes, init_type=init_type)
    params = init_mlp_params(jax.random.PRNGKey(3), spec)
    model = build_torch_mlp(jax.tree.map(np.asarray, params), init_type)

    x = np.random.RandomState(0).randn(17, sizes[0]).astype(np.float32)
    y_jax = np.asarray(mlp_apply(params, jnp.asarray(x), spec))
    with torch.no_grad():
        y_torch = model(torch.tensor(x, dtype=torch.float64)).numpy()
    # f32 network vs f64 oracle: tolerance reflects f32 roundoff through the
    # tanh/matmul chain, not a semantic difference.
    np.testing.assert_allclose(y_jax, y_torch, rtol=5e-4, atol=5e-5)


def test_apply_with_tangents_matches_jvp():
    spec = _spec((2, 12, 12, 12, 4))
    params = init_mlp_params(jax.random.PRNGKey(4), spec)
    x = jax.random.normal(jax.random.PRNGKey(5), (9, 2))
    tangents = jnp.stack([jnp.zeros_like(x).at[:, 0].set(1.0),
                          jnp.zeros_like(x).at[:, 1].set(1.0)])

    y, dy = mlp_apply_with_tangents(params, x, tangents, spec)

    f = lambda z: mlp_apply(params, z, spec)  # noqa: E731
    y_ref = f(x)
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref), rtol=1e-6, atol=1e-6)
    for k in range(2):
        _, dy_ref = jax.jvp(f, (x,), (tangents[k],))
        np.testing.assert_allclose(np.asarray(dy[k]), np.asarray(dy_ref), rtol=1e-5, atol=1e-6)


def test_apply_with_tangents_matches_torch_autograd():
    spec = _spec((2, 10, 10, 3))
    params = init_mlp_params(jax.random.PRNGKey(6), spec)
    model = build_torch_mlp(jax.tree.map(np.asarray, params))

    x = np.random.RandomState(1).randn(21, 2)
    cols = [torch.tensor(x[:, i : i + 1], requires_grad=True) for i in range(2)]
    out = model(torch.cat(cols, dim=-1))
    dy_torch = np.stack([
        np.concatenate(
            [
                torch.autograd.grad(out[:, j : j + 1], cols[c],
                                    grad_outputs=torch.ones(21, 1, dtype=torch.float64),
                                    retain_graph=True)[0].numpy()
                for j in range(3)
            ],
            axis=1,
        )
        for c in range(2)
    ])

    xj = jnp.asarray(x, dtype=jnp.float32)
    tangents = jnp.stack([jnp.zeros_like(xj).at[:, 0].set(1.0),
                          jnp.zeros_like(xj).at[:, 1].set(1.0)])
    _, dy = mlp_apply_with_tangents(params, xj, tangents, spec)
    np.testing.assert_allclose(np.asarray(dy), dy_torch, rtol=1e-4, atol=5e-5)


def test_dropout_train_vs_eval():
    spec = _spec((2, 32, 32, 3), dropout=0.5)
    params = init_mlp_params(jax.random.PRNGKey(7), spec)
    x = jax.random.normal(jax.random.PRNGKey(8), (16, 2))
    y_eval = mlp_apply(params, x, spec)                 # no rng -> deterministic
    y_eval2 = mlp_apply(params, x, spec)
    np.testing.assert_array_equal(np.asarray(y_eval), np.asarray(y_eval2))
    y_train = mlp_apply(params, x, spec, dropout_rng=jax.random.PRNGKey(9))
    assert not np.allclose(np.asarray(y_train), np.asarray(y_eval))


def test_single_hidden_layer_network():
    spec = _spec((2, 20, 3))
    params = init_mlp_params(jax.random.PRNGKey(10), spec)
    assert params["w_hidden"].shape[0] == 0
    x = jax.random.normal(jax.random.PRNGKey(11), (5, 2))
    y = mlp_apply(params, x, spec)
    assert y.shape == (5, 3)


def test_kaiming_uses_leaky_relu():
    spec = MLPSpec(sizes=(1, 4, 1), init_type="kaiming")
    params = init_mlp_params(jax.random.PRNGKey(12), spec)
    # force a negative pre-activation and check the 0.01 slope
    params = dict(params)
    params["w_in"] = jnp.ones_like(params["w_in"])
    params["w_out"] = jnp.ones_like(params["w_out"])
    params["b_out"] = jnp.zeros_like(params["b_out"])
    y_neg = mlp_apply(params, jnp.array([[-1.0]]), spec)
    y_pos = mlp_apply(params, jnp.array([[1.0]]), spec)
    np.testing.assert_allclose(float(y_neg[0, 0]), 4 * 0.01 * -1.0, rtol=1e-6)
    np.testing.assert_allclose(float(y_pos[0, 0]), 4 * 1.0, rtol=1e-6)


def test_flax_pinn_mlp_matches_functional_surface():
    """`PinnMLP` (the nn.Module-style surface, reference dnn.py:5) must be a
    pure veneer: identical outputs and tangents to the functional core."""
    from pinn_depthestimation_tpu.models import PinnMLP

    spec = _spec((2, 12, 12, 12, 3))
    module = PinnMLP(spec)
    x = jax.random.normal(jax.random.PRNGKey(3), (17, 2))
    variables = module.init(jax.random.PRNGKey(4), x)
    params = variables["params"]["mlp"]

    # init delegates to init_mlp_params: zero-bias-except-final preserved
    assert np.all(np.asarray(params["b_in"]) == 0.0)
    assert np.any(np.asarray(params["b_out"]) != 0.0)

    y_mod = module.apply(variables, x)
    y_fn = mlp_apply(params, x, spec)
    np.testing.assert_array_equal(np.asarray(y_mod), np.asarray(y_fn))

    tangents = jnp.stack([jnp.tile(jnp.array([1.0, 0.0]), (17, 1)),
                          jnp.tile(jnp.array([0.0, 1.0]), (17, 1))])
    out_mod = module.apply_with_tangents(variables, x, tangents)
    out_fn = mlp_apply_with_tangents(params, x, tangents, spec)
    for a, b in zip(jax.tree_util.tree_leaves(out_mod),
                    jax.tree_util.tree_leaves(out_fn)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_flax_pinn_mlp_dropout_rng_threading():
    from pinn_depthestimation_tpu.models import PinnMLP

    spec = _spec((2, 8, 8, 3), dropout=0.5)
    module = PinnMLP(spec)
    x = jax.random.normal(jax.random.PRNGKey(5), (9, 2))
    variables = module.init(jax.random.PRNGKey(6), x)
    y_eval = module.apply(variables, x)  # no rng -> deterministic eval mode
    y_eval2 = module.apply(variables, x)
    np.testing.assert_array_equal(np.asarray(y_eval), np.asarray(y_eval2))
    y_train = module.apply(variables, x, dropout_rng=jax.random.PRNGKey(7))
    assert not np.allclose(np.asarray(y_train), np.asarray(y_eval))
