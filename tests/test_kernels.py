"""Packed Pallas kernel vs the XLA reference path (interpret mode on CPU;
the compiled path is exercised on real TPU by bench.py and verification runs).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pinn_depthestimation_tpu.models import MLPSpec, init_mlp_params, mlp_apply_with_tangents
from pinn_depthestimation_tpu.ops import kernels


def _coord_tangents(coords, k):
    return jnp.stack(
        [jnp.zeros_like(coords).at[:, c].set(1.0) for c in range(k)], axis=0
    )


@pytest.mark.parametrize("width,d_in,d_out,layers", [
    (20, 2, 3, 5),     # flagship shape (config_CMB_h)
    (10, 2, 6, 10),    # CMB shape (config_CMB)
    (20, 3, 4, 4),     # navier-stokes shape (t, x, y)
    (64, 2, 3, 3),     # g = 2
    (128, 2, 2, 2),    # g = 1 (no packing headroom)
    (17, 2, 3, 4),     # odd width: g = 7, 119/128 lanes, non-8-multiple block
])
def test_packed_matches_reference(width, d_in, d_out, layers):
    spec = MLPSpec(sizes=(d_in,) + (width,) * layers + (d_out,), init_type="xavier")
    params = init_mlp_params(jax.random.PRNGKey(1), spec)
    n = 531  # deliberately not divisible by g * rows_per_tile
    coords = jnp.asarray(
        np.random.RandomState(0).uniform(-1, 1, (n, d_in)), jnp.float32
    )
    y, dy = kernels.packed_mlp_fwd_tangents(
        params, coords, spec, d_in, rows_per_tile=8, interpret=True
    )
    y_ref, dy_ref = mlp_apply_with_tangents(
        params, coords, _coord_tangents(coords, d_in), spec
    )
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref), rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(dy), np.asarray(dy_ref), rtol=1e-5, atol=1e-5)


def test_packed_kaiming_activation():
    spec = MLPSpec(sizes=(2, 16, 16, 3), init_type="kaiming")
    params = init_mlp_params(jax.random.PRNGKey(2), spec)
    coords = jnp.asarray(np.random.RandomState(1).uniform(-1, 1, (64, 2)), jnp.float32)
    y, dy = kernels.packed_mlp_fwd_tangents(
        params, coords, spec, 2, rows_per_tile=8, interpret=True
    )
    y_ref, dy_ref = mlp_apply_with_tangents(params, coords, _coord_tangents(coords, 2), spec)
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref), rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(dy), np.asarray(dy_ref), rtol=1e-5, atol=1e-5)


def test_packing_factor():
    assert kernels.packing_factor(MLPSpec(sizes=(2, 20, 3))) == 6
    assert kernels.packing_factor(MLPSpec(sizes=(2, 10, 6))) == 12
    assert kernels.packing_factor(MLPSpec(sizes=(2, 128, 3))) == 1
    with pytest.raises(ValueError, match="exceeds"):
        kernels.packing_factor(MLPSpec(sizes=(2, 200, 3)))


def test_auto_rows_per_tile():
    """Even tiles, 8-row granule, capped at the tier default (VMEM bound)."""
    # flagship f32: 12,516 pts / g=6 -> 2086 rows; 3 tiles of 696 (0.1% pad)
    assert kernels.auto_rows_per_tile(2086, 1024) == 696
    # flagship f32x3 (default 2048): 2 tiles of 1048, not one padded 2048
    assert kernels.auto_rows_per_tile(2086, 2048) == 1048
    # large batches keep the tuned default exactly
    assert kernels.auto_rows_per_tile(10_000_000 // 6, 1024) == 1024
    # single small tile rounds up to the sublane granule, floor 8
    assert kernels.auto_rows_per_tile(3, 1024) == 8
    assert kernels.auto_rows_per_tile(27, 256) == 32
    # never exceeds the default even when n_rows is a hair above a multiple
    for n_rows in (1025, 2049, 4097):
        assert kernels.auto_rows_per_tile(n_rows, 1024) <= 1024
    # and always covers: k tiles of the returned size hold all rows
    for n_rows in (1, 8, 531, 1024, 1025, 2086, 12345):
        rpt = kernels.auto_rows_per_tile(n_rows, 1024)
        k = -(-n_rows // 1024)
        assert k * rpt >= n_rows and rpt % 8 == 0


def test_auto_tiling_matches_explicit():
    """Auto-tiled outputs equal the explicitly-tiled ones (padding rows are
    inert) at an n that exercises an uneven last tile."""
    spec = MLPSpec(sizes=(2, 20, 20, 20, 3), init_type="xavier")
    params = init_mlp_params(jax.random.PRNGKey(3), spec)
    coords = jnp.asarray(
        np.random.RandomState(2).uniform(-1, 1, (531, 2)), jnp.float32
    )
    y_auto, dy_auto = kernels.packed_mlp_fwd_tangents(
        params, coords, spec, 2, interpret=True
    )
    y_exp, dy_exp = kernels.packed_mlp_fwd_tangents(
        params, coords, spec, 2, rows_per_tile=8, interpret=True
    )
    np.testing.assert_array_equal(np.asarray(y_auto), np.asarray(y_exp))
    np.testing.assert_array_equal(np.asarray(dy_auto), np.asarray(dy_exp))


def test_block_diag_structure():
    w = jnp.arange(6.0).reshape(2, 3)
    bd = np.asarray(kernels._block_diag(w, 3, jnp.float32))
    assert bd.shape == (128, 128)
    for g in range(3):
        np.testing.assert_array_equal(bd[2 * g : 2 * g + 2, 3 * g : 3 * g + 3], np.asarray(w))
    # everything else zero
    total = np.abs(bd).sum()
    np.testing.assert_allclose(total, 3 * np.abs(np.asarray(w)).sum())


def test_pack_unpack_roundtrip():
    spec = MLPSpec(sizes=(2, 20, 3))
    g = kernels.packing_factor(spec)
    coords = jnp.asarray(np.random.RandomState(3).randn(100, 2), jnp.float32)
    packed, n = kernels.pack_coords(coords, spec, g, rows_per_tile=8)
    assert n == 100
    assert packed.shape[1] == 128
    assert packed.shape[0] % 8 == 0
    # lanes beyond g*d_in are zero
    np.testing.assert_array_equal(np.asarray(packed[:, g * 2 :]), 0.0)
    # first packed row holds points 0..g-1
    np.testing.assert_array_equal(
        np.asarray(packed[0, : g * 2]).reshape(g, 2), np.asarray(coords[:g])
    )


def test_fused_residual_matches_physics(monkeypatch):
    from pinn_depthestimation_tpu import physics
    import functools

    spec = MLPSpec(sizes=(2, 20, 20, 3), init_type="xavier")
    params = init_mlp_params(jax.random.PRNGKey(4), spec)
    coords = jnp.asarray(np.random.RandomState(2).uniform(-1, 1, (96, 2)), jnp.float32)

    fc = kernels.fused_residual_continuity(params, coords, spec, interpret=True)

    awt = functools.partial(mlp_apply_with_tangents, params, spec=spec)
    _, f, g = physics.model_fields_and_grads(
        awt, coords, ["x", "y"], ["x", "y"], ["U", "V", "h"]
    )
    fc_ref = physics.continuity_only_residuals(f, g)
    np.testing.assert_allclose(np.asarray(fc), np.asarray(fc_ref), rtol=1e-4, atol=1e-5)


def test_bf16_mode_is_close_but_coarser():
    spec = MLPSpec(sizes=(2, 20, 20, 20, 3), init_type="xavier")
    params = init_mlp_params(jax.random.PRNGKey(5), spec)
    coords = jnp.asarray(np.random.RandomState(4).uniform(-1, 1, (64, 2)), jnp.float32)
    y32, _ = kernels.packed_mlp_fwd_tangents(
        params, coords, spec, 2, rows_per_tile=8, interpret=True
    )
    y16, _ = kernels.packed_mlp_fwd_tangents(
        params, coords, spec, 2, rows_per_tile=8, precision="bf16", interpret=True
    )
    err = float(jnp.abs(y16 - y32).max())
    assert err < 0.1          # same function...
    assert err > 1e-6         # ...at visibly lower precision


def test_f32x3_mode_between_f32_and_bf16():
    """Split-f32 (3 bf16 MXU passes) must land orders of magnitude tighter
    than bf16 while remaining a distinct (cheaper) function from f32."""
    spec = MLPSpec(sizes=(2,) + (20,) * 7 + (3,), init_type="xavier")
    params = init_mlp_params(jax.random.PRNGKey(5), spec)
    coords = jnp.asarray(np.random.RandomState(4).uniform(-1, 1, (130, 2)), jnp.float32)
    tang = _coord_tangents(coords, 2)
    y_ref, dy_ref = mlp_apply_with_tangents(params, coords, tang, spec)
    y3, dy3 = kernels.packed_mlp_fwd_tangents(
        params, coords, spec, 2, rows_per_tile=8, precision="f32x3", interpret=True
    )
    y16, _ = kernels.packed_mlp_fwd_tangents(
        params, coords, spec, 2, rows_per_tile=8, precision="bf16", interpret=True
    )
    err3 = float(jnp.abs(y3 - y_ref).max())
    err3_d = float(jnp.abs(dy3 - dy_ref).max())
    err16 = float(jnp.abs(y16 - y_ref).max())
    assert err3 < 1e-4 and err3_d < 2e-4       # ~2^-17 operand precision
    assert err3 > 1e-7                          # ...but not bitwise f32
    assert err3 < err16 / 20                    # far tighter than bf16


def test_f32x3_split_exactness():
    """hi + lo must reconstruct f32 values to ~2^-17 relative."""
    x = jnp.asarray(np.random.RandomState(0).randn(256).astype(np.float32) * 3.7)
    hi, lo = kernels._split_f32(x)
    rec = hi.astype(jnp.float32) + lo.astype(jnp.float32)
    rel = float(jnp.max(jnp.abs(rec - x) / (jnp.abs(x) + 1e-12)))
    assert rel < 2.0 ** -16


def test_invalid_precision_rejected():
    spec = MLPSpec(sizes=(2, 20, 3, ))
    params = init_mlp_params(jax.random.PRNGKey(6), MLPSpec(sizes=(2, 20, 20, 3)))
    coords = jnp.zeros((8, 2))
    with pytest.raises(ValueError, match="precision"):
        kernels.packed_mlp_fwd_tangents(
            params, coords, MLPSpec(sizes=(2, 20, 20, 3)), 2,
            precision="fp8", interpret=True,
        )


def test_zero_tangents_forward_only():
    """n_tangents=0 (the Predictor's fused prediction path)."""
    spec = MLPSpec(sizes=(2, 20, 20, 3), init_type="xavier")
    params = init_mlp_params(jax.random.PRNGKey(13), spec)
    coords = jnp.asarray(np.random.RandomState(5).uniform(-1, 1, (70, 2)), jnp.float32)
    y, dy = kernels.packed_mlp_fwd_tangents(
        params, coords, spec, 0, rows_per_tile=8, interpret=True
    )
    assert dy.shape == (0, 70, 3)
    from pinn_depthestimation_tpu.models import mlp_apply

    y_ref = mlp_apply(params, coords, spec)
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref), rtol=1e-5, atol=1e-5)


def test_deep_stack_fori_fallback_matches_reference():
    """Stacks deeper than UNROLL_MAX_LAYERS take the rolled fori_loop branch;
    its numerics must match the unrolled branch's oracle."""
    layers = kernels.UNROLL_MAX_LAYERS + 3  # force the fallback
    spec = MLPSpec(sizes=(2,) + (8,) * layers + (3,), init_type="xavier")
    params = init_mlp_params(jax.random.PRNGKey(4), spec)
    coords = jnp.asarray(
        np.random.RandomState(3).uniform(-1, 1, (65, 2)), jnp.float32
    )
    y, dy = kernels.packed_mlp_fwd_tangents(
        params, coords, spec, 2, rows_per_tile=8, interpret=True
    )
    y_ref, dy_ref = mlp_apply_with_tangents(
        params, coords, _coord_tangents(coords, 2), spec
    )
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref), rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(dy), np.asarray(dy_ref), rtol=2e-4, atol=2e-5)
