"""Property-based tests (hypothesis) for the pure invariants the rest of the
suite checks only pointwise: normalization round-trips, checkpoint cadence
algebra, packing identities, and interop round-trips."""

import numpy as np
from hypothesis import given, settings, strategies as st

from pinn_depthestimation_tpu.ops.normalize import denormalize, normalize
from pinn_depthestimation_tpu.training.checkpoint import (
    checkpoint_due,
    checkpoint_points,
)

finite = st.floats(
    min_value=-1e6, max_value=1e6, allow_nan=False, allow_infinity=False,
    width=64,
)


@settings(max_examples=200, deadline=None)
@given(
    fracs=st.lists(
        st.floats(min_value=0.0, max_value=1.0, allow_nan=False),
        min_size=1, max_size=50,
    ),
    lo=finite,
    span=st.floats(min_value=1e-6, max_value=1e6, allow_nan=False),
)
def test_normalize_round_trip(fracs, lo, span):
    """denormalize(normalize(x)) == x over the map's domain (bounds covering
    the data — how the pipeline always uses it: min/max come from the data
    itself or config bounds, reference operations.py:4-13/19-28), and the
    normalized values stay in [-1, 1]. Out-of-range points far beyond a tiny
    span lose precision to cancellation by floating-point necessity, so the
    property is stated on the domain."""
    hi = lo + span
    arr = lo + np.asarray(fracs, np.float64) * span
    normed = normalize(arr, lo, hi)
    back = denormalize(normed, lo, hi)
    np.testing.assert_allclose(back, arr, rtol=1e-9, atol=1e-9 * span + 1e-12)
    assert np.all(normed >= -1 - 1e-9) and np.all(normed <= 1 + 1e-9)


@settings(max_examples=200, deadline=None)
@given(value=finite, lo=finite)
def test_normalize_degenerate_range_is_zero(value, lo):
    """A degenerate (max == min) range maps everything to 0 instead of
    dividing by zero (reference operations.py:5-6)."""
    out = normalize(np.asarray([value]), lo, lo)
    assert np.all(out == 0.0)


@settings(max_examples=300, deadline=None)
@given(
    start=st.integers(min_value=0, max_value=120_000),
    n1=st.integers(min_value=0, max_value=30_000),
    n2=st.integers(min_value=0, max_value=30_000),
    kind=st.sampled_from(["newmethod", "cmb"]),
)
def test_checkpoint_points_partition(start, n1, n2, kind):
    """Chunk-boundary algebra: splitting (start, end] into two blocks yields
    the same cadence points as one block (no point lost or duplicated
    however the L-BFGS record chunks land), each point is itself due, and
    points are strictly increasing."""
    mid, end = start + n1, start + n1 + n2
    one = checkpoint_points(start, end, kind)
    two = checkpoint_points(start, mid, kind) + checkpoint_points(mid, end, kind)
    assert one == two
    assert all(checkpoint_due(p, kind) for p in one)
    assert one == sorted(set(one))
    assert all(start < p <= end for p in one)


@settings(max_examples=50, deadline=None)
@given(
    n=st.integers(min_value=1, max_value=500),
    d_in=st.integers(min_value=1, max_value=5),
    width=st.integers(min_value=max(2, 1), max_value=40),
    rows=st.sampled_from([8, 64, 256]),
)
def test_pack_coords_identity(n, d_in, width, rows):
    """pack_coords lays g points per 128-lane row; reading the packed block
    back row-major must reproduce the original points (padding excluded) —
    the invariant the whole kernel addressing scheme rests on."""
    import jax

    from pinn_depthestimation_tpu.models import MLPSpec
    from pinn_depthestimation_tpu.ops import kernels

    width = max(width, d_in)  # spec requires hidden width >= 1; any width ok
    spec = MLPSpec(sizes=(d_in,) + (width,) * 2 + (1,))
    g = kernels.packing_factor(spec)
    coords = np.arange(n * d_in, dtype=np.float32).reshape(n, d_in)
    packed, n_out = jax.jit(
        kernels.pack_coords, static_argnames=("spec", "g", "rows_per_tile")
    )(coords, spec=spec, g=g, rows_per_tile=rows)
    assert n_out == n
    packed = np.asarray(packed)
    m = packed.shape[0]
    assert m % rows == 0  # padded to whole tiles
    # row r, slot k holds point r*g + k in columns [k*d_in, (k+1)*d_in)
    recovered = packed[:, : g * d_in].reshape(m * g, d_in)[:n]
    np.testing.assert_array_equal(recovered, coords)


@settings(max_examples=30, deadline=None)
@given(
    d_in=st.integers(min_value=1, max_value=6),
    width=st.integers(min_value=2, max_value=30),
    n_hidden=st.integers(min_value=1, max_value=6),
    d_out=st.integers(min_value=1, max_value=6),
)
def test_torch_interop_round_trip(d_in, width, n_hidden, d_out):
    """params -> reference-layout state_dict -> params is the identity for
    any architecture the config system can express."""
    import jax

    from pinn_depthestimation_tpu.models import MLPSpec, init_mlp_params
    from pinn_depthestimation_tpu.utils import torch_interop

    spec = MLPSpec(sizes=(d_in,) + (width,) * n_hidden + (d_out,))
    params = init_mlp_params(jax.random.PRNGKey(d_in * 7 + width), spec)
    sd = torch_interop.torch_state_dict_from_params(params)
    back = torch_interop.params_from_torch_linears(
        [(sd[f"layers.layer_{i}.weight"], sd[f"layers.layer_{i}.bias"])
         for i in range(n_hidden + 1)]
    )
    for key in ("w_in", "b_in", "w_hidden", "b_hidden", "w_out", "b_out"):
        np.testing.assert_array_equal(
            np.asarray(back[key]), np.asarray(params[key], np.float32)
        )
