"""On-device L-BFGS validated against torch.optim.LBFGS and SciPy L-BFGS-B.

The torch comparisons check observable-behavior parity (the reference's
optimizer, reference ``train.py:116-125``); the SciPy comparison revives the
deleted ``l_bfgs_b_optimizer`` wrapper's role as a quality oracle
(SURVEY.md §4 'Optimizer').
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
from scipy.optimize import minimize as scipy_minimize

from pinn_depthestimation_tpu.optim import LBFGSOptions, LBFGSRunner, lbfgs_minimize
from pinn_depthestimation_tpu.optim.lbfgs import MAX_LS


def rosenbrock_jnp(xy):
    x, y = xy[0], xy[1]
    return (1.0 - x) ** 2 + 100.0 * (y - x * x) ** 2


def rosenbrock_np(v):
    x, y = v
    return (1.0 - x) ** 2 + 100.0 * (y - x * x) ** 2


def _torch_lbfgs(fun_torch, x0, **opts):
    x = torch.tensor(x0, dtype=torch.float32, requires_grad=True)
    opt = torch.optim.LBFGS([x], **opts)

    evals = [0]

    def closure():
        opt.zero_grad()
        loss = fun_torch(x)
        loss.backward()
        evals[0] += 1
        return loss

    opt.step(closure)
    return x.detach().numpy(), float(fun_torch(x)), evals[0]


TORCH_OPTS = dict(
    lr=1.0, max_iter=200, max_eval=250, history_size=100,
    tolerance_grad=1e-7, tolerance_change=1e-9, line_search_fn="strong_wolfe",
)
# max_restarts=0: these oracle comparisons assert torch's TERMINATION
# semantics (eval-count bounds); the stall-restart extension intentionally
# keeps optimizing where torch stops (see its own tests below)
JAX_OPTS = LBFGSOptions(
    lr=1.0, max_iter=200, max_eval=250, history_size=100,
    tolerance_grad=1e-7, tolerance_change=1e-9, line_search="strong_wolfe",
    max_restarts=0, curvature_guard=0.0,
)


def test_rosenbrock_matches_torch_and_scipy():
    x0 = np.array([-1.2, 1.0], np.float32)

    x_jax, info = lbfgs_minimize(rosenbrock_jnp, jnp.asarray(x0), JAX_OPTS)
    x_torch, f_torch, evals_torch = _torch_lbfgs(
        lambda v: (1 - v[0]) ** 2 + 100 * (v[1] - v[0] ** 2) ** 2, x0, **TORCH_OPTS
    )
    res = scipy_minimize(rosenbrock_np, x0.astype(np.float64), method="L-BFGS-B")

    # all three find the (1, 1) minimum
    np.testing.assert_allclose(np.asarray(x_jax), [1.0, 1.0], atol=1e-3)
    np.testing.assert_allclose(x_torch, [1.0, 1.0], atol=1e-3)
    np.testing.assert_allclose(res.x, [1.0, 1.0], atol=1e-5)
    assert info["fun"] < 1e-8
    assert f_torch < 1e-8
    # comparable evaluation budget to torch (identical semantics up to f32
    # kernel roundoff steering the line search slightly differently)
    assert info["nfev"] <= 2 * evals_torch + 10


def test_quadratic_matches_torch_trajectory():
    """On a convex quadratic the first steps are deterministic enough that
    torch and the JAX implementation should land on the same parameters."""
    rs = np.random.RandomState(0)
    A = rs.randn(8, 8).astype(np.float32)
    A = A @ A.T + 8 * np.eye(8, dtype=np.float32)
    b = rs.randn(8).astype(np.float32)
    x0 = np.zeros(8, np.float32)

    fun_jnp = lambda x: 0.5 * x @ jnp.asarray(A) @ x - jnp.asarray(b) @ x  # noqa: E731
    x_jax, info = lbfgs_minimize(fun_jnp, jnp.asarray(x0), JAX_OPTS)

    At, bt = torch.tensor(A), torch.tensor(b)
    x_torch, f_torch, _ = _torch_lbfgs(
        lambda v: 0.5 * v @ At @ v - bt @ v, x0, **TORCH_OPTS
    )

    x_star = np.linalg.solve(A.astype(np.float64), b.astype(np.float64))
    np.testing.assert_allclose(np.asarray(x_jax), x_star, atol=1e-4)
    np.testing.assert_allclose(x_torch, x_star, atol=1e-4)
    np.testing.assert_allclose(np.asarray(x_jax), x_torch, atol=5e-4)


def test_pytree_parameters():
    """Optimization over a dict pytree (the real use: model params)."""

    def fun(p):
        return jnp.sum((p["a"] - 3.0) ** 2) + jnp.sum((p["b"] + 1.0) ** 4)

    x0 = {"a": jnp.zeros((3, 2)), "b": jnp.zeros(4)}
    x, info = lbfgs_minimize(fun, x0, LBFGSOptions(max_iter=100, tolerance_grad=1e-9))
    np.testing.assert_allclose(np.asarray(x["a"]), 3.0, atol=1e-4)
    np.testing.assert_allclose(np.asarray(x["b"]), -1.0, atol=2e-2)  # quartic flat
    assert info["fun"] < 1e-6


def test_small_history_ring_buffer():
    """history_size smaller than the iteration count exercises the ring."""
    rs = np.random.RandomState(1)
    A = rs.randn(20, 20).astype(np.float32)
    A = A @ A.T + np.eye(20, dtype=np.float32)
    b = rs.randn(20).astype(np.float32)
    fun = lambda x: 0.5 * x @ jnp.asarray(A) @ x - jnp.asarray(b) @ x  # noqa: E731

    x, info = lbfgs_minimize(
        fun, jnp.zeros(20), LBFGSOptions(max_iter=300, history_size=3, tolerance_grad=1e-6)
    )
    x_star = np.linalg.solve(A.astype(np.float64), b.astype(np.float64))
    np.testing.assert_allclose(np.asarray(x), x_star, atol=1e-3)
    assert info["nit"] > 3  # actually cycled the buffer


def test_max_eval_stop():
    x, info = lbfgs_minimize(
        rosenbrock_jnp, jnp.asarray([-1.2, 1.0]), LBFGSOptions(max_iter=1000, max_eval=7)
    )
    assert info["reason"] == "max_eval"
    assert info["nfev"] >= 7
    # may overshoot by at most one line search (torch checks post-iteration)
    assert info["nfev"] <= 7 + 26


def test_max_iter_stop():
    x, info = lbfgs_minimize(
        rosenbrock_jnp, jnp.asarray([-1.2, 1.0]), LBFGSOptions(max_iter=3, max_eval=10_000)
    )
    assert info["reason"] == "max_iter"
    assert info["nit"] == 3


def test_tolerance_grad_stop_at_optimum():
    x, info = lbfgs_minimize(
        lambda v: jnp.sum(v**2), jnp.zeros(4), LBFGSOptions(max_iter=100)
    )
    # gradient is zero at the start: must stop after the initial evaluation
    assert info["reason"] == "tolerance_grad"
    assert info["nfev"] == 1
    assert info["nit"] == 0


def test_no_line_search_mode():
    fun = lambda x: jnp.sum((x - 2.0) ** 2)  # noqa: E731
    x, info = lbfgs_minimize(
        fun,
        jnp.zeros(3),
        LBFGSOptions(lr=0.5, max_iter=50, line_search="none", tolerance_grad=1e-6),
    )
    np.testing.assert_allclose(np.asarray(x), 2.0, atol=1e-4)


def test_records_capture_every_evaluation():
    x, info = lbfgs_minimize(
        rosenbrock_jnp, jnp.asarray([-1.2, 1.0]), LBFGSOptions(max_iter=20, max_eval=100)
    )
    hist = info["history"]
    assert hist.shape == (info["nfev"], 3)
    # every record row: total == fid (aux wiring in lbfgs_minimize), finite
    assert np.isfinite(hist).all()
    np.testing.assert_allclose(hist[:, 0], hist[:, 2], rtol=1e-6)
    # first record is f(x0)
    np.testing.assert_allclose(hist[0, 2], rosenbrock_np([-1.2, 1.0]), rtol=1e-5)


def test_chunked_runner_equals_single_run():
    """Tiny record buffers force many host re-entries; the trajectory must be
    identical to one uninterrupted run (chunking is pure bookkeeping)."""

    def loss_fn(params, batch):
        del batch
        v = rosenbrock_jnp(params)
        return v, (v, jnp.zeros_like(v))

    opts = LBFGSOptions(max_iter=60, max_eval=200)
    x0 = jnp.asarray([-1.2, 1.0])

    big = LBFGSRunner(loss_fn, x0, opts, record_capacity=8192)
    s = big.init(x0, None)
    chunks_big = 0
    while not big.finished(s):
        s, _ = big.run_chunk(s, None)
        chunks_big += 1
    x_big, f_big = np.asarray(big.get_params(s)), float(s.f)

    small = LBFGSRunner(loss_fn, x0, opts, record_capacity=40)
    s2 = small.init(x0, None)
    chunks_small = 0
    while not small.finished(s2):
        s2, _ = small.run_chunk(s2, None)
        chunks_small += 1
    x_small, f_small = np.asarray(small.get_params(s2)), float(s2.f)

    assert chunks_small > chunks_big
    np.testing.assert_array_equal(x_big, x_small)
    assert f_big == f_small
    assert int(s.func_evals) == int(s2.func_evals)


def test_wolfe_conditions_hold_on_accepted_steps():
    """Accepted line-search steps satisfy Armijo; spot-check via records:
    the loss after each iteration never exceeds the Armijo bound by much."""
    x, info = lbfgs_minimize(
        rosenbrock_jnp, jnp.asarray([-1.2, 1.0]), LBFGSOptions(max_iter=50)
    )
    totals = info["history"][:, 2]
    # monotone trend: final loss far below initial, no wild blowups recorded
    assert totals[-1] < totals[0]
    assert np.max(totals) <= totals[0] * 50  # bracketing may probe larger steps


@pytest.mark.parametrize("n", [2, 37, 129])
def test_dimension_robustness(n):
    rs = np.random.RandomState(n)
    target = rs.randn(n).astype(np.float32)
    fun = lambda x: jnp.sum((x - jnp.asarray(target)) ** 2)  # noqa: E731
    x, info = lbfgs_minimize(fun, jnp.zeros(n), LBFGSOptions(max_iter=50))
    np.testing.assert_allclose(np.asarray(x), target, atol=1e-4)


@pytest.mark.parametrize("seed", range(6))
def test_fuzz_against_torch_on_random_problems(seed):
    """Randomized convex-ish problems: our optimizer and torch.optim.LBFGS
    must reach the same optimum with comparable evaluation budgets (exercises
    rarely-hit line-search branches)."""
    rs = np.random.RandomState(seed)
    n = rs.randint(3, 30)
    A = rs.randn(n, n).astype(np.float32)
    A = A @ A.T + np.eye(n, dtype=np.float32) * rs.uniform(0.1, 5)
    b = rs.randn(n).astype(np.float32)
    c = rs.uniform(0.1, 3.0)
    x0 = rs.randn(n).astype(np.float32)

    Aj, bj = jnp.asarray(A), jnp.asarray(b)

    def fun_jnp(x):
        q = 0.5 * x @ Aj @ x - bj @ x
        return q + c * jnp.sum(jnp.tanh(x) ** 2)  # mild non-quadratic term

    x_jax, info = lbfgs_minimize(fun_jnp, jnp.asarray(x0), JAX_OPTS)

    At, bt = torch.tensor(A), torch.tensor(b)
    x_torch, f_torch, evals_torch = _torch_lbfgs(
        lambda v: 0.5 * v @ At @ v - bt @ v + c * torch.sum(torch.tanh(v) ** 2),
        x0, **TORCH_OPTS,
    )

    assert info["fun"] <= f_torch + 1e-3 + abs(f_torch) * 1e-3
    # same minimizer (strongly convex quadratic dominates)
    np.testing.assert_allclose(np.asarray(x_jax), x_torch, atol=5e-3)
    assert info["nfev"] <= max(3 * evals_torch, evals_torch + 30)


def test_tiny_record_capacity_clamped_no_livelock():
    """record_capacity below one worst-case line search (MAX_LS + 2 rows)
    used to make run_chunk a no-op: the chunk loop's admission cap went
    negative, the state came back unchanged and RUNNING, and the caller's
    drive loop spun forever. The runner now clamps the capacity."""
    from pinn_depthestimation_tpu.optim.lbfgs import MAX_LS

    def loss_fn(params, batch):
        del batch
        v = rosenbrock_jnp(params)
        return v, (v, jnp.zeros_like(v))

    opts = LBFGSOptions(max_iter=25, max_eval=80)
    x0 = jnp.asarray([-1.2, 1.0])
    tiny = LBFGSRunner(loss_fn, x0, opts, record_capacity=4)
    assert tiny._record_capacity == MAX_LS + 3
    s = tiny.init(x0, None)
    for _ in range(500):  # bounded: must terminate well before this
        if tiny.finished(s):
            break
        prev_evals = int(s.func_evals)
        s, _ = tiny.run_chunk(s, None)
        assert int(s.func_evals) > prev_evals, "chunk made no progress"
    assert tiny.finished(s)


def test_stall_restart_recovers_from_poisoned_history():
    """A degenerate curvature pair (rho ~ 1e10) collapses the two-loop
    direction; strict torch semantics then terminate far from any critical
    point (measured on the flagship: stuck at max|g| 350x tolerance_grad).
    With stall restarts the history is cleared and optimization continues —
    the restarted run must land orders of magnitude below the wedged one."""
    from pinn_depthestimation_tpu.optim import lbfgs as L

    def quad(params, _batch):
        x = params["x"]
        return 0.5 * jnp.sum(x * x), (jnp.zeros(()), jnp.zeros(()))

    x0 = {"x": jnp.array([1.0, -2.0, 0.5], jnp.float32)}

    def run(max_restarts):
        opts = LBFGSOptions(max_iter=100, max_eval=300, history_size=4,
                            tolerance_grad=1e-7, tolerance_change=1e-9,
                            max_restarts=max_restarts)
        runner = LBFGSRunner(loss_fn=quad, params_template=x0, options=opts,
                             record_capacity=64)
        state = runner.init(x0, batch=None)
        # poison slot 0: rho ~ 1e10 with a sign-flipping y so the two-loop
        # emits a non-descent direction, plus a blown-up H0 scale
        state = state._replace(
            s_hist=state.s_hist.at[0].set(
                jnp.array([1e-5, 1e-5, 1e-5], jnp.float32)),
            y_hist=state.y_hist.at[0].set(
                jnp.array([-1e-15, -1e-15, -1e-15], jnp.float32)),
            rho=state.rho.at[0].set(-1e10),
            num=jnp.int32(1),
            h_diag=jnp.asarray(1e10, jnp.float32),
            n_iter=jnp.int32(1),  # past the first-iteration steepest-descent path
        )
        while not runner.finished(state):
            state, _ = runner.run_chunk(state, None)
        return state, runner

    wedged, _ = run(0)
    recovered, runner = run(8)
    assert int(recovered.restarts) >= 1
    # the restarted run optimizes well past where strict semantics stop
    assert float(recovered.f) < max(float(wedged.f) * 1e-2, 1e-8)


def test_strict_torch_termination_with_zero_restarts():
    """max_restarts=0 restores literal torch termination semantics."""
    from pinn_depthestimation_tpu.optim import lbfgs as L

    def quad(params, _batch):
        x = params["x"]
        return 0.5 * jnp.sum(x * x), (jnp.zeros(()), jnp.zeros(()))

    x0 = {"x": jnp.array([1.0, -2.0, 0.5], jnp.float32)}
    opts = LBFGSOptions(max_iter=100, max_eval=300, history_size=4,
                        tolerance_grad=1e-7, tolerance_change=1e-9,
                        max_restarts=0)
    runner = LBFGSRunner(loss_fn=quad, params_template=x0, options=opts,
                         record_capacity=64)
    state = runner.init(x0, batch=None)
    state = state._replace(
        s_hist=state.s_hist.at[0].set(jnp.array([1e-5, 0, 0], jnp.float32)),
        y_hist=state.y_hist.at[0].set(jnp.array([1e-10, 0, 0], jnp.float32)),
        rho=state.rho.at[0].set(1e10),
        num=jnp.int32(1),
        h_diag=jnp.asarray(1e10, jnp.float32),
        n_iter=jnp.int32(1),
    )
    while not runner.finished(state):
        state, _ = runner.run_chunk(state, None)
    assert int(state.restarts) == 0


def test_restore_state_tolerates_missing_restarts_field():
    """Checkpoints written before the stall-restart feature resume with a
    zero restart counter."""
    def quad(params, _batch):
        x = params["x"]
        return 0.5 * jnp.sum(x * x), (jnp.zeros(()), jnp.zeros(()))

    x0 = {"x": jnp.array([1.0, -2.0, 0.5], jnp.float32)}
    runner = LBFGSRunner(loss_fn=quad, params_template=x0,
                         options=LBFGSOptions(max_iter=10, history_size=4),
                         record_capacity=64)
    state = runner.init(x0, batch=None)
    raw = runner.export_state(state)
    assert "restarts" in raw
    del raw["restarts"]  # simulate a round-2 checkpoint
    restored = runner.restore_state(raw)
    assert int(restored.restarts) == 0


def test_runner_f64_reaches_f64_precision():
    """Under x64 the SAME runner converges to f64-resolvable optima — the
    basis of the trainer's f64 polish phase (config.F64PolishConfig): a loss
    anchored at 1.0 whose residual term an f32 evaluation literally cannot
    resolve below ~1e-7 (f32 eps quantization of 1.0 + r)."""
    import jax

    with jax.enable_x64():
        c = jnp.asarray([0.3, -1.7, 0.9], jnp.float64)

        def quad(params, _batch):
            x = params["x"]
            r = 0.5 * jnp.sum((x - c) ** 2)
            total = 1.0 + r
            return total, (jnp.ones((), x.dtype), r)

        x0 = {"x": jnp.zeros(3, jnp.float64)}
        opts = LBFGSOptions(max_iter=200, max_eval=500, history_size=10,
                            tolerance_grad=1e-12, tolerance_change=1e-15)
        runner = LBFGSRunner(loss_fn=quad, params_template=x0, options=opts,
                             record_capacity=128)
        state = runner.init(x0, batch=None)
        while not runner.finished(state):
            state, _ = runner.run_chunk(state, None)
        assert state.x.dtype == jnp.float64
        # the terminal residual sits at f64 resolution: 1.0 + r == 1.0 in
        # f32 for any r < 6e-8, so landing below 1e-14 proves the whole
        # state machine (line search, two-loop recursion, tolerances) ran
        # in f64 end-to-end
        assert float(state.f) - 1.0 < 1e-14
        x_fin = np.asarray(runner.get_params(state)["x"])
        np.testing.assert_allclose(x_fin, np.asarray(c), atol=1e-7)
    assert jax.config.jax_enable_x64 is False


def test_minimize_immediate_convergence_keeps_init_record():
    """Converging at x0 must still report the init evaluation's history row
    (drain_records exists for exactly this; nfev and history must agree)."""
    x, info = lbfgs_minimize(
        lambda p: jnp.sum(p**2),
        jnp.zeros((3,)),
        LBFGSOptions(max_iter=10, tolerance_grad=1e-8),
    )
    assert info["nfev"] == 1
    assert info["history"].shape[0] == 1
    np.testing.assert_allclose(info["history"][0, 2], 0.0, atol=1e-12)


def test_restart_cannot_override_exhausted_budget():
    """A stall restart must never resurrect a run whose max_eval/max_iter
    budget is already exhausted (NOT_DESCENT is assigned before the budget
    checks in the reason cascade)."""

    def rosen(p):
        return jnp.sum(100.0 * (p[1:] - p[:-1] ** 2) ** 2 + (1 - p[:-1]) ** 2)

    for max_eval in (3, 7, 15):
        _, info = lbfgs_minimize(
            rosen,
            jnp.zeros((6,)),
            LBFGSOptions(
                max_iter=1000, max_eval=max_eval, history_size=10,
                tolerance_grad=1e-12, tolerance_change=1e-16,
                max_restarts=8,
            ),
        )
        # one in-flight strong-Wolfe search may legitimately finish past the
        # budget edge (torch semantics); a restart-resurrected EXTRA search
        # would exceed this bound
        assert info["nfev"] <= max_eval + MAX_LS + 1, (max_eval, info)
