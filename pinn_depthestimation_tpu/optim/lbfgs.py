"""On-device L-BFGS with strong-Wolfe line search, as pure jitted JAX.

Replaces two host-bound optimizers of the reference lineage:

* ``torch.optim.LBFGS(line_search_fn='strong_wolfe')`` driven by a closure
  re-evaluated up to ``max_eval`` times (reference ``train.py:116-125,195-200``)
  — every evaluation forces a host->device round trip through the Python
  closure;
* the deleted SciPy ``L-BFGS-B`` wrapper (``l_bfgs_b_optimizer``) that
  flattened weights to the host per function evaluation (SURVEY.md §3.5).

Here the optimizer state — flattened parameters, the ``(m, n)`` s/y history
ring buffers, the bracketing line-search state — lives entirely in device
memory, and the whole optimization is data-dependent control flow expressed
as ``lax.while_loop``. The host only re-enters at *chunk* boundaries to flush
loss records to ``log.txt`` and write checkpoints.

Semantics follow ``torch.optim.LBFGS`` (the reference's observable behavior):

* first iteration: steepest descent, step ``t = min(1, 1/sum|g|) * lr``;
  later iterations: two-loop recursion over up to ``history_size`` (s, y)
  pairs with ``H0 = (s.y / y.y) I``, step ``t = lr``;
* pairs are stored only when ``s.y > 1e-10``;
* strong-Wolfe line search with cubic interpolation, bracketing + zoom,
  ``c1=1e-4, c2=0.9, max_ls=25``, internal tolerance ``1e-9``;
* stop conditions, in order: ``max|g| <= tolerance_grad`` |
  ``gtd > -tolerance_change`` | iteration/evaluation budgets |
  ``max|t*d| <= tolerance_change`` | ``|f - f_prev| < tolerance_change``;
* beyond torch: step/loss/descent stops that fire while ``max|g|`` is still
  above ``tolerance_grad`` trigger a history-reset restart instead of
  termination, up to ``LBFGSOptions.max_restarts`` (see its docstring for
  the measured flagship stall this addresses; set 0 for strict torch
  termination).

The objective may return auxiliary ``(fidelity, residual)`` losses; every
evaluation appends ``(fid, res, total)`` to a device-side record buffer so the
reference's per-closure-call ``log.txt`` rows (reference ``train.py:162-173``)
can be reproduced without per-iteration host syncs.

Works transparently under a data-parallel mesh: the flat parameter vector is
replicated, batches are sharded, and XLA inserts psum for the loss/grad
reductions; all L-BFGS linear algebra is on replicated vectors.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass
from typing import Any, Callable, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.flatten_util import ravel_pytree

# Stop-reason codes (returned in LBFGSState.reason)
RUNNING = 0
CONVERGED_GRAD = 1       # max|g| <= tolerance_grad
MAX_ITER = 2
MAX_EVAL = 3
CONVERGED_STEP = 4       # max|t*d| <= tolerance_change
CONVERGED_LOSS = 5       # |f - f_prev| < tolerance_change
NOT_DESCENT = 6          # gtd > -tolerance_change

C1 = 1e-4
C2 = 0.9
LS_TOLERANCE = 1e-9      # torch hardcodes this inside _strong_wolfe
MAX_LS = 25


@dataclass(frozen=True)
class LBFGSOptions:
    lr: float = 1.0
    max_iter: int = 20
    max_eval: int | None = None
    history_size: int = 100
    tolerance_grad: float = 1e-7
    tolerance_change: float = 1e-9
    line_search: str = "strong_wolfe"  # 'strong_wolfe' | 'none'
    # Stall restarts (framework extension beyond torch). In f32 a near-zero
    # curvature pair (ys ~ 1e-10 -> rho ~ 1e10) can poison the two-loop
    # direction; the line search then collapses to a zero step and torch
    # semantics terminate on tolerance_change even though max|g| is far
    # above tolerance_grad. Measured on the flagship deep run: the stall
    # froze the optimizer at loss 1.47e-4 / max|g|=3.5e-5 after 258
    # evaluations, where torch CPU from the SAME warm point (different f32
    # micro-path, no wedge) continued to 4.4e-5. When a step/loss/descent
    # stop fires with max|g| still above tolerance_grad, we clear the s/y
    # history (next direction = -g) and continue, up to ``max_restarts``
    # times. Set 0 for strict torch termination semantics.
    max_restarts: int = 8
    # Cautious curvature update (framework extension beyond torch; set 0 for
    # torch's absolute ``ys > 1e-10`` rule). A pair is stored only when
    # ``ys > max(1e-10, curvature_guard * |s| * |y|)`` — i.e. the angle
    # between s and y is bounded away from 90 degrees, the Li-Fukushima
    # cautious-update form, which filters pure-noise pairs (f32 gradient
    # noise posing as curvature) while preserving convergence theory. On the
    # measured flagship stall this guard is not the binding factor (the
    # marginal pair there has cos(s, y) ~ 0.1 — small vectors, not
    # orthogonality; see PARITY_LBFGS_WARM.md), but it hardens the history
    # against the genuinely degenerate pairs long runs do produce.
    curvature_guard: float = 1e-4

    def resolved_max_eval(self) -> int:
        return self.max_eval if self.max_eval is not None else self.max_iter * 5 // 4


class LBFGSState(NamedTuple):
    x: jax.Array            # (n,) flat parameters
    f: jax.Array            # scalar current loss
    g: jax.Array            # (n,) current gradient
    d: jax.Array            # (n,) search direction
    t: jax.Array            # scalar last step size
    prev_g: jax.Array       # (n,)
    prev_f: jax.Array
    s_hist: jax.Array       # (m, n) ring buffer of steps
    y_hist: jax.Array       # (m, n) ring buffer of grad diffs
    rho: jax.Array          # (m,) 1/(s.y); 0 marks an empty slot
    head: jax.Array         # ring start (oldest valid slot)
    num: jax.Array          # valid history entries
    h_diag: jax.Array       # scalar H0 scale
    n_iter: jax.Array       # completed outer iterations
    func_evals: jax.Array   # total objective evaluations
    reason: jax.Array       # stop-reason code; RUNNING while active
    restarts: jax.Array     # stall restarts consumed (see LBFGSOptions)
    records: jax.Array      # (cap, 3) per-eval (fid, res, total)
    rec_count: jax.Array    # valid rows in records


def _cubic_interpolate(x1, f1, g1, x2, f2, g2, bounds=None):
    """Minimizer of the cubic through (x1,f1,g1),(x2,f2,g2), clamped to bounds.

    Mirrors torch's ``_cubic_interpolate`` including the bisection fallback
    when the square root goes negative.
    """
    if bounds is not None:
        xmin_bound, xmax_bound = bounds
    else:
        xmin_bound = jnp.minimum(x1, x2)
        xmax_bound = jnp.maximum(x1, x2)
    d1 = g1 + g2 - 3 * (f1 - f2) / (x1 - x2)
    d2_square = d1**2 - g1 * g2
    d2 = jnp.sqrt(jnp.maximum(d2_square, 0.0))
    min_pos_12 = x2 - (x2 - x1) * ((g2 + d2 - d1) / (g2 - g1 + 2 * d2))
    min_pos_21 = x1 - (x1 - x2) * ((g1 + d2 - d1) / (g1 - g2 + 2 * d2))
    min_pos = jnp.where(x1 <= x2, min_pos_12, min_pos_21)
    interpolated = jnp.clip(min_pos, xmin_bound, xmax_bound)
    bisection = (xmin_bound + xmax_bound) / 2.0
    result = jnp.where(d2_square >= 0, interpolated, bisection)
    # Degenerate inputs (nan from 0/0) fall back to bisection like torch's
    # float math would never produce a usable min_pos.
    return jnp.where(jnp.isfinite(result), result, bisection)


class _LS(NamedTuple):
    """Carried state of the strong-Wolfe search (bracket + zoom phases)."""

    t: jax.Array
    f_new: jax.Array
    g_new: jax.Array
    gtd_new: jax.Array
    t_prev: jax.Array
    f_prev: jax.Array
    g_prev: jax.Array
    gtd_prev: jax.Array
    ls_iter: jax.Array
    done: jax.Array          # curvature condition met
    found: jax.Array         # bracket located
    br_t: jax.Array          # (2,)
    br_f: jax.Array          # (2,)
    br_g: jax.Array          # (2, n)
    br_gtd: jax.Array        # (2,)
    insuf: jax.Array         # insufficient-progress flag (zoom)
    ctx: Any                 # (records, rec_count, func_evals)


def _strong_wolfe(evaluate, x, t, d, f, g, gtd, d_norm, tolerance_change, ctx):
    """torch-semantics strong-Wolfe line search as two ``lax.while_loop``s.

    ``evaluate(x, ctx) -> (f, g, ctx)`` is the recording objective.
    Returns ``(f_new, g_new, t, ctx)``; the caller applies ``x + t*d``.
    """

    def eval_at(t, ctx):
        f_new, g_new, ctx = evaluate(x + t * d, ctx)
        return f_new, g_new, jnp.dot(g_new, d), ctx

    f_new, g_new, gtd_new, ctx = eval_at(t, ctx)

    zero = jnp.zeros_like(t)
    init = _LS(
        t=t, f_new=f_new, g_new=g_new, gtd_new=gtd_new,
        t_prev=zero, f_prev=f, g_prev=g, gtd_prev=gtd,
        ls_iter=jnp.zeros((), jnp.int32),
        done=jnp.zeros((), bool), found=jnp.zeros((), bool),
        br_t=jnp.stack([zero, zero]), br_f=jnp.stack([f, f]),
        br_g=jnp.stack([g, g]), br_gtd=jnp.stack([gtd, gtd]),
        insuf=jnp.zeros((), bool), ctx=ctx,
    )

    # ---- bracket phase -----------------------------------------------------
    def bracket_cond(s: _LS):
        return (s.ls_iter < MAX_LS) & ~s.found & ~s.done

    def bracket_body(s: _LS):
        armijo_fail = (s.f_new > f + C1 * s.t * gtd) | ((s.ls_iter > 1) & (s.f_new >= s.f_prev))
        # torch checks Armijo first: curvature only terminates when Armijo holds
        curvature_ok = ~armijo_fail & (jnp.abs(s.gtd_new) <= -C2 * gtd)
        ascending = s.gtd_new >= 0

        found = armijo_fail | curvature_ok | ascending
        # bracket on (t_prev, t) for armijo/ascending; single point for curvature
        br_t = jnp.where(curvature_ok, jnp.stack([s.t, s.t]), jnp.stack([s.t_prev, s.t]))
        br_f = jnp.where(curvature_ok, jnp.stack([s.f_new, s.f_new]), jnp.stack([s.f_prev, s.f_new]))
        br_g = jnp.where(curvature_ok, jnp.stack([s.g_new, s.g_new]), jnp.stack([s.g_prev, s.g_new]))
        br_gtd = jnp.where(
            curvature_ok, jnp.stack([s.gtd_new, s.gtd_new]), jnp.stack([s.gtd_prev, s.gtd_new])
        )

        # interpolation step (only meaningful when not found)
        min_step = s.t + 0.01 * (s.t - s.t_prev)
        max_step = s.t * 10
        t_next = _cubic_interpolate(
            s.t_prev, s.f_prev, s.gtd_prev, s.t, s.f_new, s.gtd_new,
            bounds=(min_step, max_step),
        )
        f_next, g_next, gtd_next, ctx = lax.cond(
            found,
            lambda c: (s.f_new, s.g_new, s.gtd_new, c),
            lambda c: eval_at(t_next, c),
            s.ctx,
        )
        return _LS(
            t=jnp.where(found, s.t, t_next),
            f_new=f_next, g_new=g_next, gtd_new=gtd_next,
            t_prev=jnp.where(found, s.t_prev, s.t),
            f_prev=jnp.where(found, s.f_prev, s.f_new),
            g_prev=jnp.where(found, s.g_prev, s.g_new),
            gtd_prev=jnp.where(found, s.gtd_prev, s.gtd_new),
            ls_iter=jnp.where(found, s.ls_iter, s.ls_iter + 1),
            done=s.done | curvature_ok,
            found=found,
            br_t=jnp.where(found, br_t, s.br_t),
            br_f=jnp.where(found, br_f, s.br_f),
            br_g=jnp.where(found, br_g, s.br_g),
            br_gtd=jnp.where(found, br_gtd, s.br_gtd),
            insuf=s.insuf, ctx=ctx,
        )

    s = lax.while_loop(bracket_cond, bracket_body, init)

    # reached max_ls without a bracket: torch uses [0, t] with the endpoints
    exhausted = ~s.found & ~s.done
    s = s._replace(
        br_t=jnp.where(exhausted, jnp.stack([jnp.zeros_like(t), s.t]), s.br_t),
        br_f=jnp.where(exhausted, jnp.stack([f, s.f_new]), s.br_f),
        br_g=jnp.where(exhausted, jnp.stack([g, s.g_new]), s.br_g),
        br_gtd=jnp.where(exhausted, jnp.stack([gtd, s.gtd_new]), s.br_gtd),
    )

    # ---- zoom phase --------------------------------------------------------
    def low_high(br_f):
        low = jnp.where(br_f[0] <= br_f[1], 0, 1)
        return low, 1 - low

    def zoom_cond(s: _LS):
        interval = jnp.abs(s.br_t[1] - s.br_t[0]) * d_norm
        return (~s.done) & (s.ls_iter < MAX_LS) & (interval >= tolerance_change)

    def zoom_body(s: _LS):
        low, high = low_high(s.br_f)
        t_new = _cubic_interpolate(
            s.br_t[0], s.br_f[0], s.br_gtd[0], s.br_t[1], s.br_f[1], s.br_gtd[1]
        )

        br_max = jnp.maximum(s.br_t[0], s.br_t[1])
        br_min = jnp.minimum(s.br_t[0], s.br_t[1])
        eps = 0.1 * (br_max - br_min)
        close_to_edge = jnp.minimum(br_max - t_new, t_new - br_min) < eps
        displace = s.insuf | (t_new >= br_max) | (t_new <= br_min)
        t_displaced = jnp.where(
            jnp.abs(t_new - br_max) < jnp.abs(t_new - br_min), br_max - eps, br_min + eps
        )
        t_new = jnp.where(close_to_edge & displace, t_displaced, t_new)
        insuf = close_to_edge & ~displace

        f_new, g_new, gtd_new, ctx = eval_at(t_new, s.ctx)

        armijo_fail = (f_new > f + C1 * t_new * gtd) | (f_new >= s.br_f[low])
        curvature_ok = jnp.abs(gtd_new) <= -C2 * gtd
        # the high->low bracket move only applies when curvature was NOT met
        # (torch's elif); when done the new point simply becomes the low end
        overshoot = ~curvature_ok & (gtd_new * (s.br_t[high] - s.br_t[low]) >= 0)

        # armijo failure: new point becomes the high end
        def set_slot(arr, idx, val):
            return arr.at[idx].set(val)

        br_t1 = set_slot(s.br_t, high, t_new)
        br_f1 = set_slot(s.br_f, high, f_new)
        br_g1 = set_slot(s.br_g, high, g_new)
        br_gtd1 = set_slot(s.br_gtd, high, gtd_new)

        # sufficient decrease: maybe move old low to high slot, then take low
        br_t2 = jnp.where(overshoot, set_slot(s.br_t, high, s.br_t[low]), s.br_t)
        br_f2 = jnp.where(overshoot, set_slot(s.br_f, high, s.br_f[low]), s.br_f)
        br_g2 = jnp.where(overshoot, set_slot(s.br_g, high, s.br_g[low]), s.br_g)
        br_gtd2 = jnp.where(overshoot, set_slot(s.br_gtd, high, s.br_gtd[low]), s.br_gtd)
        br_t2 = set_slot(br_t2, low, t_new)
        br_f2 = set_slot(br_f2, low, f_new)
        br_g2 = set_slot(br_g2, low, g_new)
        br_gtd2 = set_slot(br_gtd2, low, gtd_new)

        take_first = armijo_fail
        return s._replace(
            t=t_new, f_new=f_new, g_new=g_new, gtd_new=gtd_new,
            ls_iter=s.ls_iter + 1,
            done=s.done | (~armijo_fail & curvature_ok),
            br_t=jnp.where(take_first, br_t1, br_t2),
            br_f=jnp.where(take_first, br_f1, br_f2),
            br_g=jnp.where(take_first, br_g1, br_g2),
            br_gtd=jnp.where(take_first, br_gtd1, br_gtd2),
            insuf=insuf, ctx=ctx,
        )

    single_point = s.done  # curvature met during bracketing: t/f/g already final
    s = lax.while_loop(zoom_cond, zoom_body, s)

    low, _ = low_high(s.br_f)
    t_fin = jnp.where(single_point, s.t, s.br_t[low])
    f_fin = jnp.where(single_point, s.f_new, s.br_f[low])
    g_fin = jnp.where(single_point, s.g_new, s.br_g[low])
    return f_fin, g_fin, t_fin, s.ctx


def _two_loop_direction(g, s_hist, y_hist, rho, head, num, h_diag):
    """Two-loop recursion over the ring buffer. Empty slots carry rho = 0 and
    therefore contribute nothing — no boolean masking needed."""
    m = rho.shape[0]

    def backward(j2, carry):
        q, alphas = carry
        j = m - 1 - j2
        idx = (head + j) % m
        al = rho[idx] * jnp.dot(s_hist[idx], q)
        q = q - al * y_hist[idx]
        return q, alphas.at[idx].set(al)

    q, alphas = lax.fori_loop(0, m, backward, (-g, jnp.zeros_like(rho)))
    r = q * h_diag

    def forward(j, r):
        idx = (head + j) % m
        be = rho[idx] * jnp.dot(y_hist[idx], r)
        return r + s_hist[idx] * (alphas[idx] - be)

    del num  # masking is implicit via rho == 0
    return lax.fori_loop(0, m, forward, r)


def make_lbfgs_step(evaluate: Callable, options: LBFGSOptions):
    """One outer L-BFGS iteration: direction, line search, history update,
    convergence checks. ``evaluate(x, ctx) -> (f, g, ctx)``."""
    lr = options.lr
    tol_grad = options.tolerance_grad
    tol_change = options.tolerance_change
    max_eval = options.resolved_max_eval()
    use_wolfe = options.line_search == "strong_wolfe"

    def step(state: LBFGSState) -> LBFGSState:
        m = state.rho.shape[0]
        first = state.n_iter == 0

        # -- history update (iterations >= 2), torch order: update then direction
        y = state.g - state.prev_g
        s_vec = state.d * state.t
        ys = jnp.dot(y, s_vec)
        ys_floor = jnp.asarray(1e-10, ys.dtype)
        if options.curvature_guard > 0.0:
            # cautious update: reject noise pairs with cos(s, y) ~ 0
            # (see LBFGSOptions.curvature_guard)
            ys_floor = jnp.maximum(
                ys_floor,
                options.curvature_guard
                * jnp.linalg.norm(s_vec)
                * jnp.linalg.norm(y),
            )
        store = (~first) & (ys > ys_floor)

        slot = jnp.where(state.num == m, state.head, (state.head + state.num) % m)
        s_hist = jnp.where(store, state.s_hist.at[slot].set(s_vec), state.s_hist)
        y_hist = jnp.where(store, state.y_hist.at[slot].set(y), state.y_hist)
        rho = jnp.where(store, state.rho.at[slot].set(1.0 / ys), state.rho)
        head = jnp.where(store & (state.num == m), (state.head + 1) % m, state.head)
        num = jnp.where(store & (state.num < m), state.num + 1, state.num)
        h_diag = jnp.where(store, ys / jnp.dot(y, y), state.h_diag)

        d = jnp.where(
            first,
            -state.g,
            _two_loop_direction(state.g, s_hist, y_hist, rho, head, num, h_diag),
        )
        t0 = jnp.where(
            first,
            jnp.minimum(1.0, 1.0 / jnp.sum(jnp.abs(state.g))) * lr,
            jnp.full_like(state.t, lr),
        )

        gtd = jnp.dot(state.g, d)
        not_descent = gtd > -tol_change

        prev_f, prev_g = state.f, state.g

        def do_line_search(ctx):
            d_norm = jnp.max(jnp.abs(d))
            if use_wolfe:
                f_new, g_new, t_new, ctx = _strong_wolfe(
                    evaluate, state.x, t0, d, state.f, state.g, gtd, d_norm, LS_TOLERANCE, ctx
                )
                return f_new, g_new, t_new, ctx
            # no line search: fixed step, then re-evaluate — except on the
            # final iteration, where torch skips the evaluation and reports
            # the stale pre-step loss (lbfgs.py 'if n_iter != max_iter')
            f_new, g_new, ctx = lax.cond(
                state.n_iter + 1 < options.max_iter,
                lambda c: evaluate(state.x + t0 * d, c),
                lambda c: (state.f, state.g, c),
                ctx,
            )
            return f_new, g_new, t0, ctx

        ctx = (state.records, state.rec_count, state.func_evals)
        f_new, g_new, t_new, ctx = lax.cond(
            not_descent,
            lambda c: (state.f, state.g, t0, c),
            do_line_search,
            ctx,
        )
        records, rec_count, func_evals = ctx
        x_new = jnp.where(not_descent, state.x, state.x + t_new * d)

        n_iter = state.n_iter + 1
        opt_cond = jnp.max(jnp.abs(g_new)) <= tol_grad
        step_small = jnp.max(jnp.abs(t_new * d)) <= tol_change
        loss_flat = jnp.abs(f_new - prev_f) < tol_change

        # first matching reason wins (torch's check order)
        reason = jnp.where(not_descent, NOT_DESCENT, RUNNING)
        reason = jnp.where(
            (reason == RUNNING) & (n_iter >= options.max_iter), MAX_ITER, reason
        )
        reason = jnp.where(
            (reason == RUNNING) & (func_evals >= max_eval), MAX_EVAL, reason
        )
        reason = jnp.where((reason == RUNNING) & opt_cond, CONVERGED_GRAD, reason)
        reason = jnp.where((reason == RUNNING) & step_small, CONVERGED_STEP, reason)
        reason = jnp.where((reason == RUNNING) & loss_flat, CONVERGED_LOSS, reason)

        # Stall restart (LBFGSOptions.max_restarts): a step/loss/descent stop
        # away from a critical point means the direction quality collapsed
        # (poisoned curvature pair), not convergence — clear the history
        # (rho = 0 masks every slot; next direction falls out as -g) and
        # keep running, bounded by the restart budget.
        stallish = (
            (reason == CONVERGED_STEP)
            | (reason == CONVERGED_LOSS)
            | (reason == NOT_DESCENT)
        )
        do_restart = (
            stallish
            & (jnp.max(jnp.abs(g_new)) > tol_grad)
            & (state.restarts < options.max_restarts)
            # a restart must never override an exhausted budget: NOT_DESCENT
            # is assigned before the max_iter/max_eval checks above, so
            # without these conjuncts a non-descent stall at the budget edge
            # would resurrect the run for up to another full line search
            & (n_iter < options.max_iter)
            & (func_evals < max_eval)
        )
        rho = jnp.where(do_restart, jnp.zeros_like(rho), rho)
        num = jnp.where(do_restart, jnp.zeros_like(num), num)
        head = jnp.where(do_restart, jnp.zeros_like(head), head)
        h_diag = jnp.where(do_restart, jnp.ones_like(h_diag), h_diag)
        reason = jnp.where(do_restart, RUNNING, reason)
        reason = reason.astype(state.reason.dtype)  # x64-safe (literals weak-type to int64)
        restarts = state.restarts + do_restart.astype(state.restarts.dtype)
        # zero the recorded step so the next iteration's s = t*d is exactly 0
        # and the cross-restart (possibly degenerate) pair is never stored
        t_new = jnp.where(do_restart, jnp.zeros_like(t_new), t_new)

        return state._replace(
            x=x_new, f=f_new, g=g_new, d=d, t=t_new,
            prev_g=prev_g, prev_f=prev_f,
            s_hist=s_hist, y_hist=y_hist, rho=rho, head=head, num=num, h_diag=h_diag,
            n_iter=n_iter, func_evals=func_evals,
            reason=reason, restarts=restarts, records=records, rec_count=rec_count,
        )

    return step


def _make_recording_evaluate(value_and_grad_flat):
    """Wrap a flat value-and-grad so every call appends (fid, res, total)."""

    def evaluate(x, ctx):
        records, rec_count, func_evals = ctx
        (total, aux), gflat = value_and_grad_flat(x)
        fid, res = aux
        row = jnp.stack([fid, res, total]).astype(records.dtype)
        records = lax.dynamic_update_slice(
            records, row[None, :],
            (rec_count, jnp.zeros((), rec_count.dtype)),  # x64-safe index pair
        )
        return total, gflat, (records, rec_count + 1, func_evals + 1)

    return evaluate


class LBFGSRunner:
    """Chunked driver around the jitted L-BFGS core.

    Each ``run_chunk`` advances as many outer iterations as fit in the record
    buffer and returns the per-evaluation loss rows so the host can stream
    them into ``log.txt`` and cut checkpoints — the device never blocks on
    host I/O mid-iteration.
    """

    def __init__(
        self,
        loss_fn: Callable,
        params_template: Any,
        options: LBFGSOptions,
        *,
        mesh=None,
        record_capacity: int = 8192,
        value_and_grad_fn: Callable | None = None,
        donate_state: bool = True,
    ):
        """``value_and_grad_fn(params, batch) -> ((total, aux), grads)``
        overrides ``jax.value_and_grad(loss_fn)`` — used by the Trainer to
        route evaluations through the one-kernel fused training step
        (training/loss.py::build_value_and_grad_fn). ``loss_fn`` is still
        required (template for the aux structure and non-overridden uses)."""
        self.options = options
        flat0, self._unravel = ravel_pytree(params_template)
        self._n = flat0.shape[0]
        # chunk boundaries are governed by the record buffer: a chunk ends
        # when fewer than one worst-case line search (MAX_LS + 2 rows) fits.
        # Below MAX_LS + 3 the chunk loop could never admit an iteration:
        # run_chunk would return an unchanged RUNNING state and the caller's
        # drive loop would spin forever — enforce the floor instead.
        self._record_capacity = max(record_capacity, MAX_LS + 3)
        self._loss_fn = loss_fn
        self._mesh = mesh

        def flat_loss(x, batch):
            return loss_fn(self._unravel(x), batch)

        if value_and_grad_fn is None:
            self._flat_value_and_grad = jax.value_and_grad(flat_loss, has_aux=True)
        else:
            def flat_vg(x, batch):
                (total, aux), grads = value_and_grad_fn(self._unravel(x), batch)
                return (total, aux), ravel_pytree(grads)[0]

            self._flat_value_and_grad = flat_vg

        # donate_state=False when the evaluation leaf contains a host
        # callback: donation lets XLA reuse the state buffers while an
        # in-flight callback may still read its aliased operand — observed
        # as intermittent bit-level divergence in the device_eval polish
        @functools.partial(
            jax.jit, donate_argnums=(0,) if donate_state else ()
        )
        def run_chunk(state: LBFGSState, batch) -> LBFGSState:
            evaluate = _make_recording_evaluate(
                lambda x: self._flat_value_and_grad(x, batch)
            )
            step = make_lbfgs_step(evaluate, self.options)
            cap = jnp.int32(self._record_capacity - (MAX_LS + 2))

            def cond(s: LBFGSState):
                return (s.reason == RUNNING) & (s.rec_count <= cap)

            return lax.while_loop(cond, step, state)

        self._run_chunk = run_chunk

        @jax.jit
        def init_state(params, batch) -> LBFGSState:
            x, _ = ravel_pytree(params)
            records = jnp.zeros((self._record_capacity, 3), jnp.float32)
            evaluate = _make_recording_evaluate(
                lambda z: self._flat_value_and_grad(z, batch)
            )
            f, g, (records, rec_count, func_evals) = evaluate(
                x, (records, jnp.int32(0), jnp.int32(0))
            )
            m = options.history_size
            # initial convergence check (torch step() prologue)
            reason = jnp.where(
                jnp.max(jnp.abs(g)) <= options.tolerance_grad,
                CONVERGED_GRAD,
                RUNNING,
            ).astype(jnp.int32)
            if options.max_iter <= 0:  # torch's 'while n_iter < max_iter'
                reason = jnp.full_like(reason, MAX_ITER)
            return LBFGSState(
                x=x, f=f, g=g,
                d=-g, t=jnp.ones((), x.dtype),
                prev_g=g, prev_f=f,
                s_hist=jnp.zeros((m, self._n), x.dtype),
                y_hist=jnp.zeros((m, self._n), x.dtype),
                rho=jnp.zeros((m,), x.dtype),
                head=jnp.int32(0), num=jnp.int32(0),
                h_diag=jnp.ones((), x.dtype),
                n_iter=jnp.int32(0), func_evals=func_evals,
                reason=reason, restarts=jnp.int32(0),
                records=records, rec_count=rec_count,
            )

        self._init_state = init_state

    # ------------------------------------------------------------------ API

    def init(self, params: Any, batch) -> LBFGSState:
        return self._init_state(params, batch)

    def run_chunk(self, state: LBFGSState, batch) -> tuple[LBFGSState, np.ndarray]:
        """Advance until done or the record buffer fills; returns
        ``(state, records)`` with records a host ``(k, 3)`` array."""
        state = self._run_chunk(state, batch)
        count = int(state.rec_count)
        records = np.asarray(state.records[:count])
        state = state._replace(rec_count=jnp.int32(0))
        return state, records

    def drain_records(self, state: LBFGSState) -> tuple[LBFGSState, np.ndarray]:
        """Flush any recorded-but-unflushed rows (e.g. the init evaluation
        when the optimizer converges immediately) without running a chunk."""
        count = int(state.rec_count)
        records = np.asarray(state.records[:count])
        return state._replace(rec_count=jnp.int32(0)), records

    def finished(self, state: LBFGSState) -> bool:
        return int(state.reason) != RUNNING

    # -------------------------------------------------------- serialization

    # transient fields excluded from checkpoints (rebuilt empty on restore)
    _TRANSIENT_FIELDS = ("records", "rec_count")

    def export_state(self, state: LBFGSState) -> dict:
        """Checkpointable dict of the optimizer state: iterate, gradient,
        direction, step, s/y ring buffers + rho/head/num, and all counters.
        The record buffer is transient (flushed at chunk boundaries) and is
        not serialized."""
        return {
            k: np.asarray(v)
            for k, v in state._asdict().items()
            if k not in self._TRANSIENT_FIELDS
        }

    def restore_state(self, raw: dict) -> LBFGSState:
        """Rebuild an exact-trajectory ``LBFGSState`` from
        :meth:`export_state` output (a fresh, empty record buffer is
        attached). Validates the flat-parameter and history shapes against
        this runner's template/options."""
        raw = dict(raw)
        # pre-restart-feature checkpoints lack the counter; resume with 0
        raw.setdefault("restarts", np.int32(0))
        missing = [
            k for k in LBFGSState._fields
            if k not in raw and k not in self._TRANSIENT_FIELDS
        ]
        if missing:
            raise ValueError(f"L-BFGS checkpoint is missing fields {missing}")
        x = jnp.asarray(raw["x"])
        if x.shape != (self._n,):
            raise ValueError(
                f"L-BFGS checkpoint has {x.shape[0]} flat parameters, "
                f"model has {self._n}"
            )
        m = self.options.history_size
        if np.shape(raw["rho"]) != (m,):
            raise ValueError(
                f"L-BFGS checkpoint history_size {np.shape(raw['rho'])[0]} "
                f"!= configured {m}"
            )
        fields = {
            k: jnp.asarray(v)
            for k, v in raw.items()
            if k in LBFGSState._fields and k not in self._TRANSIENT_FIELDS
        }
        return LBFGSState(
            records=jnp.zeros((self._record_capacity, 3), jnp.float32),
            rec_count=jnp.int32(0),
            **fields,
        )

    def get_params(self, state: LBFGSState) -> Any:
        return self._unravel(state.x)

    @property
    def n_params(self) -> int:
        """Flat parameter count of this runner's template."""
        return self._n

    def params_from_flat(self, x) -> Any:
        """Pytree view of a flat parameter vector in this runner's layout
        (the inverse of ``ravel_pytree`` on the template)."""
        return self._unravel(jnp.asarray(x))

    def stop_reason(self, state: LBFGSState) -> str:
        names = {
            RUNNING: "running",
            CONVERGED_GRAD: "tolerance_grad",
            MAX_ITER: "max_iter",
            MAX_EVAL: "max_eval",
            CONVERGED_STEP: "tolerance_change (step)",
            CONVERGED_LOSS: "tolerance_change (loss)",
            NOT_DESCENT: "direction not descent",
        }
        return names[int(state.reason)]


def lbfgs_minimize(
    fun: Callable,
    x0: Any,
    options: LBFGSOptions | None = None,
) -> tuple[Any, dict]:
    """Convenience: minimize ``fun(pytree) -> scalar``; returns (x, info).

    The functional analog of the deleted SciPy wrapper's
    ``LBFGSBOptimizer.optimize`` (SURVEY.md §0) — but running entirely on
    device. Used by tests as the SciPy-oracle comparison surface.
    """
    options = options or LBFGSOptions()

    def loss_fn(params, batch):
        del batch
        v = fun(params)
        return v, (v, jnp.zeros_like(v))

    runner = LBFGSRunner(loss_fn, x0, options)
    state = runner.init(x0, batch=None)
    history = []
    while not runner.finished(state):
        state, records = runner.run_chunk(state, None)
        history.append(records)
    # immediate convergence leaves the init evaluation's row unflushed —
    # without this, nfev=1 would come with an empty history
    state, leftover = runner.drain_records(state)
    if leftover.size:
        history.append(leftover)
    info = {
        "fun": float(state.f),
        "nit": int(state.n_iter),
        "nfev": int(state.func_evals),
        "reason": runner.stop_reason(state),
        "grad_max": float(jnp.max(jnp.abs(state.g))),
        "history": np.concatenate(history, axis=0) if history else np.zeros((0, 3)),
    }
    return runner.get_params(state), info
