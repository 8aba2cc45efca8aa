"""Probe: statically UNROLL the streaming backward's replay + reverse-walk
loops (python range instead of fori_loop, static ring slots and weight
slices) — the forward kernel gained +12% f32 / +35% bf16 from full layer
unroll, and the walk attribution shows replay_nowrites at 1.43x the
unrolled forward's per-FLOP cost at the flagship shape, implicating the
rolled loop's dynamic `w_h_ref[j]` slice per iteration. Real computation
(not timing-only): grads are checked against the rolled kernel.

Usage: python .soak/bwd_unroll_probe.py
"""

import time

import numpy as np

from pinn_depthestimation_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from jax.experimental import pallas as pl  # noqa: E402
from jax.experimental.pallas import tpu as pltpu  # noqa: E402

from pinn_depthestimation_tpu.models.mlp import MLPSpec, init_mlp_params  # noqa: E402
from pinn_depthestimation_tpu.ops import kernels_vjp as kv  # noqa: E402
from pinn_depthestimation_tpu.ops.kernels import LANES  # noqa: E402

assert jax.devices()[0].platform == "tpu"
DEPTH, N, KT, CHUNK, REPS = 100, 12516, 2, 300, 3

spec = MLPSpec(sizes=(2,) + (20,) * (DEPTH + 1) + (3,), init_type="xavier")
params = init_mlp_params(jax.random.PRNGKey(0), spec)
rs = np.random.RandomState(0)
coords = jnp.asarray(rs.uniform(-1, 1, (N, 2)).astype(np.float32))
ybar = jnp.asarray(rs.randn(N, 3).astype(np.float32) * 0.1)
dybar = jnp.asarray(rs.randn(KT, N, 3).astype(np.float32) * 0.1)


def make_unrolled(three_pass_allowed=True):
    """Clone of _make_bwd_kernel_stream with replay+walk python-unrolled."""
    def builder(spec, n_stack, n_tangents, g, s, dot_precision, tm,
                ring_slots, three_pass=False, train_epilogue=0):
        kt, R = n_tangents, ring_slots
        n_states, pdist = n_stack + 1, ring_slots - 1
        math = kv._bwd_math(spec, n_tangents, dot_precision, tm, three_pass)
        act, dact_from, ddact_times = (math["act"], math["dact_from"],
                                       math["ddact_times"])
        mm, mm_t, mm_tn, split = (math["mm"], math["mm_t"], math["mm_tn"],
                                  math["split"])

        def kernel(x_ref, w_in_ref, b_in_ref, w_h_ref, b_h_ref, w_out_ref,
                   t_rows_ref, ybar_ref, *rest):
            tbar_refs = rest[:kt]
            (dw_in_ref, db_in_ref, dw_h_ref, db_h_ref, dw_out_ref,
             db_out_ref, states_ref) = rest[kt : kt + 7]
            ring, sem_w, sem_r = rest[kt + 7 :]

            @pl.when(pl.program_id(0) == 0)
            def _zero():
                dw_in_ref[:] = jnp.zeros_like(dw_in_ref)
                db_in_ref[:] = jnp.zeros_like(db_in_ref)
                dw_h_ref[:] = jnp.zeros_like(dw_h_ref)
                db_h_ref[:] = jnp.zeros_like(db_h_ref)
                dw_out_ref[:] = jnp.zeros_like(dw_out_ref)
                db_out_ref[:] = jnp.zeros_like(db_out_ref)

            x = x_ref[:]

            def layer_forward(c_state, j):  # j static
                a, us = split(c_state)
                d = dact_from(a)
                streams = jnp.concatenate([a] + [u * d for u in us], axis=0)
                zs = mm(streams, w_h_ref[j])
                z_a, z_us = split(zs)
                na = act(z_a + b_h_ref[j : j + 1, :])
                return jnp.concatenate([na] + z_us, axis=0)

            def put_state(j, st):  # j static
                slot = j % R
                if j >= R:
                    pltpu.make_async_copy(
                        ring.at[slot], states_ref.at[j - R], sem_w.at[slot]
                    ).wait()
                ring[slot] = st
                pltpu.make_async_copy(
                    ring.at[slot], states_ref.at[j], sem_w.at[slot]
                ).start()

            z0 = mm(x, w_in_ref[:]) + b_in_ref[:]
            a0 = act(z0)
            seeds = [jnp.broadcast_to(t_rows_ref[c : c + 1, :], (tm, LANES))
                     for c in range(kt)]
            c_state = jnp.concatenate([a0] + seeds, axis=0)
            put_state(0, c_state)

            for j in range(n_stack):  # UNROLLED replay
                c_state = layer_forward(c_state, j)
                put_state(j + 1, c_state)

            for i in range(min(R, n_states)):  # drain writes
                j = n_states - 1 - i
                pltpu.make_async_copy(
                    ring.at[j % R], states_ref.at[j], sem_w.at[j % R]
                ).wait()

            a_last, us_last = split(c_state)
            d_last = dact_from(a_last)
            s_last = jnp.concatenate(
                [a_last] + [u * d_last for u in us_last], axis=0)
            yb = ybar_ref[:]
            zbar_out = jnp.concatenate([yb] + [r[:] for r in tbar_refs], axis=0)
            dw_out_ref[:] += kv._compact(mm_tn(s_last, zbar_out), g, s)
            db_out_ref[:] += jnp.sum(yb, axis=0, keepdims=True)
            sbar = mm_t(zbar_out, w_out_ref[:])

            def backward_through(c_prev, c_cur, sbar, j):  # j static
                a_cur, us_cur = split(c_cur)
                d_cur = dact_from(a_cur)
                abar, tbars = split(sbar)
                dbar = jnp.zeros_like(a_cur)
                for k in range(kt):
                    dbar = dbar + tbars[k] * us_cur[k]
                ubars = [tbars[k] * d_cur for k in range(kt)]
                zbar = (abar + ddact_times(a_cur, dbar)) * d_cur
                a_prev, us_prev = split(c_prev)
                d_prev = dact_from(a_prev)
                s_prev = jnp.concatenate(
                    [a_prev] + [u * d_prev for u in us_prev], axis=0)
                zbar_stack = jnp.concatenate([zbar] + ubars, axis=0)
                dw = kv._compact(mm_tn(s_prev, zbar_stack), g, s)
                db = jnp.sum(zbar, axis=0, keepdims=True)
                sbar_prev = mm_t(zbar_stack, w_h_ref[j])
                return sbar_prev, dw, db

            def get_start(j):  # j static
                pltpu.make_async_copy(
                    states_ref.at[j], ring.at[j % R], sem_r.at[j % R]
                ).start()

            for i in range(min(pdist, n_stack)):  # prefetch
                get_start(n_stack - 1 - i)

            c_cur = c_state
            for i in range(n_stack):  # UNROLLED reverse walk
                j = n_stack - 1 - i
                slot = j % R
                pltpu.make_async_copy(
                    states_ref.at[j], ring.at[slot], sem_r.at[slot]
                ).wait()
                c_prev = ring[slot]
                if j >= pdist:
                    get_start(j - pdist)
                sbar, dw, db = backward_through(c_prev, c_cur, sbar, j)
                dw_h_ref[j] += dw
                db_h_ref[j : j + 1, :] += db
                c_cur = c_prev

            a_0, us_0 = split(c_cur)
            d_0 = dact_from(a_0)
            abar0, tbars0 = split(sbar)
            dbar0 = jnp.zeros_like(a_0)
            for k in range(kt):
                dbar0 = dbar0 + tbars0[k] * us_0[k]
            zbar0 = (abar0 + ddact_times(a_0, dbar0)) * d_0
            dw_in = kv._compact(mm_tn(x, zbar0), g, s)
            for k in range(kt):
                ubar0 = tbars0[k] * d_0
                v = jnp.sum(ubar0, axis=0, keepdims=True)
                folded = kv._roll_sum(v, g, s)
                row_ids = jax.lax.broadcasted_iota(jnp.int32, (s, LANES), 0)
                dw_in = dw_in + jnp.where(row_ids == k, folded, 0.0)
            dw_in_ref[:] += dw_in
            db_in_ref[:] += jnp.sum(zbar0, axis=0, keepdims=True)

        return kernel
    return builder


def run_once(p):
    return kv.packed_mlp_bwd(p, coords, ybar, dybar, spec, KT, impl="stream")


def timed(label, builder=None):
    orig = kv._make_bwd_kernel_stream
    if builder is not None:
        kv._make_bwd_kernel_stream = builder
    try:
        def chunk(p):
            def body(c, _):
                g = run_once(c)
                return jax.tree.map(lambda a, b: a + 0.0 * b, c, g), None
            out, _ = jax.lax.scan(body, p, None, CHUNK)
            return (jax.tree.reduce(lambda a, b: a + jnp.sum(b) * 0, out, 0.0)
                    + out["w_out"][0, 0])

        grads = jax.jit(run_once)(params)
        run = jax.jit(chunk)
        t0 = time.perf_counter()
        float(run(params))
        compile_s = time.perf_counter() - t0
        ts = []
        for _ in range(REPS):
            t0 = time.perf_counter()
            float(run(params))
            ts.append((time.perf_counter() - t0) / CHUNK * 1e3)
        ms = sorted(ts)[len(ts) // 2]
        print(f"{label}: {ms:.3f} ms/call (compile+first {compile_s:.1f}s)",
              flush=True)
        return ms, grads
    finally:
        kv._make_bwd_kernel_stream = orig


rolled_ms, g_rolled = timed("rolled (shipped)")
kv.packed_mlp_bwd.clear_cache()
unrolled_ms, g_unrolled = timed("UNROLLED        ", make_unrolled())
rel = max(
    float(np.max(np.abs(np.asarray(a) - np.asarray(b)))
          / (np.max(np.abs(np.asarray(b))) + 1e-12))
    for a, b in zip(jax.tree.leaves(g_unrolled), jax.tree.leaves(g_rolled))
)
print(f"RESULT unrolled/rolled = {unrolled_ms / rolled_ms:.3f}x "
      f"({rolled_ms:.3f} -> {unrolled_ms:.3f} ms), grads max rel diff {rel:.2e}",
      flush=True)
