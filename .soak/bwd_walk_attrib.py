"""Attribute the stream-backward's reverse-walk time: the one-kernel step
runs at ~76% of the eval kernel's per-FLOP efficiency (ROOFLINE step
section). Candidate sinks inside the walk: the dependent sbar chain
(mm_t per layer), the weight-gradient dots (mm_tn + lane-roll compaction
+ VMEM accumulate per layer), and the backward VPU chain (ddact/dbar/
ubars). Timing-only ablated clones (results are garbage — NEVER ship);
DMA legs stay ON in all variants. Flagship shape, ONE process.

Usage: python .soak/bwd_walk_attrib.py
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
ybar = jnp.asarray(rs.randn(N, 3).astype(np.float32))
dybar = jnp.asarray(rs.randn(KT, N, 3).astype(np.float32))


def make_ablated(mode):
    """Clone of _make_bwd_kernel_stream with reverse-walk pieces toggleable.

    mode: 'full' | 'no_dw' | 'no_sbar' | 'no_bwd_vpu' | 'replay_only'
    """
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

            def layer_forward(c_state, j):
                a, us = split(c_state)
                d = dact_from(a)
                streams = jnp.concatenate([a] + [u * d for u in us], axis=0)
                zs = mm(streams, w_h_ref[j])
                z_a, z_us = split(zs)
                na = act(z_a + b_h_ref[pl.ds(j, 1), :])
                return jnp.concatenate([na] + z_us, axis=0)

            def put_state(j, st):
                slot = jax.lax.rem(j, R)

                @pl.when(j >= R)
                def _():
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

            def replay(j, st):
                st = layer_forward(st, j)
                put_state(j + 1, st)
                return st

            c_state = jax.lax.fori_loop(0, n_stack, replay, c_state)

            def drain(i, _):
                j = n_states - 1 - i
                slot = jax.lax.rem(j, R)
                pltpu.make_async_copy(
                    ring.at[slot], states_ref.at[j], sem_w.at[slot]
                ).wait()
                return 0

            jax.lax.fori_loop(0, min(R, n_states), drain, 0)

            if mode == "replay_only":
                # consume the replay result so the loop survives
                db_out_ref[:] += jnp.sum(
                    split(c_state)[0], axis=0, keepdims=True)
                return

            a_last, us_last = split(c_state)
            d_last = dact_from(a_last)
            s_last = jnp.concatenate(
                [a_last] + [u * d_last for u in us_last], axis=0)
            yb = ybar_ref[:]
            zbar_out = jnp.concatenate([yb] + [r[:] for r in tbar_refs], axis=0)
            dw_out_ref[:] += kv._compact(mm_tn(s_last, zbar_out), g, s)
            db_out_ref[:] += jnp.sum(yb, axis=0, keepdims=True)
            sbar = mm_t(zbar_out, w_out_ref[:])

            def backward_through(c_prev, c_cur, sbar, j):
                a_cur, us_cur = split(c_cur)
                d_cur = dact_from(a_cur)
                abar, tbars = split(sbar)
                if mode == "no_bwd_vpu":
                    ubars = list(tbars)
                    zbar = abar
                else:
                    dbar = jnp.zeros_like(a_cur)
                    for k in range(kt):
                        dbar = dbar + tbars[k] * us_cur[k]
                    ubars = [tbars[k] * d_cur for k in range(kt)]
                    zbar = (abar + ddact_times(a_cur, dbar)) * d_cur
                zbar_stack = jnp.concatenate([zbar] + ubars, axis=0)
                if mode == "no_dw":
                    dw = None
                else:
                    a_prev, us_prev = split(c_prev)
                    d_prev = dact_from(a_prev)
                    s_prev = jnp.concatenate(
                        [a_prev] + [u * d_prev for u in us_prev], axis=0)
                    dw = kv._compact(mm_tn(s_prev, zbar_stack), g, s)
                db = jnp.sum(zbar, axis=0, keepdims=True)
                if mode == "no_sbar":
                    sbar_prev = zbar_stack * 0.5
                else:
                    sbar_prev = mm_t(zbar_stack, w_h_ref[j])
                return sbar_prev, dw, db

            def get_start(j):
                slot = jax.lax.rem(j, R)
                pltpu.make_async_copy(
                    states_ref.at[j], ring.at[slot], sem_r.at[slot]
                ).start()

            def prefetch(i, _):
                get_start(n_stack - 1 - i)
                return 0

            jax.lax.fori_loop(0, min(pdist, n_stack), prefetch, 0)

            def bwd_step(i, carry):
                sbar, c_cur = carry
                j = n_stack - 1 - i
                slot = jax.lax.rem(j, R)
                pltpu.make_async_copy(
                    states_ref.at[j], ring.at[slot], sem_r.at[slot]
                ).wait()
                c_prev = ring[slot]

                @pl.when(j >= pdist)
                def _():
                    get_start(j - pdist)

                sbar_prev, dw, db = backward_through(c_prev, c_cur, sbar, j)
                if dw is not None:
                    dw_h_ref[j] += dw
                db_h_ref[pl.ds(j, 1), :] += db
                return sbar_prev, c_prev

            sbar, c0 = jax.lax.fori_loop(0, n_stack, bwd_step,
                                         (sbar, c_state))

            a_0, us_0 = split(c0)
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


def timed(label, builder):
    orig = kv._make_bwd_kernel_stream
    kv._make_bwd_kernel_stream = builder
    try:
        def chunk(p):
            def body(c, _):
                g = kv.packed_mlp_bwd(c, coords, ybar, dybar, spec, KT,
                                      impl="stream")
                return jax.tree.map(lambda a, b: a + 0.0 * b, c, g), None
            out, _ = jax.lax.scan(body, p, None, CHUNK)
            return (jax.tree.reduce(lambda a, b: a + jnp.sum(b) * 0, out, 0.0)
                    + out["w_out"][0, 0])

        run = jax.jit(chunk)
        float(run(params))
        ts = []
        for _ in range(REPS):
            t0 = time.perf_counter()
            float(run(params))
            ts.append((time.perf_counter() - t0) / CHUNK * 1e3)
        ms = sorted(ts)[len(ts) // 2]
        print(f"{label}: {ms:.3f} ms/call", flush=True)
        return ms
    finally:
        kv._make_bwd_kernel_stream = orig


full = timed("full          ", make_ablated("full")); kv.packed_mlp_bwd.clear_cache()
replay = timed("replay_only   ", make_ablated("replay_only")); kv.packed_mlp_bwd.clear_cache()
no_dw = timed("no_dw_dots    ", make_ablated("no_dw")); kv.packed_mlp_bwd.clear_cache()
no_sbar = timed("no_sbar_chain ", make_ablated("no_sbar")); kv.packed_mlp_bwd.clear_cache()
no_vpu = timed("no_bwd_vpu    ", make_ablated("no_bwd_vpu")); kv.packed_mlp_bwd.clear_cache()
print(f"RESULT walk total {full - replay:.3f} ms | dw dots {full - no_dw:.3f}"
      f" | sbar chain {full - no_sbar:.3f} | bwd VPU {full - no_vpu:.3f}",
      flush=True)
