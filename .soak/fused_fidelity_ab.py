"""A/B the fused zero-tangent fidelity forward (round-3 commits 3506038 +
a7d911e) on real TPU hardware — round-4 queue item 2.

ONE process, sequential measurements (TPU hygiene per the verify skill):

1. COMPILE CHECK: the kt=0 fused forward + custom-VJP backward must lower
   through Mosaic on hardware (interpret-mode exactness is already CI-proven;
   hardware lowering never ran — the relay died first). A failure here means
   training any CMB/legacy config with >= FUSED_FIDELITY_MIN_POINTS
   observations would crash at jit time -> raise the threshold to inf and
   file the Mosaic error.
2. CROSSOVER SWEEP: loss+grad wall time vs observation count with the
   fidelity branch FORCED to XLA vs FORCED fused, at the flagship depth
   (2->[20]x100->6) and at the reference CMB shape (2->[10]x10->6).
   Re-pins FUSED_FIDELITY_MIN_POINTS (currently 4096, mirrored from the
   3-stream residual crossover; the 1-stream crossover was never measured).

Context: the shipped CMB config observes 12 gauge points (config_CMB.json
data_fidelity.training_points) — the gate keeps those on XLA regardless;
this sweep serves large-observation users and pins the constant honestly.
"""

import json
import sys
import time

import numpy as np

from pinn_depthestimation_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

SMOKE = "--smoke" in sys.argv  # CPU dry run: tiny shapes, interpret kernels

import jax  # noqa: E402

if SMOKE:
    jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp  # noqa: E402

from pinn_depthestimation_tpu.models import MLPSpec, init_mlp_params  # noqa: E402
from pinn_depthestimation_tpu.ops import kernels_vjp  # noqa: E402

if not SMOKE:
    assert jax.devices()[0].platform == "tpu", "this A/B needs the real chip"
INTERPRET = SMOKE
DEPTH = 3 if SMOKE else 100
CMB_DEPTH = 2 if SMOKE else 10
N_FID = 256 if SMOKE else 8192
OBS_SWEEP = (64, 256) if SMOKE else (512, 2048, 4096, 8192, 16384, 65536)
CHUNK = 2 if SMOKE else 50

# ---------------- 1. kt=0 hardware compile check ----------------
spec = MLPSpec(sizes=(2,) + (20,) * DEPTH + (3,), init_type="xavier")
params = init_mlp_params(jax.random.PRNGKey(0), spec)
x = jnp.asarray(np.random.RandomState(0).uniform(-1, 1, (N_FID, 2)), jnp.float32)


def fid_loss(p):
    y, _ = kernels_vjp.fused_apply_with_tangents(p, x, spec, 0, "f32", INTERPRET)
    return jnp.mean((y - 0.1) ** 2)


v, g = jax.jit(jax.value_and_grad(fid_loss))(params)
print("COMPILE kt=0 fused fwd+bwd OK:", float(v),
      float(jnp.max(jnp.abs(g["w_out"]))), flush=True)

# ---------------- 2. crossover sweep ----------------
# Time a scanned chunk of loss evals (scan-chunking per CLAUDE.md: per-step
# host dispatch pays ~25 ms tunnel RTT) with the fidelity branch forced each
# way via the module constant (read at trace time, like the CI test does).


def timed_chunk(loss_fn, p):
    def body(c, _):
        val, grads = jax.value_and_grad(loss_fn)(p)
        return c + val + jax.tree.reduce(
            lambda a, b: a + jnp.sum(b * 0), grads, 0.0
        ), None

    run = jax.jit(lambda p0: jax.lax.scan(body, jnp.float32(0), None, CHUNK)[0])
    float(run(p))  # compile + warm
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        float(run(p))
        ts.append((time.perf_counter() - t0) / CHUNK * 1e3)
    return sorted(ts)[1]  # median ms/eval


def build(cfg_spec, n_obs, n_res, force):
    """loss_fn closing over a synthetic separate-fidelity batch."""
    rs = np.random.RandomState(n_obs)
    batch = {
        "fidelity_input": jnp.asarray(rs.uniform(-1, 1, (n_obs, 2)), jnp.float32),
        "fidelity_true": jnp.asarray(
            rs.uniform(-1, 1, (n_obs, cfg_spec.d_out)), jnp.float32
        ),
        "residual_input": jnp.asarray(rs.uniform(-1, 1, (n_res, 2)), jnp.float32),
    }
    # The branch under test is the fidelity forward itself (loss.py's
    # fidelity_forward picks between exactly these two forms), so time it
    # in isolation plus the MSE — no Config plumbing, branch forced by
    # construction rather than via FUSED_FIDELITY_MIN_POINTS.
    from pinn_depthestimation_tpu.models import mlp_apply

    if force == "fused":
        def fid(p):
            y, _ = kernels_vjp.fused_apply_with_tangents(
                p, batch["fidelity_input"], cfg_spec, 0, "f32", INTERPRET
            )
            return y
    else:
        def fid(p):
            return mlp_apply(p, batch["fidelity_input"], spec=cfg_spec)

    def loss_fn(p):
        return jnp.mean((fid(p) - batch["fidelity_true"]) ** 2)

    return loss_fn


for label, net in (
    ("flagship-depth", MLPSpec(sizes=(2,) + (20,) * DEPTH + (6,), init_type="xavier")),
    ("cmb-ref", MLPSpec(sizes=(2,) + (10,) * CMB_DEPTH + (6,), init_type="xavier")),
):
    p = init_mlp_params(jax.random.PRNGKey(1), net)
    rows = {}
    for n_obs in OBS_SWEEP:
        ms = {}
        for force in ("xla", "fused"):
            ms[force] = timed_chunk(build(net, n_obs, 256, force), p)
        rows[n_obs] = ms
        print(f"SWEEP {label} n_obs={n_obs}: xla {ms['xla']:.3f} ms/eval, "
              f"fused {ms['fused']:.3f} ms/eval, ratio "
              f"{ms['xla'] / ms['fused']:.2f}x", flush=True)
    print("RESULT", label, json.dumps(rows), flush=True)

print("done — re-pin FUSED_FIDELITY_MIN_POINTS in training/loss.py to the "
      "measured crossover (and update its docstring + STATUS.md)")
