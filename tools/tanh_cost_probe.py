"""Measure the VPU/tanh share of the bf16 (and f32x3) fused forward kernel:
A/B jnp.tanh vs identity vs a Pade(5,4) rational, same kernel otherwise.
(Monkeypatch + jax.clear_caches between variants; single TPU process.)"""
import time
import jax, jax.numpy as jnp, numpy as np
from pinn_depthestimation_tpu.utils.cache import enable_compilation_cache
enable_compilation_cache()
from pinn_depthestimation_tpu.models import MLPSpec, init_mlp_params
from pinn_depthestimation_tpu.ops import kernels

spec = MLPSpec(sizes=(2,) + (20,) * 100 + (3,), init_type="xavier")
params = init_mlp_params(jax.random.PRNGKey(0), spec)
N = 4_000_000
coords = jnp.asarray(np.random.RandomState(0).uniform(-1, 1, (N, 2)), jnp.float32)

real_tanh = jnp.tanh

def pade_tanh(x):
    # tanh Pade(5,4): x(945 + 105x^2 + x^4) / (945 + 420x^2 + 15x^4),
    # input clamped to +-3.9 where |err| < 2e-3 (bf16 noise scale)
    x = jnp.clip(x, -3.9, 3.9)
    x2 = x * x
    x4 = x2 * x2
    return x * (945.0 + 105.0 * x2 + x4) / (945.0 + 420.0 * x2 + 15.0 * x4)

def measure(precision):
    out = {}
    for name, fn in (("tanh", real_tanh), ("pade", pade_tanh), ("ident", lambda z: z)):
        jnp.tanh = fn
        jax.clear_caches()
        try:
            run = jax.jit(lambda p, c: jnp.sum(
                kernels.fused_residual_continuity(p, c, spec, precision=precision) ** 2))
            float(run(params, coords))
            ts = []
            for _ in range(5):
                t0 = time.perf_counter(); float(run(params, coords)); ts.append(time.perf_counter() - t0)
            dt = sorted(ts)[len(ts)//2]
            out[name] = N / dt
            print(f"{precision} {name}: {N/dt:.3e} evals/s", flush=True)
        finally:
            jnp.tanh = real_tanh
    return out

for prec in ("bf16",):
    r = measure(prec)
    print(f"{prec}: pade/tanh = {r['pade']/r['tanh']:.3f}x, ident/tanh = {r['ident']/r['tanh']:.3f}x", flush=True)
