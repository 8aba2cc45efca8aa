"""Probe v2: HBM **output-ref** (not scratch; Mosaic rejects hbm scratch) + ring-buffered async DMA with dynamic indices, compiled
on the real chip. Pattern match for the bwd-v2 state streaming design."""
import jax, jax.numpy as jnp, numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from pinn_depthestimation_tpu.utils.cache import enable_compilation_cache
enable_compilation_cache()
assert jax.devices()[0].platform == "tpu"

L, R = 16, 3  # layers, ring slots

def kernel(x_ref, o_ref, hbm, ring, sem_w, sem_r):
    # forward: state_{j+1} = state_j * 2 + j, stream every state to HBM
    def fwd(j, st):
        slot = j % R
        @pl.when(j >= R)
        def _():
            pltpu.make_async_copy(ring.at[slot], hbm.at[j - R], sem_w.at[slot]).wait()
        ring[slot] = st
        pltpu.make_async_copy(ring.at[slot], hbm.at[j], sem_w.at[slot]).start()
        return st * 2.0 + jnp.float32(j)
    st = jax.lax.fori_loop(0, L, fwd, x_ref[:])
    # drain writes
    def drain(j, _):
        pltpu.make_async_copy(ring.at[j % R], hbm.at[j], sem_w.at[j % R]).wait()
        return 0
    jax.lax.fori_loop(L - R, L, drain, 0)
    # backward: sum states in reverse with prefetch ring
    def pre(i, _):
        j = L - 1 - i
        pltpu.make_async_copy(hbm.at[j], ring.at[j % R], sem_r.at[j % R]).start()
        return 0
    jax.lax.fori_loop(0, min(R, L), pre, 0)
    def bwd(i, acc):
        j = L - 1 - i
        pltpu.make_async_copy(hbm.at[j], ring.at[j % R], sem_r.at[j % R]).wait()
        acc = acc + ring[j % R]
        @pl.when(j - R >= 0)
        def _():
            pltpu.make_async_copy(hbm.at[j - R], ring.at[(j - R) % R], sem_r.at[(j - R) % R]).start()
        return acc
    acc = jax.lax.fori_loop(0, L, bwd, jnp.zeros_like(x_ref[:]))
    o_ref[:] = acc

x = jnp.ones((256, 128), jnp.float32)
def kernel2(x_ref, o_ref, hbm, ring, sem_w, sem_r):
    return kernel(x_ref, o_ref, hbm, ring, sem_w, sem_r)

f = pl.pallas_call(
    kernel2,
    out_shape=[
        jax.ShapeDtypeStruct((256, 128), jnp.float32),
        jax.ShapeDtypeStruct((L, 256, 128), jnp.float32),
    ],
    out_specs=[
        pl.BlockSpec((256, 128), lambda: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),
    ],
    scratch_shapes=[
        pltpu.VMEM((R, 256, 128), jnp.float32),
        pltpu.SemaphoreType.DMA((R,)),
        pltpu.SemaphoreType.DMA((R,)),
    ],
)
out = np.asarray(jax.jit(f)(x)[0])
# expected: states s_j where s_0 = 1, s_{j+1} = 2 s_j + j ; sum over j=0..L-1
s, tot = np.float32(1.0), 0.0
for j in range(L):
    tot += s
    s = s * 2 + j
np.testing.assert_allclose(out, tot, rtol=1e-6)
print("TPU HBM DMA ring probe OK, sum =", out[0, 0], "expected", tot)
