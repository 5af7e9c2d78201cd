"""Chip speed-of-light probes: MXU TFLOP/s and HBM GB/s, single-dispatch
fori_loop chains with a hard host-fetch sync (axon-tunnel-proof)."""
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

rng = np.random.RandomState(0)
n = 4096
a = jnp.asarray(rng.rand(n, n).astype(np.float32), jnp.bfloat16)
b = jnp.asarray(rng.rand(n, n).astype(np.float32), jnp.bfloat16)

ITERS = 64


@jax.jit
def mm_chain(a, b):
    def body(i, x):
        return (x @ b) * jnp.bfloat16(1e-3)
    return jax.lax.fori_loop(0, ITERS, body, a)


def sync(x):
    return float(np.asarray(x[0, 0]))


sync(mm_chain(a, b))  # compile+warm
t0 = time.perf_counter()
r = mm_chain(a, b)
sync(r)
dt = time.perf_counter() - t0
fl = 2 * n**3 * ITERS
print(f"matmul chain: {dt*1e3:.1f} ms -> {fl/dt/1e12:.1f} TFLOP/s bf16")

x = jnp.asarray(rng.rand(64 * 1024 * 1024).astype(np.float32))


@jax.jit
def ew_chain(x):
    def body(i, v):
        return v * 1.000001 + 1e-7
    return jax.lax.fori_loop(0, ITERS, body, x)


sync2 = lambda v: float(np.asarray(v[0]))
sync2(ew_chain(x))
t0 = time.perf_counter()
r = ew_chain(x)
sync2(r)
dt = time.perf_counter() - t0
bw = 2 * x.nbytes * ITERS / dt
print(f"elementwise chain: {dt*1e3:.1f} ms -> {bw/1e9:.0f} GB/s")
