"""Standalone timing: fused GN aggregation+solve Pallas kernel vs the
XLA windowed-aggregate + cholesky_solve_small chain, per iteration at
the production KITTI 1/8-res shape.

RUN THE GATE FIRST: scripts/check_gn_fused_tpu.py must be GREEN before
any number from this probe is recorded.  fori-chained single dispatch,
hard host-fetch sync.

Usage: python scripts/probe_gn_fused.py   (SOLO on the chip)
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

from codd_tpu.ops.pallas.gn_fused import (  # noqa: E402
    gn_fused_solve, gn_fused_solve_reference)

B, h, w, C = 1, 48, 160, 16
rng = np.random.RandomState(0)
ae = jnp.asarray(rng.randn(B, h, w, C).astype(np.float32) * 0.5)
J = rng.randn(B, h, w, 3, 6).astype(np.float32)
Wt = rng.rand(B, h, w, 3).astype(np.float32)
M = np.einsum("...ki,...k,...kj->...ij", J, Wt, J)
idx = [(i, j) for i in range(6) for j in range(i, 6)]
Hp = np.stack([M[..., i, j] for i, j in idx], axis=-1)
bv = rng.randn(B, h, w, 6).astype(np.float32)
vals = jnp.asarray(np.concatenate([Hp, bv], axis=-1))


def chain_ms(fn, k=64):
    @jax.jit
    def run(a):
        def body(i, c):
            out = fn(a + (c * 0), vals)
            return c + jnp.sum(out) * 1e-20
        return jax.lax.fori_loop(0, k, body, jnp.float32(0))

    t0 = time.perf_counter()
    _ = float(np.asarray(run(ae)))
    print(f"  [compile+first {time.perf_counter()-t0:.0f}s]", flush=True)
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        _ = float(np.asarray(run(ae)))
        best = min(best, (time.perf_counter() - t0) / k)
    return best * 1e3


for bf16 in (False, True):
    print(f"== bf16_scores={bf16} ==", flush=True)
    t_ref = chain_ms(lambda a, v: gn_fused_solve_reference(
        a, v, bf16_scores=bf16))
    t_k = chain_ms(lambda a, v: gn_fused_solve(a, v, bf16_scores=bf16))
    print(f"xla windowed+solve {t_ref:.3f} ms  fused kernel {t_k:.3f} ms  "
          f"speedup {t_ref / t_k:.2f}x", flush=True)
