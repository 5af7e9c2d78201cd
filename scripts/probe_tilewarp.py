"""tile_warping formulation shootout at the full-res KITTI shape (the
tile_update4 hot spot): exact per-pixel gathers vs tile-window variants.

fori-chained single dispatch, hard host-fetch sync (BENCH_NOTES rules).
Usage: python scripts/probe_tilewarp.py
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

from codd_tpu.models.stereo.hitnet import (  # noqa: E402
    tile_warping, tile_warping_grouped, tile_warping_tilewin)

B, H, W, C = 1, 384, 1280, 16
ht, wt = H // 4, W // 4
rng = np.random.RandomState(0)
fea_l = jnp.asarray(rng.randn(B, H, W, C).astype(np.float32))
fea_r = jnp.asarray(rng.randn(B, H, W, C).astype(np.float32))
d = jnp.asarray(rng.uniform(0, 200, (B, ht, wt)).astype(np.float32))
dx = jnp.asarray(rng.uniform(-0.5, 0.5, (B, ht, wt)).astype(np.float32))
dy = jnp.asarray(rng.uniform(-0.5, 0.5, (B, ht, wt)).astype(np.float32))
hyp3 = jnp.stack([d, dx, dy], axis=-1)


def chain_ms(fn, k=16):
    @jax.jit
    def run(h):
        def body(i, c):
            out = fn(h + (c * 0), fea_l, fea_r)
            return c + jnp.sum(out) * 1e-20
        return jax.lax.fori_loop(0, k, body, jnp.float32(0))

    t0 = time.perf_counter()
    _ = float(np.asarray(run(hyp3)))
    print(f"  [compile+first {time.perf_counter()-t0:.0f}s]", flush=True)
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        _ = float(np.asarray(run(hyp3)))
        best = min(best, (time.perf_counter() - t0) / k)
    return best * 1e3


import sys as _sys

cases = _sys.argv[1:] or ["exact", "mac", "reduce", "reduce16"]
for case in cases:
    if case == "exact":
        ms = chain_ms(tile_warping)
    elif case == "grouped":
        ms = chain_ms(tile_warping_grouped)
    elif case == "grouped16":
        ms = chain_ms(
            lambda h, l, r: tile_warping_grouped(h, l, r, bw=16))
    elif case == "reduce16":
        ms = chain_ms(
            lambda h, l, r: tile_warping_tilewin(h, l, r, "reduce", tw=16))
    else:
        ms = chain_ms(
            lambda h, l, r, c=case: tile_warping_tilewin(h, l, r, c))
    print(f"{case}: {ms:.2f} ms", flush=True)
