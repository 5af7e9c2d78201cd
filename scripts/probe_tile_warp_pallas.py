"""Standalone timing: fused Pallas tile-warp kernel vs the exact XLA
tile_warping path, per call at each propagation level's production shape.

RUN THE GATE FIRST: scripts/check_tile_warp_tpu.py must be GREEN before
any number from this probe is recorded (BENCH_NOTES discipline).
fori-chained single dispatch, hard host-fetch sync.

Usage: python scripts/probe_tile_warp_pallas.py   (SOLO on the chip)
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

from codd_tpu.models.stereo.hitnet import tile_warping  # noqa: E402
from codd_tpu.ops.pallas.tile_warp import tile_warp_cost  # noqa: E402


def chain_ms(fn, hyp3, fea_l, fea_r, k=16):
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


for (H, W, C, max_d, label) in [
        (384, 1280, 16, 200.0, "full-res (update4)"),
        (192, 640, 16, 100.0, "half-res (update3)"),
        (96, 320, 24, 50.0, "quarter-res (update2)")]:
    B, ht, wt = 1, H // 4, W // 4
    rng = np.random.RandomState(0)
    fea_l = jnp.asarray(rng.randn(B, H, W, C).astype(np.float32))
    fea_r = jnp.asarray(rng.randn(B, H, W, C).astype(np.float32))
    hyp3 = jnp.asarray(np.stack([
        rng.uniform(0, max_d, (B, ht, wt)),
        rng.uniform(-0.5, 0.5, (B, ht, wt)),
        rng.uniform(-0.5, 0.5, (B, ht, wt))], -1).astype(np.float32))
    print(f"== {label} {H}x{W} C={C} ==", flush=True)
    t_exact = chain_ms(tile_warping, hyp3, fea_l, fea_r)
    t_pallas = chain_ms(lambda h, l, r: tile_warp_cost(h, l, r),
                        hyp3, fea_l, fea_r)
    print(f"exact {t_exact:.2f} ms  pallas {t_pallas:.2f} ms  "
          f"speedup {t_exact / t_pallas:.2f}x", flush=True)
