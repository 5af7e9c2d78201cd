"""Standalone timing: windowed-reduction splat (splat_one_window) vs the
incumbent _splat_one_gather, at both production call-site shapes
(full-res C=6 r=1 and quarter-res C=32 r=2, KITTI).

fori-chained single dispatch, hard host-fetch sync (BENCH_NOTES rules).
Usage: python scripts/probe_splat_window.py   (SOLO on the chip)
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

from codd_tpu.ops.splat import _splat_one_gather  # noqa: E402
from codd_tpu.ops.splat_window import splat_one_window  # noqa: E402


def chain_ms(fn, pts, feats, intr, k=8):
    @jax.jit
    def run(p):
        def body(i, c):
            out, zbuf = fn(p + (c * 0), feats, intr)
            return c + (jnp.sum(out) + jnp.sum(zbuf)) * 1e-20
        return jax.lax.fori_loop(0, k, body, jnp.float32(0))

    t0 = time.perf_counter()
    _ = float(np.asarray(run(pts)))
    print(f"  [compile+first {time.perf_counter()-t0:.0f}s]", flush=True)
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        _ = float(np.asarray(run(pts)))
        best = min(best, (time.perf_counter() - t0) / k)
    return best * 1e3


for (H, W, C, r, label) in [(384, 1280, 6, 1.0, "full-res C=6 r=1"),
                            (96, 320, 32, 2.0, "quarter-res C=32 r=2")]:
    N = H * W
    rng = np.random.RandomState(0)
    z = rng.rand(N) * 20 + 1.0
    x = (rng.rand(N) * W - W / 2) / 450.0 * z
    y = (rng.rand(N) * H - H / 2) / 450.0 * z
    pts = jnp.asarray(np.stack([x, y, z], -1).astype(np.float32))
    feats = jnp.asarray(rng.randn(N, C).astype(np.float32))
    intr = jnp.asarray([450.0, 450.0, W / 2, H / 2], jnp.float32)

    print(f"== {label} ({H}x{W}) ==", flush=True)
    t_g = chain_ms(lambda p, f, i: _splat_one_gather(p, f, i, H, W, r, 8,
                                                     0.0), pts, feats, intr)
    t_w = chain_ms(lambda p, f, i: splat_one_window(p, f, i, H, W, r, 8,
                                                    0.0), pts, feats, intr)
    print(f"xla_gather {t_g:.2f} ms  xla_window {t_w:.2f} ms  "
          f"speedup {t_g / t_w:.2f}x", flush=True)
