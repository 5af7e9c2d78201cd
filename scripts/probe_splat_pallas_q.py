"""Isolate the quarter-res pallas splat compile hang.

The full-res case (C=6->pad 8, r=1, T=480 tiles) compiles in ~5 s; the
quarter-res case (C=32, r=2, T=30) hung >8 min.  Sweep the differing
factors one at a time at the quarter-res shape to find which one Mosaic
chokes on.

Usage: python scripts/probe_splat_pallas_q.py [case ...]
  cases: base (C=6 r=1), c32 (C=32 r=1), r2 (C=6 r=2), full (C=32 r=2)
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np
import jax.numpy as jnp

from scripts.bench_util import chain_time  # noqa: E402  (sets cache cfg)
from codd_tpu.ops.splat import splat_render  # noqa: E402

H, W = 96, 320
CASES = {
    "base": (6, 1.0),
    "c32": (32, 1.0),
    "r2": (6, 2.0),
    "full": (32, 2.0),
}


def run(name):
    C, radius = CASES[name]
    rng = np.random.RandomState(0)
    N = H * W
    Z = (1.0 + rng.rand(N) * 50).astype(np.float32)
    px = rng.uniform(-2, W + 2, N).astype(np.float32)
    py = rng.uniform(-2, H + 2, N).astype(np.float32)
    fx = fy = 450.0
    cx, cy = W / 2, H / 2
    pts = np.stack([(px - cx) / fx * Z, (py - cy) / fy * Z, Z], -1)[None]
    feats = rng.rand(1, N, C).astype(np.float32)
    intr = np.array([[fx, fy, cx, cy]], np.float32)

    def op(p, f, i):
        return splat_render(p, f, i, H=H, W=W, radius_px=radius,
                            impl="pallas")

    t0 = time.time()
    ms = chain_time(op, (jnp.asarray(pts), jnp.asarray(feats),
                         jnp.asarray(intr)), k=4, verbose=True)
    print(f"{name} (C={C} r={radius}): {ms:.2f} ms "
          f"(wall {time.time()-t0:.0f}s)", flush=True)


if __name__ == "__main__":
    for name in (sys.argv[1:] or ["base", "c32", "r2", "full"]):
        run(name)
