"""Microbenchmark: splat_render at the two production shapes (KITTI res).

Full-res:    N = H*W points,       C = 6 (induced flow 3 + weight 3), r=1
Quarter-res: N = (H/4)*(W/4),      C = 32 fusion features,            r=2

Usage: python scripts/profile_splat.py [--bf16]
"""
import argparse
import sys

sys.path.insert(0, "/root/repo")

import numpy as np
import jax.numpy as jnp

from scripts.bench_util import chain_time  # noqa: E402  (sets cache cfg)
from codd_tpu.ops.splat import splat_render  # noqa: E402


def bench_case(name, H, W, C, radius, dtype, impl="xla_gather", k=4):
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
        return splat_render(p, f, i, H=H, W=W, radius_px=radius, impl=impl)

    args = (jnp.asarray(pts, dtype), jnp.asarray(feats, dtype),
            jnp.asarray(intr))
    ms = chain_time(op, args, k=k, verbose=True)
    print(f"{name} [{impl}]: {ms:.2f} ms", flush=True)
    return ms


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--bf16", action="store_true")
    p.add_argument("--height", type=int, default=384)
    p.add_argument("--width", type=int, default=1280)
    p.add_argument("--impl", default=None,
                   help="run only this impl (default: all three)")
    args = p.parse_args()
    dt = jnp.bfloat16 if args.bf16 else jnp.float32
    H, W = args.height, args.width
    impls = (args.impl,) if args.impl else ("xla_gather", "xla", "pallas")
    for impl in impls:
        t_full = bench_case("full-res C=6 r=1", H, W, 6, 1.0, dt, impl)
        t_q = bench_case("quarter-res C=32 r=2", H // 4, W // 4, 32, 2.0,
                         dt, impl)
        print(f"total per frame [{impl}]: {t_full + t_q:.2f} ms", flush=True)


if __name__ == "__main__":
    main()
