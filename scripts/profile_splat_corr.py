"""Measure the rewritten splat + corr lookup on the real TPU."""
import sys

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/scripts")
from bench_util import chain_time  # noqa: E402  (sets cache config)

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from codd_tpu.ops.splat import splat_render  # noqa: E402
from codd_tpu.ops import build_corr_pyramid, corr_lookup  # noqa: E402


def main():
    key = jax.random.PRNGKey(0)
    H, W = 384, 1280
    N = H * W
    pts = jax.random.normal(key, (1, N, 3), dtype=jnp.float32) * 5.0
    pts = pts.at[..., 2].set(jnp.abs(pts[..., 2]) + 1.0)
    feats = jax.random.normal(key, (1, N, 6), dtype=jnp.float32)
    intr = jnp.array([[700.0, 700.0, W / 2, H / 2]])

    ms = chain_time(
        lambda f, p, k: splat_render(p, f, k, H=H, W=W, radius_px=1.0),
        (feats, pts, intr), verbose=True)
    print(f"splat full-res C=6: {ms:.2f} ms", flush=True)

    H4, W4 = 96, 320
    N4 = H4 * W4
    pts4 = pts[:, :N4]
    feats4 = jax.random.normal(key, (1, N4, 32), dtype=jnp.float32)
    ms = chain_time(
        lambda f, p, k: splat_render(p, f, k, H=H4, W=W4, radius_px=2.0),
        (feats4, pts4, intr / 4), verbose=True)
    print(f"splat 1/4-res C=32: {ms:.2f} ms", flush=True)

    # corr lookup at RAFT 1/8 resolution
    h8, w8 = H // 8, W // 8
    f1 = jax.random.normal(key, (1, h8, w8, 128), dtype=jnp.float32)
    f2 = jax.random.normal(key, (1, h8, w8, 128), dtype=jnp.float32)
    pyr = build_corr_pyramid(f1, f2, 4)
    coords = jax.random.uniform(key, (1, h8, w8, 2)) * jnp.array([w8, h8])

    ms = chain_time(
        lambda c, p: (corr_lookup(p, c, 3),), (coords, pyr), verbose=True)
    print(f"corr_lookup r=3 4 levels: {ms:.2f} ms", flush=True)


if __name__ == "__main__":
    main()
