"""Single-dispatch fori-chain timings for the motion-path hot ops at KITTI
res: splat_render (both impls, both call-site shapes) and the corr
pyramid build + 16 lookups.  Run SOLO."""
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

from codd_tpu.ops.splat import splat_render  # noqa: E402
from codd_tpu.ops.corr import build_corr_pyramid, corr_lookup  # noqa: E402

H, W = 384, 1280
rng = np.random.RandomState(0)


def timeit(name, jitted, args, iters=8):
    out = jitted(*args)
    leaf = jax.tree_util.tree_leaves(out)[0]
    float(np.asarray(leaf).reshape(-1)[0])
    t0 = time.perf_counter()
    out = jitted(*args)
    leaf = jax.tree_util.tree_leaves(out)[0]
    float(np.asarray(leaf).reshape(-1)[0])
    dt = time.perf_counter() - t0
    print(f"{name}: {dt/iters*1e3:.1f} ms", flush=True)


def splat_case(name, h, w, C, radius, impl, iters=8):
    N = h * w
    Z = (1.0 + rng.rand(N) * 50).astype(np.float32)
    px = rng.uniform(-2, w + 2, N).astype(np.float32)
    py = rng.uniform(-2, h + 2, N).astype(np.float32)
    fx = fy = 450.0
    cx, cy = w / 2, h / 2
    pts = jnp.asarray(
        np.stack([(px - cx) / fx * Z, (py - cy) / fy * Z, Z], -1)[None])
    feats = jnp.asarray(rng.rand(1, N, C).astype(np.float32))
    intr = jnp.asarray([[fx, fy, cx, cy]], jnp.float32)

    @jax.jit
    def chain(pts, feats, intr):
        def body(i, carry):
            p, acc = carry
            out, zbuf = splat_render(p, feats, intr, H=h, W=w,
                                     radius_px=radius, impl=impl)
            p = pts + (out.mean() * 1e-9).astype(pts.dtype)
            return (p, acc + zbuf[0, 0, 0])
        return jax.lax.fori_loop(0, iters, body, (pts, jnp.float32(0)))[1]

    timeit(f"splat {name} [{impl}]", chain, (pts, feats, intr), iters)


which = set(sys.argv[1:]) or {"splat", "corr"}

if "splat" in which:
    for impl in ("xla_gather", "xla"):
        splat_case("full-res C=6 r=1", H, W, 6, 1.0, impl)
        splat_case("quarter C=32 r=2", H // 4, W // 4, 32, 2.0, impl)

if "corr" in which:
    h8, w8 = H // 8, W // 8
    f1 = jnp.asarray(rng.randn(1, h8, w8, 128).astype(np.float32))
    f2 = jnp.asarray(rng.randn(1, h8, w8, 128).astype(np.float32))
    base = jnp.asarray(
        np.stack(np.meshgrid(np.arange(w8), np.arange(h8), indexing="xy"),
                 -1)[None].astype(np.float32))

    @jax.jit
    def corr_chain(f1, f2, base):
        pyr = build_corr_pyramid(f1, f2)

        def body(i, carry):
            c, acc = carry
            out = corr_lookup(pyr, c, 3)
            c = base + (out.mean() * 1e-9).astype(base.dtype)
            return (c, acc + out[0, 0, 0, 0])
        return jax.lax.fori_loop(0, 16, body, (base, jnp.float32(0)))[1]

    out = corr_chain(f1, f2, base)
    float(np.asarray(out))
    t0 = time.perf_counter()
    float(np.asarray(corr_chain(f1, f2, base)))
    dt = time.perf_counter() - t0
    print(f"corr build+16 lookups: {dt*1e3:.1f} ms", flush=True)
