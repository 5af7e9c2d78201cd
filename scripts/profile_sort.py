"""Microbenchmarks on the real TPU. To factor out the ~30ms axon tunnel
round-trip, each op is chained k times inside one jit (with a data
dependency); per-op cost = (t_k - t_1) / (k - 1)."""
import sys
import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


def _run(fn, args, iters):
    for _ in range(2):
        r = fn(*args)
    leaf = jax.tree_util.tree_leaves(r)[0]
    float(leaf.reshape(-1)[0])
    t0 = time.perf_counter()
    for _ in range(iters):
        r = fn(*args)
        leaf = jax.tree_util.tree_leaves(r)[0]
        float(leaf.reshape(-1)[0])
    return (time.perf_counter() - t0) / iters * 1e3


def chain_time(op, args, k=9, iters=5):
    """op: fn(*args) -> tree with leaf[0] feeding back into args[0]."""
    def chained(n):
        def f(*a):
            a = list(a)
            for _ in range(n):
                r = op(*a)
                leaves = jax.tree_util.tree_leaves(r)
                # perturb first arg so iterations can't be CSE'd
                a[0] = a[0] + leaves[0].reshape(-1)[:1].astype(a[0].dtype).sum()
            return a[0]
        return jax.jit(f)
    t1 = _run(chained(1), args, iters)
    tk = _run(chained(k), args, iters)
    return (tk - t1) / (k - 1)


def main():
    key = jax.random.PRNGKey(0)
    print("devices:", jax.devices())

    n = 2_460_000
    k32 = jax.random.randint(key, (n,), 0, 2**31 - 1, dtype=jnp.int32).astype(jnp.uint32)
    p32 = jnp.arange(n, dtype=jnp.int32)

    ms = chain_time(lambda k, p: jax.lax.sort((k, p), dimension=0, num_keys=1), (k32, p32))
    print(f"sort u32+i32 n={n}: {ms:.2f} ms ({ms*1e6/n:.1f} ns/el)")
    ms = chain_time(lambda k: (jax.lax.sort(k, dimension=0),), (k32,))
    print(f"sort u32 only n={n}: {ms:.2f} ms ({ms*1e6/n:.1f} ns/el)")

    for nn in [307_200, 614_400, 1_228_800]:
        ms = chain_time(lambda k, p: jax.lax.sort((k, p), dimension=0, num_keys=1),
                        (k32[:nn], p32[:nn]))
        print(f"sort u32+i32 n={nn}: {ms:.2f} ms ({ms*1e6/nn:.1f} ns/el)")

    x8 = jax.random.normal(key, (n, 8), dtype=jnp.float32)
    ms = chain_time(lambda x: (jnp.cumsum(x, axis=0),), (x8,))
    print(f"cumsum (2.46M,8) f32: {ms:.2f} ms")
    xb = x8.astype(jnp.bfloat16)
    ms = chain_time(lambda x: (jnp.cumsum(x.astype(jnp.float32), axis=0),), (xb,))
    print(f"cumsum (2.46M,8) bf16->f32: {ms:.2f} ms")
    x1 = jax.random.normal(key, (n,), dtype=jnp.float32)
    ms = chain_time(lambda x: (jnp.cumsum(x),), (x1,))
    print(f"cumsum (2.46M,) f32: {ms:.2f} ms")

    src = jax.random.normal(key, (491_520, 8), dtype=jnp.float32)
    idx = jax.random.randint(key, (n,), 0, 491_520, dtype=jnp.int32)
    ms = chain_time(lambda s, i: (jnp.take(s, i, axis=0),), (src, idx))
    print(f"row gather (2.46M rows of 8xf32): {ms:.2f} ms")
    srcw = jax.random.normal(key, (491_520, 16), dtype=jnp.float32)
    ms = chain_time(lambda s, i: (jnp.take(s, i, axis=0),), (srcw, idx))
    print(f"row gather (2.46M rows of 16xf32): {ms:.2f} ms")
    srce = jax.random.normal(key, (491_520,), dtype=jnp.float32)
    ms = chain_time(lambda s, i: (jnp.take(s, i),), (srce, idx))
    print(f"elem gather (2.46M f32): {ms:.2f} ms")

    sys.path.insert(0, "/root/repo")
    from codd_tpu.ops.splat import splat_render
    H, W = 384, 1280
    N = H * W
    pts = jax.random.normal(key, (1, N, 3), dtype=jnp.float32) * 5.0
    pts = pts.at[..., 2].set(jnp.abs(pts[..., 2]) + 1.0)
    feats = jax.random.normal(key, (1, N, 6), dtype=jnp.float32)
    intr = jnp.array([[700.0, 700.0, W / 2, H / 2]])

    def sp(f, p, k):
        o, z = splat_render(p, f, k, H=H, W=W, radius_px=1.0)
        return (o,)
    ms = chain_time(sp, (feats, pts, intr), k=5)
    print(f"splat full-res (N={N}, C=6): {ms:.2f} ms")

    H4, W4 = 96, 320
    N4 = H4 * W4
    pts4 = pts[:, :N4]
    feats4 = jax.random.normal(key, (1, N4, 32), dtype=jnp.float32)
    intr4 = intr / 4

    def sp4(f, p, k):
        o, z = splat_render(p, f, k, H=H4, W=W4, radius_px=2.0)
        return (o,)
    ms = chain_time(sp4, (feats4, pts4, intr4), k=5)
    print(f"splat 1/4-res (N={N4}, C=32, r=2): {ms:.2f} ms")


if __name__ == "__main__":
    main()
