"""Per-stage stereo timing at KITTI res: backbone / tile-init /
tile-propagation, each fori-chained single-dispatch with hard sync.

Usage: python scripts/probe_stereo_stages.py
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

from codd_tpu.models.stereo.hitnet import (HITUNet, TileInitialization,  # noqa: E402
                                           TilePropagation)

H, W = 384, 1280
rng = np.random.RandomState(0)
limg = jnp.asarray(rng.rand(1, H, W, 3).astype(np.float32))
rimg = jnp.asarray(rng.rand(1, H, W, 3).astype(np.float32))
cat = jnp.concatenate([limg, rimg], axis=0)

backbone = HITUNet()
bp = jax.jit(backbone.init)(jax.random.PRNGKey(0), cat[:, :64, :128])
fea_cat = jax.jit(backbone.apply)(bp, cat)
fea_l = [f[:1] for f in fea_cat]
fea_r = [f[1:] for f in fea_cat]

tinit = TileInitialization(320, "auto")
ip = jax.jit(tinit.init)(jax.random.PRNGKey(0),
                         [f[:, :f.shape[1] // 4 * 4 // 4 * 4] if False else f
                          for f in fea_l], fea_r)
init_cv, init_hyps = jax.jit(tinit.apply)(ip, fea_l, fea_r)

tprop = TilePropagation()
pp = jax.jit(tprop.init)(jax.random.PRNGKey(0), fea_l, fea_r, init_hyps)


def chain_ms(fn, seed_arrays, k=8):
    """fn(*seed_arrays) -> scalar-reducible pytree; returns ms/call."""

    @jax.jit
    def run(seed):
        def body(i, c):
            s, acc = c
            out = fn(jax.tree_util.tree_map(lambda a: a + (acc * 0).astype(a.dtype), seed))
            red = sum(jnp.sum(x.astype(jnp.float32)) for x in
                      jax.tree_util.tree_leaves(out))
            return (s, acc + red * 1e-20)
        return jax.lax.fori_loop(0, k, body, (0, jnp.float32(0)))[1]

    _ = float(np.asarray(run(seed_arrays)))
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        _ = float(np.asarray(run(seed_arrays)))
        best = min(best, (time.perf_counter() - t0) / k)
    return best * 1e3


ms_bb = chain_ms(lambda x: backbone.apply(bp, x), cat)
print(f"backbone (batched 2): {ms_bb:.2f} ms", flush=True)

ms_init = chain_ms(lambda fl: tinit.apply(ip, fl, fea_r), fea_l)
print(f"tile_init:            {ms_init:.2f} ms", flush=True)

ms_prop = chain_ms(lambda fl: tprop.apply(pp, fl, fea_r, init_hyps)[0],
                   fea_l)
print(f"tile_propagation:     {ms_prop:.2f} ms", flush=True)

print(f"sum: {ms_bb + ms_init + ms_prop:.2f} ms (module probe said ~48)")
