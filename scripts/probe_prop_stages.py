"""Sub-module timing of TilePropagation at KITTI res: which of the 8
update stages owns the 36.8 ms (r4 probe_stereo_stages)?

fori-chained single-dispatch with hard sync, one stage at a time.
Usage: python scripts/probe_prop_stages.py
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

from codd_tpu.models.stereo.hitnet import (  # noqa: E402
    HITUNet, TileInitialization, TilePropagation, TileUpdate0, TileUpdate,
    PostTileUpdate, FinalTileUpdate, tile_warping)
from codd_tpu.ops.upsample import hyp_upsample  # noqa: E402

H, W = 384, 1280
rng = np.random.RandomState(0)
cat = jnp.asarray(rng.rand(2, H, W, 3).astype(np.float32))

backbone = HITUNet()
bp = jax.jit(backbone.init)(jax.random.PRNGKey(0), cat[:, :64, :128])
fea_cat = jax.jit(backbone.apply)(bp, cat)
fea_l = [f[:1] for f in fea_cat]
fea_r = [f[1:] for f in fea_cat]
tinit = TileInitialization(320, "auto")
ip = jax.jit(tinit.init)(jax.random.PRNGKey(0), fea_l, fea_r)
_, init_hyps = jax.jit(tinit.apply)(ip, fea_l, fea_r)

tprop = TilePropagation()
pp = jax.jit(tprop.init)(jax.random.PRNGKey(0), fea_l, fea_r, init_hyps)


def chain_ms(fn, seed, k=8):
    @jax.jit
    def run(s):
        def body(i, c):
            seed_i = jax.tree_util.tree_map(
                lambda a: a + (c * 0).astype(a.dtype), s)
            out = fn(seed_i)
            red = sum(jnp.sum(x.astype(jnp.float32))
                      for x in jax.tree_util.tree_leaves(out))
            return c + red * 1e-20
        return jax.lax.fori_loop(0, k, body, jnp.float32(0))

    _ = float(np.asarray(run(seed)))
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        _ = float(np.asarray(run(seed)))
        best = min(best, (time.perf_counter() - t0) / k)
    return best * 1e3


# reconstruct the intermediate hypotheses once (same wiring as
# TilePropagation.__call__)
def full(fl):
    return tprop.apply(pp, fl, fea_r, init_hyps)[0]


outs = {}
p = {"params": pp["params"]}


def sub(name, cls, *args, **kw):
    mod = cls(**kw)
    prm = {"params": pp["params"][name]}
    return mod, prm


t16_m, t16_p = sub("tile_update0", TileUpdate0)
t16 = jax.jit(lambda fl: t16_m.apply(t16_p, fl[0], fea_r[0], init_hyps[0]))(fea_l)
up_ms = {}
up_ms["t16 (1/64)"] = chain_ms(
    lambda fl: t16_m.apply(t16_p, fl[0], fea_r[0], init_hyps[0]), fea_l)
print(f"tile_update0 1/64: {up_ms['t16 (1/64)']:.2f} ms", flush=True)

prev = t16
for i, name in enumerate(["tile_update1", "tile_update2", "tile_update3",
                          "tile_update4"]):
    m, prm = sub(name, TileUpdate)
    lvl = i + 1
    prev_hyp = prev if i == 0 else prev[0]
    out = jax.jit(lambda fl, ph: m.apply(prm, fl[lvl], fea_r[lvl],
                                         init_hyps[lvl], ph))(fea_l, prev_hyp)
    ms = chain_ms(lambda a: m.apply(prm, a[0][lvl], fea_r[lvl],
                                    init_hyps[lvl], a[1]),
                  (fea_l, prev_hyp))
    print(f"{name} 1/{64 >> lvl}: {ms:.2f} ms", flush=True)
    prev = out

r1_m, r1_p = sub("tile_update4_1", PostTileUpdate, hid_c=32, out_c=16,
                 resblk_num=4)
r1x = jax.jit(lambda fl, h: r1_m.apply(r1_p, fl[2], h))(fea_l, prev[0])
ms = chain_ms(lambda a: r1_m.apply(r1_p, a[0][2], a[1]), (fea_l, prev[0]))
print(f"tile_update4_1 (post 1/4): {ms:.2f} ms", flush=True)

r05_m, r05_p = sub("tile_update5", PostTileUpdate, hid_c=32, out_c=16,
                   resblk_num=4)
h_up = hyp_upsample(r1x, 1.0)
r05x = jax.jit(lambda fl, h: r05_m.apply(r05_p, fl[3], h))(fea_l, h_up)
ms = chain_ms(lambda a: r05_m.apply(r05_p, a[0][3], a[1]), (fea_l, h_up))
print(f"tile_update5 (post 1/2): {ms:.2f} ms", flush=True)

rf_m, rf_p = sub("tile_update6", FinalTileUpdate, hid_c=16, resblk_num=2)
h_up2 = hyp_upsample(r05x, 1.0)
ms = chain_ms(lambda a: rf_m.apply(rf_p, a[0][4], a[1]), (fea_l, h_up2))
print(f"tile_update6 (final 1/1): {ms:.2f} ms", flush=True)

ms_full = chain_ms(lambda a: full(a), fea_l)
print(f"full propagation: {ms_full:.2f} ms", flush=True)
