"""Stereo stage breakdown at KITTI res: backbone / init / propagation."""
import sys

import numpy as np

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/scripts")

import jax
import jax.numpy as jnp

from bench_util import chain_time  # noqa: E402

from codd_tpu.models.stereo.hitnet import (HITNetStereo, HITUNet,
                                           TileInitialization,
                                           TilePropagation)

H, W = 384, 1280
rng = np.random.RandomState(0)
l = jnp.asarray(rng.rand(1, H, W, 3).astype(np.float32))
r = jnp.asarray(rng.rand(1, H, W, 3).astype(np.float32))

stereo = HITNetStereo(max_disp=320)
sp = jax.jit(stereo.init)(jax.random.PRNGKey(0),
                          jnp.zeros((1, 64, 128, 3)),
                          jnp.zeros((1, 64, 128, 3)))["params"]

bb = HITUNet(name="backbone")
ti = TileInitialization(320, name="tile_init")
tp = TilePropagation(name="tile_update")


def backbone2(a, b):
    f = bb.apply({"params": sp["backbone"]}, jnp.concatenate([a, b], 0))
    return f[4]


def bb_init(a, b):
    f = bb.apply({"params": sp["backbone"]}, jnp.concatenate([a, b], 0))
    fl = [x[:1] for x in f]
    fr = [x[1:] for x in f]
    cv, hyp = ti.apply({"params": sp["tile_init"]}, fl, fr)
    return hyp[4]


def full(a, b):
    return stereo.apply({"params": sp}, a, b, train=False)["pred_disp"]


print(f"backbone(x2 batched): {chain_time(backbone2, (l, r), k=4):.1f} ms",
      flush=True)
print(f"backbone+init: {chain_time(bb_init, (l, r), k=4):.1f} ms", flush=True)
print(f"stereo full: {chain_time(full, (l, r), k=4):.1f} ms", flush=True)
