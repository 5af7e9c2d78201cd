"""Stereo stage breakdown via single-dispatch fori chains: backbone,
backbone+init, full.  Run SOLO."""
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

from codd_tpu.models.stereo.hitnet import (HITNetStereo, HITUNet,  # noqa
                                           TileInitialization,
                                           TilePropagation)

H, W = 384, 1280
ITERS = 8
rng = np.random.RandomState(0)
l = jnp.asarray(rng.rand(1, H, W, 3).astype(np.float32))
r = jnp.asarray(rng.rand(1, H, W, 3).astype(np.float32))

stereo = HITNetStereo(max_disp=320)
sp = jax.jit(stereo.init)(jax.random.PRNGKey(0),
                          jnp.zeros((1, 64, 128, 3)),
                          jnp.zeros((1, 64, 128, 3)))
bbp = {"params": sp["params"]["backbone"]}
tip = {"params": sp["params"]["tile_init"]}
bb = HITUNet()
ti = TileInitialization(320)


def chain(fn):
    @jax.jit
    def c(l, r):
        def body(i, carry):
            x, acc = carry
            v = fn(x, r)
            x = l + (v * 1e-9).astype(l.dtype)
            return (x, acc + v)
        return jax.lax.fori_loop(0, ITERS, body, (l, jnp.float32(0)))[1]
    return c


def timeit(name, fn):
    c = chain(fn)
    float(np.asarray(c(l, r)))
    t0 = time.perf_counter()
    float(np.asarray(c(l, r)))
    dt = time.perf_counter() - t0
    print(f"{name}: {dt/ITERS*1e3:.1f} ms", flush=True)


def f_backbone(a, b):
    f = bb.apply(bbp, jnp.concatenate([a, b], 0))
    return f[4].mean()


def f_bb_init(a, b):
    f = bb.apply(bbp, jnp.concatenate([a, b], 0))
    fl = [x[:1] for x in f]
    fr = [x[1:] for x in f]
    cv, hyp = ti.apply(tip, fl, fr)
    return sum(h.mean() for h in hyp)


def f_full(a, b):
    return stereo.apply(sp, a, b, train=False)["pred_disp"].mean()


timeit("backbone x2", f_backbone)
timeit("backbone+init", f_bb_init)
timeit("stereo full", f_full)
