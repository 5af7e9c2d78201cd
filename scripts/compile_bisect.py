"""Compile-bomb bisect: jit each piece of CODD.step at KITTI res in
sequence.  The stage whose compile SIGKILLs the axon compile helper is the
last one printed without an 'ok'.  Run SOLO (compiles contend)."""
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

from codd_tpu.models.motion.raft3d import RAFT3D  # noqa: E402
from codd_tpu.models.motion.motion import Motion  # noqa: E402
from codd_tpu.models.fusion.fusion import Fusion  # noqa: E402
from codd_tpu.models.codd import CODD  # noqa: E402

B, H, W = 1, 384, 1280
rng = np.random.RandomState(0)
img = jnp.asarray(rng.rand(B, H, W, 3).astype(np.float32))
disp = jnp.asarray((rng.rand(B, H, W) * 60 + 2).astype(np.float32))
intr = jnp.asarray([[450.0, 450.0, W / 2, H / 2]], jnp.float32)


def stage(name, fn):
    t0 = time.time()
    print(f"[{name}] compiling...", flush=True)
    out = fn()
    leaf = jax.tree_util.tree_leaves(out)[0]
    float(np.asarray(leaf).reshape(-1)[0])
    print(f"[{name}] ok ({time.time()-t0:.0f}s)", flush=True)


which = set(sys.argv[1:]) or {"raft", "motion", "fusion", "step"}

if {"raft", "motion"} & which:
    raft = RAFT3D(iters=16)
    rp = jax.jit(raft.init)(
        jax.random.PRNGKey(0), img[:, :64, :128], disp[:, :64, :128],
        disp[:, :64, :128], jnp.asarray([[450.0, 450, 64, 32]]),
        jnp.zeros((1, 8, 16, 128)), jnp.zeros((1, 8, 16, 512)))

if "raft" in which:
    fmap = jnp.asarray(rng.randn(B, H // 8, W // 8, 128).astype(np.float32))
    ninp = jnp.asarray(rng.randn(B, H // 8, W // 8, 512).astype(np.float32))

    def run_raft():
        f = jax.jit(lambda im, dp, dc: raft.apply(
            rp, im, dp, dc, intr, fmap, ninp)[0]["Ts"])
        return f(img, disp, disp)
    stage("raft16-eval", run_raft)

if "motion" in which:
    mot = Motion(iters=16)
    mp = jax.jit(mot.init)(
        jax.random.PRNGKey(0), img[:, :64, :128], disp[:, :64, :128],
        img[:, :64, :128], jnp.zeros((1, 16, 32, 32)), disp[:, :64, :128],
        jnp.zeros((1, 8, 16, 128)), jnp.zeros((1, 8, 16, 512)),
        jnp.asarray([[450.0, 450, 64, 32]]))
    memf = jnp.asarray(rng.randn(B, H // 4, W // 4, 32).astype(np.float32))
    fmap = jnp.asarray(rng.randn(B, H // 8, W // 8, 128).astype(np.float32))
    ninp = jnp.asarray(rng.randn(B, H // 8, W // 8, 512).astype(np.float32))

    def run_motion():
        f = jax.jit(lambda ic, dc: mot.apply(
            mp, ic, dc, img, memf, disp, fmap, ninp, intr)[0][3])
        return f(img, disp)
    stage("motion-eval(raft+splats)", run_motion)

if "fusion" in which:
    fus = Fusion(in_channels=24, fusion_channel=32)
    h4, w4 = H // 4, W // 4
    fl = jnp.asarray(rng.rand(B, h4, w4, 24).astype(np.float32))
    pc = jnp.asarray(rng.rand(B, H, W, 1).astype(np.float32) * 50)
    fw = jnp.asarray(rng.rand(B, h4, w4, 32).astype(np.float32))
    flow3 = jnp.asarray(rng.rand(B, H, W, 3).astype(np.float32))
    fp = jax.jit(fus.init)(jax.random.PRNGKey(0), pc[:, :64, :128],
                           pc[:, :64, :128], fw[:, :16, :32],
                           fw[:, :16, :32], flow3[:, :64, :128],
                           flow3[:, :64, :128], fl[:, :16, :32],
                           fl[:, :16, :32])

    def run_fusion():
        f = jax.jit(lambda a: fus.apply(fp, a, pc, fw, fw, flow3, flow3,
                                        fl, fl)[0])
        return f(pc)
    stage("fusion-eval", run_fusion)

if "step" in which:
    model = CODD(max_disp=320, iters=16)
    params = jax.jit(model.init)(
        jax.random.PRNGKey(0), jnp.zeros((1, 2, 64, 128, 3)),
        jnp.zeros((1, 2, 64, 128, 3)),
        jnp.asarray([[450.0, 450.0, 64.0, 32.0]], jnp.float32))
    first = jax.jit(lambda l, r: model.apply(params, l, r, intr,
                                             method=CODD.first_step))
    carry, _ = first(img, img)

    def run_step():
        f = jax.jit(lambda c, l, r: model.apply(
            params, c, l, r, intr, method=CODD.step)[1]["pred_disp"])
        return f(carry, img, img)
    stage("codd-step", run_step)
