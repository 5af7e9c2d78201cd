"""Per-module chained timings at KITTI res (f32 and bf16).

Methodology: data-dependent chaining inside one jit (bench_util.chain_time)
so the axon tunnel can't dedup and dispatch overhead amortizes."""
import sys

import numpy as np

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/scripts")

import jax
import jax.numpy as jnp

from bench_util import chain_time  # noqa: E402

from codd_tpu.models.stereo.hitnet import HITNetStereo
from codd_tpu.models.motion.raft3d import RAFT3D
from codd_tpu.models.fusion.fusion import Fusion

H, W = 384, 1280
rng = np.random.RandomState(0)


def _img(h, w, c=3):
    return jnp.asarray(rng.rand(1, h, w, c).astype(np.float32))


def main(bf16=False, only=None):
    dt = jnp.bfloat16 if bf16 else jnp.float32
    tag = "bf16" if bf16 else "f32"

    def want(name):
        return only is None or name in only

    def cast(t):
        return jax.tree.map(lambda x: x.astype(dt)
                            if hasattr(x, "dtype") and x.dtype == jnp.float32
                            else x, t)

    # ---- stereo ----
    l, r = _img(H, W), _img(H, W)
    l, r = cast(l), cast(r)
    if want("stereo"):
        stereo = HITNetStereo(max_disp=320)
        sp = jax.jit(stereo.init)(jax.random.PRNGKey(0), _img(64, 128),
                                  _img(64, 128))
        sp = cast(sp)
        f = lambda a, b: stereo.apply(sp, a, b, train=False)["pred_disp"]
        print(f"stereo {tag}: {chain_time(f, (l, r), k=4):.1f} ms", flush=True)

    # ---- raft encode (frame-0 cache path) ----
    if want("raft") or want("encode"):
        raft = RAFT3D(iters=16)
        rp = jax.jit(raft.init)(
            jax.random.PRNGKey(0), _img(64, 128), jnp.zeros((1, 64, 128)),
            jnp.zeros((1, 64, 128)), jnp.asarray([[450.0, 450, 64, 32]]),
            jnp.zeros((1, 8, 16, 128)), jnp.zeros((1, 8, 16, 512)))
        rp = cast(rp)
        enc = lambda im: raft.apply(rp, im, method=RAFT3D.encode)[0]
    if want("encode"):
        print(f"raft.encode {tag}: {chain_time(enc, (l,), k=4):.1f} ms",
              flush=True)

    # ---- raft full (16 GN iters) ----
    if want("raft"):
        disp = jnp.asarray((rng.rand(1, H, W) * 60 + 2).astype(np.float32))
        intr = jnp.asarray([[450.0, 450.0, W / 2, H / 2]], jnp.float32)

        def raft_full(im, dp, dc):
            fm, ni = raft.apply(rp, im, method=RAFT3D.encode)
            out, _, _ = raft.apply(rp, im, dp, dc, intr, fm, ni)
            return out["Ts"]

        dpp = cast(210.0 / disp)
        print(f"raft full {tag}: "
              f"{chain_time(raft_full, (l, dpp, dpp), k=3):.1f} ms",
              flush=True)

    if not want("fusion"):
        return
    # ---- fusion ----
    fus = Fusion(in_channels=24, fusion_channel=32)
    h4, w4 = H // 4, W // 4
    fl = jnp.asarray(rng.rand(1, h4, w4, 24).astype(np.float32))
    fr = jnp.asarray(rng.rand(1, h4, w4, 24).astype(np.float32))
    pc = jnp.asarray(rng.rand(1, H, W, 1).astype(np.float32) * 50)
    pw = jnp.asarray(rng.rand(1, H, W, 1).astype(np.float32) * 50)
    fw = jnp.asarray(rng.rand(1, h4, w4, 32).astype(np.float32))
    flow = jnp.asarray(rng.rand(1, H, W, 3).astype(np.float32))
    conf = jnp.asarray(rng.rand(1, H, W, 3).astype(np.float32))
    fp = jax.jit(fus.init)(jax.random.PRNGKey(0), pc[:, :64, :128],
                           pw[:, :64, :128], fw[:, :16, :32], fw[:, :16, :32],
                           flow[:, :64, :128], conf[:, :64, :128],
                           fl[:, :16, :32], fr[:, :16, :32])
    fp = cast(fp)
    args = cast((pc, pw, fw, fw, flow, conf, fl, fr))

    def fuse(*a):
        return fus.apply(fp, *a)[0]

    print(f"fusion {tag}: {chain_time(fuse, args, k=4):.1f} ms", flush=True)


if __name__ == "__main__":
    only = [a for a in sys.argv[1:] if not a.startswith("--")] or None
    main(bf16="--bf16" in sys.argv, only=only)
