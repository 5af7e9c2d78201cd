"""Round-3 per-component profile of the 192 ms streaming step (KITTI res).

Methodology: fori_loop-chained single-dispatch timing with a data
dependency between iterations + hard host-fetch sync (the only pattern
that measures compute, not dispatch, through the axon tunnel — see
BENCH_NOTES.md measurement-integrity note).

Usage: python scripts/profile_r3.py <component> [--bf16]
  component in: stereo raft splat_full splat_full_xla splat_full_pallas
                splat_quarter corr gn fusion
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

H, W = 384, 1280
ITERS = 8
rng = np.random.RandomState(0)
comp = sys.argv[1]
bf16 = "--bf16" in sys.argv
dt_ = jnp.bfloat16 if bf16 else jnp.float32


def img(h, w, c=3):
    return jnp.asarray(rng.rand(1, h, w, c).astype(np.float32)).astype(dt_)


def run(chain, *args):
    t0 = time.perf_counter()
    acc = chain(*args)
    acc = float(np.asarray(acc))
    print(f"[compile+first {time.perf_counter()-t0:.0f}s] acc={acc:.4f}",
          flush=True)
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        acc = float(np.asarray(chain(*args)))
        best = min(best, (time.perf_counter() - t0) / ITERS)
    tag = "bf16" if bf16 else "f32"
    print(f"{comp} {tag}: {best*1e3:.1f} ms/frame")


if comp == "stereo":
    from codd_tpu.models.stereo.hitnet import HITNetStereo
    stereo = HITNetStereo(max_disp=320)
    sp = jax.jit(stereo.init)(jax.random.PRNGKey(0),
                              jnp.zeros((1, 64, 128, 3)),
                              jnp.zeros((1, 64, 128, 3)))
    if bf16:
        from codd_tpu.utils.precision import cast_floats
        sp = cast_floats(sp)
    l, r = img(H, W), img(H, W)

    @jax.jit
    def chain(l, r):
        def body(i, c):
            x, acc = c
            d = stereo.apply(sp, x, r, train=False)["pred_disp"]
            return (l + (d.mean() * 1e-6).astype(l.dtype),
                    acc + d[0, 0, 0, 0].astype(jnp.float32))
        return jax.lax.fori_loop(0, ITERS, body, (l, jnp.float32(0)))[1]

    run(chain, l, r)

elif comp == "raft":
    from codd_tpu.models.motion.raft3d import RAFT3D
    model = RAFT3D(iters=16)
    image = img(H, W)
    depth_prev = (jnp.asarray(rng.uniform(2, 40, (1, H, W))
                              .astype(np.float32))).astype(dt_)
    depth_curr = depth_prev + 0.1
    intr = jnp.asarray([[450.0, 450.0, W / 2, H / 2]], jnp.float32)
    fmap = img(H // 8, W // 8, 128)
    netinp = img(H // 8, W // 8, 512)
    params = jax.jit(model.init)(
        jax.random.PRNGKey(0), jnp.zeros((1, 64, 128, 3)),
        jnp.zeros((1, 64, 128)), jnp.zeros((1, 64, 128)),
        intr, jnp.zeros((1, 8, 16, 128)), jnp.zeros((1, 8, 16, 512)))
    if bf16:
        from codd_tpu.utils.precision import cast_floats
        params = cast_floats(params)

    @jax.jit
    def chain(image, depth_prev):
        def body(i, c):
            x, acc = c
            out, fm, ni = model.apply(params, x, depth_prev,
                                      depth_prev + 0.1, intr, fmap, netinp,
                                      train_mode=False)
            w = out["weight"]
            return (image + (w.mean() * 1e-6).astype(image.dtype),
                    acc + w[0, 0, 0, 0].astype(jnp.float32))
        return jax.lax.fori_loop(0, ITERS, body,
                                 (image, jnp.float32(0)))[1]

    run(chain, image, depth_prev)

elif comp.startswith("splat"):
    from codd_tpu.ops.splat import splat_render
    if comp.startswith("splat_full"):
        h, w, C, radius = H, W, 6, 1.0
    else:
        h, w, C, radius = H // 4, W // 4, 32, 2.0
    impl = ("xla" if comp.endswith("_xla")
            else "pallas" if comp.endswith("_pallas") else "xla_gather")
    N = h * w
    pts = jnp.asarray(
        np.stack([rng.uniform(-2, 2, N), rng.uniform(-1, 1, N),
                  rng.uniform(2, 40, N)], -1)[None].astype(np.float32))
    feats = jnp.asarray(rng.rand(1, N, C).astype(np.float32)).astype(dt_)
    intr = jnp.asarray([[450.0, 450.0, w / 2, h / 2]], jnp.float32)

    @jax.jit
    def chain(pts, feats):
        def body(i, c):
            p, acc = c
            out, zb = splat_render(p, feats, intr, H=h, W=w,
                                   radius_px=radius, impl=impl)
            return (pts + (zb.mean() * 1e-7).astype(pts.dtype),
                    acc + out[0, 0, 0, 0].astype(jnp.float32))
        return jax.lax.fori_loop(0, ITERS, body, (pts, jnp.float32(0)))[1]

    run(chain, pts, feats)

elif comp == "corr":
    from codd_tpu.ops import corr as corr_ops
    h8, w8 = H // 8, W // 8
    f1 = img(h8, w8, 128)
    f2 = img(h8, w8, 128)
    coords = jnp.asarray(
        np.stack(np.meshgrid(np.arange(w8), np.arange(h8)), -1)[None]
        .astype(np.float32))

    @jax.jit
    def chain(f1, f2):
        pyr = corr_ops.build_corr_pyramid(f1, f2, 4)

        def body(i, c):
            crd, acc = c
            o = corr_ops.corr_lookup(pyr, crd, 3)
            return (coords + (o.mean() * 1e-6).astype(coords.dtype),
                    acc + o[0, 0, 0, 0].astype(jnp.float32))
        # 16 lookups = one frame's GN loop worth
        return jax.lax.fori_loop(0, 16 * ITERS, body,
                                 (coords, jnp.float32(0)))[1]

    run(chain, f1, f2)

elif comp == "gn":
    from codd_tpu.ops import se3
    from codd_tpu.ops.gn import gn_step
    h8, w8 = H // 8, W // 8
    Ts = se3.identity((1, h8, w8))
    ae = img(h8, w8, 16).astype(jnp.float32)
    target = jnp.asarray(
        rng.rand(1, h8, w8, 3).astype(np.float32))
    weight = jnp.asarray(
        rng.rand(1, h8, w8, 3).astype(np.float32))
    depth = jnp.asarray(rng.uniform(2, 40, (1, h8, w8)).astype(np.float32))
    intr8 = jnp.asarray([[56.0, 56.0, w8 / 2, h8 / 2]], jnp.float32)

    @jax.jit
    def chain(Ts, ae):
        def body(i, c):
            T, acc = c
            T2 = gn_step(T, ae, target, weight, depth, intr8)
            return (T2, acc + T2[0, 0, 0, 0].astype(jnp.float32))
        return jax.lax.fori_loop(0, 16 * ITERS, body,
                                 (Ts, jnp.float32(0)))[1]

    run(chain, Ts, ae)

elif comp == "fusion":
    from codd_tpu.models.fusion.fusion import Fusion
    fusion = Fusion()
    pred = jnp.asarray(rng.uniform(1, 100, (1, H, W, 1)).astype(np.float32))
    warp = pred + 1.0
    featc = img(H // 4, W // 4, 24)
    featw = img(H // 4, W // 4, 32)
    floww = img(H, W, 3)
    confw = img(H, W, 3)
    fl = img(H // 4, W // 4, 24)
    fr = img(H // 4, W // 4, 24)
    fp = jax.jit(fusion.init)(
        jax.random.PRNGKey(0), jnp.zeros((1, 64, 128, 1)),
        jnp.zeros((1, 64, 128, 1)), jnp.zeros((1, 16, 32, 24)),
        jnp.zeros((1, 16, 32, 32)), jnp.zeros((1, 64, 128, 3)),
        jnp.zeros((1, 64, 128, 3)), jnp.zeros((1, 16, 32, 24)),
        jnp.zeros((1, 16, 32, 24)))
    if bf16:
        from codd_tpu.utils.precision import cast_floats
        fp = cast_floats(fp)
        pred, warp = pred.astype(dt_), warp.astype(dt_)

    @jax.jit
    def chain(pred, warp):
        def body(i, c):
            p, acc = c
            d, wf, wr = fusion.apply(fp, p, warp, featc, featw, floww,
                                     confw, fl, fr)
            return (pred + (d.mean() * 1e-6).astype(pred.dtype),
                    acc + d[0, 0, 0, 0].astype(jnp.float32))
        return jax.lax.fori_loop(0, ITERS, body, (pred, jnp.float32(0)))[1]

    run(chain, pred, warp)

else:
    raise SystemExit(f"unknown component {comp}")
