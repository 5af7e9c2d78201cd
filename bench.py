"""Throughput benchmark — the reference benchmark_speed.py equivalent,
run at KITTI resolution on the real chip.

Reference protocol (benchmark_speed.py:36-65): synthetic input, warmup,
timed loop, prints overall FPS.  Note the reference resets state every call
so it only ever measures the frame-0 path; we report the *streaming* frame
step (full stereo -> motion -> fusion cascade, the honest online metric)
as the headline number.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
Baseline: 60 FPS/chip at KITTI 1242x375 (BASELINE.md driver target).
"""

import argparse
import json
import os
import time

import numpy as np

import jax

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.abspath(__file__)),
                               ".jax_cache"))
import jax.numpy as jnp


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--height", type=int, default=384)   # 375 padded to /64
    p.add_argument("--width", type=int, default=1280)   # 1242 padded to /64
    p.add_argument("--iters", type=int, default=50)
    p.add_argument("--warmup", type=int, default=5)
    p.add_argument("--gn-iters", type=int, default=16)
    p.add_argument("--max-disp", type=int, default=320)
    p.add_argument("--mode", choices=["streaming", "frame0"],
                   default="streaming")
    p.add_argument("--batch", type=int, default=1,
                   help="independent concurrent streams (serving "
                        "throughput); metric reports aggregate frames/s")
    p.add_argument("--bf16", action="store_true",
                   help="cast params/inputs to bfloat16")
    p.add_argument("--splat-impl", default="xla_gather",
                   help="full-res splat backend (ops.splat impls)")
    p.add_argument("--splat-impl-lr", default="",
                   help="quarter-res splat backend ('' = same)")
    p.add_argument("--init-cost", default="auto",
                   help="stereo init-cost variant (auto/unrolled/map/"
                        "phases)")
    p.add_argument("--tile-warp", default="auto",
                   help="stereo propagation warp variant (auto/exact/"
                        "tilewin)")
    p.add_argument("--corr-impl", default="auto",
                   help="corr pyramid/lookup path (ops.corr impls: auto, "
                        "patch, volume, volume_pallas, volume_reduce)")
    p.add_argument("--gn-impl", default="auto",
                   help="GN aggregation path (ops.gn build_system impls)")
    p.add_argument("--gn-unroll", type=int, default=1,
                   help="eval GN scan unroll factor (divisor of gn-iters; "
                        "fuses across iteration boundaries)")
    p.add_argument("--gn-bf16", action="store_true",
                   help="bf16 GN attention scores (halves score HBM)")
    p.add_argument("--profile-dir", default=None,
                   help="capture a jax.profiler trace of the timed loop")
    args = p.parse_args()

    from codd_tpu.models.codd import CODD
    from codd_tpu.ops.gn import resolve_impl as resolve_gn_impl

    H, W = args.height, args.width
    B = args.batch
    gn_resolved = resolve_gn_impl(args.gn_impl, 32, W // 8)
    if args.gn_bf16 and gn_resolved == "dense":
        print(f"WARNING: --gn-bf16 is a no-op: gn impl resolves to 'dense' "
              f"at this shape (W/8={W // 8}); bf16 scores apply only to the "
              f"windowed/pallas paths", flush=True)
    model = CODD(max_disp=args.max_disp, iters=args.gn_iters,
                 splat_impl=args.splat_impl, splat_impl_lr=args.splat_impl_lr,
                 gn_impl=args.gn_impl, gn_bf16_scores=args.gn_bf16,
                 corr_impl=args.corr_impl, gn_unroll=args.gn_unroll,
                 tile_warp_variant=args.tile_warp,
                 init_cost_variant=args.init_cost)
    rng = np.random.RandomState(0)
    # rotate through distinct synthetic frames so no layer of the stack can
    # dedup identical executions
    NBUF = 8
    lbuf = [jnp.asarray(rng.rand(B, H, W, 3).astype(np.float32))
            for _ in range(NBUF)]
    rbuf = [jnp.asarray(rng.rand(B, H, W, 3).astype(np.float32))
            for _ in range(NBUF)]
    left = jnp.stack([lbuf[0], lbuf[1]], axis=1)
    right = jnp.stack([rbuf[0], rbuf[1]], axis=1)
    intr = jnp.asarray([[450.0, 450.0, W / 2.0, H / 2.0]] * B, jnp.float32)

    # params are resolution-independent (all-conv): init at a small size to
    # keep the init trace cheap, then apply at the benchmark resolution
    params = jax.jit(model.init)(
        jax.random.PRNGKey(0),
        jnp.zeros((1, 2, 64, 128, 3)), jnp.zeros((1, 2, 64, 128, 3)),
        jnp.asarray([[450.0, 450.0, 64.0, 32.0]], jnp.float32))

    if args.bf16:
        from codd_tpu.utils.precision import cast_floats
        params = cast_floats(params)
        left, right = cast_floats(left), cast_floats(right)
        lbuf = [cast_floats(x) for x in lbuf]
        rbuf = [cast_floats(x) for x in rbuf]

    first = jax.jit(lambda p, l, r, k: model.apply(p, l, r, k,
                                                   method=CODD.first_step))
    # carry donation re-validated FINITE on the current axon runtime
    # (scripts/repro_donation.py --carry, 2026-08-19) — the old-carry
    # buffers alias the new carry instead of being copied each frame
    step = jax.jit(lambda p, c, l, r, k: model.apply(p, c, l, r, k,
                                                     method=CODD.step),
                   donate_argnums=(1,))

    carry, _ = first(params, left[:, 0], right[:, 0], intr)
    carry = jax.block_until_ready(carry)

    if args.mode == "frame0":
        def run(c, i):
            nc, out = first(params, lbuf[i % NBUF], rbuf[i % NBUF], intr)
            return nc, out["pred_disp"]
    else:
        def run(c, i):
            nc, out = step(params, c, lbuf[i % NBUF], rbuf[i % NBUF], intr)
            return nc, out["pred_disp"]

    def hard_sync(x):
        # block_until_ready is unreliable through the axon tunnel (returns
        # at schedule time); a host fetch of a value dependent on the whole
        # chain is the only trustworthy sync
        return float(np.asarray(x[0, 0, 0, 0]))

    for i in range(args.warmup):
        carry, disp = run(carry, i)
    hard_sync(disp)

    if args.profile_dir:
        with jax.profiler.trace(args.profile_dir):
            for i in range(3):
                carry, disp = run(carry, i)
            hard_sync(disp)

    t0 = time.perf_counter()
    for i in range(args.iters):
        carry, disp = run(carry, i)
    hard_sync(disp)
    dt = time.perf_counter() - t0

    fps = args.iters * B / dt
    name = (f"fps_{args.mode}_kitti_{H}x{W}" if B == 1 else
            f"fps_{args.mode}_b{B}_kitti_{H}x{W}")
    print(json.dumps({
        "metric": name,
        "value": round(fps, 3),
        "unit": "fps",
        "vs_baseline": round(fps / 60.0, 4),
    }))


if __name__ == "__main__":
    main()
