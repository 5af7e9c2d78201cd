#!/usr/bin/env python
"""Speed benchmark CLI (reference benchmark_speed.py equivalent).

Reference protocol (benchmark_speed.py:36-65): build the model from a model
config, feed synthetic 512x640 frames, 200 timed iterations after 5 warmup,
print "Overall fps".  Because the reference resets state every call, its
number measures the frame-0 path only; pass --streaming for the honest
full-cascade per-frame throughput (also the metric bench.py reports).
"""

import argparse
import time

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("config", nargs="?", default="configs/models/codd.py")
    p.add_argument("--height", type=int, default=512)
    p.add_argument("--width", type=int, default=640)
    p.add_argument("--iters", type=int, default=200)
    p.add_argument("--warmup", type=int, default=5)
    p.add_argument("--streaming", action="store_true")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from codd_tpu.config import load_config
    from codd_tpu.models.builder import build_estimator
    from codd_tpu.models.codd import CODD

    cfg = load_config(args.config)
    model = build_estimator(cfg["model"])
    H, W = args.height, args.width
    rng = np.random.RandomState(0)
    # rotate distinct input buffers so no layer of the stack can dedup
    # identical executions (same scheme as bench.py)
    NBUF = 8
    lbuf = [jnp.asarray(rng.rand(1, H, W, 3).astype(np.float32))
            for _ in range(NBUF)]
    rbuf = [jnp.asarray(rng.rand(1, H, W, 3).astype(np.float32))
            for _ in range(NBUF)]
    intr = jnp.asarray([[450.0, 450.0, W / 2, H / 2]], jnp.float32)
    params = jax.jit(model.init)(
        jax.random.PRNGKey(0), jnp.zeros((1, 2, 64, 128, 3)),
        jnp.zeros((1, 2, 64, 128, 3)),
        jnp.asarray([[450.0, 450.0, 64.0, 32.0]], jnp.float32))

    first = jax.jit(lambda p, a, b, k: model.apply(p, a, b, k,
                                                   method=CODD.first_step))
    step = jax.jit(lambda p, c, a, b, k: model.apply(p, c, a, b, k,
                                                     method=CODD.step))
    # (carry donation removed: input-output buffer aliasing corrupts
    # results on the current axon runtime — see trainer.py note)

    carry, out = first(params, lbuf[0], rbuf[0], intr)
    if args.streaming:
        run = lambda c, i: step(params, c, lbuf[i % NBUF], rbuf[i % NBUF],
                                intr)
    else:
        run = lambda c, i: first(params, lbuf[i % NBUF], rbuf[i % NBUF], intr)

    for i in range(args.warmup):
        carry, out = run(carry, i)
    float(np.asarray(out["pred_disp"][0, 0, 0, 0]))  # hard sync (axon
    # tunnel: block_until_ready returns at schedule time)

    t0 = time.perf_counter()
    for i in range(args.iters):
        carry, out = run(carry, i)
    float(np.asarray(out["pred_disp"][0, 0, 0, 0]))  # hard sync
    dt = time.perf_counter() - t0
    print(f"Overall fps: {args.iters / dt:.3f}")


if __name__ == "__main__":
    main()
