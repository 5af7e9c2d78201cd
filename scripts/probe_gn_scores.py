"""GN aggregation f32-vs-bf16 scores, fori-chained single dispatch.

The windowed aggregation materializes a (B, h, nb, bs, h2, win) logits
tensor: (1, 48, 5, 32, 48, 96) = 35.4M elements = 141 MB f32 per GN
iteration; scores HBM dominates the ~23 ms GN share of the streaming step.
bf16 scores (`gn_bf16_scores` runtime flag) halve that traffic.

The GN iterations chain naturally (Ts_{i+1} = gn_step(Ts_i, ...)), so one
dispatch of ITERS iterations with a hard host fetch is the measurement —
`bench_util.chain_time` differencing is useless at this granularity
(returned negative ms under tunnel jitter).
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

from codd_tpu.ops import se3  # noqa: E402
from codd_tpu.ops.gn import gn_step  # noqa: E402

B, H, W = 1, 384, 1280
h8, w8 = H // 8, W // 8
ITERS = 64
rng = np.random.RandomState(0)

Ts0 = se3.identity((B, h8, w8), jnp.float32)
ae = jnp.asarray(rng.randn(B, h8, w8, 16).astype(np.float32))
target = jnp.asarray(rng.rand(B, h8, w8, 3).astype(np.float32))
weight = jnp.asarray(rng.rand(B, h8, w8, 3).astype(np.float32))
depth = jnp.asarray((rng.rand(B, h8, w8) * 20 + 1).astype(np.float32))
intr = jnp.asarray([[450.0 / 8, 450.0 / 8, W / 16, H / 16]], jnp.float32)


def run(impl, flag):
    @jax.jit
    def chain(Ts, ae):
        def body(i, Ts):
            return gn_step(Ts, ae + i * 1e-6, target, weight, depth, intr,
                           impl=impl, bf16_scores=flag)
        return jax.lax.fori_loop(0, ITERS, body, Ts)

    t0 = time.perf_counter()
    out = chain(Ts0, ae)
    s = float(np.asarray(out[0, 0, 0, 0]))
    print(f"  [compile+first {time.perf_counter()-t0:.0f}s] {s:.4f}",
          flush=True)
    for _ in range(3):
        t0 = time.perf_counter()
        out = chain(Ts0, ae)
        s = float(np.asarray(out[0, 0, 0, 0]))
        dt = time.perf_counter() - t0
        print(f"gn_step {impl} bf16_scores={flag}: "
              f"{dt/ITERS*1e3:.2f} ms/iter", flush=True)


cases = [("windowed", False), ("windowed", True),
         ("pallas_window", False), ("pallas_window", True)]
only = sys.argv[1:] if len(sys.argv) > 1 else None
for impl, flag in cases:
    if only and impl not in only:
        continue
    run(impl, flag)
