"""Attribute the splat post-sort pipeline cost (the 'scan/cumsum/sort2'
~24 ms bucket, BENCH_NOTES r3 profile) section by section at the full-res
production shape, and rank cumsum reformulations.

Sections of ops/splat._splat_one_gather (KITTI full-res: N = 491k points,
K = 4 taps, M = 2.45M rows, C+2 = 8 payload channels):
  cummax     run-start index scan (rank computation)
  segscan    2-operand segmented associative scan (transmittance)
  cumsum     global (M, 8) inclusive cumsum   [+ hierarchical variants]
  sort2      2-operand compaction sort
  take_S     (npix,) row gather of (M, 8) cumsum rows
  take_feat  (M,) row gather of (N, 6) feature rows

The hierarchical cumsum variants cut the log-pass count of the global
scan: a two-level (blocks x in-block) decomposition does cumsum over
axis=1 of (Mb, blk, 8) — XLA sees a much shorter scan axis — plus a tiny
block-offset cumsum and one fused broadcast add.  Exact same additions,
different grouping (allow ~1e-6 rel drift).

Timing: fori-chained single-dispatch with hard host-fetch sync (the only
trustworthy probe pattern through the axon tunnel — BENCH_NOTES).
Run SOLO on the chip.
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

from codd_tpu.ops.splat import _seg_add  # noqa: E402

H, W = 384, 1280
N = H * W
K = 4
C = 6
NPIX = H * W
M = K * N + NPIX


def chain(fn, x, extras=(), k=8):
    """fn(x, *extras) -> scalar; fori-chained k-dispatch, hard sync."""

    @jax.jit
    def run(x):
        def body(i, c):
            p, acc = c
            out = fn(p, *extras)
            return (p + (out * 0).astype(p.dtype), acc + out)
        return jax.lax.fori_loop(0, k, body, (x, jnp.float32(0)))[1]

    _ = float(np.asarray(run(x)))
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        _ = float(np.asarray(run(x)))
        best = min(best, (time.perf_counter() - t0) / k)
    return best * 1e3


def cs2(x, blk=2048):
    Mx = x.shape[0]
    Mp = -(-Mx // blk) * blk
    xp = jnp.pad(x, ((0, Mp - Mx), (0, 0))).reshape(-1, blk, x.shape[1])
    intra = jnp.cumsum(xp, axis=1)
    offs = jnp.cumsum(intra[:, -1], axis=0)
    offs = jnp.concatenate(
        [jnp.zeros((1, x.shape[1]), x.dtype), offs[:-1]], 0)
    return (intra + offs[:, None, :]).reshape(Mp, -1)[:Mx]


def cs3(x, b1=128, b2=128):
    Mx = x.shape[0]
    blk = b1 * b2
    Mp = -(-Mx // blk) * blk
    xp = jnp.pad(x, ((0, Mp - Mx), (0, 0))).reshape(-1, b1, b2, x.shape[1])
    intra = jnp.cumsum(xp, axis=2)
    mid = jnp.cumsum(intra[:, :, -1], axis=1)
    midx = jnp.concatenate([jnp.zeros_like(mid[:, :1]), mid[:, :-1]], 1)
    top = jnp.cumsum(mid[:, -1], axis=0)
    topx = jnp.concatenate([jnp.zeros_like(top[:1]), top[:-1]], 0)
    out = intra + midx[:, :, None, :] + topx[:, None, None, :]
    return out.reshape(Mp, -1)[:Mx]


def main():
    rng = np.random.RandomState(0)
    alpha = jnp.asarray(rng.rand(M).astype(np.float32) * 0.9)
    fid = jnp.asarray(rng.randint(0, N, size=(M,)).astype(np.uint32))
    stacked = jnp.asarray(rng.rand(M, C + 2).astype(np.float32))
    feats = jnp.asarray(rng.rand(N, C).astype(np.float32))
    pid_s = jnp.sort(jnp.asarray(
        rng.randint(0, NPIX, size=(M,)).astype(np.int32)))

    print(f"shapes: M={M} N={N} npix={NPIX} C+2={C + 2}", flush=True)

    def rank_of(p):
        pos = jnp.arange(M)
        start = jnp.concatenate([jnp.ones((1,), bool), p[1:] != p[:-1]])
        seg_start = jax.lax.cummax(jnp.where(start, pos, 0))
        return (pos - seg_start).sum().astype(jnp.float32)

    print(f"cummax rank:            {chain(rank_of, pid_s):7.2f} ms",
          flush=True)

    def segscan(p, a):
        start = jnp.concatenate([jnp.ones((1,), bool), p[1:] != p[:-1]])
        log_t = jnp.log1p(-jnp.clip(a, 0, 1 - 1e-4))
        _, s = jax.lax.associative_scan(_seg_add, (start, log_t))
        return s.sum()

    print(f"segscan (2-op):         {chain(segscan, pid_s, (alpha,)):7.2f}"
          " ms", flush=True)

    print(f"cumsum flat (M,8):      "
          f"{chain(lambda x: jnp.cumsum(x, 0)[-1].sum(), stacked):7.2f} ms",
          flush=True)
    print(f"cumsum 2level blk2048:  "
          f"{chain(lambda x: cs2(x)[-1].sum(), stacked):7.2f} ms",
          flush=True)
    print(f"cumsum 2level blk8192:  "
          f"{chain(lambda x: cs2(x, 8192)[-1].sum(), stacked):7.2f} ms",
          flush=True)
    print(f"cumsum 3level 128x128:  "
          f"{chain(lambda x: cs3(x)[-1].sum(), stacked):7.2f} ms",
          flush=True)

    ref = np.asarray(jnp.cumsum(stacked, axis=0))
    for name, fn in (("2level", cs2), ("3level", cs3)):
        got = np.asarray(fn(stacked))
        rel = np.max(np.abs(got - ref) / (np.abs(ref) + 1))
        print(f"parity {name}: rel {rel:.2e}", flush=True)

    def sort2(f):
        k2, pos = jax.lax.sort(
            (f, jnp.arange(M, dtype=jnp.uint32)), dimension=0, num_keys=1,
            is_stable=False)
        return pos[:NPIX].sum().astype(jnp.float32)

    print(f"sort2 (2-op):           {chain(sort2, fid):7.2f} ms", flush=True)

    def take_s(x, p):
        return jnp.take(x, p[:NPIX], axis=0).sum()

    print(f"take_S (npix of M,8):   "
          f"{chain(take_s, stacked, (pid_s,)):7.2f} ms", flush=True)

    def take_f(f, i):
        return jnp.take(f, i.astype(jnp.int32), axis=0).sum()

    print(f"take_feat (M of N,6):   "
          f"{chain(take_f, feats, (fid,)):7.2f} ms", flush=True)


if __name__ == "__main__":
    main()
