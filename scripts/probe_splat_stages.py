"""Stage-level breakdown of the inference splat (_splat_one_gather) at the
full-res production shape: fragment projection -> sort1 -> segmented scan
-> cumsum(+feat gather) -> compaction sort2.  Times CUMULATIVE prefixes of
the pipeline with the fori-chain hard-sync pattern; stage costs are the
differences.

Usage: python scripts/probe_splat_stages.py [--height H] [--width W]
"""
import argparse
import math
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

from codd_tpu.ops.splat import (_project_fragments, _quantize_z,  # noqa: E402
                                _seg_add)


def make_prefix(stage, H, W, radius_px=1.0, points_per_pixel=8):
    K = (2 * int(math.ceil(radius_px))) ** 2
    npix = H * W
    f32 = jnp.float32

    def fn(points, features, intrinsics):
        N, C = features.shape
        pid, alpha, zfrag, _, Z = _project_fragments(
            points, features, intrinsics, H, W, radius_px, 0.0,
            npix, materialize_features=False)
        if stage == "project":
            return alpha.sum() + pid.sum()

        z_bits = 32 - int(npix + 1).bit_length()
        zq = _quantize_z(Z, z_bits)
        zmask = jnp.uint32((1 << z_bits) - 1)
        key = (pid.astype(jnp.uint32) << z_bits) | jnp.broadcast_to(
            zq[:, None], (N, K)).reshape(-1)
        key = jnp.concatenate([
            key, (jnp.arange(npix, dtype=jnp.uint32) << z_bits) | zmask])
        alpha = jnp.concatenate([alpha, jnp.zeros((npix,), f32)])
        zfrag = jnp.concatenate([zfrag, jnp.zeros((npix,), f32)])
        fid = jnp.concatenate([jnp.arange(N * K, dtype=jnp.uint32),
                               jnp.zeros((npix,), jnp.uint32)])
        key_s, alpha_s, z_s, fid_s = jax.lax.sort(
            (key, alpha, zfrag, fid), dimension=0, num_keys=1,
            is_stable=False)
        if stage == "sort1":
            return alpha_s.sum() + key_s[-1].astype(f32)

        M = key_s.shape[0]
        pid_s = (key_s >> z_bits).astype(jnp.int32)
        real = (pid_s < npix) & (alpha_s > 0)
        pos = jnp.arange(M)
        start = jnp.concatenate([jnp.ones((1,), bool),
                                 pid_s[1:] != pid_s[:-1]])
        seg_start = jax.lax.cummax(jnp.where(start, pos, 0))
        rank = pos - seg_start
        log_t = jnp.log1p(-alpha_s)
        _, seg_incl = jax.lax.associative_scan(_seg_add, (start, log_t))
        transmittance = jnp.exp(seg_incl - log_t)
        wgt = (alpha_s * transmittance
               * (rank < points_per_pixel) * real).astype(f32)
        if stage == "scan":
            return wgt.sum()

        feat_s = jnp.take(features, (fid_s // K).astype(jnp.int32), axis=0)
        zhead = jnp.where(start & real, z_s, 0.0)[:, None]
        cnt = real.astype(f32)[:, None]
        stacked = jnp.concatenate([feat_s * wgt[:, None], zhead, cnt],
                                  axis=-1)
        S = jnp.cumsum(stacked, axis=0)
        if stage == "cumsum":
            return S[-1].sum()

        is_end = jnp.concatenate([pid_s[1:] != pid_s[:-1],
                                  jnp.ones((1,), bool)])
        key2 = jnp.where(is_end, pid_s, npix)
        _, pos_end = jax.lax.sort(
            (key2, jnp.arange(M, dtype=jnp.uint32)),
            dimension=0, num_keys=1, is_stable=False)
        S_end = jnp.take(S, pos_end[:npix].astype(jnp.int32), axis=0)
        S_prevend = jnp.concatenate(
            [jnp.zeros((1, S.shape[1]), f32), S_end[:-1]], axis=0)
        totals = S_end - S_prevend
        return totals.sum()

    return fn


def chain(fn, points, features, intr, k=8):
    @jax.jit
    def run(points):
        def body(i, c):
            p, acc = c
            out = fn(p, features, intr)
            return (p + (out * 0).astype(p.dtype), acc + out)
        return jax.lax.fori_loop(0, k, body, (points, jnp.float32(0)))[1]

    _ = float(np.asarray(run(points)))
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        _ = float(np.asarray(run(points)))
        best = min(best, (time.perf_counter() - t0) / k)
    return best * 1e3


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--height", type=int, default=384)
    p.add_argument("--width", type=int, default=1280)
    p.add_argument("--channels", type=int, default=6)
    args = p.parse_args()
    H, W, C = args.height, args.width, args.channels

    rng = np.random.RandomState(0)
    N = H * W
    Z = (1.0 + rng.rand(N) * 50).astype(np.float32)
    px = rng.uniform(-2, W + 2, N).astype(np.float32)
    py = rng.uniform(-2, H + 2, N).astype(np.float32)
    fx = fy = 450.0
    cx, cy = W / 2, H / 2
    pts = jnp.asarray(np.stack([(px - cx) / fx * Z, (py - cy) / fy * Z, Z],
                               -1))
    feats = jnp.asarray(rng.rand(N, C).astype(np.float32))
    intr = jnp.asarray([fx, fy, cx, cy], jnp.float32)

    prev = 0.0
    for stage in ("project", "sort1", "scan", "cumsum", "full"):
        ms = chain(make_prefix(stage, H, W), pts, feats, intr)
        print(f"{stage:8s}: cumulative {ms:7.2f} ms  (+{ms - prev:6.2f})",
              flush=True)
        prev = ms


if __name__ == "__main__":
    main()
