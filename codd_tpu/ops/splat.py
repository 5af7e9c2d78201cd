"""Z-buffered point splatting (forward warping) — the TPU re-design of the
pytorch3d point renderer used by the motion module (reference:
model/motion/motion.py:22-42,82-130).

Semantics reproduced:
  * every 3-D point projects into the image; it covers the pixels whose
    centers lie within ``radius_px`` of the projection,
  * per covered pixel the point contributes alpha = 1 - d^2/r^2,
  * fragments on a pixel are alpha-composited front-to-back in depth order
    (nearest surface dominates; up to ``points_per_pixel`` fragments),
  * the returned zbuf is the depth of the nearest fragment (0 where empty).

TPU formulation — **no scatter anywhere** (TPU scatters serialize: a 4M-row
segment_sum measures ~650 ms even with sorted indices; sorts run ~20 ns/el):
  1. fragments = (point, footprint-tap) pairs over the tight
     floor-based (2*ceil(r))^2 footprint, plus one zero-alpha dummy
     fragment per pixel so every pixel owns a run;
  2. one lexicographic sort by (pixel, z) orders fragments;
  3. per-run transmittance = exclusive segment cumsum in log space
     (global cumsum + gather of the run-start base);
  4. per-pixel composite = difference of the global inclusive cumsum at
     run boundaries;
  5. run-end positions compact to dense pixel order with a second (cheap,
     2-operand) sort, and one wide row-gather produces the images.

Everything is jnp; XLA differentiates it (sorts/gathers have VJPs).

Known divergence from the reference (documented, intentional): pytorch3d's
screen-space convention puts pixel centers at half-integer coordinates,
which shifts the reference's splats by 0.5 px relative to its own
``inv_project`` grid.  We keep pixel centers at integers so forward and
backward warps are mutually consistent.
"""

from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp

__all__ = ["splat_render"]


def _quantize_z(z, z_bits):
    """Monotone ``z_bits``-bit key for positive depths: the top bits of the
    f32 encoding (bit patterns of positive floats are ordered).  Finite
    positive z never reaches the all-ones code, which is kept for dummies."""
    bits = jax.lax.bitcast_convert_type(z.astype(jnp.float32), jnp.uint32)
    return bits >> (32 - z_bits)


def _splat_one(points, features, intrinsics, H, W, radius_px,
               points_per_pixel):
    """points: (N,3), features: (N,C), intrinsics: (4,)."""
    out_dtype = features.dtype
    # compositing math is precision-critical: bf16 rounds the alpha clip
    # (1 - 1e-4) to exactly 1.0, making log1p(-alpha) = -inf
    points = points.astype(jnp.float32)
    features = features.astype(jnp.float32)
    intrinsics = intrinsics.astype(jnp.float32)
    N, C = features.shape
    R = int(math.ceil(radius_px))
    K = (2 * R) ** 2
    npix = H * W
    f32 = jnp.float32

    fx, fy, cx, cy = intrinsics
    X, Y, Z = points[:, 0], points[:, 1], points[:, 2]
    zvalid = Z > 1e-4
    zs = jnp.where(zvalid, Z, 1.0)
    x = fx * (X / zs) + cx
    y = fy * (Y / zs) + cy

    # floor-based footprint: taps floor(p) + {-(R-1) .. R} cover every
    # integer tap within euclidean distance < R of the projection
    offs = jnp.arange(-(R - 1), R + 1)
    dy, dx = jnp.meshgrid(offs, offs, indexing="ij")
    dx = dx.reshape(-1)
    dy = dy.reshape(-1)
    bx = jnp.floor(x).astype(jnp.int32)
    by = jnp.floor(y).astype(jnp.int32)
    px = bx[:, None] + dx[None, :]  # (N,K)
    py = by[:, None] + dy[None, :]

    d2 = (px.astype(f32) - x[:, None]) ** 2 + (py.astype(f32) - y[:, None]) ** 2
    alpha = 1.0 - d2 / (radius_px * radius_px)
    ok = ((alpha > 0) & (px >= 0) & (px < W) & (py >= 0) & (py < H)
          & zvalid[:, None])
    pid = jnp.where(ok, py * W + px, npix).reshape(-1)
    alpha = jnp.clip(alpha, 0.0, 1.0 - 1e-4).reshape(-1)

    # ---- single-key packed sort ----
    # key = pid (high bits) | quantized-z (low bits).  z quantization only
    # affects the z-ORDER of fragments on the same pixel (ties break
    # arbitrarily for near-equal depths); exact z and alpha are
    # reconstructed after the sort from the packed (point, tap) payload.
    # Halving the sort operands matters: sorting is the splat's main cost.
    z_bits = 32 - int(npix + 1).bit_length()
    assert z_bits >= 8, "image too large for packed splat keys"
    zq = _quantize_z(Z, z_bits)  # monotone in Z, < all-ones for finite z
    zmask = jnp.uint32((1 << z_bits) - 1)
    key = (pid.astype(jnp.uint32) << z_bits) | jnp.broadcast_to(
        zq[:, None], (N, K)).reshape(-1)
    payload = (jnp.broadcast_to(
        jnp.arange(N, dtype=jnp.int32)[:, None] * K, (N, K))
        + jnp.arange(K, dtype=jnp.int32)[None, :]).reshape(-1)

    # dummy fragment per pixel: guarantees every pid owns a run
    key = jnp.concatenate([
        key,
        (jnp.arange(npix, dtype=jnp.uint32) << z_bits) | zmask])
    payload = jnp.concatenate([payload, jnp.full((npix,), -1, jnp.int32)])

    key_s, payload_s = jax.lax.sort((key, payload), dimension=0, num_keys=1)
    M = key_s.shape[0]
    pid_s = (key_s >> z_bits).astype(jnp.int32)
    is_dummy = payload_s < 0
    src_s = jnp.where(is_dummy, 0, payload_s // K)
    tap_s = jnp.where(is_dummy, 0, payload_s % K)

    # reconstruct exact z and alpha from the source points
    pt = jnp.take(jnp.stack([x, y, Z], -1), src_s, axis=0)  # (M, 3) rows
    # tap offsets from arithmetic on the packed tap id (no tiny-table gather)
    side = 2 * R
    tdx = tap_s % side - (R - 1)
    tdy = tap_s // side - (R - 1)
    tapx = jnp.floor(pt[:, 0]).astype(jnp.int32) + tdx
    tapy = jnp.floor(pt[:, 1]).astype(jnp.int32) + tdy
    d2_s = ((tapx.astype(f32) - pt[:, 0]) ** 2
            + (tapy.astype(f32) - pt[:, 1]) ** 2)
    alpha_s = jnp.where(
        is_dummy, 0.0,
        jnp.clip(1.0 - d2_s / (radius_px * radius_px), 0.0, 1.0 - 1e-4))
    z_s = pt[:, 2]
    real = (pid_s < npix) & (alpha_s > 0)

    pos = jnp.arange(M)
    start = jnp.concatenate([jnp.ones((1,), bool), pid_s[1:] != pid_s[:-1]])
    seg_start = jax.lax.cummax(jnp.where(start, pos, 0))
    rank = pos - seg_start

    # front-to-back transmittance (exclusive in-segment cumprod of 1-alpha)
    log_t = jnp.log1p(-alpha_s)
    csum = jnp.cumsum(log_t)
    excl = csum - log_t
    transmittance = jnp.exp(excl - jnp.take(excl, seg_start))

    wgt = (alpha_s * transmittance
           * (rank < points_per_pixel) * real).astype(f32)
    feat_s = jnp.take(features, src_s, axis=0)  # (M, C) wide row gather

    # channels to reduce per pixel: weighted features, nearest-z (only the
    # run head can carry it), and the real-fragment count (emptiness flag)
    zhead = jnp.where(start & real, z_s, 0.0)[:, None]
    cnt = real.astype(f32)[:, None]
    stacked = jnp.concatenate([feat_s * wgt[:, None], zhead, cnt], axis=-1)
    S = jnp.cumsum(stacked, axis=0)  # (M, C+2) global inclusive cumsum

    # run-end compaction: each pid owns exactly one run end; a 2-operand
    # sort brings the end positions into dense pixel order
    is_end = jnp.concatenate([pid_s[1:] != pid_s[:-1], jnp.ones((1,), bool)])
    key = jnp.where(is_end, pid_s, npix)
    _, end_pos = jax.lax.sort((key, pos.astype(jnp.int32)), dimension=0,
                              num_keys=1)
    end_pos = end_pos[:npix]  # (npix,) position of each pixel's run end

    S_end = jnp.take(S, end_pos, axis=0)                    # (npix, C+2)
    S_prevend = jnp.concatenate(
        [jnp.zeros((1, S.shape[1]), f32),
         jnp.take(S, end_pos[:-1], axis=0)], axis=0)
    # runs are contiguous in pid order, so prev pixel's end is this run's
    # exclusive base
    totals = S_end - S_prevend
    out = totals[:, :C].astype(out_dtype)
    zbuf = jnp.where(totals[:, C + 1] > 0, totals[:, C], 0.0).astype(out_dtype)

    return out.reshape(H, W, C), zbuf.reshape(H, W)


@partial(jax.jit, static_argnames=("H", "W", "radius_px", "points_per_pixel"))
def splat_render(points, features, intrinsics, H: int, W: int,
                 radius_px: float = 1.0, points_per_pixel: int = 8):
    """Render a batched point cloud into (features, zbuf) images.

    Args:
      points: (B, N, 3) camera-space points.
      features: (B, N, C).
      intrinsics: (B, 4) [fx, fy, cx, cy].
      H, W: output resolution.
      radius_px: splat radius in pixels (reference radius 2.0 NDC-per-h
        == 1 px at full res; 4.0 == 2 px at 1/4 res).

    Returns:
      (B, H, W, C) composited features, (B, H, W) nearest-surface depth
      (0 where nothing landed).
    """
    fn = lambda p, f, k: _splat_one(p, f, k, H, W, radius_px,
                                    points_per_pixel)
    return jax.vmap(fn)(points, features, intrinsics)
