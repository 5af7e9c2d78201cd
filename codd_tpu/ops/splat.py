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

TPU formulation — **no scatter anywhere**:
  1. fragments = (point, footprint-tap) pairs over the tight floor-based
     (2*ceil(r))^2 footprint, plus one zero-alpha dummy fragment per pixel
     so every pixel owns a run;
  2. ONE flat 1-D sort keyed by packed (pixel, quantized-z) orders the
     fragments; only (alpha, z, source-point-id) ride through the sort as
     value operands — feature channels are row-gathered post-sort at the
     point id (a (N, C) row gather is cheaper than broadcasting C
     channels to all K taps and carrying them as sort operands).
     Fragments are built tap-major in (K, N) layout so the lane dim is
     the big N axis (the (N, K=4) layout padded 4 -> 128 lanes, 32x waste).
     Batched (2-D) sorts are ~9x slower than flat 1-D sorts
     on TPU, so the batch dim is an unrolled python loop, not vmap;
  3. a segmented associative scan (combine resets at run starts) yields
     in-run transmittance (log space) and in-run rank in one pass;
  4. per-pixel totals come from a plain GLOBAL cumsum of the rank-masked
     weighted contributions (features, nearest-z head, count) — a 2-D
     per-run segmented scan over the channels compiles pathologically on
     the TPU backend and was reverted (commit 3e0cdc4);
  5. run-END rows compact to dense pixel order with a 2-operand flat sort
     (end-marked pixel key, row position); adjacent differences of the
     compacted cumsum rows give each pixel's totals
     (cumsum[end_p] - cumsum[end_{p-1}], dense because of the dummies).

Everything is jnp; XLA differentiates it (sorts/gathers have VJPs).

``pixel_center_offset`` selects the pixel-center convention: 0.0 keeps
integer pixel centers (self-consistent with ops.warp / ops.projective);
pytorch3d's screen-space convention puts pixel centers at half-integer
coordinates (reference motion.py:106-128 via PerspectiveCameras), which
shifts its splats by -0.5 px relative to the integer-center grid — pass
-0.5 to reproduce that when running reference-trained weights.
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


def _seg_add(a, b):
    """Segmented-sum combine: the flag marks segment starts; sums reset
    across segment boundaries.  Associative (flag = 'b's range touches a
    start'), so usable with jax.lax.associative_scan."""
    fa, va = a
    fb, vb = b
    return fa | fb, jax.tree.map(
        lambda x, y: jnp.where(fb, y, x + y), va, vb)


def _splat_one_sort(points, features, intrinsics, H, W, radius_px,
                    points_per_pixel, pixel_center_offset):
    """Differentiable variant used by the TRAINING path: the feature
    channels ride through both sorts as value operands and the per-pixel
    reduction is a global cumsum + boundary difference.  Costs more HBM
    than `_splat_one_gather` but its backward pass is sorts/cumsums only —
    the gather variant's VJP would emit (M,)-row scatter-adds, which
    serialize on TPU (~150 ms at 0.5M rows)."""
    out_dtype = features.dtype
    points = points.astype(jnp.float32)
    features = features.astype(jnp.float32)
    intrinsics = intrinsics.astype(jnp.float32)
    N, C = features.shape
    K = (2 * int(math.ceil(radius_px))) ** 2
    npix = H * W
    f32 = jnp.float32

    pid, alpha, zfrag, ffrag, Z = _project_fragments(
        points, features, intrinsics, H, W, radius_px, pixel_center_offset,
        npix)

    z_bits = 32 - int(npix + 1).bit_length()
    assert z_bits >= 8, "image too large for packed splat keys"
    zq = _quantize_z(Z, z_bits)
    zmask = jnp.uint32((1 << z_bits) - 1)
    key = (pid.astype(jnp.uint32) << z_bits) | jnp.broadcast_to(
        zq[None, :], (K, N)).reshape(-1)

    # dummy fragment per pixel: guarantees every pid owns a run
    key = jnp.concatenate([
        key, (jnp.arange(npix, dtype=jnp.uint32) << z_bits) | zmask])
    alpha = jnp.concatenate([alpha, jnp.zeros((npix,), f32)])
    zfrag = jnp.concatenate([zfrag, jnp.zeros((npix,), f32)])
    ops = [key, alpha, zfrag] + list(ffrag)
    zero_feat = jnp.zeros((npix,), f32)
    for c in range(C):
        ops[3 + c] = jnp.concatenate([ops[3 + c], zero_feat])

    sorted_ops = jax.lax.sort(tuple(ops), dimension=0, num_keys=1,
                              is_stable=False)
    key_s, alpha_s, z_s = sorted_ops[0], sorted_ops[1], sorted_ops[2]
    feat_s = jnp.stack(sorted_ops[3:], axis=-1)  # (M, C)
    M = key_s.shape[0]
    pid_s = (key_s >> z_bits).astype(jnp.int32)
    real = (pid_s < npix) & (alpha_s > 0)

    pos = jnp.arange(M)
    start = jnp.concatenate([jnp.ones((1,), bool), pid_s[1:] != pid_s[:-1]])
    seg_start = jax.lax.cummax(jnp.where(start, pos, 0))
    rank = pos - seg_start

    # front-to-back transmittance (exclusive in-segment cumprod of 1-alpha)
    log_t = jnp.log1p(-alpha_s)
    _, seg_incl = jax.lax.associative_scan(_seg_add, (start, log_t))
    transmittance = jnp.exp(seg_incl - log_t)

    wgt = (alpha_s * transmittance
           * (rank < points_per_pixel) * real).astype(f32)

    zhead = jnp.where(start & real, z_s, 0.0)[:, None]
    cnt = real.astype(f32)[:, None]
    stacked = jnp.concatenate([feat_s * wgt[:, None], zhead, cnt], axis=-1)
    S = jnp.cumsum(stacked, axis=0)  # (M, C+2) global inclusive cumsum

    # run-end compaction via a second flat sort carrying the cumsum rows
    is_end = jnp.concatenate([pid_s[1:] != pid_s[:-1], jnp.ones((1,), bool)])
    key2 = jnp.where(is_end, pid_s, npix)
    sorted2 = jax.lax.sort(
        (key2,) + tuple(S[:, c] for c in range(C + 2)),
        dimension=0, num_keys=1, is_stable=False)
    S_end = jnp.stack(sorted2[1:], axis=-1)[:npix]  # (npix, C+2) pixel order

    S_prevend = jnp.concatenate(
        [jnp.zeros((1, C + 2), f32), S_end[:-1]], axis=0)
    totals = S_end - S_prevend
    out = totals[:, :C].astype(out_dtype)
    zbuf = jnp.where(totals[:, C + 1] > 0, totals[:, C], 0.0).astype(out_dtype)

    return out.reshape(H, W, C), zbuf.reshape(H, W)


def _splat_one_gather(points, features, intrinsics, H, W, radius_px,
                      points_per_pixel, pixel_center_offset):
    """points: (N,3), features: (N,C).  Inference variant (fewest sorted
    bytes; its VJP would contain serializing scatters — training uses
    `_splat_one_sort`)."""
    out_dtype = features.dtype
    # compositing math is precision-critical: bf16 rounds the alpha clip
    # (1 - 1e-4) to exactly 1.0, making log1p(-alpha) = -inf
    points = points.astype(jnp.float32)
    features = features.astype(jnp.float32)
    intrinsics = intrinsics.astype(jnp.float32)
    N, C = features.shape
    K = (2 * int(math.ceil(radius_px))) ** 2
    npix = H * W
    f32 = jnp.float32

    pid, alpha, zfrag, _, Z = _project_fragments(
        points, features, intrinsics, H, W, radius_px, pixel_center_offset,
        npix, materialize_features=False)

    # ---- single flat sort; features do NOT ride through the sort ----
    # key = pid (high bits) | quantized-z (low bits).  z quantization only
    # affects the z-ORDER of fragments on the same pixel (ties break
    # arbitrarily for near-equal depths); exact z and alpha ride along.
    z_bits = 32 - int(npix + 1).bit_length()
    assert z_bits >= 8, "image too large for packed splat keys"
    zq = _quantize_z(Z, z_bits)  # monotone in Z, < all-ones for finite z
    zmask = jnp.uint32((1 << z_bits) - 1)
    key = (pid.astype(jnp.uint32) << z_bits) | jnp.broadcast_to(
        zq[None, :], (K, N)).reshape(-1)

    # dummy fragment per pixel: guarantees every pid owns a run.  Dummy
    # pid_src points at source row 0 but its weight is always 0 (alpha = 0).
    key = jnp.concatenate([
        key, (jnp.arange(npix, dtype=jnp.uint32) << z_bits) | zmask])
    alpha = jnp.concatenate([alpha, jnp.zeros((npix,), f32)])
    zfrag = jnp.concatenate([zfrag, jnp.zeros((npix,), f32)])
    fid = jnp.concatenate([
        jnp.broadcast_to(jnp.arange(N, dtype=jnp.uint32)[None, :],
                         (K, N)).reshape(-1),
        jnp.zeros((npix,), jnp.uint32)])

    key_s, alpha_s, z_s, fid_s = jax.lax.sort(
        (key, alpha, zfrag, fid), dimension=0, num_keys=1, is_stable=False)
    M = key_s.shape[0]
    pid_s = (key_s >> z_bits).astype(jnp.int32)
    real = (pid_s < npix) & (alpha_s > 0)

    pos = jnp.arange(M)
    start = jnp.concatenate([jnp.ones((1,), bool), pid_s[1:] != pid_s[:-1]])
    seg_start = jax.lax.cummax(jnp.where(start, pos, 0))
    rank = pos - seg_start

    # in-run transmittance via the 1-D segmented scan (same as the sort
    # variant; a 2-D segmented scan over the feature channels compiles
    # pathologically on the TPU backend, so per-pixel totals use the plain
    # global cumsum + boundary differencing instead)
    log_t = jnp.log1p(-alpha_s)
    _, seg_incl = jax.lax.associative_scan(_seg_add, (start, log_t))
    transmittance = jnp.exp(seg_incl - log_t)

    wgt = (alpha_s * transmittance
           * (rank < points_per_pixel) * real).astype(f32)

    # features: one (N, C) row gather at the fragment's source point id —
    # cheaper than broadcasting C channels over K taps and sorting them
    feat_s = jnp.take(features, fid_s.astype(jnp.int32), axis=0)

    zhead = jnp.where(start & real, z_s, 0.0)[:, None]
    cnt = real.astype(f32)[:, None]
    stacked = jnp.concatenate([feat_s * wgt[:, None], zhead, cnt], axis=-1)
    S = jnp.cumsum(stacked, axis=0)  # (M, C+2) global inclusive cumsum

    # run-end compaction: each pid owns exactly one run end; a 2-operand
    # flat sort (key, row position) brings end rows into dense pixel
    # order, then one row gather pulls their cumsum rows; adjacent-row
    # differences in pixel order give the per-pixel totals
    is_end = jnp.concatenate([pid_s[1:] != pid_s[:-1], jnp.ones((1,), bool)])
    key2 = jnp.where(is_end, pid_s, npix)
    _, pos_end = jax.lax.sort(
        (key2, jnp.arange(M, dtype=jnp.uint32)),
        dimension=0, num_keys=1, is_stable=False)
    S_end = jnp.take(S, pos_end[:npix].astype(jnp.int32), axis=0)
    S_prevend = jnp.concatenate(
        [jnp.zeros((1, C + 2), f32), S_end[:-1]], axis=0)
    totals = S_end - S_prevend

    out = totals[:, :C].astype(out_dtype)
    zbuf = jnp.where(totals[:, C + 1] > 0, totals[:, C], 0.0).astype(out_dtype)

    return out.reshape(H, W, C), zbuf.reshape(H, W)


def _project_fragments(points, features, intrinsics, H, W, radius_px,
                       pixel_center_offset, npix_sentinel,
                       materialize_features=True):
    """points (N,3), features (N,C) -> flat fragment arrays (K*N,).

    Fragments are built TAP-MAJOR: flat index = k*N + n (the sort reorders
    everything anyway, so fragment order is free).  The (K, N) layout puts
    the big N axis on the 128-lane dim; the old (N, K) layout padded the
    K=4 minor dim to 128 lanes — 32x wasted lanes on every elementwise op
    (measured 4.2 ms of the 33 ms full-res splat).

    Culled fragments (alpha<=0, out of image, invalid z) get
    pid = npix_sentinel so they sort to the end.  ``ffrag`` is a list of C
    per-channel flat (K*N,) arrays (sort value operands); with
    ``materialize_features=False`` it is None and callers gather feature
    rows post-sort at the carried point id instead."""
    f32 = jnp.float32
    N, C = features.shape
    R = int(math.ceil(radius_px))
    K = (2 * R) ** 2

    fx, fy, cx, cy = intrinsics
    X, Y, Z = points[:, 0], points[:, 1], points[:, 2]
    zvalid = Z > 1e-4
    zs = jnp.where(zvalid, Z, 1.0)
    x = fx * (X / zs) + cx + pixel_center_offset
    y = fy * (Y / zs) + cy + pixel_center_offset

    offs = jnp.arange(-(R - 1), R + 1)
    dy, dx = jnp.meshgrid(offs, offs, indexing="ij")
    dx = dx.reshape(-1)
    dy = dy.reshape(-1)
    bx = jnp.floor(x).astype(jnp.int32)
    by = jnp.floor(y).astype(jnp.int32)
    px = bx[None, :] + dx[:, None]  # (K, N)
    py = by[None, :] + dy[:, None]

    d2 = (px.astype(f32) - x[None, :]) ** 2 + (py.astype(f32) - y[None, :]) ** 2
    alpha = 1.0 - d2 / (radius_px * radius_px)
    ok = ((alpha > 0) & (px >= 0) & (px < W) & (py >= 0) & (py < H)
          & zvalid[None, :])
    pid = jnp.where(ok, py * W + px, npix_sentinel).reshape(-1)
    alpha = jnp.where(ok, jnp.clip(alpha, 0.0, 1.0 - 1e-4), 0.0).reshape(-1)
    zfrag = jnp.broadcast_to(Z[None, :], (K, N)).reshape(-1)
    if materialize_features:
        ffrag = [jnp.broadcast_to(features[:, c][None, :], (K, N)).reshape(-1)
                 for c in range(C)]
    else:
        ffrag = None
    return pid, alpha, zfrag, ffrag, Z


def _splat_one_pallas(points, features, intrinsics, H, W, radius_px,
                      points_per_pixel, pixel_center_offset):
    """Sort fragments once, then composite with the Pallas tile kernel
    (ops/pallas/splat_composite.py) — no dummy rows, no second sort, no
    global cumsum.  Inference path (the kernel has no VJP).

    The sort carries only (key, source-point-id) — 2 operands instead of
    3+C (sorts cost ~linearly in sorted bytes; the r3 variant's 9-operand
    sort ate most of the kernel path's win).  Everything else is
    recovered post-sort: features/x/y/z by ONE packed (N, C+3) row gather
    at the point id, alpha recomputed from the fragment's pixel (from the
    key) and the point's projected position."""
    from .pallas.splat_composite import TILE_PX, WMAX, composite_tiles

    out_dtype = features.dtype
    points = points.astype(jnp.float32)
    features = features.astype(jnp.float32)
    intrinsics = intrinsics.astype(jnp.float32)
    N, C = features.shape
    npix = H * W
    npix_pad = -(-npix // TILE_PX) * TILE_PX
    T = npix_pad // TILE_PX
    f32 = jnp.float32

    pid, _, _, _, Z = _project_fragments(
        points, features, intrinsics, H, W, radius_px, pixel_center_offset,
        npix_pad, materialize_features=False)
    K = pid.shape[0] // N

    z_bits = 32 - int(npix_pad).bit_length()
    assert z_bits >= 8, "image too large for packed splat keys"
    zq = _quantize_z(Z, z_bits)
    key = (pid.astype(jnp.uint32) << z_bits) | jnp.broadcast_to(
        zq[None, :], (K, N)).reshape(-1)
    fid = jnp.broadcast_to(jnp.arange(N, dtype=jnp.uint32)[None, :],
                           (K, N)).reshape(-1)

    key_s, fid_s = jax.lax.sort((key, fid), dimension=0, num_keys=1,
                                is_stable=False)
    pid_s = (key_s >> z_bits).astype(jnp.int32)

    # packed per-point row gather: [features..., x, y, z]
    fx_, fy_, cx_, cy_ = intrinsics
    zv = jnp.where(Z > 1e-4, Z, 1.0)
    px_pt = fx_ * (points[:, 0] / zv) + cx_ + pixel_center_offset
    py_pt = fy_ * (points[:, 1] / zv) + cy_ + pixel_center_offset
    packed = jnp.concatenate(
        [features, px_pt[:, None], py_pt[:, None], Z[:, None]], axis=1)
    rows = jnp.take(packed, fid_s.astype(jnp.int32), axis=0)  # (M, C+3)

    # recompute alpha from the landed pixel vs the projected position
    lx = (pid_s % W).astype(f32)
    ly = (pid_s // W).astype(f32)
    d2 = (lx - rows[:, C]) ** 2 + (ly - rows[:, C + 1]) ** 2
    alpha_s = jnp.clip(1.0 - d2 / (radius_px * radius_px), 0.0, 1.0 - 1e-4)
    alpha_s = jnp.where(pid_s < npix_pad, alpha_s, 0.0)
    z_s = rows[:, C + 2]
    feat_s = rows[:, :C].T  # (C, M)

    # pad with WMAX sentinel rows so window DMAs stay in bounds; the
    # channel dim pads to a multiple of 8 because Mosaic requires manual
    # HBM DMA slices to be sublane-aligned (8 rows for f32)
    C8 = -(-C // 8) * 8
    pid_p = jnp.concatenate(
        [pid_s, jnp.full((WMAX,), npix_pad, jnp.int32)])[None]
    alpha_p = jnp.concatenate([alpha_s, jnp.zeros((WMAX,), jnp.float32)])[None]
    z_p = jnp.concatenate([z_s, jnp.zeros((WMAX,), jnp.float32)])[None]
    feat_p = jnp.pad(feat_s, ((0, C8 - C), (0, WMAX)))

    boundaries = jnp.arange(T + 1, dtype=jnp.int32) * TILE_PX
    offsets = jnp.searchsorted(pid_s, boundaries, side="left").astype(
        jnp.int32)

    # interpret only off-TPU; the axon plugin reports platform "axon" for
    # the real chip (and supports Mosaic), so match by exclusion of CPU/GPU
    interpret = jax.devices()[0].platform in ("cpu", "gpu", "cuda", "rocm")
    out, zbuf, cnt = composite_tiles(
        pid_p, alpha_p, z_p, feat_p, offsets, npix_pad,
        points_per_pixel=points_per_pixel, interpret=interpret)
    out = out[:npix, :C].astype(out_dtype).reshape(H, W, C)
    zbuf = jnp.where(cnt[:npix] > 0, zbuf[:npix], 0.0).astype(out_dtype)
    return out, zbuf.reshape(H, W)


@partial(jax.jit, static_argnames=("H", "W", "radius_px", "points_per_pixel",
                                   "pixel_center_offset", "impl",
                                   "batch_mode"))
def splat_render(points, features, intrinsics, H: int, W: int,
                 radius_px: float = 1.0, points_per_pixel: int = 8,
                 pixel_center_offset: float = 0.0, impl: str = "xla",
                 batch_mode: str = "auto"):
    """Render a batched point cloud into (features, zbuf) images.

    Args:
      points: (B, N, 3) camera-space points.
      features: (B, N, C).
      intrinsics: (B, 4) [fx, fy, cx, cy].
      H, W: output resolution.
      radius_px: splat radius in pixels (reference radius 2.0 NDC-per-h
        == 1 px at full res; 4.0 == 2 px at 1/4 res).
      pixel_center_offset: 0.0 for integer pixel centers (self-consistent
        grid), -0.5 to reproduce pytorch3d's half-integer screen convention.
      impl: "xla" (differentiable: payload rides the sorts; scatter-free
        backward — the TRAINING path), "xla_gather" (fewest sorted bytes:
        2-pass segmented scans + post-sort row gathers; fastest forward —
        the inference path), "pallas" (fused tile compositor,
        forward-only), "xla_window" (scan-free shifted-window reduction,
        forward path) or "xla_sort_window" (differentiable windowed
        variant) — see ops/splat_window.py.
      batch_mode: "unroll" compiles one flat-sort pipeline per batch entry
        (flat 1-D sorts are ~9x faster than the batched 2-D sorts a vmap
        would produce on TPU — the runtime-optimal choice); "vmap"
        compiles ONE batched pipeline (the compile-time-optimal choice:
        the unroll multiplies the dominant compile cost of the sort
        VJP graphs by B, which blows the XLA:CPU compile budget of the
        multi-device dryrun); "auto" = vmap on the CPU backend, unroll
        elsewhere.

    Returns:
      (B, H, W, C) composited features, (B, H, W) nearest-surface depth
      (0 where nothing landed).
    """
    if impl in ("xla_window", "xla_sort_window"):
        # deferred: splat_window imports from this module
        from .splat_window import splat_one_sort_window, splat_one_window
        one = {"xla_window": splat_one_window,
               "xla_sort_window": splat_one_sort_window}[impl]
    else:
        one = {"pallas": _splat_one_pallas,
               "xla_gather": _splat_one_gather,
               "xla": _splat_one_sort}[impl]
    B = points.shape[0]
    if batch_mode == "auto":
        batch_mode = "vmap" if jax.default_backend() == "cpu" else "unroll"
    if impl == "pallas":
        batch_mode = "unroll"  # the tile kernel is written per-image
    if batch_mode == "vmap" and B > 1:
        return jax.vmap(
            lambda p, f, i: one(p, f, i, H, W, radius_px, points_per_pixel,
                                pixel_center_offset)
        )(points, features, intrinsics)
    outs, zbufs = [], []
    for b in range(B):
        o, z = one(points[b], features[b], intrinsics[b], H, W,
                   radius_px, points_per_pixel, pixel_center_offset)
        outs.append(o)
        zbufs.append(z)
    return jnp.stack(outs), jnp.stack(zbufs)
