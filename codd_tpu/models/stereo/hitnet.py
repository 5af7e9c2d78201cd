"""HITNet-style tile-hypothesis stereo matcher (TPU/flax re-design).

Capability parity with the reference stereo stack (reference:
model/stereo/hitnet/{backbone,initialization,propagation,hitnet}.py;
HITNet = arXiv 2007.12140), re-laid-out NHWC with cost volumes channel-last.

Structure:
  * HITUNet       — 5-level UNet feature pyramid [1/16, 1/8, 1/4, 1/2, 1/1]
  * TileInit      — 4x4 tile embeddings per level; right-image tile features
                    computed at every horizontal position (stride (4,1) after
                    3px right-pad) so the matching cost is a pure gather:
                    cost(i, d) = ||L_i - R_{4i-d}||_1  (initialization.py:18-45)
  * TilePropagation — coarse-to-fine tile updates with slant-plane local
                    cost volumes and two-hypothesis selection
  * HITNetStereo  — wrapper returning the per-frame outputs dict

Tile hypothesis layout (trailing 16 channels): [d, dx, dy, 13-ch descriptor].
The hypothesis pyramid lives at resolutions [1/64 .. 1/4] of the input.
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ...ops.grid_sample import grid_sample
from ...ops.upsample import hyp_upsample, pixel_unshuffle, to_plane
from ...ops.warp import meshgrid_xy
from ..layers import Conv, ConvTranspose, SharedStrideConv, lrelu

__all__ = ["HITUNet", "TileInitialization", "TilePropagation", "HITNetStereo"]


# ---------------------------------------------------------------------------
# Backbone
# ---------------------------------------------------------------------------


class _ConvDown(nn.Module):
    features: int

    @nn.compact
    def __call__(self, x):
        x = lrelu(Conv(self.features, 4, stride=2, padding=1, name="c0")(x))
        x = lrelu(Conv(self.features, 3, padding=1, name="c1")(x))
        return x


class _ConvMerge(nn.Module):
    features: int

    @nn.compact
    def __call__(self, x):
        x = lrelu(Conv(self.features, 1, name="c0")(x))
        x = lrelu(Conv(self.features, 3, padding=1, name="c1")(x))
        x = lrelu(Conv(self.features, 3, padding=1, name="c2")(x))
        return x


class HITUNet(nn.Module):
    """UNet backbone; returns [1/16, 1/8, 1/4, 1/2, 1/1] features with
    channels [32, 24, 24, 16, 16] (backbone.py:43-88)."""

    @nn.compact
    def __call__(self, x):
        x_down = lrelu(Conv(16, 3, padding=1, name="conv1")(x))
        x_down1 = _ConvDown(16, name="down1")(x_down)
        x_down2 = _ConvDown(24, name="down2")(x_down1)
        x_down3 = _ConvDown(24, name="down3")(x_down2)
        x4 = _ConvDown(32, name="down4_0")(x_down3)
        x4 = lrelu(Conv(32, 3, padding=1, name="down4_1")(x4))
        x_down4 = lrelu(Conv(32, 3, padding=1, name="down4_2")(x4))

        up4 = lrelu(ConvTranspose(24, name="up4")(x_down4))
        x_up4 = _ConvMerge(24, name="merge4")(jnp.concatenate([x_down3, up4], -1))
        up3 = lrelu(ConvTranspose(24, name="up3")(x_up4))
        x_up3 = _ConvMerge(24, name="merge3")(jnp.concatenate([x_down2, up3], -1))
        up2 = lrelu(ConvTranspose(16, name="up2")(x_up3))
        x_up2 = _ConvMerge(16, name="merge2")(jnp.concatenate([x_down1, up2], -1))
        up1 = lrelu(ConvTranspose(16, name="up1")(x_up2))
        x_up1 = _ConvMerge(16, name="merge1")(jnp.concatenate([x_down, up1], -1))

        return [x_down4, x_up4, x_up3, x_up2, x_up1]


# ---------------------------------------------------------------------------
# Tile initialization
# ---------------------------------------------------------------------------


def calc_init_cost(feat_l: jnp.ndarray, feat_r_full: jnp.ndarray,
                   max_disp: int, variant: str = "auto") -> jnp.ndarray:
    """Matching cost over all disparities, gather-free.

    feat_l: (B, ht, wt, C) left tile features (one per 4px column).
    feat_r_full: (B, ht, wr, C) right tile features at every column.
    Returns cost (B, ht, wt, D): ||L_i - R_{4i-d}||_1 with out-of-range
    right features reading 0 (the reference's zeros-padded nearest
    grid_sample, initialization.py:18-45).

    Two equivalent formulations, selected by ``variant``:
      * "unrolled" — D strided slices + fused |L - R| reductions; fastest
        at runtime on TPU but emits O(D) HLO ops per level.
      * "map"      — a D/4-iteration ``lax.map`` (~150x fewer HLO ops);
        the right choice where compile time/memory is the constraint
        (XLA:CPU multi-device dryruns).  Requires D % 4 == 0; falls back
        to "unrolled" otherwise (e.g. coarsest levels of tiny test
        configs).
      * "auto"     — "map" on the CPU backend, "unrolled" elsewhere.

    Formulation notes: for fixed d the accessed right columns {4j - d : j}
    are a stride-4 slice of the (left-zero-padded) right features, so the
    whole volume needs no gathers, which run far below bandwidth on TPU.
    Channels move to the second-minor axis so the lane dimension is the
    wide wr axis and the C=16 reduction doesn't waste 128-lane tiles."""
    B, ht, wt, C = feat_l.shape
    wr = feat_r_full.shape[2]
    D = max_disp

    # "phases" wins nothing at model scale (bench A/B 2026-08-19) — the
    # stride-4 slices of "unrolled" are not the bottleneck; keep it opt-in
    if variant == "auto":
        variant = "map" if jax.default_backend() == "cpu" else "unrolled"
    if variant in ("map", "phases") and (D % 4 != 0 or D < 4):
        variant = "unrolled"
    assert variant in ("unrolled", "map", "phases"), \
        f"bad init-cost variant {variant}"

    # (B, ht, C, w): C on sublanes, width on lanes
    lT = jnp.moveaxis(feat_l, -1, 2)
    rT = jnp.moveaxis(feat_r_full, -1, 2)
    rp = jnp.pad(rT, ((0, 0), (0, 0), (0, 0), (D, 0)))

    if variant == "unrolled":
        costs = []
        for d in range(D):
            sl = jax.lax.slice(rp, (0, 0, 0, D - d),
                               (B, ht, C, D - d + 4 * wt), (1, 1, 1, 4))
            costs.append(jnp.sum(jnp.abs(lT - sl), axis=2))  # (B, ht, wt)
        return jnp.stack(costs, axis=-1)  # (B, ht, wt, D)

    if variant == "phases":
        # Same math as "unrolled" but the four column phases are split
        # into contiguous planes ONCE, so every per-d slice is dense:
        # the stride-4 lane slices of "unrolled" read at ~1/4 lane
        # efficiency, and D of them dominate tile_init at the fine levels
        # (12.2 ms measured 2026-08-19).  Column D-d+4j with d = 4k+p
        # lives in phase (4-p)%4 at folded row D/4 - k + j - [p>0].
        need = D + 4 * wt
        if rp.shape[-1] >= need:
            rp4 = rp[..., :need]
        else:
            rp4 = jnp.pad(rp, ((0, 0),) * 3 + ((0, need - rp.shape[-1]),))
        rf = rp4.reshape(B, ht, C, need // 4, 4)
        phases = [rf[..., q] for q in range(4)]  # each (B, ht, C, need/4)
        costs = []
        for d in range(D):
            k, p = divmod(d, 4)
            q = (4 - p) % 4
            base = D // 4 - k - (1 if p else 0)
            sl = jax.lax.slice_in_dim(phases[q], base, base + wt, axis=3)
            costs.append(jnp.sum(jnp.abs(lT - sl), axis=2))  # (B, ht, wt)
        return jnp.stack(costs, axis=-1)  # (B, ht, wt, D)

    # rolled "map" variant: identical math with a D/4-iteration lax.map
    # instead of D unrolled strided slices.  The accessed column D-d+4j
    # with d = 4k+p folds onto the (w/4, 4)-reshaped
    # width axis as row D/4-k+j-[p>0], lane (4-p)%4 — one dynamic_slice of
    # wt+1 folded rows covers all four phases of a k.
    need = D + 4 * wt  # columns beyond D+4(wt-1) are never accessed
    if rp.shape[-1] >= need:
        rp4 = rp[..., :need]
    else:
        rp4 = jnp.pad(rp, ((0, 0),) * 3 + ((0, need - rp.shape[-1]),))
    rf = rp4.reshape(B, ht, C, need // 4, 4)

    def one_k(k):
        base = D // 4 - k - 1  # k in [0, D/4): base in [0, D/4-1]
        cols = jax.lax.dynamic_slice(rf, (0, 0, 0, base, 0),
                                     (B, ht, C, wt + 1, 4))
        outs = []
        for p in range(4):  # d = 4k + p
            q = (4 - p) % 4
            off = 1 if p == 0 else 0
            sl = jax.lax.slice_in_dim(cols, off, off + wt, axis=3)[..., q]
            outs.append(jnp.sum(jnp.abs(lT - sl), axis=2))  # (B, ht, wt)
        return jnp.stack(outs, axis=-1)  # (B, ht, wt, 4)

    cost_k = jax.lax.map(one_k, jnp.arange(D // 4))  # (D/4, B, ht, wt, 4)
    cost = jnp.moveaxis(cost_k, 0, 3)  # (B, ht, wt, D/4, 4); d = 4k + p
    return cost.reshape(B, ht, wt, D)


class _TileConv(nn.Module):
    """Shared-weight 4x4 tile embedding; left stride (4,4), right stride (4,1)."""

    @nn.compact
    def __call__(self, fea_l, fea_r):
        c0 = SharedStrideConv(16, (4, 4), name="c0")
        c1 = Conv(16, 1, name="c1")
        tl = lrelu(c1(lrelu(c0(fea_l, (4, 4)))))
        # zero-pad 3 columns on the right, then stride (4,1): one tile
        # feature per column (initialization.py:119-124)
        fr = jnp.pad(fea_r, ((0, 0), (0, 0), (0, 3), (0, 0)))
        tr = lrelu(c1(lrelu(c0(fr, (4, 1)))))
        return tl, tr


class TileInitialization(nn.Module):
    max_disp: int = 320
    init_cost_variant: str = "auto"

    @nn.compact
    def __call__(self, fea_l: Sequence[jnp.ndarray], fea_r: Sequence[jnp.ndarray]):
        """fea pyramids [1/16..1/1].  Returns (cost pyramid, hypothesis pyramid),
        both coarse-to-fine at tile resolutions [1/64 .. 1/4]."""
        names = ["16x", "8x", "4x", "2x", "1x"]
        divs = [16, 8, 4, 2, 1]
        costs, hyps = [], []
        for lvl in range(5):
            tl, tr = _TileConv(name=f"tile_conv{names[lvl]}")(fea_l[lvl], fea_r[lvl])
            cost = calc_init_cost(tl, tr, self.max_disp // divs[lvl],
                                  self.init_cost_variant)
            cmin = jnp.min(cost, axis=-1, keepdims=True)
            d0 = jnp.argmin(cost, axis=-1).astype(tl.dtype)[..., None]
            # descriptor input: coarse levels use the tile embedding itself,
            # fine levels the backbone feature at tile res (initialization.py:186-190)
            guide = tl if lvl < 2 else fea_l[lvl - 2]
            dscrpt = lrelu(Conv(13, 1, name=f"tile_fea_dscrpt{names[lvl]}")(
                jnp.concatenate([cmin, guide], -1)))
            zeros = jnp.zeros_like(d0)
            hyps.append(jnp.concatenate([d0, zeros, zeros, dscrpt], -1))
            costs.append(cost)
        return costs, hyps


# ---------------------------------------------------------------------------
# Tile propagation
# ---------------------------------------------------------------------------


def _warp_by_disp(fea_r, disp):
    """Sample fea_r at x - disp (bilinear, zeros padding) — propagation.py:35-58.

    Horizontal-only 2-tap sample (see ops.warp._hwarp).  Kept as the test
    oracle for the fused ``tile_warping`` below
    (tests/test_stereo.py::test_tile_warping_matches_per_warp_oracle);
    the production path no longer calls it."""
    from ...ops.warp import _hwarp

    B, H, W, _ = fea_r.shape
    x, _ = meshgrid_xy(H, W, fea_r.dtype)
    warped, _ = _hwarp(fea_r, x[None] - disp, "zeros")
    return warped


def tile_warping(hyp3, fea_l, fea_r):
    """Slant-plane local cost volume -> (B, ht, wt, 48) (propagation.py:61-86).

    The three hypothesis offsets k in {-1, 0, +1} sample fea_r at positions
    exactly 1 px apart, so their bilinear taps live in FOUR consecutive
    columns [x0-1, x0+2] (x0 = floor(x - local_d)).  One sliced gather of a
    (4, C) column block per pixel serves all three warps: 6x fewer gather
    descriptors and 256-byte contiguous chunks (C=16 f32) instead of the
    64-byte rows of per-warp 2-tap sampling — TPU gathers need >=256B
    chunks to run near bandwidth.  Out-of-image taps are masked to zero
    (torch zeros-padding grid_sample semantics, identical to the previous
    per-warp path)."""
    B, H, W, C = fea_r.shape
    d, dx, dy = hyp3[..., 0], hyp3[..., 1], hyp3[..., 2]
    local_d = to_plane(d, dx, dy, size=4)  # k = 0 plane
    x, _ = meshgrid_xy(H, W, fea_r.dtype)
    p = x[None] - local_d  # (B, H, W) sample position for k = 0
    x0 = jnp.floor(p)
    f = (p - x0).astype(fea_r.dtype)[..., None]  # (B, H, W, 1)

    # gather the 4-column block; clipping only activates when every tap is
    # out of image (masked to zero below), so clipped reads never leak
    fr = jnp.pad(fea_r, ((0, 0), (0, 0), (3, 3), (0, 0)))
    start = jnp.clip(x0 - 1 + 3, 0, W + 2).astype(jnp.int32)  # (B, H, W)
    ys = jnp.broadcast_to(jnp.arange(H, dtype=jnp.int32)[None, :, None],
                          (B, H, W))
    idx = jnp.stack([ys, start], axis=-1).reshape(B, -1, 2)

    dnums = jax.lax.GatherDimensionNumbers(
        offset_dims=(1, 2), collapsed_slice_dims=(0,),
        start_index_map=(0, 1))

    def gather_one(op, ind):
        return jax.lax.gather(op, ind, dnums, slice_sizes=(1, 4, C))

    cols = jax.vmap(gather_one)(fr, idx).reshape(B, H, W, 4, C)
    ok = ((x0[..., None] - 1 + jnp.arange(4.0) >= 0)
          & (x0[..., None] - 1 + jnp.arange(4.0) <= W - 1))
    cols = cols * ok[..., None].astype(fea_r.dtype)

    cvs = []
    # k = +1 warps at p-1 -> taps (cols[0], cols[1]); k = 0 -> (1, 2);
    # k = -1 warps at p+1 -> taps (2, 3); all share the fraction f.
    # tile_warping's k loop is (-1, 0, +1) == tap starts (2, 1, 0).
    for j in (2, 1, 0):
        warped = cols[..., j, :] * (1 - f) + cols[..., j + 1, :] * f
        cv = jnp.sum(jnp.abs(fea_l - warped), axis=-1, keepdims=True)
        cvs.append(pixel_unshuffle(cv, 4))
    return jnp.concatenate(cvs, -1)


# tile-window warp: gathered columns per tile; exactness bound (see
# tile_warping_tilewin docstring): 1.5*(|1-dx| + |dy|) + 4 <= _TILE_WIN/2
_TILE_WIN = 24


def tile_warping_tilewin(hyp3, fea_l, fea_r, contraction: str = "reduce",
                         tw: int = _TILE_WIN):
    """`tile_warping` with per-TILE window gathers (TPU production path).

    The per-pixel 4-column gather above is exact but descriptor-bound on
    TPU: one gather descriptor per output pixel costs ~25 ns regardless of
    size, so the full-res call is ~12 ms of pure descriptor overhead
    (probe_prop_stages, 2026-08-19).  All 16 pixels of a 4x4 tile share
    one slant-plane hypothesis, so their bilinear taps live within a
    narrow column band around the tile-center position: ONE (4, 24, C)
    block gather per TILE (16x fewer descriptors) followed by an in-band
    one-hot tap selection (MXU contraction over the 24-wide band; the
    one-hot never leaves fp32 accumulation).

    Exactness contract: identical to `tile_warping` whenever
    ``1.5 * (|1 - dx| + |dy|) <= 8`` (e.g. |dx| <= 4 with dy = 0) — far
    beyond trained slant magnitudes (|dx|,|dy| < ~1).  Pixels whose taps
    fall outside the band (pathological slants only) read zeros, matching
    the zeros-padding convention for out-of-image taps.  Regression-tested
    against `tile_warping` at bounded slants (tests/test_stereo.py).
    """
    B, H, W, C = fea_r.shape
    ht, wt = H // 4, W // 4
    d, dx, dy = hyp3[..., 0], hyp3[..., 1], hyp3[..., 2]  # (B, ht, wt)
    local_d = to_plane(d, dx, dy, size=4)                 # (B, H, W)
    x, _ = meshgrid_xy(H, W, fea_r.dtype)
    p = x[None] - local_d
    x0 = jnp.floor(p)
    f = (p - x0).astype(fea_r.dtype)                      # (B, H, W)

    TW = tw
    P = TW  # zero pad: clamped windows + out-of-image taps read zeros
    frp = jnp.pad(fea_r, ((0, 0), (0, 0), (P, P), (0, 0)))
    xc = 4.0 * jnp.arange(wt, dtype=p.dtype) + 1.5        # tile-center x
    s = jnp.floor(xc[None, None, :] - d).astype(jnp.int32) - TW // 2 + P
    s = jnp.clip(s, 0, W + 2 * P - TW)                    # (B, ht, wt)

    ys = jnp.broadcast_to(
        4 * jnp.arange(ht, dtype=jnp.int32)[None, :, None], (B, ht, wt))
    idx = jnp.stack([ys, s], axis=-1).reshape(B, -1, 2)
    dnums = jax.lax.GatherDimensionNumbers(
        offset_dims=(1, 2, 3), collapsed_slice_dims=(),
        start_index_map=(0, 1))

    def gather_one(op, ind):
        return jax.lax.gather(
            op, ind, dnums, slice_sizes=(4, TW, C),
            mode=jax.lax.GatherScatterMode.PROMISE_IN_BOUNDS)

    win = jax.vmap(gather_one)(frp, idx).reshape(B, ht, wt, 4, TW, C)

    def t4(a):  # (B, H, W) -> (B, ht, wt, i, j) tile-space pixel view
        return a.reshape(B, ht, 4, wt, 4).transpose(0, 1, 3, 2, 4)

    # window coords of the k=0 left tap, per pixel
    rel0 = t4(x0.astype(jnp.int32) + P) - s[:, :, :, None, None]
    f_t = t4(f)                                            # (B,ht,wt,i,j)

    # per-pixel tap weights over the band: m = (k, j), k outer to match
    # the (-1, 0, +1) concat block order of the exact path
    ks = jnp.array([-1, 0, 1], dtype=jnp.int32)
    tap0 = (rel0[:, :, :, :, None, :]
            - ks[None, None, None, None, :, None])         # (B,ht,wt,i,k,j)
    fb = f_t[:, :, :, :, None, :].astype(jnp.float32)      # (B,ht,wt,i,k=1,j)

    # band contraction as an unrolled fused multiply-accumulate over the
    # TW columns: a batched (12, TW)x(TW, C) einsum here lowers to 123k
    # tiny MXU matmuls (pad-dominated — measured 6.55 -> 2.34 FPS at model
    # scale, 2026-08-19); the unrolled sum is pure VPU elementwise work
    # that XLA fuses into one pass with no materialized one-hot.
    winf = win.astype(jnp.float32)
    if contraction == "mac":
        warped = jnp.zeros(tap0.shape + (C,), jnp.float32)  # (B,ht,wt,i,k,j,C)
        for wcol in range(TW):
            wt_w = ((tap0 == wcol) * (1.0 - fb)
                    + (tap0 + 1 == wcol) * fb)             # (B,ht,wt,i,k,j)
            warped = warped + (wt_w[..., None]
                               * winf[:, :, :, :, None, None, wcol, :])
    elif contraction == "reduce":
        # streaming reduce over the band: virtual (.., k, j, w, c) product
        # reduced on w (second-minor) — no materialized one-hot
        wio = jnp.arange(TW, dtype=jnp.int32)
        selw = ((tap0[..., None] == wio) * (1.0 - fb[..., None])
                + (tap0[..., None] + 1 == wio) * fb[..., None]
                )                                          # (B,ht,wt,i,k,j,TW)
        warped = jnp.sum(selw[..., None]
                         * winf[:, :, :, :, None, None, :, :], axis=-2)
    else:
        raise ValueError(f"bad tilewin contraction {contraction}")
    fl_t = fea_l.reshape(B, ht, 4, wt, 4, C).transpose(0, 1, 3, 2, 4, 5)
    cost = jnp.sum(jnp.abs(fl_t[:, :, :, :, None].astype(jnp.float32)
                           - warped), axis=-1)             # (B,ht,wt,i,k,j)
    # channel layout matches concat(pixel_unshuffle): k*16 + i*4 + j
    cost = cost.transpose(0, 1, 2, 4, 3, 5).reshape(B, ht, wt, 48)
    return cost.astype(fea_l.dtype)


def tile_warping_grouped(hyp3, fea_l, fea_r, bw: int = 12):
    """`tile_warping` with row-anchored GROUP gathers (4 pixels/descriptor).

    The exact path above spends one gather descriptor per output pixel
    (~25 ns each -> ~12 ms/call at full res, probe_prop_stages
    2026-08-19); `tile_warping_tilewin` cut descriptors 16x but lost at
    model scale (6.00 vs 6.55 FPS) — its tile-space transposes of f/x0
    break XLA's producer fusion.  This variant is the middle point
    sketched in BENCH_NOTES (queue B3 verdict): the FOUR pixels of one
    tile ROW share a slant-plane hypothesis, so their sample positions
    are p_j = p_0 + j*(1-dx) (linear in j) and their bilinear taps live
    in one narrow column band.  One (1, bw, C) block gather per row
    group (4x fewer descriptors, 768-byte chunks at C=16 f32) + an
    in-band two-tap compare-select (pure VPU, fuses) replaces the
    per-pixel gather.  Crucially all per-pixel tensors stay in the
    row-major (B, H, W) layout of the exact path — no tile-space
    transposes.

    Exactness contract: identical to `tile_warping` whenever
    ``3 * |1 - dx| <= bw - 5`` (bw=12 -> |1-dx| <= 2.33, i.e. dx in
    [-1.33, 3.33]) — independent of dy (the row anchor is computed from
    the actual row positions, so the dy term cancels) and far beyond
    trained slant magnitudes (|dx| < ~1).  Out-of-contract taps read
    zero, matching the zeros-padding convention.  Regression-tested
    against `tile_warping` (tests/test_stereo.py)."""
    B, H, W, C = fea_r.shape
    assert W % 4 == 0, W
    wt = W // 4
    d, dx, dy = hyp3[..., 0], hyp3[..., 1], hyp3[..., 2]
    local_d = to_plane(d, dx, dy, size=4)  # (B, H, W)
    x, _ = meshgrid_xy(H, W, fea_r.dtype)
    p = x[None] - local_d
    x0 = jnp.floor(p)
    f = (p - x0).astype(fea_r.dtype)[..., None]  # (B, H, W, 1)

    # row-group anchor: p is linear in the within-row pixel index j, so
    # min_j p_j is at an endpoint; the band start is the group's true
    # leftmost tap (floor(pmin) - 1), dy-free by construction
    P = bw  # zero pad: clamped bands + out-of-image taps read zeros
    frp = jnp.pad(fea_r, ((0, 0), (0, 0), (P, P), (0, 0)))
    pg = p.reshape(B, H, wt, 4)
    pmin = jnp.minimum(pg[..., 0], pg[..., 3])
    s = jnp.floor(pmin).astype(jnp.int32) - 1 + P  # (B, H, wt), padded coords
    s = jnp.clip(s, 0, W + 2 * P - bw)

    ys = jnp.broadcast_to(jnp.arange(H, dtype=jnp.int32)[None, :, None],
                          (B, H, wt))
    idx = jnp.stack([ys, s], axis=-1).reshape(B, -1, 2)
    dnums = jax.lax.GatherDimensionNumbers(
        offset_dims=(1, 2), collapsed_slice_dims=(0,),
        start_index_map=(0, 1))

    def gather_one(op, ind):
        return jax.lax.gather(
            op, ind, dnums, slice_sizes=(1, bw, C),
            mode=jax.lax.GatherScatterMode.PROMISE_IN_BOUNDS)

    band = jax.vmap(gather_one)(frp, idx).reshape(B, H, wt, bw, C)

    # per-pixel tap-0 column within its group band (padded coords)
    x0i = x0.astype(jnp.int32)
    rel = ((x0i + P - 1).reshape(B, H, wt, 4)
           - s[..., None])                       # (B, H, wt, 4)
    fg = f.reshape(B, H, wt, 4, 1)
    wio = jnp.arange(bw, dtype=jnp.int32)

    cvs = []
    # same block order as the exact path: k in (-1, 0, +1) == tap starts
    # (2, 1, 0); each block lerps taps (j, j+1) with the shared fraction
    for j in (2, 1, 0):
        okj = ((x0i - 1 + j >= 0) & (x0i - 1 + j <= W - 1)) \
            .astype(fea_r.dtype).reshape(B, H, wt, 4, 1)
        okj1 = ((x0i + j >= 0) & (x0i + j <= W - 1)) \
            .astype(fea_r.dtype).reshape(B, H, wt, 4, 1)
        sel = ((rel[..., None] + j == wio) * ((1 - fg) * okj)
               + (rel[..., None] + j + 1 == wio) * (fg * okj1)
               )                                 # (B, H, wt, 4, bw)
        warped = jnp.sum(sel[..., None] * band[:, :, :, None, :, :],
                         axis=-2)                # (B, H, wt, 4, C)
        cv = jnp.sum(jnp.abs(fea_l - warped.reshape(B, H, W, C)),
                     axis=-1, keepdims=True)
        cvs.append(pixel_unshuffle(cv, 4))
    return jnp.concatenate(cvs, -1)


class ResBlock(nn.Module):
    features: int
    dilation: int = 1

    @nn.compact
    def __call__(self, x):
        p = self.dilation if self.dilation > 1 else 1
        y = lrelu(Conv(self.features, 3, padding=p, dilation=self.dilation,
                       name="conv1")(x))
        y = Conv(self.features, 3, padding=p, dilation=self.dilation,
                 name="conv2")(y)
        return lrelu(x + y)


def _resolve_warp_variant(variant: str) -> str:
    """'auto' -> exact per-pixel gathers everywhere.  tilewin wins in
    ISOLATION on TPU (10.9 vs 14.4 ms/call at full res, probe_tilewarp
    2026-08-19) but LOSES at model scale (bench 6.00 vs 6.55 FPS — the
    exact path's gather fuses better with its producers); it stays
    opt-in until it wins at the bench level."""
    if variant == "auto":
        return "exact"
    # a typo'd variant silently running the default path is the same
    # measurement trap the builder's strict runtime-key guard closes
    assert variant in ("exact", "tilewin", "grouped", "pallas"), \
        f"bad tile_warp_variant {variant!r}; known: auto, exact, tilewin, " \
        "grouped, pallas"
    return variant


class _CVEncoder(nn.Module):
    """unshuffled |fea_l| + tile-warp cost -> 16ch (the `decrease` layer)."""

    warp_variant: str = "auto"

    @nn.compact
    def __call__(self, hyp3, fea_l, fea_r, fea_mag):
        variant = _resolve_warp_variant(self.warp_variant)
        if variant == "tilewin":
            cv = tile_warping_tilewin(hyp3, fea_l, fea_r)
        elif variant == "grouped":
            cv = tile_warping_grouped(hyp3, fea_l, fea_r)
        elif variant == "pallas":
            # fused VMEM tile-warp kernel (forward-only — inference
            # opt-in, on-chip gate scripts/check_tile_warp_tpu.py)
            from ...ops.pallas.tile_warp import tile_warp_cost
            cv = tile_warp_cost(hyp3, fea_l, fea_r,
                                interpret=jax.default_backend() == "cpu")
        else:
            cv = tile_warping(hyp3, fea_l, fea_r)
        return lrelu(Conv(16, 1, name="decrease")(
            jnp.concatenate([fea_mag, cv], -1)))


class TileUpdate0(nn.Module):
    """Coarsest-level refinement (propagation.py:124-172)."""

    warp_variant: str = "auto"

    @nn.compact
    def __call__(self, fea_l, fea_r, hyp):
        fea_mag = pixel_unshuffle(
            jnp.sum(jnp.abs(fea_l), -1, keepdims=True), 4)
        cv = _CVEncoder(self.warp_variant,
                        name="cv")(hyp[..., :3], fea_l, fea_r, fea_mag)
        x = lrelu(Conv(32, 1, name="conv0")(jnp.concatenate([hyp, cv], -1)))
        x = ResBlock(32, name="resblock0")(x)
        x = ResBlock(32, name="resblock1")(x)
        upd = Conv(16, 3, padding=1, name="lastconv")(x)
        refined = hyp + upd
        d = jax.nn.relu(refined[..., :1])
        return jnp.concatenate([d, refined[..., 1:]], -1)


class TileUpdate(nn.Module):
    """Two-hypothesis refinement + confidence selection (propagation.py:175-248)."""

    warp_variant: str = "auto"

    @nn.compact
    def __call__(self, fea_l, fea_r, hyp_cur, hyp_prev):
        fea_mag = pixel_unshuffle(
            jnp.sum(jnp.abs(fea_l), -1, keepdims=True), 4)
        enc = _CVEncoder(self.warp_variant, name="cv")
        cv_cur = enc(hyp_cur[..., :3], fea_l, fea_r, fea_mag)
        hyp_up = hyp_upsample(hyp_prev, 2.0)
        cv_up = enc(hyp_up[..., :3], fea_l, fea_r, fea_mag)

        x = jnp.concatenate([hyp_cur, cv_cur, hyp_up, cv_up], -1)
        x = lrelu(Conv(32, 1, name="conv0")(x))
        x = ResBlock(32, name="resblock0")(x)
        x = ResBlock(32, name="resblock1")(x)
        out = Conv(34, 3, padding=1, name="lastconv")(x)

        conf = out[..., :2]           # [prev_conf, cur_conf]
        d_prev = out[..., 2:18]
        d_cur = out[..., 18:34]

        def relu_d(h):
            return jnp.concatenate([jax.nn.relu(h[..., :1]), h[..., 1:]], -1)

        upd_cur = relu_d(hyp_cur + d_cur)
        upd_prev = relu_d(hyp_up + d_prev)
        sel = (jnp.argmax(conf, axis=-1, keepdims=True) == 1).astype(out.dtype)
        refined = sel * upd_cur + (1.0 - sel) * upd_prev

        cur_and_conf = jnp.concatenate([upd_cur, conf[..., 1:2]], -1)
        prev_and_conf = jnp.concatenate([upd_prev, conf[..., 0:1]], -1)
        return refined, cur_and_conf, prev_and_conf


class PostTileUpdate(nn.Module):
    """Feature-guided refinement at/below tile size (propagation.py:251-290)."""

    hid_c: int = 32
    out_c: int = 16
    resblk_num: int = 4

    @nn.compact
    def __call__(self, fea_l, hyp):
        x = jnp.concatenate([fea_l, hyp], -1)
        x = lrelu(Conv(self.hid_c, 1, name="conv1_0")(x))
        x = lrelu(Conv(self.hid_c, 3, padding=1, name="conv1_1")(x))
        for i in range(self.resblk_num):
            dil = 3 if i == 1 else 1
            x = ResBlock(self.hid_c, dilation=dil, name=f"resblock{i}")(x)
        upd = Conv(self.out_c, 3, padding=1, name="lastconv")(x)
        refined = hyp + upd
        return jnp.concatenate([jax.nn.relu(refined[..., :1]), refined[..., 1:]], -1)


class FinalTileUpdate(nn.Module):
    """Final per-pixel update; emits only [d, dx, dy] (propagation.py:293-333)."""

    hid_c: int = 16
    resblk_num: int = 2

    @nn.compact
    def __call__(self, fea_l, hyp):
        x = jnp.concatenate([fea_l, hyp], -1)
        x = lrelu(Conv(self.hid_c, 1, name="conv1_0")(x))
        x = lrelu(Conv(self.hid_c, 3, padding=1, name="conv1_1")(x))
        for i in range(self.resblk_num):
            x = ResBlock(self.hid_c, name=f"resblock{i}")(x)
        upd = Conv(3, 3, padding=1, name="lastconv")(x)
        # reference quirk kept: the previous disparity is broadcast-added to
        # all three output channels (propagation.py:330)
        return jax.nn.relu(hyp[..., 0:1] + upd)


class TilePropagation(nn.Module):
    warp_variant: str = "auto"

    @nn.compact
    def __call__(self, fea_l, fea_r, init_hyps, train: bool = False):
        wv = self.warp_variant
        t16 = TileUpdate0(wv, name="tile_update0")(fea_l[0], fea_r[0], init_hyps[0])
        t8 = TileUpdate(wv, name="tile_update1")(fea_l[1], fea_r[1], init_hyps[1], t16)
        t4 = TileUpdate(wv, name="tile_update2")(fea_l[2], fea_r[2], init_hyps[2], t8[0])
        t2 = TileUpdate(wv, name="tile_update3")(fea_l[3], fea_r[3], init_hyps[3], t4[0])
        t1 = TileUpdate(wv, name="tile_update4")(fea_l[4], fea_r[4], init_hyps[4], t2[0])
        r1x = PostTileUpdate(32, 16, 4, name="tile_update4_1")(fea_l[2], t1[0])
        r05x = PostTileUpdate(32, 16, 4, name="tile_update5")(
            fea_l[3], hyp_upsample(r1x, 1.0))
        r025x = FinalTileUpdate(16, 2, name="tile_update6")(
            fea_l[4], hyp_upsample(r05x, 1.0))
        final_disp = r025x[..., 0:1]

        if not train:
            return final_disp, None

        # training: slant-upsampled supervision pyramids, pre/cur ordered
        # (propagation.py:374-451)
        planes = [
            hyp_upsample(t16, 16.0, 64),
            hyp_upsample(t8[1], 8.0, 32), hyp_upsample(t8[2], 8.0, 32),
            hyp_upsample(t4[1], 4.0, 16), hyp_upsample(t4[2], 4.0, 16),
            hyp_upsample(t2[1], 2.0, 8), hyp_upsample(t2[2], 2.0, 8),
            hyp_upsample(t1[1], 1.0, 4), hyp_upsample(t1[2], 1.0, 4),
            hyp_upsample(r1x, 1.0, 4),
            hyp_upsample(r05x, 1.0, 2),
            r025x,
        ]
        aux = {
            "prop_disp_pyramid": [p[..., 0:1] for p in planes],
            "dx_pyramid": [p[..., 1:2] for p in planes],
            "dy_pyramid": [p[..., 2:3] for p in planes],
            # w exists for the 8 two-hypothesis outputs only.  Reference
            # quirk kept: propagation.py:436-445 slices channel 3:4 of the
            # upsampled 17-ch plane — the FIRST DESCRIPTOR channel, not the
            # appended confidence at channel 16 — so the w_loss actually
            # supervises descriptor[0]; parity requires the same slice.
            "w_pyramid": [p[..., 3:4] for p in planes[1:9]],
        }
        return final_disp, aux


class HITNetStereo(nn.Module):
    """Stereo wrapper — the `HITNetMF` equivalent (hitnet.py:14-122)."""

    max_disp: int = 320
    init_cost_variant: str = "auto"
    tile_warp_variant: str = "auto"

    @nn.compact
    def __call__(self, left_img, right_img, train: bool = False):
        backbone = HITUNet(name="backbone")
        # one batched pass over [left; right]: the tiny-channel convs are
        # layout/bandwidth-bound, so doubling the batch beats two calls
        # (identical math — the backbone has no cross-batch ops)
        B = left_img.shape[0]
        fea_cat = backbone(jnp.concatenate([left_img, right_img], axis=0))
        fea_l = [f[:B] for f in fea_cat]
        fea_r = [f[B:] for f in fea_cat]
        init_cv, init_hyps = TileInitialization(
            self.max_disp, self.init_cost_variant,
            name="tile_init")(fea_l, fea_r)
        final_disp, aux = TilePropagation(
            self.tile_warp_variant, name="tile_update")(
            fea_l, fea_r, init_hyps, train=train)

        outputs = {
            "pred_disp": final_disp,           # (B, H, W, 1)
            "left_feat": fea_l[2],             # 1/4 res, 24ch
            "right_feat": fea_r[2],
            "left_img": left_img,
        }
        if train:
            outputs["init_cv_pyramid"] = init_cv
            outputs.update(aux)
            outputs["pred_disp"] = aux["prop_disp_pyramid"][-1]
        return outputs
