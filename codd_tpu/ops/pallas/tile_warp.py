"""Fused slant-plane tile-warp cost volume — a Pallas kernel for the
stereo propagation hot spot (VERDICT r4 task #5).

Semantics: identical to models/stereo/hitnet.tile_warping (reference
TileWarping, propagation.py:61-86): for each 4x4 tile with hypothesis
(d, dx, dy), warp the right features by the local slant plane at the
three offsets k in {-1, 0, +1}, take the L1 distance to the left
features, and PixelUnshuffle(4) into a (ht, wt, 48) cost with channel
layout k*16 + i*4 + j.

Why a kernel: the exact XLA path is one 4-column gather per *pixel*
(~25 ns/descriptor x 491k pixels x 2 CV encoders = ~24 ms of
tile_update4's 29 ms, BENCH_NOTES r4); the tilewin XLA variant cuts
descriptors 16x but pays a 141 MB one-hot band reduction that loses at
model scale.  Here each grid step holds ONE tile row's full-width
features in VMEM and does the tap selection as in-VMEM lane gathers —
no HBM intermediates, no descriptors, no band matmuls.

Mosaic gather constraint (measured 2026-08-19, check_tile_warp_tpu on
chip): the TPU lowering ONLY supports ``take_along_axis`` where the
index array has the SAME shape as the operand
(``indices_aval.shape == in_aval.shape + (1,)`` assertion in
``_gather_lowering_rule``).  The first cut gathered (C, wt) taps out of
a (C, Wp) buffer and failed to lower.  This version is pixel-major:
every operand and every gather lives on the SAME (·, Wp) lane grid —
left/right features share one (4*C, Wp) layout, the per-pixel plane
offsets are precomputed by XLA outside the kernel, and the
PixelUnshuffle(4) to tile space happens outside too (a cheap static
reshape/transpose).

Layout contract (prepared by the wrapper, channels on sublanes, pixels
on lanes — the gn_fused.py lesson: never put a small channel dim on
lanes):
  * fea_r / fea_l: (B*ht, 4*C, Wp)  in-tile row i at sublanes
    [i*C, (i+1)*C), W padded by _PAD zero columns each side.
  * pb:   (B*ht, 8, Wp) rows [p_base, dy_slope, 0...]:
    p_base(x) = x - (d + dx_slope*(j - 1.5)) at pixel granularity.
  * out:  (B*ht, 12, Wp) cost rows i*3 + kk  (kk indexes k in -1,0,+1).

On-device equality gate: scripts/check_tile_warp_tpu.py (and the
interpret-mode test tests/test_tile_warp_pallas.py) vs tile_warping —
the gate MUST run on the real chip before this kernel backs any bench
number (gn_window lesson: interpret equality != compiled equality).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["tile_warp_cost", "tile_warp_cost_reference"]

_PAD = 3  # left/right zero columns: the 4-tap window of clamped x0


def _kernel(fear_ref, feal_ref, pb_ref, out_ref, *, C, W):
    """One tile row: fear/feal (1, 4C, Wp), pb (1, 8, Wp), out (1, 12, Wp).
    Static python loops only; every gather is same-shape on (C, Wp)."""
    f32 = jnp.float32
    Wp = fear_ref.shape[-1]
    p_base = pb_ref[0, 0:1, :].astype(f32)   # (1, Wp)
    dys = pb_ref[0, 1:2, :].astype(f32)

    for i in range(4):
        p = p_base - dys * (i - 1.5)         # slant plane at sub-row i
        x0 = jnp.floor(p)
        f = p - x0                           # (1, Wp)
        fr = fear_ref[0, i * C:(i + 1) * C, :].astype(f32)   # (C, Wp)
        fl = feal_ref[0, i * C:(i + 1) * C, :].astype(f32)
        taps = []
        for m in range(4):
            xm = x0 - 1 + m                  # unpadded tap x, (1, Wp)
            idx = jnp.clip(xm.astype(jnp.int32) + _PAD, 0, Wp - 1)
            g = jnp.take_along_axis(
                fr, jnp.broadcast_to(idx, (C, Wp)), axis=1)  # same-shape
            # mask out-of-image taps to zero (zeros-padding grid_sample
            # semantics — identical to tile_warping)
            ok = ((xm >= 0) & (xm <= W - 1)).astype(f32)
            taps.append(g * ok)
        # k in (-1, 0, +1) <-> tap starts (2, 1, 0) (tile_warping)
        for kk, m in enumerate((2, 1, 0)):
            warped = taps[m] * (1.0 - f) + taps[m + 1] * f
            cost = jnp.sum(jnp.abs(fl - warped), axis=0,
                           keepdims=True)    # (1, Wp)
            out_ref[0, i * 3 + kk, :] = cost[0]


@functools.partial(jax.jit, static_argnames=("interpret",))
def tile_warp_cost(hyp3, fea_l, fea_r, interpret: bool = False):
    """hyp3: (B, ht, wt, 3), fea_l/fea_r: (B, H, W, C) with H = 4*ht,
    W = 4*wt.  Returns (B, ht, wt, 48) cost in fea_l.dtype — the drop-in
    value of models/stereo/hitnet.tile_warping."""
    B, H, W, C = fea_r.shape
    ht, wt = H // 4, W // 4
    Wp = W + 2 * _PAD
    f32 = jnp.float32

    def rows(x):  # (B, H, W, C) -> (B*ht, 4*C, Wp)
        x = jnp.pad(x.astype(f32), ((0, 0), (0, 0), (_PAD, _PAD), (0, 0)))
        x = x.reshape(B, ht, 4, Wp, C)
        return x.transpose(0, 1, 2, 4, 3).reshape(B * ht, 4 * C, Wp)

    fr = rows(fea_r)
    fl = rows(fea_l)

    # per-pixel plane offsets (XLA precompute): x = 4*tx + j
    d = hyp3[..., 0].astype(f32)             # (B, ht, wt)
    dxs = hyp3[..., 1].astype(f32)
    dys = hyp3[..., 2].astype(f32)
    rep = lambda a: jnp.repeat(a, 4, axis=-1)            # (B, ht, W)
    jc = jnp.tile(jnp.arange(4, dtype=f32) - 1.5, wt)    # (W,)
    xs = jnp.arange(W, dtype=f32)
    p_base = xs - (rep(d) + rep(dxs) * jc)               # (B, ht, W)
    pb = jnp.stack([p_base, rep(dys)], axis=2)           # (B, ht, 2, W)
    pb = jnp.pad(pb, ((0, 0), (0, 0), (0, 6), (_PAD, _PAD)))
    pb = pb.reshape(B * ht, 8, Wp)

    kernel = functools.partial(_kernel, C=C, W=W)
    out = pl.pallas_call(
        kernel,
        grid=(B * ht,),
        in_specs=[
            pl.BlockSpec((1, 4 * C, Wp), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 4 * C, Wp), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, Wp), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 12, Wp), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B * ht, 12, Wp), f32),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
    )(fr, fl, pb)

    # (B*ht, 12, Wp) -> (B, ht, wt, 48) with channel k*16 + i*4 + j
    out = out[:, :, _PAD:_PAD + W].reshape(B, ht, 4, 3, wt, 4)
    out = out.transpose(0, 1, 4, 3, 2, 5).reshape(B, ht, wt, 48)
    return out.astype(fea_l.dtype)


def tile_warp_cost_reference(hyp3, fea_l, fea_r):
    """The exact XLA path (models/stereo/hitnet.tile_warping) — oracle for
    the interpret tests and the on-chip gate."""
    from ...models.stereo.hitnet import tile_warping

    return tile_warping(hyp3, fea_l, fea_r)
