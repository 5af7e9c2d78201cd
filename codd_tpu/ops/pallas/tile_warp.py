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
model scale.  Here each grid step holds ONE tile row's full-width right
features in VMEM (~330 KB) and does the tap selection as in-VMEM lane
gathers (jnp.take_along_axis on the minor dim) — no HBM intermediates,
no descriptors, no band matmuls.

Layout contract (prepared by the wrapper, all channel-first / n-on-lanes
— the gn_fused.py lesson: never put a small channel dim on lanes):
  * fea_r:  (B*ht, 4*C, Wp)  row i at sublanes [i*C, (i+1)*C), W padded
            by 3 columns each side (zeros) for the 4-tap window, plus
            right alignment slack.
  * fea_l:  (B*ht, 48_or_more, wt) tile layout: channel (i*4+j)*C + c
            holds left pixel (i, 4*tx + j, c).
  * hyp3:   (B*ht, 3, wt) rows [d, dx, dy].
  * out:    (B*ht, 48, wt) cost rows k*16 + i*4 + j.

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


def _kernel(fear_ref, feal_ref, hyp_ref, out_ref, *, C, W, wt):
    """One tile row: fear (1, 4C, Wp), feal (1, 16C, wt), hyp (1, 8, wt),
    out (1, 48, wt).  Static python loops only."""
    f32 = jnp.float32
    d = hyp_ref[0, 0:1, :].astype(f32)     # (1, wt)
    dxs = hyp_ref[0, 1:2, :].astype(f32)
    dys = hyp_ref[0, 2:3, :].astype(f32)

    # pixel x positions per in-tile column j: x = 4*tx + j
    tx4 = jax.lax.broadcasted_iota(f32, (1, wt), 1) * 4.0

    for i in range(4):
        fr = fear_ref[0, i * C:(i + 1) * C, :].astype(f32)   # (C, Wp)
        for j in range(4):
            # slant plane at pixel (i, j) of every tile (to_plane, size=4)
            local_d = d + dxs * (j - 1.5) + dys * (i - 1.5)
            p = tx4 + j - local_d                            # (1, wt)
            x0 = jnp.floor(p)
            f = (p - x0)                                     # (1, wt)
            base = x0.astype(jnp.int32) - 1 + _PAD           # leftmost tap
            # four taps at base + m, m in 0..3; clamp into the padded
            # buffer, mask out-of-image taps to zero (zeros-padding
            # grid_sample semantics — identical to tile_warping)
            taps = []
            for m in range(4):
                xm = x0 - 1 + m                              # unpadded tap x
                idx = jnp.clip(base + m, 0, W + 2 * _PAD - 1)
                g = jnp.take_along_axis(
                    fr, jnp.broadcast_to(idx, (C, wt)), axis=1)  # (C, wt)
                ok = ((xm >= 0) & (xm <= W - 1)).astype(f32)
                taps.append(g * ok)
            fl_ij = feal_ref[0, (i * 4 + j) * C:(i * 4 + j + 1) * C,
                             :].astype(f32)                  # (C, wt)
            # k in (-1, 0, +1) <-> tap starts (2, 1, 0) (tile_warping)
            for kk, m in enumerate((2, 1, 0)):
                warped = taps[m] * (1.0 - f) + taps[m + 1] * f
                cost = jnp.sum(jnp.abs(fl_ij - warped), axis=0,
                               keepdims=True)                # (1, wt)
                out_ref[0, kk * 16 + i * 4 + j, :] = cost[0]


@functools.partial(jax.jit, static_argnames=("interpret",))
def tile_warp_cost(hyp3, fea_l, fea_r, interpret: bool = False):
    """hyp3: (B, ht, wt, 3), fea_l/fea_r: (B, H, W, C) with H = 4*ht,
    W = 4*wt.  Returns (B, ht, wt, 48) cost in fea_l.dtype — the drop-in
    value of models/stereo/hitnet.tile_warping."""
    B, H, W, C = fea_r.shape
    ht, wt = H // 4, W // 4
    f32 = jnp.float32

    # fea_r -> (B*ht, 4*C, Wp): row-major (i, c) sublanes, padded columns
    fr = jnp.pad(fea_r.astype(f32),
                 ((0, 0), (0, 0), (_PAD, _PAD), (0, 0)))
    fr = fr.reshape(B, ht, 4, W + 2 * _PAD, C)
    fr = fr.transpose(0, 1, 2, 4, 3).reshape(
        B * ht, 4 * C, W + 2 * _PAD)

    # fea_l -> (B*ht, 16*C, wt): channel (i*4+j)*C + c = pixel (i, 4tx+j, c)
    fl = fea_l.astype(f32).reshape(B, ht, 4, wt, 4, C)
    fl = fl.transpose(0, 1, 2, 4, 5, 3).reshape(B * ht, 16 * C, wt)

    hyp = hyp3.astype(f32).transpose(0, 3, 1, 2).reshape(
        B, 3, ht, wt).transpose(0, 2, 1, 3).reshape(B * ht, 3, wt)
    hyp = jnp.pad(hyp, ((0, 0), (0, 5), (0, 0)))  # sublane-align to 8

    kernel = functools.partial(_kernel, C=C, W=W, wt=wt)
    out = pl.pallas_call(
        kernel,
        grid=(B * ht,),
        in_specs=[
            pl.BlockSpec((1, 4 * C, W + 2 * _PAD), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 16 * C, wt), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, wt), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 48, wt), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B * ht, 48, wt), f32),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
    )(fr, fl, hyp)

    out = out.reshape(B, ht, 48, wt).transpose(0, 1, 3, 2)
    return out.astype(fea_l.dtype)


def tile_warp_cost_reference(hyp3, fea_l, fea_r):
    """The exact XLA path (models/stereo/hitnet.tile_warping) — oracle for
    the interpret tests and the on-chip gate."""
    from ...models.stereo.hitnet import tile_warping

    return tile_warping(hyp3, fea_l, fea_r)
