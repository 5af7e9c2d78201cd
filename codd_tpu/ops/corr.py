"""Correlation pyramid + windowed lookup (RAFT-3D style), TPU formulation.

The reference materializes an all-pairs (B, h, w, h, w) correlation volume,
average-pools it into a 4-level pyramid, and indexes radius-3 windows with
a CUDA gather (`lietorch_extras.corr_index_forward`, reference:
blocks/corr.py).

TPU re-design (exactly equivalent math, radically different access
pattern): correlation is *linear in f2*, so

    avgpool(corr(f1, f2), level l)  ==  corr(f1, avgpool^l(f2))

and each pyramid level is built as ONE MXU einsum of f1 against the
pooled f2 — a per-query 2-D correlation map (B, N, hl, wl), stored bf16.
That build runs **once per frame**; the 16-iteration GN refinement loop
then only does per-query (2r+2)^2 *scalar*-patch gathers out of its own
map — 2*C fewer gathered bytes per tap than gathering feature taps and
re-dotting them inside the loop (C=128: ~64x less gather traffic where
it matters).  An earlier variant gathered (t, t, C) feature patches per
query per iteration; the einsum was free but the gathers were ~2.8 ms x
16 iterations per frame.

Element-wise (4-byte) gathers run ~100x below bandwidth on TPU; all
gathers here are sliced patch gathers (one descriptor per query).
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp

__all__ = ["build_corr_pyramid", "corr_lookup"]

# zero padding around each per-query correlation map: must cover every
# clamped tap-window start: sx = clip(x0, -(r+1), wl-1+r) - r + P must stay
# in [0, wl+2P-t], which needs P >= 2r+1 (gathers are PROMISE_IN_BOUNDS —
# an out-of-range start is undefined behavior on TPU, not a clamp)
_RADIUS_PAD = 7


def build_corr_pyramid(fmap1: jnp.ndarray, fmap2: jnp.ndarray,
                       num_levels: int = 4) -> Dict:
    """fmap1/fmap2: (B, h, w, C).  Returns per-level per-query correlation
    maps vols[l]: (B, N, hl+2P, wl+2P) bf16 (zero-padded so lookups never
    clip), matching the reference scaling <f1/4, f2/4> (corr.py:56-62)."""
    B, h, w, C = fmap1.shape
    N = h * w
    f1 = (fmap1 / 4.0).reshape(B, N, C)
    x = fmap2 / 4.0
    P = _RADIUS_PAD
    vols = []
    for lvl in range(num_levels):
        v = jnp.einsum("bnc,byxc->bnyx", f1, x,
                       preferred_element_type=jnp.float32)
        v = jnp.pad(v, ((0, 0), (0, 0), (P, P), (P, P)))
        vols.append(v.astype(jnp.bfloat16))
        if lvl + 1 < num_levels:
            x = jax.lax.reduce_window(
                x, 0.0, jax.lax.add, (1, 2, 2, 1), (1, 2, 2, 1),
                "VALID") / 4.0
    return {"vols": vols, "hw": (h, w)}


def _lookup_level(vol: jnp.ndarray, hl: int, wl: int, coords: jnp.ndarray,
                  radius: int) -> jnp.ndarray:
    """vol: (B, N, hl+2P, wl+2P) padded per-query correlation maps;
    coords: (B, h, w, 2) in level pixels.
    Returns (B, h, w, (2r+1)^2), window row-major (dy outer, dx inner).

    The t x t integer taps per query form one (t, t) patch of the query's
    own map, gathered with ONE descriptor per query.  Out-of-image taps
    read the zero padding — exactly the 0 the validity mask used to
    enforce; queries so far outside that every tap is invalid are clamped
    into range and masked at the end."""
    B, h, w, _ = coords.shape
    N = h * w
    r = radius
    t = 2 * r + 2  # integer taps covering all bilinear supports
    P = _RADIUS_PAD
    assert P >= 2 * r + 1

    cx = coords[..., 0].reshape(B, N)
    cy = coords[..., 1].reshape(B, N)
    x0 = jnp.floor(cx)
    y0 = jnp.floor(cy)
    fx = (cx - x0)[:, :, None]  # (B,N,1)
    fy = (cy - y0)[:, :, None]

    # any-tap-in-image range; outside it the whole window is zero
    vq = ((x0 >= -(r + 1)) & (x0 <= wl - 1 + r)
          & (y0 >= -(r + 1)) & (y0 <= hl - 1 + r))  # (B,N)
    sx = (jnp.clip(x0, -(r + 1), wl - 1 + r) - r + P).astype(jnp.int32)
    sy = (jnp.clip(y0, -(r + 1), hl - 1 + r) - r + P).astype(jnp.int32)

    dnums = jax.lax.GatherDimensionNumbers(
        offset_dims=(1, 2), collapsed_slice_dims=(0,),
        start_index_map=(0, 1, 2))

    def gather_one(op, idx):
        return jax.lax.gather(
            op, idx, dnums, slice_sizes=(1, t, t),
            mode=jax.lax.GatherScatterMode.PROMISE_IN_BOUNDS)

    qidx = jnp.broadcast_to(jnp.arange(N, dtype=jnp.int32)[None, :], (B, N))
    starts = jnp.stack([qidx, sy, sx], axis=-1)  # (B, N, 3)
    dots = jax.vmap(gather_one)(vol, starts).astype(jnp.float32)  # (B,N,t,t)
    dots = dots * vq[:, :, None, None]

    # bilinear combination of neighboring taps -> (2r+1)^2 window values
    d00 = dots[:, :, : t - 1, : t - 1]
    d01 = dots[:, :, : t - 1, 1:]
    d10 = dots[:, :, 1:, : t - 1]
    d11 = dots[:, :, 1:, 1:]
    fx_ = fx[..., None]  # (B,N,1,1)
    fy_ = fy[..., None]
    out = ((1 - fy_) * ((1 - fx_) * d00 + fx_ * d01)
           + fy_ * ((1 - fx_) * d10 + fx_ * d11))
    return out.reshape(B, h, w, (2 * r + 1) ** 2)


def corr_lookup(pyramid: Dict, coords: jnp.ndarray, radius: int = 3
                ) -> jnp.ndarray:
    """Index (2r+1)^2 windows from every pyramid level.

    coords: (B, h, w, 2) target coords in level-0 pixels.
    Returns (B, h, w, L*(2r+1)^2), level-major then window row-major
    (matching the torch cat order, corr.py:47-54)."""
    h, w = pyramid["hw"]
    P = _RADIUS_PAD
    out = []
    hl, wl = h, w
    for i, vol in enumerate(pyramid["vols"]):
        hl = vol.shape[2] - 2 * P
        wl = vol.shape[3] - 2 * P
        out.append(_lookup_level(vol, hl, wl, coords / (2 ** i), radius))
    return jnp.concatenate(out, axis=-1)
