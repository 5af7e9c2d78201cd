"""Correlation pyramid + windowed lookup (RAFT-3D style), TPU formulation.

The reference materializes an all-pairs (B, h, w, h, w) correlation volume,
average-pools it into a 4-level pyramid, and indexes radius-3 windows with
a CUDA gather (`lietorch_extras.corr_index_forward`, reference:
blocks/corr.py).

TPU re-design (exactly equivalent math, radically different access
pattern):  correlation is *linear in f2*, so

    avgpool(corr(f1, f2), level l)  ==  corr(f1, avgpool^l(f2))

and the pyramid can be stored as pooled **feature maps** instead of pooled
volumes.  A window lookup then becomes:
  1. gather the (2r+2)^2 integer feature taps around each target coord
     (row gathers of 128-wide rows — ~bandwidth speed, unlike the
     element-wise volume gathers which run ~100x slower on TPU),
  2. one batched einsum against f1 (MXU),
  3. bilinear combination of the (2r+2)^2 tap dots into (2r+1)^2 values.

This removes the (n, n) volume entirely: less HBM, no all-pairs matmul,
and profiled ~100x faster lookups than the volume-gather version.

DO NOT re-try the per-query correlation-MAP pyramid (build (B,N,hl,wl)
volumes once per frame with an MXU einsum, then gather (t,t) scalar
patches per iteration): it gathers 16-byte contiguous chunks and ran at
948 ms per frame vs 45 ms for this formulation (measured 2026-08-17 on
v5e; TPU gathers need >=256-byte contiguous chunks to run near
bandwidth — the (t,t,C) feature patches here are 256B-chunked).
"""

from __future__ import annotations

from typing import Dict, List

import jax
import jax.numpy as jnp

__all__ = ["build_corr_pyramid", "corr_lookup"]


def build_corr_pyramid(fmap1: jnp.ndarray, fmap2: jnp.ndarray,
                       num_levels: int = 4) -> Dict:
    """fmap1/fmap2: (B, h, w, C).  Returns the lookup state: normalized f1
    and the pooled-f2 feature pyramid (matches reference scaling
    <f1/4, f2/4>, corr.py:56-62)."""
    x = fmap2 / 4.0
    # bf16 storage: halves the tap-gather HBM traffic; dots accumulate f32
    levels = [x.astype(jnp.bfloat16)]
    for _ in range(num_levels - 1):
        x = jax.lax.reduce_window(
            x, 0.0, jax.lax.add, (1, 2, 2, 1), (1, 2, 2, 1), "VALID") / 4.0
        levels.append(x.astype(jnp.bfloat16))
    return {"f1": (fmap1 / 4.0).astype(jnp.bfloat16), "levels": levels}


def _lookup_level(f1: jnp.ndarray, f2_l: jnp.ndarray, coords: jnp.ndarray,
                  radius: int) -> jnp.ndarray:
    """f1: (B,h,w,C); f2_l: (B,hl,wl,C); coords: (B,h,w,2) in level pixels.
    Returns (B, h, w, (2r+1)^2), window row-major (dy outer, dx inner).

    The t x t integer taps per query form one contiguous (t, t, C) patch,
    so the lookup is ONE sliced gather per query (t*t = 64x fewer gather
    descriptors than per-tap row gathers — the per-tap form cost ~3.6 ms
    per GN iteration at KITTI res, dominating the refinement loop).  The
    level features are zero-padded by 2r+1 so patch starts never clip:
    out-of-image taps read zeros, which contribute exactly the 0 the
    validity mask used to enforce; queries so far outside that every tap
    is invalid are clamped into range and masked at the end."""
    B, h, w, C = f1.shape
    hl, wl = f2_l.shape[1:3]
    N = h * w
    r = radius
    t = 2 * r + 2  # integer taps covering all bilinear supports
    P = 2 * r + 1  # zero padding: valid patch starts for all clamped x0

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

    f2p = jnp.pad(f2_l, ((0, 0), (P, P), (P, P), (0, 0)))

    dnums = jax.lax.GatherDimensionNumbers(
        offset_dims=(1, 2, 3), collapsed_slice_dims=(),
        start_index_map=(0, 1))

    def gather_one(op, idx):
        return jax.lax.gather(
            op, idx, dnums, slice_sizes=(t, t, C),
            mode=jax.lax.GatherScatterMode.PROMISE_IN_BOUNDS)

    starts = jnp.stack([sy, sx], axis=-1)  # (B, N, 2)
    patches = jax.vmap(gather_one)(f2p, starts)  # (B, N, t, t, C)

    dots = jnp.einsum("bnyxc,bnc->bnyx", patches, f1.reshape(B, N, C),
                      preferred_element_type=jnp.float32)
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
    f1 = pyramid["f1"]
    out = []
    for i, f2_l in enumerate(pyramid["levels"]):
        out.append(_lookup_level(f1, f2_l, coords / (2 ** i), radius))
    return jnp.concatenate(out, axis=-1)
