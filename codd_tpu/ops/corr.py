"""All-pairs correlation pyramid + windowed lookup (RAFT-3D style).

The reference materializes a (B, h, w, h, w) correlation volume, average-
pools it into a 4-level pyramid, and indexes radius-3 windows with a CUDA
gather (`lietorch_extras.corr_index_forward`, reference: blocks/corr.py).

TPU re-design: the volume build is a single MXU matmul; the lookup is a
vectorized bilinear gather over the flattened source-pixel axis.  XLA
differentiates the gather (scatter-add in the VJP), replacing the custom
backward kernel.
"""

from __future__ import annotations

from typing import List

import jax
import jax.numpy as jnp

__all__ = ["build_corr_pyramid", "corr_lookup"]


def build_corr_pyramid(fmap1: jnp.ndarray, fmap2: jnp.ndarray,
                       num_levels: int = 4) -> List[jnp.ndarray]:
    """fmap1/fmap2: (B, h, w, C).  Returns list of (B*h*w, h_i, w_i) volumes.

    Matches reference scaling: correlation = <f1/4, f2/4> (corr.py:56-62).
    """
    B, h, w, C = fmap1.shape
    a = fmap1.reshape(B, h * w, C) / 4.0
    b = fmap2.reshape(B, h * w, C) / 4.0
    corr = jnp.einsum("bnc,bmc->bnm", a, b, preferred_element_type=jnp.float32,
                      precision=jax.lax.Precision.HIGHEST)
    corr = corr.reshape(B * h * w, 1, h, w)
    pyramid = []
    for i in range(num_levels):
        hi, wi = h // (2 ** i), w // (2 ** i)
        pyramid.append(corr.reshape(B * h * w, hi, wi))
        if i + 1 < num_levels:
            corr = jax.lax.reduce_window(
                corr, 0.0, jax.lax.add, (1, 1, 2, 2), (1, 1, 2, 2), "VALID"
            ) / 4.0
    return pyramid


def _bilinear_volume_gather(vol: jnp.ndarray, x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
    """vol: (N, H, W); x/y: (N, K) pixel coords.  Zero padding out of range."""
    N, H, W = vol.shape
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    wx = x - x0
    wy = y - y0

    flat = vol.reshape(N, H * W)

    def corner(xf, yf):
        ok = (xf >= 0) & (xf <= W - 1) & (yf >= 0) & (yf <= H - 1)
        xi = jnp.clip(xf, 0, W - 1).astype(jnp.int32)
        yi = jnp.clip(yf, 0, H - 1).astype(jnp.int32)
        v = jnp.take_along_axis(flat, yi * W + xi, axis=1)
        return v * ok.astype(vol.dtype)

    v00 = corner(x0, y0)
    v01 = corner(x0 + 1, y0)
    v10 = corner(x0, y0 + 1)
    v11 = corner(x0 + 1, y0 + 1)
    return (v00 * (1 - wx) + v01 * wx) * (1 - wy) + (v10 * (1 - wx) + v11 * wx) * wy


def corr_lookup(pyramid: List[jnp.ndarray], coords: jnp.ndarray, radius: int = 3) -> jnp.ndarray:
    """Index (2r+1)^2 windows from every pyramid level.

    coords: (B, h, w, 2) target coords in level-0 pixels.
    Returns (B, h, w, L*(2r+1)^2) features, level-major then window
    row-major — matching the torch cat order (corr.py:47-54).
    """
    B, h, w, _ = coords.shape
    n = B * h * w
    r = radius
    d = 2 * r + 1
    offs = jnp.arange(-r, r + 1, dtype=coords.dtype)
    # window offsets, row-major (dy outer, dx inner)
    dy, dx = jnp.meshgrid(offs, offs, indexing="ij")
    dx = dx.reshape(-1)
    dy = dy.reshape(-1)

    out = []
    for i, vol in enumerate(pyramid):
        cx = coords[..., 0].reshape(n, 1) / (2 ** i) + dx[None]
        cy = coords[..., 1].reshape(n, 1) / (2 ** i) + dy[None]
        out.append(_bilinear_volume_gather(vol, cx, cy))
    feat = jnp.concatenate(out, axis=-1)  # (n, L*d*d)
    return feat.reshape(B, h, w, len(pyramid) * d * d)
