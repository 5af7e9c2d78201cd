"""Image resampling with exact ``torch.nn.functional.grid_sample`` semantics.

The reference implementation leans on torch's grid_sample in every warp op
(reference: utils/warp.py:43-92, model/motion/raft3d/sampler_ops.py:9-28,
model/stereo/hitnet/propagation.py:35-58).  Accuracy parity of the whole
pipeline dies if these differ, so this module reproduces the
``align_corners=True`` bilinear/nearest gather exactly, but in pixel
coordinates (the normalized-grid dance is an artifact of the torch API and
is dropped at this layer; callers that need it convert once).

All functions take NHWC images and pixel-space ``(x, y)`` coordinates.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["grid_sample", "gather_pixels"]


def _gather_2d(img: jnp.ndarray, ix: jnp.ndarray, iy: jnp.ndarray) -> jnp.ndarray:
    """Gather img[b, iy, ix, :] for integer index maps.

    img: (B, H, W, C); ix/iy: (B, *Q) int32 already clamped to range.
    Returns (B, *Q, C).
    """
    B, H, W, C = img.shape
    flat = img.reshape(B, H * W, C)
    idx = (iy * W + ix).reshape(B, -1)
    out = jnp.take_along_axis(flat, idx[..., None], axis=1)
    return out.reshape(ix.shape + (C,))


def grid_sample(
    img: jnp.ndarray,
    coords: jnp.ndarray,
    mode: str = "bilinear",
    padding_mode: str = "zeros",
) -> jnp.ndarray:
    """Sample ``img`` at pixel coordinates (align_corners=True semantics).

    Args:
      img: (B, H, W, C).
      coords: (B, *Q, 2) with ``coords[..., 0] = x`` and ``coords[..., 1] = y``
        in pixel units (0..W-1 / 0..H-1 is in-bounds).
      mode: "bilinear" | "nearest".
      padding_mode: "zeros" | "border".

    Returns:
      (B, *Q, C) sampled values.
    """
    B, H, W, C = img.shape
    x = coords[..., 0]
    y = coords[..., 1]

    if mode == "nearest":
        # torch uses std::nearbyint (round half to even), as does jnp.round.
        xr = jnp.round(x)
        yr = jnp.round(y)
        xi = jnp.clip(xr, 0, W - 1).astype(jnp.int32)
        yi = jnp.clip(yr, 0, H - 1).astype(jnp.int32)
        out = _gather_2d(img, xi, yi)
        if padding_mode == "zeros":
            valid = (xr >= 0) & (xr <= W - 1) & (yr >= 0) & (yr <= H - 1)
            out = out * valid[..., None].astype(img.dtype)
        return out

    if mode != "bilinear":
        raise ValueError(f"unsupported mode: {mode}")

    x0f = jnp.floor(x)
    y0f = jnp.floor(y)
    wx = (x - x0f).astype(img.dtype)[..., None]
    wy = (y - y0f).astype(img.dtype)[..., None]

    def corner(xf, yf):
        xi = jnp.clip(xf, 0, W - 1).astype(jnp.int32)
        yi = jnp.clip(yf, 0, H - 1).astype(jnp.int32)
        v = _gather_2d(img, xi, yi)
        if padding_mode == "zeros":
            ok = (xf >= 0) & (xf <= W - 1) & (yf >= 0) & (yf <= H - 1)
            v = v * ok[..., None].astype(img.dtype)
        return v

    v00 = corner(x0f, y0f)
    v01 = corner(x0f + 1, y0f)
    v10 = corner(x0f, y0f + 1)
    v11 = corner(x0f + 1, y0f + 1)

    top = v00 * (1 - wx) + v01 * wx
    bot = v10 * (1 - wx) + v11 * wx
    return top * (1 - wy) + bot * wy


def gather_pixels(img: jnp.ndarray, ix: jnp.ndarray, iy: jnp.ndarray,
                  fill: float = 0.0) -> jnp.ndarray:
    """Integer gather with zero (or ``fill``) padding outside the image.

    img: (B, H, W, C); ix/iy: (B, *Q) integer maps (any int dtype).
    Equivalent to nearest-mode grid_sample at exact integer coords — used by
    the tile-initialization cost volume where the reference abuses a nearest
    5-D grid_sample as a disparity gather (reference: initialization.py:18-45).
    """
    B, H, W, C = img.shape
    valid = (ix >= 0) & (ix < W) & (iy >= 0) & (iy < H)
    xi = jnp.clip(ix, 0, W - 1).astype(jnp.int32)
    yi = jnp.clip(iy, 0, H - 1).astype(jnp.int32)
    out = _gather_2d(img, xi, yi)
    out = jnp.where(valid[..., None], out, jnp.asarray(fill, img.dtype))
    return out
