"""Flow / disparity warping with validity masks.

Behavioural contract mirrors the reference warps (reference: utils/warp.py:43-92):
forward-sample the source image at ``grid + offset`` and derive a validity
mask by warping an all-ones image with zero padding, thresholded at 0.9999.

NHWC layout; flow is (B, H, W, 2) in (dx, dy) pixel units.
"""

from __future__ import annotations

import jax.numpy as jnp

from .grid_sample import grid_sample

__all__ = ["meshgrid_xy", "flow_warp", "disp_warp"]


def meshgrid_xy(h: int, w: int, dtype=jnp.float32):
    """(h, w) maps of x and y pixel coordinates."""
    x = jnp.arange(w, dtype=dtype)[None, :] * jnp.ones((h, 1), dtype)
    y = jnp.arange(h, dtype=dtype)[:, None] * jnp.ones((1, w), dtype)
    return x, y


def _warp(img, coords, padding_mode, mode):
    warped = grid_sample(img, coords, mode=mode, padding_mode=padding_mode)
    ones = jnp.ones_like(img)
    vmask = grid_sample(ones, coords, mode=mode, padding_mode="zeros")
    valid = vmask >= 0.9999
    return warped, valid


def flow_warp(img: jnp.ndarray, flow: jnp.ndarray, padding_mode: str = "border",
              mode: str = "bilinear"):
    """Backward-warp ``img`` by optical flow.

    img: (B, H, W, C); flow: (B, H, W, 2).
    Returns (warped (B,H,W,C), valid (B,H,W,C) bool).
    """
    B, H, W, _ = img.shape
    x, y = meshgrid_xy(H, W, img.dtype)
    coords = jnp.stack([x[None] + flow[..., 0], y[None] + flow[..., 1]], axis=-1)
    return _warp(img, coords, padding_mode, mode)


def interpolate_value_disp(x: jnp.ndarray, indices: jnp.ndarray,
                           maxdisp: int) -> jnp.ndarray:
    """Linearly interpolate a cost/offset volume x (B,H,W,D) at fractional
    disparity ``indices`` (B,H,W) (reference utils/warp.py:95-118)."""
    idx = jnp.clip(indices, 0, maxdisp - 1)
    i0 = jnp.floor(idx)
    i1 = jnp.minimum(i0 + 1, maxdisp - 1)
    i0 = jnp.maximum(i1 - 1, 0)
    y0 = jnp.take_along_axis(x, i0.astype(jnp.int32)[..., None], -1)[..., 0]
    y1 = jnp.take_along_axis(x, i1.astype(jnp.int32)[..., None], -1)[..., 0]
    lam = idx - i0
    return (1 - lam) * y0 + lam * y1


def get_disp_from_offset(pred_vol: jnp.ndarray, off_vol: jnp.ndarray,
                         maxdisp: int, down: int) -> jnp.ndarray:
    """Argmax disparity + interpolated offset, scaled back to full res
    (reference utils/warp.py:121-125).  Volumes are (B,H,W,D)."""
    pred = jnp.argmax(pred_vol, axis=-1).astype(pred_vol.dtype)
    off = interpolate_value_disp(off_vol, pred, maxdisp // down)
    return (pred + off) * down


def disp_warp(img: jnp.ndarray, disp: jnp.ndarray, padding_mode: str = "border"):
    """Backward-warp the right image by (positive) disparity.

    img: (B, H, W, C); disp: (B, H, W) or (B, H, W, 1).
    Returns (warped, valid) like :func:`flow_warp`.

    Disparity shifts are horizontal-only, so the bilinear sample needs two
    taps (same row), not four — half the gather traffic of the generic
    grid_sample path.
    """
    if disp.ndim == 4:
        disp = disp[..., 0]
    B, H, W, C = img.shape
    x, _ = meshgrid_xy(H, W, img.dtype)
    xs = x[None] - disp  # (B, H, W)
    warped, inb = _hwarp(img, xs, padding_mode)
    valid = jnp.broadcast_to(inb[..., None], warped.shape)
    return warped, valid


def _hwarp(img: jnp.ndarray, xs: jnp.ndarray, padding_mode: str):
    """Horizontal-only bilinear sample: img (B,H,W,C) at x-coords xs (B,H,W).

    Returns (warped (B,H,W,C), in_bounds (B,H,W) bool matching the
    reference validity semantics: ones warped with zeros padding >= 0.9999).
    """
    B, H, W, C = img.shape
    x0f = jnp.floor(xs)
    wx = (xs - x0f).astype(img.dtype)[..., None]

    def tap(xf):
        xi = jnp.clip(xf, 0, W - 1).astype(jnp.int32)
        v = jnp.take_along_axis(img, xi[..., None], axis=2)
        if padding_mode == "zeros":
            ok = (xf >= 0) & (xf <= W - 1)
            v = v * ok[..., None].astype(img.dtype)
        return v

    v0 = tap(x0f)
    v1 = tap(x0f + 1)
    warped = v0 * (1 - wx) + v1 * wx
    # validity: weight mass of in-bounds taps (== warping ones with zeros)
    ok0 = ((x0f >= 0) & (x0f <= W - 1)).astype(img.dtype)
    ok1 = ((x0f + 1 >= 0) & (x0f + 1 <= W - 1)).astype(img.dtype)
    mass = ok0 * (1 - wx[..., 0]) + ok1 * wx[..., 0]
    return warped, mass >= 0.9999
