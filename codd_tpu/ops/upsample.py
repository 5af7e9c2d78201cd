"""Resolution-change ops: convex upsampling, slant-plane tile expansion,
pixel (un)shuffle, nearest/bilinear resize.

NHWC throughout.  Channel orders match the torch reference where a learned
layer consumes the result (so ported weights stay valid).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from . import se3

__all__ = [
    "unfold3x3", "cvx_upsample", "upsample_se3", "to_plane", "hyp_upsample",
    "pixel_unshuffle", "interpolate_nearest", "interpolate_bilinear",
]


def unfold3x3(x: jnp.ndarray, dilation: int = 1) -> jnp.ndarray:
    """Extract 3x3 neighborhoods: (B,H,W,C) -> (B,H,W,9,C).

    Neighborhood order is row-major (dy, dx) like torch F.unfold.
    """
    d = dilation
    xp = jnp.pad(x, ((0, 0), (d, d), (d, d), (0, 0)))
    H, W = x.shape[1:3]
    patches = [
        xp[:, dy * d:dy * d + H, dx * d:dx * d + W, :]
        for dy in range(3)
        for dx in range(3)
    ]
    return jnp.stack(patches, axis=3)


def cvx_upsample(data: jnp.ndarray, mask: jnp.ndarray, factor: int = 8) -> jnp.ndarray:
    """RAFT-style convex-combination upsampling (reference: se3_field.py:173-186).

    data: (B,h,w,C); mask: (B,h,w,9*factor*factor) logits laid out as
    (9, factor, factor) per pixel (torch channel order).  Returns
    (B, h*factor, w*factor, C).
    """
    B, h, w, C = data.shape
    f = factor
    m = mask.reshape(B, h, w, 9, f, f)
    m = jax.nn.softmax(m, axis=3)
    nb = unfold3x3(data)  # (B,h,w,9,C)
    up = jnp.einsum("bhwkyx,bhwkc->bhwyxc", m, nb)
    up = up.transpose(0, 1, 3, 2, 4, 5).reshape(B, h * f, w * f, C)
    return up


def upsample_se3(Ts: jnp.ndarray, mask: jnp.ndarray, factor: int = 8) -> jnp.ndarray:
    """Upsample an SE3 field through the tangent space (se3_field.py:189-192)."""
    tau = se3.log(Ts)
    return se3.exp(cvx_upsample(tau, mask, factor))


def to_plane(d: jnp.ndarray, dx: jnp.ndarray, dy: jnp.ndarray, size: int = 4) -> jnp.ndarray:
    """Expand per-tile slant planes to per-pixel disparity (propagation.py:10-23).

    d/dx/dy: (B,h,w) or (B,h,w,1).  Returns (B, h*size, w*size) planar disp
    ``d + a*dx + b*dy`` with a,b in {-(s-1)/2 .. (s-1)/2} (a varies along x).
    """
    if d.ndim == 4:
        d, dx, dy = d[..., 0], dx[..., 0], dy[..., 0]
    B, h, w = d.shape
    c = jnp.linspace(-(size - 1) / 2.0, (size - 1) / 2.0, size, dtype=d.dtype)
    # (B,h,1,w,1) + offsets
    val = (
        d[:, :, None, :, None]
        + c[None, None, None, None, :] * dx[:, :, None, :, None]
        + c[None, None, :, None, None] * dy[:, :, None, :, None]
    )
    return val.reshape(B, h * size, w * size)


def interpolate_nearest(x: jnp.ndarray, scale: int) -> jnp.ndarray:
    """Nearest-neighbor upsample by integer factor (NHWC)."""
    return jnp.repeat(jnp.repeat(x, scale, axis=1), scale, axis=2)


def interpolate_bilinear(x: jnp.ndarray, out_hw, align_corners: bool = True) -> jnp.ndarray:
    """Bilinear resize (NHWC) with torch align_corners semantics."""
    from .grid_sample import grid_sample

    B, H, W, C = x.shape
    oh, ow = out_hw
    if align_corners:
        ys = jnp.linspace(0.0, H - 1.0, oh)
        xs = jnp.linspace(0.0, W - 1.0, ow)
    else:
        ys = (jnp.arange(oh) + 0.5) * (H / oh) - 0.5
        xs = (jnp.arange(ow) + 0.5) * (W / ow) - 0.5
    gx, gy = jnp.meshgrid(xs, ys)
    coords = jnp.broadcast_to(jnp.stack([gx, gy], -1)[None], (B, oh, ow, 2))
    return grid_sample(x, coords, mode="bilinear", padding_mode="border")


def hyp_upsample(h: jnp.ndarray, scale: float, size: int = 2) -> jnp.ndarray:
    """Tile-hypothesis upsampling (propagation.py:26-32).

    h: (B,ht,wt,C) with channels [d, dx, dy, rest...].  The disparity plane
    is expanded with the slant equation then multiplied by ``scale``; the
    remaining channels are nearest-upsampled.
    """
    d = to_plane(h[..., 0], h[..., 1], h[..., 2], size=size) * scale
    rest = interpolate_nearest(h[..., 1:], size)
    return jnp.concatenate([d[..., None], rest], axis=-1)


def pixel_unshuffle(x: jnp.ndarray, factor: int) -> jnp.ndarray:
    """torch PixelUnshuffle in NHWC: (B,H,W,C) -> (B,H/f,W/f,C*f*f).

    Output channel order matches torch: out[c*f*f + py*f + px].
    """
    B, H, W, C = x.shape
    f = factor
    x = x.reshape(B, H // f, f, W // f, f, C)
    x = x.transpose(0, 1, 3, 5, 2, 4)  # B, H/f, W/f, C, fy, fx
    return x.reshape(B, H // f, W // f, C * f * f)
