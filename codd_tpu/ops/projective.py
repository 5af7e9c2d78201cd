"""Pinhole projection ops on dense depth / point fields.

Math parity with the reference (reference: model/motion/raft3d/projective_ops.py),
re-laid-out for NHW(-C) tensors: depth is (B, H, W), intrinsics (B, 4) as
``[fx, fy, cx, cy]``, points (B, H, W, 3).
"""

from __future__ import annotations

import jax.numpy as jnp

from . import se3
from .warp import meshgrid_xy

MIN_DEPTH = 0.05
EPS = 1e-5

__all__ = [
    "project", "inv_project", "projective_transform", "induced_flow",
    "MIN_DEPTH",
]


def project(points: jnp.ndarray, intrinsics: jnp.ndarray) -> jnp.ndarray:
    """Points (B,H,W,3) -> image coords (B,H,W,3) = [x, y, 1/Z]."""
    X, Y, Z = jnp.moveaxis(points, -1, 0)
    Z = Z + EPS
    fx, fy, cx, cy = [intrinsics[:, i, None, None] for i in range(4)]
    x = fx * (X / Z) + cx
    y = fy * (Y / Z) + cy
    d = 1.0 / Z
    return jnp.stack([x, y, d], axis=-1)


def inv_project(depth: jnp.ndarray, intrinsics: jnp.ndarray) -> jnp.ndarray:
    """Depth (B,H,W) -> camera-space points (B,H,W,3)."""
    H, W = depth.shape[-2:]
    fx, fy, cx, cy = [intrinsics[:, i, None, None] for i in range(4)]
    x, y = meshgrid_xy(H, W, depth.dtype)
    X = depth * ((x[None] - cx) / fx)
    Y = depth * ((y[None] - cy) / fy)
    return jnp.stack([X, Y, depth], axis=-1)


def projective_transform(Ts: jnp.ndarray, depth: jnp.ndarray, intrinsics: jnp.ndarray):
    """Apply the dense transform field and reproject.

    Ts: (B,H,W,7) SE3 field. Returns (coords (B,H,W,3), valid (B,H,W) float).
    """
    X0 = inv_project(depth, intrinsics)
    X1 = se3.act(Ts, X0)
    x1 = project(X1, intrinsics)
    valid = (X0[..., 2] > MIN_DEPTH) & (X1[..., 2] > MIN_DEPTH)
    return x1, valid.astype(depth.dtype)


def induced_flow(Ts: jnp.ndarray, depth: jnp.ndarray, intrinsics: jnp.ndarray):
    """2D+invdepth flow and 3D flow induced by the SE3 field.

    Returns (flow2d (B,H,W,3), flow3d (B,H,W,3), valid (B,H,W) float).
    """
    X0 = inv_project(depth, intrinsics)
    X1 = se3.act(Ts, X0)
    x0 = project(X0, intrinsics)
    x1 = project(X1, intrinsics)
    valid = (X0[..., 2] > MIN_DEPTH) & (X1[..., 2] > MIN_DEPTH)
    return x1 - x0, X1 - X0, valid.astype(depth.dtype)
