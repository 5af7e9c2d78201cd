"""Z-buffered point splatting (forward warping) — the TPU re-design of the
pytorch3d point renderer used by the motion module (reference:
model/motion/motion.py:22-42,82-130).

Semantics reproduced:
  * every 3-D point projects into the image; it covers the pixels whose
    centers lie within ``radius_px`` of the projection,
  * per covered pixel the point contributes alpha = 1 - d^2/r^2,
  * fragments on a pixel are alpha-composited front-to-back in depth order
    (nearest surface dominates; up to ``points_per_pixel`` fragments),
  * the returned zbuf is the depth of the nearest fragment (0 where empty,
    matching relu(-1-background) in the reference).

TPU formulation: fragments = (point, window-offset) pairs; a single
lexicographic ``lax.sort`` by (pixel-id, z) orders all fragments, after
which per-pixel transmittance is an exclusive segment cumsum in log space
and the composite is a ``segment_sum`` — no data-dependent loops, fully
differentiable by XLA.

Known divergence from the reference (documented, intentional): pytorch3d's
screen-space convention puts pixel centers at half-integer coordinates,
which shifts the reference's splats by 0.5 px relative to its own
``inv_project`` grid.  We keep pixel centers at integers so forward and
backward warps are mutually consistent.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

__all__ = ["splat_render"]


def _splat_one(points, features, intrinsics, H, W, radius_px, window, points_per_pixel):
    """points: (N,3), features: (N,C), intrinsics: (4,)."""
    N, C = features.shape
    K = window * window
    f32 = jnp.float32

    fx, fy, cx, cy = intrinsics
    X, Y, Z = points[:, 0], points[:, 1], points[:, 2]
    zvalid = Z > 1e-4
    zs = jnp.where(zvalid, Z, 1.0)
    x = fx * (X / zs) + cx
    y = fy * (Y / zs) + cy

    r = window // 2
    offs = jnp.arange(-r, r + 1)
    dy, dx = jnp.meshgrid(offs, offs, indexing="ij")
    dx = dx.reshape(-1)  # (K,)
    dy = dy.reshape(-1)

    bx = jnp.floor(x + 0.5).astype(jnp.int32)  # nearest pixel
    by = jnp.floor(y + 0.5).astype(jnp.int32)
    px = bx[:, None] + dx[None, :]  # (N,K)
    py = by[:, None] + dy[None, :]

    d2 = (px.astype(f32) - x[:, None]) ** 2 + (py.astype(f32) - y[:, None]) ** 2
    alpha = 1.0 - d2 / (radius_px * radius_px)
    ok = (
        (alpha > 0)
        & (px >= 0) & (px < W) & (py >= 0) & (py < H)
        & zvalid[:, None]
    )
    npix = H * W
    pid = jnp.where(ok, py * W + px, npix).reshape(-1)  # invalid -> dump bucket
    z = jnp.broadcast_to(Z[:, None], (N, K)).reshape(-1).astype(f32)
    alpha = jnp.clip(alpha, 0.0, 1.0 - 1e-4).reshape(-1)

    src = jnp.broadcast_to(jnp.arange(N, dtype=jnp.int32)[:, None], (N, K)).reshape(-1)
    pid_s, z_s, alpha_s, src_s = jax.lax.sort(
        (pid, z, alpha, src), dimension=0, num_keys=2
    )

    M = pid_s.shape[0]
    start = jnp.concatenate([jnp.ones((1,), bool), pid_s[1:] != pid_s[:-1]])
    pos = jnp.arange(M)
    seg_start = jax.lax.cummax(jnp.where(start, pos, 0))
    rank = pos - seg_start

    log_t = jnp.log1p(-alpha_s)
    csum = jnp.cumsum(log_t)
    excl = csum - log_t  # inclusive -> exclusive
    seg_base = jnp.take(excl, seg_start)
    transmittance = jnp.exp(excl - seg_base)

    wgt = alpha_s * transmittance * (rank < points_per_pixel) * (pid_s < npix)
    feat_s = jnp.take(features, src_s, axis=0)  # (M, C)

    out = jax.ops.segment_sum(feat_s * wgt[:, None].astype(features.dtype),
                              pid_s, num_segments=npix + 1)[:npix]
    zmin = jax.ops.segment_min(jnp.where(pid_s < npix, z_s, jnp.inf),
                               pid_s, num_segments=npix + 1)[:npix]
    zbuf = jnp.where(jnp.isfinite(zmin), zmin, 0.0)

    return out.reshape(H, W, C), zbuf.reshape(H, W)


@partial(jax.jit, static_argnames=("H", "W", "radius_px", "points_per_pixel"))
def splat_render(points, features, intrinsics, H: int, W: int,
                 radius_px: float = 1.0, points_per_pixel: int = 8):
    """Render a batched point cloud into (features, zbuf) images.

    Args:
      points: (B, N, 3) camera-space points.
      features: (B, N, C).
      intrinsics: (B, 4) [fx, fy, cx, cy].
      H, W: output resolution.
      radius_px: splat radius in pixels (reference radius 2.0 NDC-per-h
        == 1 px at full res; 4.0 == 2 px at 1/4 res).

    Returns:
      (B, H, W, C) composited features, (B, H, W) nearest-surface depth
      (0 where nothing landed).
    """
    window = 2 * int(radius_px + 0.999) + 1
    fn = lambda p, f, k: _splat_one(p, f, k, H, W, radius_px, window, points_per_pixel)
    return jax.vmap(fn)(points, features, intrinsics)
