"""Pure-JAX dense SE(3) fields.

The reference relies on lietorch's CUDA SE3 group (reference:
model/motion/raft3d/raft3d.py:9, se3_field.py:8) for per-pixel rigid
transforms with tangent-space autograd.  On TPU the whole manifold is
expressed in closed form as jittable jnp ops — XLA differentiates
exp/log/compose/action directly, so no custom VJP is needed.

Representation: a trailing-7 array ``[tx, ty, tz, qx, qy, qz, qw]``
(translation + unit quaternion, matching lietorch's data layout so
checkpoints/tests can be compared element-wise).  Twists are trailing-6
``[v, w]`` (translation part first, like lietorch's se3 tangent).

All functions broadcast over arbitrary leading (batch / pixel) dims.
"""

from __future__ import annotations

import jax.numpy as jnp

__all__ = [
    "identity", "exp", "log", "mul", "act", "inv", "matrix", "quat_rotate",
]

_EPS = 1e-8


def _f32_internal(fn):
    """Manifold math runs in f32 regardless of the field dtype: the exp/log
    small-angle series and quaternion normalization cancel catastrophically
    in bfloat16."""
    import functools

    @functools.wraps(fn)
    def wrapped(*args):
        dtype = args[0].dtype
        if dtype == jnp.float32:
            return fn(*args)
        out = fn(*(a.astype(jnp.float32) for a in args))
        return out.astype(dtype)

    return wrapped


def identity(shape, dtype=jnp.float32) -> jnp.ndarray:
    """Identity transforms of the given leading shape -> (*shape, 7)."""
    data = jnp.zeros(tuple(shape) + (7,), dtype)
    return data.at[..., 6].set(1.0)


def quat_rotate(q: jnp.ndarray, p: jnp.ndarray) -> jnp.ndarray:
    """Rotate points p (..., 3) by unit quaternions q (..., 4) [x,y,z,w]."""
    qv = q[..., :3]
    qw = q[..., 3:4]
    t = 2.0 * jnp.cross(qv, p)
    return p + qw * t + jnp.cross(qv, t)


@_f32_internal
def act(g: jnp.ndarray, p: jnp.ndarray) -> jnp.ndarray:
    """Group action on points: R p + t.  g: (...,7), p: (...,3)."""
    return quat_rotate(g[..., 3:7], p) + g[..., :3]


def _quat_mul(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    ax, ay, az, aw = jnp.moveaxis(a, -1, 0)
    bx, by, bz, bw = jnp.moveaxis(b, -1, 0)
    return jnp.stack(
        [
            aw * bx + ax * bw + ay * bz - az * by,
            aw * by - ax * bz + ay * bw + az * bx,
            aw * bz + ax * by - ay * bx + az * bw,
            aw * bw - ax * bx - ay * by - az * bz,
        ],
        axis=-1,
    )


@_f32_internal
def mul(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Compose transforms: (a * b)(p) = a(b(p))."""
    q = _quat_mul(a[..., 3:7], b[..., 3:7])
    t = quat_rotate(a[..., 3:7], b[..., :3]) + a[..., :3]
    return jnp.concatenate([t, q], axis=-1)


@_f32_internal
def inv(g: jnp.ndarray) -> jnp.ndarray:
    q = g[..., 3:7] * jnp.asarray([-1.0, -1.0, -1.0, 1.0], g.dtype)
    t = -quat_rotate(q, g[..., :3])
    return jnp.concatenate([t, q], axis=-1)


def _sinc_coeffs(theta2):
    """Taylor-safe A=sin t/t, B=(1-cos t)/t^2, C=(t-sin t)/t^3."""
    theta = jnp.sqrt(theta2 + _EPS)
    small = theta2 < 1e-8
    A = jnp.where(small, 1.0 - theta2 / 6.0, jnp.sin(theta) / theta)
    B = jnp.where(small, 0.5 - theta2 / 24.0, (1.0 - jnp.cos(theta)) / (theta2 + _EPS))
    C = jnp.where(small, 1.0 / 6.0 - theta2 / 120.0, (1.0 - A) / (theta2 + _EPS))
    return A, B, C


@_f32_internal
def exp(tau: jnp.ndarray) -> jnp.ndarray:
    """Exponential map se(3) -> SE(3).  tau: (..., 6) = [v, w]."""
    v = tau[..., :3]
    w = tau[..., 3:6]
    theta2 = jnp.sum(w * w, axis=-1, keepdims=True)
    theta = jnp.sqrt(theta2 + _EPS)
    half = 0.5 * theta
    small = theta2[..., 0] < 1e-8
    # quaternion: [sin(t/2) w/t, cos(t/2)]
    s = jnp.where(small[..., None], 0.5 - theta2 / 48.0, jnp.sin(half) / theta)
    qv = s * w
    qw = jnp.where(small[..., None], 1.0 - theta2 / 8.0, jnp.cos(half))
    q = jnp.concatenate([qv, qw], axis=-1)
    # t = V v, V = I + B [w]x + C [w]x^2
    A, B, C = _sinc_coeffs(theta2)
    wxv = jnp.cross(w, v)
    wxwxv = jnp.cross(w, wxv)
    t = v + B * wxv + C * wxwxv
    return jnp.concatenate([t, q], axis=-1)


@_f32_internal
def log(g: jnp.ndarray) -> jnp.ndarray:
    """Logarithm map SE(3) -> se(3) -> (..., 6) = [v, w]."""
    t = g[..., :3]
    qv = g[..., 3:6]
    qw = g[..., 6:7]
    qn = jnp.sqrt(jnp.sum(qv * qv, axis=-1, keepdims=True) + _EPS)
    # angle in (-pi, pi]; guard sign so w stays continuous around identity
    theta = 2.0 * jnp.arctan2(qn, jnp.abs(qw)) * jnp.sign(qw)
    small = (qn[..., 0] ** 2) < 1e-8
    scale = jnp.where(small[..., None], 2.0 / jnp.maximum(qw, _EPS), theta / qn)
    w = scale * qv
    theta2 = jnp.sum(w * w, axis=-1, keepdims=True)
    A, B, C = _sinc_coeffs(theta2)
    # V^-1 = I - 1/2 [w]x + D [w]x^2,  D = (1 - A/(2B)) / theta^2
    D = jnp.where(
        theta2[..., 0:1] < 1e-8,
        1.0 / 12.0 + theta2 / 720.0,
        (1.0 - A / (2.0 * B)) / (theta2 + _EPS),
    )
    wxt = jnp.cross(w, t)
    wxwxt = jnp.cross(w, wxt)
    v = t - 0.5 * wxt + D * wxwxt
    return jnp.concatenate([v, w], axis=-1)


def matrix(g: jnp.ndarray) -> jnp.ndarray:
    """4x4 homogeneous matrices (..., 4, 4)."""
    qx, qy, qz, qw = jnp.moveaxis(g[..., 3:7], -1, 0)
    t = g[..., :3]
    R = jnp.stack(
        [
            jnp.stack([1 - 2 * (qy * qy + qz * qz), 2 * (qx * qy - qz * qw), 2 * (qx * qz + qy * qw)], -1),
            jnp.stack([2 * (qx * qy + qz * qw), 1 - 2 * (qx * qx + qz * qz), 2 * (qy * qz - qx * qw)], -1),
            jnp.stack([2 * (qx * qz - qy * qw), 2 * (qy * qz + qx * qw), 1 - 2 * (qx * qx + qy * qy)], -1),
        ],
        axis=-2,
    )
    top = jnp.concatenate([R, t[..., None]], axis=-1)
    bottom = jnp.zeros_like(top[..., :1, :]).at[..., 0, 3].set(1.0)
    return jnp.concatenate([top, bottom], axis=-2)
