"""Fused window-select + bilinear-combine for the volume corr lookup.

The XLA formulation of the post-slab-gather step (ops/corr.py
`_lookup_level_volume`) materializes a (B, N, Wp, t) one-hot mask in HBM
and contracts it against the slabs with N tiny (t, Wp)x(Wp, t) matmuls —
both the mask round-trip (~21 MB per level-0 lookup at KITTI res) and the
128-lane padding of t=8-wide matmuls are pure overhead.  This kernel keeps
a block of slabs in VMEM and does the column selection as t masked
VPU reductions, then folds the bilinear tap combination in before
anything returns to HBM.

Per grid step (Q queries):
  slab block (Q, t, Wp)  ->  dots[q, y, k] = slab[q, y, sx[q] + k]
                         ->  out[q, (t-1)^2] bilinear-combined, masked.

Semantics identical to `_bilinear_combine(dots * vq, fy, fx)` in
ops/corr.py (tested against it, tests/test_ops_corr_splat.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["window_select_combine"]

_Q = 128  # queries per grid step


def _kernel(slab_ref, sx_ref, fxy_ref, out_ref, *, t: int):
    slab = slab_ref[:].astype(jnp.float32)          # (Q, t, Wp)
    Q, _, Wp = slab.shape
    sx = sx_ref[:]                                   # (Q, 1) int32
    iota_w = jax.lax.broadcasted_iota(jnp.int32, (Q, Wp), 1)

    cols = []
    for k in range(t):
        mask = (iota_w == sx + k).astype(jnp.float32)        # (Q, Wp)
        cols.append(jnp.sum(slab * mask[:, None, :], axis=2))  # (Q, t)
    dots = jnp.stack(cols, axis=-1)                  # (Q, t(y), t(k=x))

    fx = fxy_ref[:, 0][:, None, None]                # (Q,1,1)
    fy = fxy_ref[:, 1][:, None, None]
    vq = fxy_ref[:, 2][:, None, None]
    d00 = dots[:, : t - 1, : t - 1]
    d01 = dots[:, : t - 1, 1:]
    d10 = dots[:, 1:, : t - 1]
    d11 = dots[:, 1:, 1:]
    out = ((1 - fy) * ((1 - fx) * d00 + fx * d01)
           + fy * ((1 - fx) * d10 + fx * d11)) * vq
    out_ref[:] = out.reshape(Q, (t - 1) * (t - 1))


@functools.partial(jax.jit, static_argnames=("radius", "interpret"))
def window_select_combine(slabs, sx, fy, fx, vq, radius: int = 3,
                          interpret: bool = False):
    """slabs (B, N, t, Wp); sx (B, N) int32 in-slab window starts;
    fy/fx (B, N, 1) bilinear fracs; vq (B, N) whole-window validity.
    Returns (B, N, (2*radius+1)^2) f32."""
    B, N, t, Wp = slabs.shape
    assert t == 2 * radius + 2
    K2 = (t - 1) * (t - 1)

    Np = -(-N // _Q) * _Q
    pad = Np - N
    slabs_f = slabs.reshape(B * N, t, Wp)
    fxy = jnp.concatenate(
        [fx.reshape(B * N, 1), fy.reshape(B * N, 1),
         vq.reshape(B * N, 1).astype(jnp.float32)], axis=1)
    sx_f = sx.reshape(B * N, 1)
    if pad:
        slabs_f = jnp.pad(slabs_f, ((0, B * pad), (0, 0), (0, 0)))
        fxy = jnp.pad(fxy, ((0, B * pad), (0, 0)))
        sx_f = jnp.pad(sx_f, ((0, B * pad), (0, 0)))

    grid = (slabs_f.shape[0] // _Q,)
    out = pl.pallas_call(
        functools.partial(_kernel, t=t),
        out_shape=jax.ShapeDtypeStruct((slabs_f.shape[0], K2), jnp.float32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((_Q, t, Wp), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_Q, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_Q, 3), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((_Q, K2), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(slabs_f, sx_f, fxy)
    return out[:B * N].reshape(B, N, K2)
