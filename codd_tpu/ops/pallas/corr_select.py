"""Fused window-select for the volume corr lookup.

The XLA formulation of the post-slab-gather step (ops/corr.py
`_lookup_level_volume`) materializes a (B, N, SW, t) one-hot mask in HBM
and contracts it against the slabs with N tiny (t, SW)x(SW, t) matmuls —
both the mask round-trip and the 128-lane padding of t=8-wide matmuls are
pure overhead.  This kernel keeps a block of slab rows in VMEM and does
the column selection as t masked VPU reductions; only the (R, t) selected
dots return to HBM (t*4 B per row instead of SW*2 B of mask).

Mosaic constraint (learned r4: `tpu.reshape (Q,7,7)->(Q,49)` is an
unsupported shape cast): every in-kernel value stays 2-D.  The (B, N, t)
row structure is flattened OUTSIDE the kernel (contiguous reshape — free)
so each kernel row is one (y-slice, window) pair; the bilinear tap
combination happens back in XLA on the small (B, N, t, t) dots tensor.

Semantics: out[r, k] = slab[r, sx[r] + k] for k in [0, t); rows with
sx[r] + k outside [0, SW) contribute 0 (never happens for in-contract
inputs — ops/corr.py clamps window starts).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["window_select"]

_R = 1024  # slab rows per grid step


def _kernel(slab_ref, sx_ref, out_ref, *, t: int):
    slab = slab_ref[:].astype(jnp.float32)            # (R, SW)
    sx = sx_ref[:]                                    # (R, 1) int32
    iota = jax.lax.broadcasted_iota(jnp.int32, slab.shape, 1)
    cols = []
    for k in range(t):
        m = (iota == sx + k).astype(jnp.float32)      # (R, SW)
        cols.append(jnp.sum(slab * m, axis=1, keepdims=True))  # (R, 1)
    out_ref[:] = jnp.concatenate(cols, axis=1)        # (R, t)


@functools.partial(jax.jit, static_argnames=("t", "interpret"))
def window_select(slabs, sx, t: int, interpret: bool = False):
    """slabs (R, SW) correlation slab rows; sx (R,) int32 window starts.
    Returns (R, t) f32: the t consecutive columns starting at sx, per row.
    """
    R, SW = slabs.shape
    Rp = -(-R // _R) * _R
    pad = Rp - R
    sx2 = sx.reshape(R, 1)
    if pad:
        slabs = jnp.pad(slabs, ((0, pad), (0, 0)))
        sx2 = jnp.pad(sx2, ((0, pad), (0, 0)))

    out = pl.pallas_call(
        functools.partial(_kernel, t=t),
        out_shape=jax.ShapeDtypeStruct((Rp, t), jnp.float32),
        grid=(Rp // _R,),
        in_specs=[
            pl.BlockSpec((_R, SW), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_R, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((_R, t), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(slabs, sx2)
    return out[:R]
