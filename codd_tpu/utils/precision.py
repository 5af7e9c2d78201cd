"""Mixed-precision helpers (the reference --fp16 wrap, TPU-flavored).

On TPU the fast dtype is bfloat16.  The policy: cast float params and
inputs to bf16 and let compute follow; numerically sensitive regions are
already pinned to f32 internally (the GN system build and 6x6 Cholesky in
ops/gn.py cast to f32 explicitly, correlation volumes accumulate in f32).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["cast_floats", "bf16_params"]


def cast_floats(tree, dtype=jnp.bfloat16):
    """Cast every floating-point leaf to ``dtype`` (ints/bools untouched)."""
    def cast(x):
        if hasattr(x, "dtype") and jnp.issubdtype(x.dtype, jnp.floating):
            return x.astype(dtype)
        return x

    return jax.tree_util.tree_map(cast, tree)


def bf16_params(params):
    return cast_floats(params, jnp.bfloat16)
