"""Pallas TPU kernel: fused windowed attention-aggregation for the dense
SE(3) Gauss-Newton system build.

The GN normal equations aggregate a 27-channel value field (21 packed
entries of H + 6 of b) with similarity weights
``a_ij = sigmoid(-||ae_i - ae_j||^2)`` over a Chebyshev window
(reference: lietorch_extras.se3_build_inplace, se3_field.py:13-31).

The XLA formulation (ops/gn.py) materializes the (n, n) score matrix in
HBM (236 MB at KITTI 1/8 res, per GN iteration).  This kernel is the
flash-attention analogue: for each 256-row block it streams 256-column
blocks of embeddings, forms the score tile on the MXU, applies the window
mask in-register, and immediately contracts against the value tile —
scores never leave VMEM.

Backward: custom_vjp that recomputes through the XLA formulation (the
kernel itself is forward-only; training uses the remat'd scan anyway).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["gn_aggregate"]

BLOCK = 256


def _kernel(ae_ref, vals_ref, out_ref, *, n, w, radius, n_blocks):
    bi = pl.program_id(0)
    row0 = bi * BLOCK

    ae_i = ae_ref[pl.ds(row0, BLOCK), :]                  # (BI, C)
    sq_i = jnp.sum(ae_i * ae_i, axis=-1, keepdims=True)   # (BI, 1)
    idx_i = row0 + jax.lax.broadcasted_iota(jnp.int32, (BLOCK, 1), 0)
    yi = idx_i // w
    xi = idx_i % w

    def body(bj, acc):
        col0 = bj * BLOCK
        ae_j = ae_ref[pl.ds(col0, BLOCK), :]              # (BJ, C)
        vals_j = vals_ref[pl.ds(col0, BLOCK), :]          # (BJ, 27)
        sq_j = jnp.sum(ae_j * ae_j, axis=-1)[None, :]     # (1, BJ)
        # bf16 MXU inputs, f32 accumulation (matches XLA default precision)
        logits = (
            2.0 * jax.lax.dot_general(
                ae_i.astype(jnp.bfloat16), ae_j.astype(jnp.bfloat16),
                (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
            - sq_i - sq_j
        )
        scores = jax.nn.sigmoid(logits)

        idx_j = col0 + jax.lax.broadcasted_iota(jnp.int32, (1, BLOCK), 1)
        yj = idx_j // w
        xj = idx_j % w
        inside = (
            (jnp.abs(yi - yj) <= radius)
            & (jnp.abs(xi - xj) <= radius)
            & (idx_i < n) & (idx_j < n)
        )
        scores = jnp.where(inside, scores, 0.0)
        return acc + jax.lax.dot_general(
            scores.astype(jnp.bfloat16), vals_j.astype(jnp.bfloat16),
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

    acc = jax.lax.fori_loop(0, n_blocks,  body,
                            jnp.zeros((BLOCK, vals_ref.shape[-1]),
                                      jnp.float32))
    out_ref[pl.ds(row0, BLOCK), :] = acc


def _aggregate_xla(ae, vals, h, w, radius):
    """Reference formulation (materializes scores) — used for the backward
    pass and as the non-TPU fallback."""
    n = h * w
    sq = jnp.sum(ae * ae, axis=-1)
    logits = 2.0 * jnp.einsum("ic,jc->ij", ae, ae) - sq[:, None] - sq[None, :]
    ys, xs = jnp.divmod(jnp.arange(n), w)
    inside = (jnp.abs(ys[:, None] - ys[None, :]) <= radius) & (
        jnp.abs(xs[:, None] - xs[None, :]) <= radius)
    scores = jax.nn.sigmoid(logits) * inside.astype(ae.dtype)
    return scores @ vals


def _aggregate_pallas(ae, vals, h, w, radius, interpret=False):
    n = h * w
    n_pad = -(-n // BLOCK) * BLOCK
    aep = jnp.pad(ae.astype(jnp.float32), ((0, n_pad - n), (0, 0)))
    valsp = jnp.pad(vals.astype(jnp.float32), ((0, n_pad - n), (0, 0)))
    n_blocks = n_pad // BLOCK
    out = pl.pallas_call(
        functools.partial(_kernel, n=n, w=w, radius=radius,
                          n_blocks=n_blocks),
        grid=(n_blocks,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_pad, valsp.shape[-1]), jnp.float32),
        interpret=interpret,
    )(aep, valsp)
    return out[:n]


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5))
def gn_aggregate(ae, vals, h, w, radius, use_pallas=True):
    """Windowed attention-aggregation: (n, C_ae), (n, 27) -> (n, 27).

    ``use_pallas`` is a static switch (False on CPU / in tests)."""
    if use_pallas:
        return _aggregate_pallas(ae, vals, h, w, radius)
    return _aggregate_xla(ae, vals, h, w, radius)


def _fwd(ae, vals, h, w, radius, use_pallas):
    return gn_aggregate(ae, vals, h, w, radius, use_pallas), (ae, vals)


def _bwd(h, w, radius, use_pallas, res, g):
    ae, vals = res
    _, vjp = jax.vjp(lambda a, v: _aggregate_xla(a, v, h, w, radius), ae, vals)
    return vjp(g)


gn_aggregate.defvjp(_fwd, _bwd)
