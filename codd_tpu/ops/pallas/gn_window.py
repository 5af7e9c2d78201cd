"""Flash-style windowed GN attention aggregation (inference path).

Computes the same quantity as ops.gn._windowed_aggregate — for every pixel
i, the window-masked sigmoid-attention aggregation of the 27-channel GN
value field (reference semantics: lietorch_extras.se3_build_inplace,
reference se3_field.py:13-31):

    agg_i = sum_j sigmoid(-||ae_i - ae_j||^2) * vals_j,   |dy|,|dx| <= radius

The XLA windowed path materializes a (B, h, nb, bs, h2, win) score tensor
(141 MB f32 per GN iteration at KITTI 1/8 res) through HBM three times
(logits write, sigmoid read+write, aggregation read); at 16 GN iterations
that HBM traffic dominates the refinement loop.  This kernel streams key
windows through VMEM flash-attention style: scores live only in VMEM and
per-iteration HBM traffic drops to the ae/vals fields themselves (~36 MB
with the 9x row-window overlap).

Blocking: one program per (QH x bs) query tile; its key window is the
x-neighborhood [x0-r, x0+bs+r) over rows [y0-r, y0+QH+r) of the
zero-padded field.  Zero-padded keys pass the distance mask but carry
zero values, so they contribute exactly 0 (same trick as the XLA path).
The window mask is exact |dy|,|dx| <= radius on pixel coordinates.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["gn_window_aggregate"]

QH = 8  # query rows per program (f32 sublane quantum)


def _kernel(ae_hbm, vals_hbm, out_ref, ae_w, vals_w, sems, *,
            radius, bs, nbx, n_chunks, ch_rows, cdim, vdim, bf16_scores):
    i = pl.program_id(0)
    jx = i % nbx
    jy = i // nbx
    win_x = bs + 2 * radius
    win_rows = QH + 2 * radius
    f32 = jnp.float32

    # key window rows [jy*QH, jy*QH + win_rows) of the padded field (pad
    # = radius rows/cols, rounded so starts stay sublane-aligned)
    copies = [
        pltpu.make_async_copy(
            ae_hbm.at[pl.ds(jy * QH, win_rows),
                      pl.ds(jx * bs, win_x)], ae_w, sems.at[0]),
        pltpu.make_async_copy(
            vals_hbm.at[pl.ds(jy * QH, win_rows),
                        pl.ds(jx * bs, win_x)], vals_w, sems.at[1]),
    ]
    for c in copies:
        c.start()
    for c in copies:
        c.wait()

    # queries: the central (QH, bs) block of the window.  The squared
    # norms fold into the distance matmul via augmented vectors
    # (-||q-k||^2 = [2q, -1, -|q|^2] . [k, |k|^2, 1]), so the kernel never
    # forms 1-D broadcast intermediates.
    q = ae_w[radius:radius + QH, radius:radius + bs].reshape(QH * bs, cdim)
    nq = QH * bs
    qsq = jnp.sum(q * q, axis=-1, keepdims=True)  # (Q, 1)
    q_aug = jnp.concatenate([2.0 * q, -jnp.ones((nq, 1), f32), -qsq], axis=1)

    # query pixel coords within the window frame
    qi = jax.lax.broadcasted_iota(jnp.int32, (QH * bs, 1), 0)
    qy = qi // bs + radius
    qx = qi % bs + radius

    def chunk(c, acc):
        k = ae_w[pl.ds(c * ch_rows, ch_rows), :].reshape(
            ch_rows * win_x, cdim)
        kv = vals_w[pl.ds(c * ch_rows, ch_rows), :].reshape(
            ch_rows * win_x, vdim)
        nk = ch_rows * win_x
        ksq = jnp.sum(k * k, axis=-1, keepdims=True)  # (K, 1)
        k_aug = jnp.concatenate([k, ksq, jnp.ones((nk, 1), f32)], axis=1)

        logits = jax.lax.dot_general(
            q_aug, k_aug, (((1,), (1,)), ((), ())),
            preferred_element_type=f32)  # (Q, K)

        ki = jax.lax.broadcasted_iota(jnp.int32, (1, ch_rows * win_x), 1)
        ky = ki // win_x + c * ch_rows
        kx = ki % win_x
        mask = ((jnp.abs(qy - ky) <= radius)
                & (jnp.abs(qx - kx) <= radius))

        sdt = jnp.bfloat16 if bf16_scores else f32
        scores = jnp.where(mask, jax.nn.sigmoid(logits), 0.0).astype(sdt)
        return acc + jax.lax.dot_general(
            scores, kv.astype(sdt), (((1,), (0,)), ((), ())),
            preferred_element_type=f32)  # (Q, 27)

    acc = jax.lax.fori_loop(0, n_chunks, chunk,
                            jnp.zeros((nq, vdim), f32))
    out_ref[:] = acc[None]


@functools.partial(jax.jit, static_argnames=("radius", "bs", "bf16_scores",
                                             "interpret"))
def gn_window_aggregate(ae, vals, radius: int = 32, bs: int = 32,
                        bf16_scores: bool = False, interpret: bool = False):
    """ae: (B, h, w, C), vals: (B, h, w, V).  Returns (B, h, w, V) f32.

    Requires w % bs == 0; h is padded to the QH quantum internally.

    C and V are zero-padded to 128 lanes: Mosaic requires manual HBM->VMEM
    DMA slices to be 128-aligned on the minor (lane) dimension, and the
    un-padded (..., 32/27) windows are ILLEGAL slices of a lane-padded HBM
    buffer (r4 probe: "Slice shape along dimension 2 must be aligned to
    tiling (128), but is 16").  Zero lanes are semantics-neutral — they
    add 0 to the squared distances and aggregate to 0 in the output — and
    the full-lane layout keeps every in-kernel op relayout-free.
    """
    B, h, w, C = ae.shape
    V = vals.shape[-1]
    V_out = V
    assert w % bs == 0, "width must tile by the block size"
    LANES = 128
    assert C <= LANES and V <= LANES
    nbx = w // bs
    nby = -(-h // QH)
    hp = nby * QH
    win_rows = QH + 2 * radius
    win_x = bs + 2 * radius

    # zero pad: radius on the left/top, radius + alignment slack right/down;
    # channels to the 128-lane tile
    aep = jnp.pad(ae.astype(jnp.float32),
                  ((0, 0), (radius, radius + hp - h + QH),
                   (radius, radius), (0, LANES - C)))
    vp = jnp.pad(vals.astype(jnp.float32),
                 ((0, 0), (radius, radius + hp - h + QH),
                  (radius, radius), (0, LANES - V)))
    C = V = LANES

    ch_rows = QH  # key rows per inner chunk
    n_chunks = win_rows // ch_rows

    kernel = functools.partial(
        _kernel, radius=radius, bs=bs, nbx=nbx, n_chunks=n_chunks,
        ch_rows=ch_rows, cdim=C, vdim=V, bf16_scores=bf16_scores)

    def one(ae_b, vals_b):
        out = pl.pallas_call(
            kernel,
            grid=(nby * nbx,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.HBM)] * 2,
            out_specs=pl.BlockSpec((1, QH * bs, V), lambda i: (i, 0, 0),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[
                pltpu.VMEM((win_rows, win_x, C), jnp.float32),
                pltpu.VMEM((win_rows, win_x, V), jnp.float32),
                pltpu.SemaphoreType.DMA((2,)),
            ],
            out_shape=jax.ShapeDtypeStruct((nby * nbx, QH * bs, V),
                                           jnp.float32),
            interpret=interpret,
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary",)),
        )(ae_b, vals_b)
        out = out.reshape(nby, nbx, QH, bs, V)
        out = out.transpose(0, 2, 1, 3, 4).reshape(hp, w, V)
        return out[:h, :, :V_out]

    return jax.vmap(one)(aep, vp)
