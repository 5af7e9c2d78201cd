"""Fused GN iteration core: windowed attention aggregation + damping +
6x6 Cholesky solve in ONE Pallas kernel (VERDICT r4 task #3).

Computes, for every pixel i of a (h, w) field (reference semantics:
lietorch_extras.se3_build_inplace + cholesky6x6, se3_field.py:13-70,
150-170):

    agg_i = sum_j sigmoid(-||ae_i - ae_j||^2) * vals_j   (|dy|,|dx| <= r)
    H_i   = unpack(agg_i[:21]);  b_i = agg_i[21:]
    H_i  += (lm * diag(H_i) + ep) * I
    dx_i  = solve(H_i, b_i)     (unrolled LL^T, non-finite -> 0)

The J/M/v build and the SE(3) retraction stay in XLA (they fuse with
their producers/consumers); what the kernel removes is the score
materialization (141 MB/iter HBM at KITTI 1/8 res in the XLA windowed
path) plus the agg/H/b round-trips between aggregation and solve.

Design notes (the r4 ``gn_window`` kernel both tied on perf and
MISCOMPILED on chip — scripts/check_gn_pallas_tpu.py; this kernel
inverts its risky choices):

  * **Channels live on sublanes, pixels on lanes.**  All operands are
    (C, n) with n the column-major-flattened pixel axis: nothing pads
    channels to 128 lanes (gn_window padded 16->128 and 27->128, an
    8x/5x VMEM+matmul waste), and the unrolled Cholesky runs on (1, nq)
    rows — one lane-tile per scalar array instead of nq/8 1-lane vregs.
  * **No in-kernel DMA, no reshapes.**  The whole padded field sits in
    VMEM (~4 MB at the production 48x160 shape); query blocks and key
    chunks are static python-unrolled lane slices.  gn_window's manual
    window DMAs and 3D->2D reshapes are the prime miscompile suspects.
  * **Column-major flattening** makes an x-window a contiguous lane
    range: the key window of query block qb is exactly the three
    adjacent column blocks.  x zero-padding (radius cols each side)
    makes edge blocks uniform; padded keys carry vals = 0 so they
    aggregate to exactly 0 whatever their score (the same trick as
    ops.gn._windowed_aggregate).
  * **Squared norms are subtracted OUTSIDE the score matmul**, exactly
    like the oracle.  The first cut folded them into augmented channels
    (q_aug = [2 ae; |ae|^2; 1]) and FAILED the on-chip gate at rel
    2.0e-2 (2026-08-19): the MXU's default-precision f32 dot rounds
    products to bf16 mantissas, and the large-magnitude |ae|^2 * 1
    terms lose ~|ae|^2 * 2^-8 ~= 0.016 absolute in the cancellation —
    while the oracle's raw-ae einsum only rounds small q_c*k_c
    products.  Now the kernel dots raw ae chunks at DEFAULT precision
    (bit-matching the oracle's einsum rounding), computes the k-norm
    row on the VPU in f32, and gets the q-norm COLUMN — (nq, 1),
    which Mosaic cannot transpose from a row — as a ones-column matmul
    at HIGHEST precision (K=C, N=1: cost is noise).  The |dy|/|dx|
    window mask comes from broadcasted_iota + div/mod by the static h
    (both proven to lower in the r4 kernel).

On-device equality gate: scripts/check_gn_fused_tpu.py (pytest-collected
via tests/test_gn_fused.py on TPU) compares against the ops.gn windowed
oracle at the production shape — run it on the real chip BEFORE trusting
any bench number from this kernel (the gn_window lesson: interpret-mode
equality does NOT imply compiled equality).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["gn_fused_solve", "gn_fused_solve_reference"]

_CHUNK = 512  # target lanes per query sub-block / key chunk


def _tri_index():
    """Packed upper-tri row index for (i, j), i <= j (ops.gn._sym_pack)."""
    idx = {}
    k = 0
    for i in range(6):
        for j in range(i, 6):
            idx[(i, j)] = k
            k += 1
    return idx


_TRI = _tri_index()


def _kernel(ae_ref, vals_ref, out_ref, *, h, w, radius, bs,
            lm, ep, bf16_scores, qsub, kchunk):
    """ae: (C, n_pad), vals: (27, n_pad), out: (6, n_pad) f32.
    n_pad = (w + 2*bs) * h, column-major (x major, y minor); one program."""
    f32 = jnp.float32
    nb = w // bs
    blk = bs * h
    C = ae_ref.shape[0]
    ones_col = jnp.ones((C, 1), f32)

    out_ref[...] = jnp.zeros_like(out_ref)

    sdt = jnp.bfloat16 if bf16_scores else f32
    for qb in range(nb):
        k0 = qb * blk                       # key window: 3 blocks from k0
        for qs in range(blk // qsub):
            q0 = (qb + 1) * blk + qs * qsub
            qa = ae_ref[:, q0:q0 + qsub]    # (C, nq)
            # q-norm as a COLUMN (nq, 1): ones-column matmul at HIGHEST
            # precision (a VPU-exact row can't be transposed in Mosaic)
            qsqc = jax.lax.dot_general(
                qa * qa, ones_col, (((0,), (0,)), ((), ())),
                preferred_element_type=f32,
                precision=jax.lax.Precision.HIGHEST)   # (nq, 1)
            # query pixel coords: lane i -> flat q0+i -> (x, y)
            qi = jax.lax.broadcasted_iota(jnp.int32, (qsub, 1), 0) + q0
            qx = qi // h
            qy = qi - qx * h

            acc = jnp.zeros((27, qsub), f32)
            for kc in range(3 * blk // kchunk):
                c0 = k0 + kc * kchunk
                ka = ae_ref[:, c0:c0 + kchunk]     # (C, nk)
                ksq = jnp.sum(ka * ka, axis=0, keepdims=True)  # (1, nk)
                # logits = -||q - k||^2 = 2 q.k - |q|^2 - |k|^2; the raw
                # dot runs at DEFAULT precision like the oracle's einsum
                raw = jax.lax.dot_general(
                    qa, ka, (((0,), (0,)), ((), ())),
                    preferred_element_type=f32)    # (nq, nk)
                logits = 2.0 * raw - qsqc - ksq
                ki = jax.lax.broadcasted_iota(
                    jnp.int32, (1, kchunk), 1) + c0
                kx = ki // h
                ky = ki - kx * h
                mask = ((jnp.abs(qx - kx) <= radius)
                        & (jnp.abs(qy - ky) <= radius))
                scores = jnp.where(mask, jax.nn.sigmoid(logits), 0.0)
                vk = vals_ref[:, c0:c0 + kchunk]   # (27, nk)
                # acc += vals @ scores^T : (27, nk) x (nq, nk) -> (27, nq)
                acc = acc + jax.lax.dot_general(
                    vk.astype(sdt), scores.astype(sdt),
                    (((1,), (1,)), ((), ())),
                    preferred_element_type=f32)

            # ---- damping + unrolled LL^T solve on (1, nq) rows ----
            def Hrow(i, j):
                r = acc[_TRI[(i, j) if i <= j else (j, i)], :][None]
                if i == j:
                    return r * (1.0 + lm) + ep
                return r

            L = [[None] * 6 for _ in range(6)]
            for i in range(6):
                for j in range(i + 1):
                    s = Hrow(i, j)
                    for t in range(j):
                        s = s - L[i][t] * L[j][t]
                    if i == j:
                        L[i][j] = jnp.sqrt(jnp.maximum(s, 1e-12))
                    else:
                        L[i][j] = s / L[j][j]
            y = [None] * 6
            for i in range(6):
                s = acc[21 + i, :][None]
                for t in range(i):
                    s = s - L[i][t] * y[t]
                y[i] = s / L[i][i]
            x = [None] * 6
            for i in reversed(range(6)):
                s = y[i]
                for t in range(i + 1, 6):
                    s = s - L[t][i] * x[t]
                x[i] = s / L[i][i]

            dx = jnp.concatenate(x, axis=0)        # (6, nq)
            finite = jnp.all(jnp.isfinite(dx), axis=0, keepdims=True)
            out_ref[:, q0:q0 + qsub] = jnp.where(finite, dx, 0.0)


def _chunk_of(blk: int) -> int:
    """Largest divisor of blk that is <= _CHUNK (lane-slice granularity)."""
    for m in range(1, blk + 1):
        if blk % m == 0 and blk // m <= _CHUNK:
            return blk // m
    return blk


@functools.partial(jax.jit, static_argnames=("radius", "lm", "ep",
                                             "bf16_scores", "interpret"))
def gn_fused_solve(ae, vals, radius: int = 32, lm: float = 1e-4,
                   ep: float = 10.0, bf16_scores: bool = False,
                   interpret: bool = False):
    """ae: (B, h, w, C) pre-scaled embeddings; vals: (B, h, w, 27) packed
    [sym_pack(H) | b].  Returns dx (B, h, w, 6) f32 — the damped GN update
    the SE(3) retraction consumes.  Requires w % radius == 0 and
    radius == 32 (the same eligibility as ops.gn resolve_impl's windowed
    path)."""
    B, h, w, C = ae.shape
    bs = radius
    assert w % bs == 0 and vals.shape[-1] == 27
    blk = bs * h
    n_pad = (w + 2 * bs) * h
    f32 = jnp.float32

    def prep(x):  # (B,h,w,c) -> (B, c, n_pad) column-major, x-padded
        x = jnp.pad(x.astype(f32), ((0, 0), (0, 0), (bs, bs), (0, 0)))
        return x.transpose(0, 3, 2, 1).reshape(B, x.shape[-1], n_pad)

    ae_cn = prep(ae)                               # (B, C, n_pad)
    vals_cn = prep(vals)

    ch = _chunk_of(blk)
    kernel = functools.partial(
        _kernel, h=h, w=w, radius=radius, bs=bs, lm=lm, ep=ep,
        bf16_scores=bf16_scores, qsub=ch, kchunk=ch)

    def one(ae_b, vals_b):
        out = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((6, n_pad), f32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            interpret=interpret,
        )(ae_b, vals_b)
        dx = out.reshape(6, w + 2 * bs, h)[:, bs:bs + w]
        return dx.transpose(2, 1, 0)               # (h, w, 6)

    return jax.vmap(one)(ae_cn, vals_cn)


def gn_fused_solve_reference(ae, vals, radius: int = 32, lm: float = 1e-4,
                             ep: float = 10.0, bf16_scores: bool = False):
    """Pure-XLA oracle: ops.gn's windowed aggregation + damping +
    cholesky_solve_small on identical inputs.  Used by the interpret-mode
    tests AND the on-chip equality gate (scripts/check_gn_fused_tpu.py)."""
    from ..gn import _sym_unpack, _windowed_aggregate, cholesky_solve_small

    agg = _windowed_aggregate(ae.astype(jnp.float32),
                              vals.astype(jnp.float32), radius,
                              bf16_scores=bf16_scores)
    H = _sym_unpack(agg[..., :21])
    b = agg[..., 21:]
    diag = jnp.diagonal(H, axis1=-2, axis2=-1)
    H = H + jnp.zeros_like(H).at[..., jnp.arange(6), jnp.arange(6)].set(
        lm * diag + ep)
    dx = cholesky_solve_small(H, b)
    return jnp.where(jnp.all(jnp.isfinite(dx), axis=-1, keepdims=True),
                     dx, 0.0)
