"""Prototype: Pallas VMEM-resident corr window lookup.

Idea: an entire padded pyramid level fits in VMEM (L0 at KITTI/8 res is
(62, 174, 128) bf16 = 2.8 MB), so the (t, t, C) patch gather + dot can run
entirely on-chip: the XLA formulation writes the gathered patches to HBM
and re-reads them for the einsum (~3x the necessary traffic, measured
0.94 ms/level); here the level loads once and each query is a VMEM
dynamic-slice + VPU reduction.

Usage: python scripts/kernel_corr_pallas.py [--check]
"""
import sys
import time
from functools import partial

sys.path.insert(0, "/root/repo")

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")


def corr_dots_kernel(starts_ref, f2p_ref, f1_ref, out_ref):
    """One query block: QB dots of (8,8,C) VMEM patches vs f1 rows.

    starts_ref: (N, 2) int32 scalar-prefetch (sy, sx) clamped in-range.
    f2p_ref: (Hp, Wp, C) bf16, whole level resident in VMEM.
    f1_ref: (QB, C) bf16 block.
    out_ref: (QB, 8, 8) f32 block (raw tap dots; bilinear combine outside).

    Mosaic requires dynamic-slice starts on the sublane (x) dim to be
    8-aligned, so the load is an (8, 16, C) superset patch at the aligned
    start; the 8 wanted columns are selected post-dot with a one-hot
    matmul keyed on the intra-tile offset.
    """
    QB = out_ref.shape[0]
    qb = pl.program_id(0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (16, 8), 0)
    outc = jax.lax.broadcasted_iota(jnp.int32, (16, 8), 1)

    def body(g, _):
        # groups of 8 queries: all sublane-dim loads/stores stay 8-aligned
        f1g = f1_ref[pl.ds(g * 8, 8), :].astype(jnp.float32)  # (8,C)
        rows = []
        for j in range(8):
            q = g * 8 + j
            sy = starts_ref[q, 0]
            sx = starts_ref[q, 1]
            sx8 = (sx // 8) * 8
            off = sx - sx8
            patch = f2p_ref[pl.ds(sy, 8), pl.ds(sx8, 16), :]  # (8,16,C)
            d16 = jnp.einsum("yxc,c->yx", patch.astype(jnp.float32),
                             f1g[j, :])  # (8,16)
            sel = (cols == outc + off).astype(jnp.float32)  # (16,8)
            # VPU broadcast-mul-reduce keeps the selection exact in f32
            # (an MXU matmul here rounds through bf16 passes)
            d = jnp.sum(d16[:, :, None] * sel[None, :, :], axis=1)  # (8,8)
            rows.append(d)
        out_ref[pl.ds(g * 8, 8), :, :] = jnp.stack(rows)
        return 0

    jax.lax.fori_loop(0, QB // 8, body, 0)


@partial(jax.jit, static_argnames=("qb",))
def corr_dots_pallas(f2p, f1, starts, qb=128):
    N, C = f1.shape
    grid = (N // qb,)
    return pl.pallas_call(
        corr_dots_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((qb, 2), lambda i: (i, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec(f2p.shape, lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((qb, C), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((qb, 8, 8), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((N, 8, 8), jnp.float32),
    )(starts, f2p, f1).reshape(N, 64)


def xla_dots(f2p, f1, starts):
    """Current production formulation (ops/corr.py): patch gather + einsum."""
    N, C = f1.shape
    dnums = jax.lax.GatherDimensionNumbers(
        offset_dims=(1, 2, 3), collapsed_slice_dims=(),
        start_index_map=(0, 1))
    patches = jax.lax.gather(
        f2p, starts, dnums, slice_sizes=(8, 8, C),
        mode=jax.lax.GatherScatterMode.PROMISE_IN_BOUNDS)
    return jnp.einsum("nyxc,nc->nyx", patches, f1,
                      preferred_element_type=jnp.float32).reshape(N, 64)


def main():
    rng = np.random.RandomState(0)
    h8, w8, C = 48, 160, 128
    N = h8 * w8
    P = 7
    shapes = [(62, 174), (38, 94), (26, 54), (20, 34)]  # padded levels

    check = "--check" in sys.argv
    for Hp, Wp in shapes:
        f2p = jnp.asarray(rng.randn(Hp, Wp, C).astype(np.float32)
                          ).astype(jnp.bfloat16)
        f1 = jnp.asarray(rng.randn(N, C).astype(np.float32)
                         ).astype(jnp.bfloat16)
        starts = jnp.asarray(
            np.stack([rng.randint(0, Hp - 8, N),
                      rng.randint(0, Wp - 16, N)], -1).astype(np.int32))

        if check:
            a = np.asarray(corr_dots_pallas(f2p, f1, starts))
            b = np.asarray(jax.jit(xla_dots)(f2p, f1, starts))
            print(f"L({Hp},{Wp}): max|d|={np.abs(a - b).max():.2e}")
            continue

        for name, fn in (("pallas", corr_dots_pallas), ("xla", jax.jit(xla_dots))):
            # fori-chain: 16 dependent lookups, hard host sync
            @jax.jit
            def chain(f2p, f1, starts):
                def body(i, c):
                    s, acc = c
                    d = fn(f2p, f1, s)
                    s2 = (s + (d[0, 0] > 1e30).astype(jnp.int32)
                          ) % jnp.int32(max(Hp, Wp))
                    return (s2, acc + d[0, 0])
                return jax.lax.fori_loop(0, 16, body,
                                         (starts, jnp.float32(0)))[1]

            acc = float(np.asarray(chain(f2p, f1, starts)))
            best = 1e9
            for _ in range(3):
                t0 = time.perf_counter()
                acc = float(np.asarray(chain(f2p, f1, starts)))
                best = min(best, (time.perf_counter() - t0) / 16)
            print(f"L({Hp},{Wp}) {name}: {best*1e3:.3f} ms/lookup")


if __name__ == "__main__":
    main()
