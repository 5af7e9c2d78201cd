"""Correlation pyramid + windowed lookup (RAFT-3D style), TPU formulation.

The reference materializes an all-pairs (B, h, w, h, w) correlation volume,
average-pools it into a 4-level pyramid, and indexes radius-3 windows with
a CUDA gather (`lietorch_extras.corr_index_forward`, reference:
blocks/corr.py).

TPU re-design (exactly equivalent math, radically different access
pattern):  correlation is *linear in f2*, so

    avgpool(corr(f1, f2), level l)  ==  corr(f1, avgpool^l(f2))

and the pyramid can be stored as pooled **feature maps** instead of pooled
volumes.  A window lookup then becomes:
  1. gather the (2r+2)^2 integer feature taps around each target coord
     (row gathers of 128-wide rows — ~bandwidth speed, unlike the
     element-wise volume gathers which run ~100x slower on TPU),
  2. one batched einsum against f1 (MXU),
  3. bilinear combination of the (2r+2)^2 tap dots into (2r+1)^2 values.

This removes the (n, n) volume entirely: less HBM, no all-pairs matmul,
and profiled ~100x faster lookups than the volume-gather version.

Two lookup implementations share that insight:

* ``impl="patch"`` (differentiable, the TRAINING path): per query per
  iteration, gather the (t, t, C) feature patch and dot against f1 on the
  MXU.  Patch rows are 256 B-chunked, so the gather runs near bandwidth —
  but every GN iteration re-reads 16 KB of f2 taps per query (126 MB per
  L0 lookup at KITTI res).

* ``impl="volume"`` (inference default): f1/f2 are FIXED across the GN
  iterations, so precompute the per-level correlation volume ONCE per
  frame with one MXU matmul per level (vol_l = <f1, pooled_f2_l> — the
  reference CorrBlock design, blocks/corr.py:56-62) and per iteration
  gather ONE contiguous (t, wl) row-slab per query (t*wl*4 B ≈ 2.8 KB
  contiguous at L0), then select the t needed columns with an
  iota-compare one-hot contraction.  ~6x less lookup traffic and zero
  einsum FLOPs inside the refinement loop.  Its VJP would scatter slabs
  into the volume (serializes on TPU), hence inference-only.

DO NOT re-try gathering (t, t) scalar patches from the volume: 16-byte
contiguous chunks run ~100x below bandwidth and measured 948 ms per frame
vs 45 ms for the patch formulation (2026-08-17, v5e).  TPU gathers need
>=256-byte contiguous chunks; the slab variant's rows are 8-70x that.
"""

from __future__ import annotations

from typing import Dict, List

import jax
import jax.numpy as jnp

__all__ = ["build_corr_pyramid", "corr_lookup"]


def build_corr_pyramid(fmap1: jnp.ndarray, fmap2: jnp.ndarray,
                       num_levels: int = 4, impl: str = "patch",
                       radius: int = 3) -> Dict:
    """fmap1/fmap2: (B, h, w, C).  Returns the lookup state.

    impl="patch": normalized f1 + pooled-f2 feature pyramid (matches
    reference scaling <f1/4, f2/4>, corr.py:56-62); dots re-computed per
    lookup.  Differentiable — the training path.

    impl="volume": padded per-level correlation volumes (B, N, Hp, Wp),
    precomputed with one MXU matmul per level; lookups are contiguous
    row-slab gathers (see module docstring).  Inference path.  ``radius``
    sets the zero padding (2r+1 each side, so clamped window starts never
    clip) and MUST match the radius later passed to ``corr_lookup``.
    """
    x = fmap2 / 4.0
    # bf16 storage: halves the tap-gather HBM traffic; dots accumulate f32
    levels = [x.astype(jnp.bfloat16)]
    for _ in range(num_levels - 1):
        x = jax.lax.reduce_window(
            x, 0.0, jax.lax.add, (1, 2, 2, 1), (1, 2, 2, 1), "VALID") / 4.0
        levels.append(x.astype(jnp.bfloat16))
    f1 = (fmap1 / 4.0).astype(jnp.bfloat16)
    if impl == "patch":
        return {"f1": f1, "levels": levels}
    assert impl in ("volume", "volume_pallas"), f"bad corr impl {impl}"

    B, h, w, C = fmap1.shape
    P = 2 * radius + 1
    f1_flat = f1.reshape(B, h * w, C)
    vols = []
    for f2_l in levels:
        f2p = jnp.pad(f2_l, ((0, 0), (P, P), (P, P), (0, 0)))
        Bp, Hp, Wp, _ = f2p.shape
        vol = jnp.einsum("bnc,bmc->bnm", f1_flat, f2p.reshape(B, -1, C),
                         preferred_element_type=jnp.float32)
        # bf16 volume: halves slab-gather traffic; one extra rounding of
        # the correlation values (~0.4% rel), same order as bf16 taps
        vols.append(vol.reshape(B, h * w, Hp, Wp).astype(jnp.bfloat16))
    # NOTE: the returned dict rides the GN scan carry, so it may contain
    # only array leaves; the select backend ("xla" vs "pallas") is a
    # static argument of corr_lookup instead.
    return {"vols": vols}


def _window_starts(coords, hl, wl, radius):
    """Shared coord math: clamped padded-grid tap starts, bilinear fracs,
    and whole-window validity.  coords: (B, h, w, 2) in level pixels."""
    B, h, w, _ = coords.shape
    N = h * w
    r = radius
    P = 2 * r + 1
    cx = coords[..., 0].reshape(B, N)
    cy = coords[..., 1].reshape(B, N)
    x0 = jnp.floor(cx)
    y0 = jnp.floor(cy)
    fx = (cx - x0)[:, :, None]  # (B,N,1)
    fy = (cy - y0)[:, :, None]
    vq = ((x0 >= -(r + 1)) & (x0 <= wl - 1 + r)
          & (y0 >= -(r + 1)) & (y0 <= hl - 1 + r))  # (B,N)
    sx = (jnp.clip(x0, -(r + 1), wl - 1 + r) - r + P).astype(jnp.int32)
    sy = (jnp.clip(y0, -(r + 1), hl - 1 + r) - r + P).astype(jnp.int32)
    return sy, sx, fy, fx, vq


def _bilinear_combine(dots, fy, fx, h, w):
    """(B, N, t, t) integer-tap dots -> (B, h, w, (t-1)^2) window values."""
    B, N, t, _ = dots.shape
    d00 = dots[:, :, : t - 1, : t - 1]
    d01 = dots[:, :, : t - 1, 1:]
    d10 = dots[:, :, 1:, : t - 1]
    d11 = dots[:, :, 1:, 1:]
    fx_ = fx[..., None]  # (B,N,1,1)
    fy_ = fy[..., None]
    out = ((1 - fy_) * ((1 - fx_) * d00 + fx_ * d01)
           + fy_ * ((1 - fx_) * d10 + fx_ * d11))
    return out.reshape(B, h, w, (t - 1) * (t - 1))


def _lookup_level_volume(vol: jnp.ndarray, coords: jnp.ndarray,
                         radius: int, select: str = "xla") -> jnp.ndarray:
    """vol: (B, N, Hp, Wp) padded per-level correlation volume;
    coords: (B, h, w, 2) in level pixels.  Returns (B, h, w, (2r+1)^2).

    Per query: ONE contiguous (t, Wp) FULL-ROW slab gather from the volume
    (t*Wp*2 B >= 500 B contiguous — near-bandwidth on TPU).  The slab must
    cover the whole minor dim: gathers that dynamically slice the minor
    (lane) dimension fall off XLA:TPU's fast row-gather path entirely —
    a 128-aligned 136-wide "narrow slab" variant measured 6.55 -> 2.45 FPS
    at model scale (2026-08-19) and was reverted.  The t needed columns
    are then selected either by an iota-compare one-hot contraction
    (select="xla") or by the fused VMEM-resident Pallas kernel
    (select="pallas", ops/pallas/corr_select.py — skips the HBM round-trip
    of the (B, N, Wp, t) mask and the 128-lane padding of t-wide matmuls)."""
    B, N, Hp, Wp = vol.shape
    h, w = coords.shape[1:3]
    t = 2 * radius + 2
    hl, wl = Hp - 2 * (2 * radius + 1), Wp - 2 * (2 * radius + 1)
    sy, sx, fy, fx, vq = _window_starts(coords, hl, wl, radius)

    n_iota = jnp.arange(N, dtype=jnp.int32)
    SW = Wp
    dnums = jax.lax.GatherDimensionNumbers(
        offset_dims=(1, 2), collapsed_slice_dims=(0,),
        start_index_map=(0, 1))

    def slab_one(vol_b, sy_b):
        idx = jnp.stack([n_iota, sy_b], axis=-1)  # (N, 2)
        return jax.lax.gather(
            vol_b, idx, dnums, slice_sizes=(1, t, SW),
            mode=jax.lax.GatherScatterMode.PROMISE_IN_BOUNDS)

    slabs = jax.vmap(slab_one)(vol, sy)  # (B, N, t, SW)

    if select == "pallas":
        from .pallas.corr_select import window_select

        interpret = jax.default_backend() in ("cpu", "gpu", "cuda", "rocm")
        sx_rows = jnp.broadcast_to(sx[:, :, None], (B, N, t)).reshape(-1)
        dots = window_select(slabs.reshape(B * N * t, SW), sx_rows, t=t,
                             interpret=interpret)
        dots = dots.reshape(B, N, t, t)
    elif select == "reduce":
        # compare-select reduce on the VPU: the einsum path below batches
        # N tiny (t, SW)x(SW, t) matmuls that pad to 128 lanes on the MXU
        # and materializes the (B, N, SW, t) mask in HBM; here the virtual
        # (B, N, t, t, SW) product is reduced on SW in one fused
        # elementwise pass.  Exactly one term per (y, k) is nonzero, so
        # the result is bit-identical to the einsum's.
        w_iota = jnp.arange(SW, dtype=jnp.int32)
        k_iota = jnp.arange(t, dtype=jnp.int32)
        selk = (w_iota[None, None, None, :]
                == (sx[:, :, None] + k_iota[None, None, :])[..., None]
                ).astype(slabs.dtype)  # (B, N, t, SW)
        dots = jnp.sum(slabs[:, :, :, None, :] * selk[:, :, None, :, :],
                       axis=-1)  # (B, N, t, t)
    else:
        # column selection: dots[b,n,y,k] = slabs[b,n,y,sx+k]; the one-hot
        # contraction runs on the MXU, never materializing scalar gathers
        w_iota = jnp.arange(SW, dtype=jnp.int32)
        k_iota = jnp.arange(t, dtype=jnp.int32)
        mask = (w_iota[None, None, :, None]
                == sx[:, :, None, None] + k_iota[None, None, None, :]
                ).astype(slabs.dtype)  # (B, N, SW, t)
        dots = jnp.einsum("bnyw,bnwk->bnyk", slabs, mask,
                          preferred_element_type=jnp.float32)
    dots = dots * vq[:, :, None, None]
    return _bilinear_combine(dots, fy, fx, h, w)


def _lookup_level(f1: jnp.ndarray, f2_l: jnp.ndarray, coords: jnp.ndarray,
                  radius: int) -> jnp.ndarray:
    """f1: (B,h,w,C); f2_l: (B,hl,wl,C); coords: (B,h,w,2) in level pixels.
    Returns (B, h, w, (2r+1)^2), window row-major (dy outer, dx inner).

    The t x t integer taps per query form one contiguous (t, t, C) patch,
    so the lookup is ONE sliced gather per query (t*t = 64x fewer gather
    descriptors than per-tap row gathers — the per-tap form cost ~3.6 ms
    per GN iteration at KITTI res, dominating the refinement loop).  The
    level features are zero-padded by 2r+1 so patch starts never clip:
    out-of-image taps read zeros, which contribute exactly the 0 the
    validity mask used to enforce; queries so far outside that every tap
    is invalid are clamped into range and masked at the end."""
    B, h, w, C = f1.shape
    hl, wl = f2_l.shape[1:3]
    N = h * w
    r = radius
    t = 2 * r + 2  # integer taps covering all bilinear supports
    P = 2 * r + 1  # zero padding: valid patch starts for all clamped x0
    sy, sx, fy, fx, vq = _window_starts(coords, hl, wl, radius)

    f2p = jnp.pad(f2_l, ((0, 0), (P, P), (P, P), (0, 0)))

    dnums = jax.lax.GatherDimensionNumbers(
        offset_dims=(1, 2, 3), collapsed_slice_dims=(),
        start_index_map=(0, 1))

    def gather_one(op, idx):
        return jax.lax.gather(
            op, idx, dnums, slice_sizes=(t, t, C),
            mode=jax.lax.GatherScatterMode.PROMISE_IN_BOUNDS)

    starts = jnp.stack([sy, sx], axis=-1)  # (B, N, 2)
    patches = jax.vmap(gather_one)(f2p, starts)  # (B, N, t, t, C)

    dots = jnp.einsum("bnyxc,bnc->bnyx", patches, f1.reshape(B, N, C),
                      preferred_element_type=jnp.float32)
    dots = dots * vq[:, :, None, None]
    return _bilinear_combine(dots, fy, fx, h, w)


def corr_lookup(pyramid: Dict, coords: jnp.ndarray, radius: int = 3,
                select: str = "xla") -> jnp.ndarray:
    """Index (2r+1)^2 windows from every pyramid level.

    coords: (B, h, w, 2) target coords in level-0 pixels.
    Returns (B, h, w, L*(2r+1)^2), level-major then window row-major
    (matching the torch cat order, corr.py:47-54).  Dispatches on the
    pyramid layout: feature pyramid ("patch") or precomputed volumes;
    ``select`` picks the volume-path column-select backend (see
    `_lookup_level_volume`)."""
    out = []
    if "vols" in pyramid:
        for i, vol in enumerate(pyramid["vols"]):
            out.append(_lookup_level_volume(vol, coords / (2 ** i), radius,
                                            select=select))
        return jnp.concatenate(out, axis=-1)
    f1 = pyramid["f1"]
    for i, f2_l in enumerate(pyramid["levels"]):
        out.append(_lookup_level(f1, f2_l, coords / (2 ** i), radius))
    return jnp.concatenate(out, axis=-1)
