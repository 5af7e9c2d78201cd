"""Prototype: precomputed-volume corr lookup with contiguous row-slab gathers.

The production lookup (ops/corr.py) gathers a (t, t, C=128) feature patch
per query per GN iteration and re-does the <f1, f2> dots every iteration:
16 KB of f2 taps re-read per query x 16 iterations, measured 0.94 ms/level
(60 ms of the 192 ms step).

But f1/f2 are FIXED across the 16 GN iterations -- only the lookup coords
change.  So precompute the full per-level correlation volume ONCE per
frame with one MXU matmul per level:

    vol_l = f1 (B, N, C) @ pooled_f2_l^T (B, C, hl*wl)   -> (B, N, hl, wl)

(This is exactly the reference CorrBlock design, blocks/corr.py:56-62 --
which round 1 abandoned because *scalar-patch* gathers from the volume ran
21x slower.  The fix is the gather granularity, not the volume:)

Per iteration, per query, gather ONE contiguous (t, wl) row-slab
vol[n, y0:y0+t, :]  (t*wl*4B = 2.8 KB contiguous at L0 -- far above the
256 B chunk size where TPU gathers hit bandwidth), then select the t
needed columns with an iota-compare mask reduction (fuses; no scalar
gathers), then bilinear-combine taps.

Traffic per L0 lookup: N*(t*wl*4) ~ 21 MB vs 126 MB of patch re-gathers,
and zero einsum FLOPs in the iteration loop.

Usage: python scripts/kernel_corr_volume.py [--check]
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

R = 3
T_TAPS = 2 * R + 2  # 8


def build_volume(f1, f2p, hl, wl):
    """f1: (N, C) f32; f2p: (hl*wl, C).  -> (N, hl, wl) volume."""
    vol = jnp.einsum("nc,mc->nm", f1, f2p,
                     preferred_element_type=jnp.float32)
    return vol.reshape(f1.shape[0], hl, wl)


def slab_lookup(vol, sy, sx, fx, fy, vq):
    """vol: (N, hl, wl) f32|bf16; sy/sx: (N,) int32 top-left tap start
    (pre-clamped in-range); fx/fy: (N,) bilinear fracs; vq: (N,) validity.
    Returns (N, 49) window values, row-major."""
    N, hl, wl = vol.shape
    t = T_TAPS
    # one contiguous (t, wl) slab per query
    dnums = jax.lax.GatherDimensionNumbers(
        offset_dims=(1, 2), collapsed_slice_dims=(0,),
        start_index_map=(0, 1))
    idx = jnp.stack([jnp.arange(N, dtype=jnp.int32), sy], axis=-1)
    slabs = jax.lax.gather(
        vol, idx, dnums, slice_sizes=(1, t, wl),
        mode=jax.lax.GatherScatterMode.PROMISE_IN_BOUNDS)  # (N, t, wl)
    slabs = slabs.astype(jnp.float32)

    # column selection: out[n, y, k] = slabs[n, y, sx[n]+k], k in [0, t)
    # via iota-compare mask + reduce over wl (fuses into the slab read)
    w_iota = jnp.arange(wl, dtype=jnp.int32)  # (wl,)
    k_iota = jnp.arange(t, dtype=jnp.int32)  # (t,)
    mask = (w_iota[None, :, None] == (sx[:, None, None] + k_iota[None, None, :])
            ).astype(slabs.dtype)  # (N, wl, t)
    dots = jnp.einsum("nyw,nwk->nyk", slabs, mask,
                      preferred_element_type=jnp.float32)  # (N, t, t)
    dots = dots * vq[:, None, None]

    d00 = dots[:, : t - 1, : t - 1]
    d01 = dots[:, : t - 1, 1:]
    d10 = dots[:, 1:, : t - 1]
    d11 = dots[:, 1:, 1:]
    fx_ = fx[:, None, None]
    fy_ = fy[:, None, None]
    out = ((1 - fy_) * ((1 - fx_) * d00 + fx_ * d01)
           + fy_ * ((1 - fx_) * d10 + fx_ * d11))
    return out.reshape(N, (t - 1) * (t - 1))


def patch_lookup(f1, f2p, sy, sx, fx, fy, vq):
    """Current production formulation: (t,t,C) patch gather + einsum."""
    N, C = f1.shape
    t = T_TAPS
    dnums = jax.lax.GatherDimensionNumbers(
        offset_dims=(1, 2, 3), collapsed_slice_dims=(),
        start_index_map=(0, 1))
    starts = jnp.stack([sy, sx], axis=-1)
    patches = jax.lax.gather(
        f2p, starts, dnums, slice_sizes=(t, t, C),
        mode=jax.lax.GatherScatterMode.PROMISE_IN_BOUNDS)
    dots = jnp.einsum("nyxc,nc->nyx", patches, f1,
                      preferred_element_type=jnp.float32)
    dots = dots * vq[:, None, None]
    d00 = dots[:, : t - 1, : t - 1]
    d01 = dots[:, : t - 1, 1:]
    d10 = dots[:, 1:, : t - 1]
    d11 = dots[:, 1:, 1:]
    fx_ = fx[:, None, None]
    fy_ = fy[:, None, None]
    out = ((1 - fy_) * ((1 - fx_) * d00 + fx_ * d01)
           + fy_ * ((1 - fx_) * d10 + fx_ * d11))
    return out.reshape(N, (t - 1) * (t - 1))


def main():
    rng = np.random.RandomState(0)
    h8, w8, C = 48, 160, 128
    N = h8 * w8
    # padded level shapes (pad P=7 each side as in ops/corr.py)
    shapes = [(62, 174), (38, 94), (26, 54), (20, 34)]

    check = "--check" in sys.argv
    bf16 = "--bf16vol" in sys.argv

    for Hp, Wp in shapes:
        f2p = jnp.asarray(rng.randn(Hp, Wp, C).astype(np.float32))
        f2p_b = f2p.astype(jnp.bfloat16)
        f1 = jnp.asarray(rng.randn(N, C).astype(np.float32))
        f1_b = f1.astype(jnp.bfloat16)
        sy = jnp.asarray(rng.randint(0, Hp - T_TAPS, N).astype(np.int32))
        sx = jnp.asarray(rng.randint(0, Wp - T_TAPS, N).astype(np.int32))
        fx = jnp.asarray(rng.rand(N).astype(np.float32))
        fy = jnp.asarray(rng.rand(N).astype(np.float32))
        vq = jnp.ones((N,), jnp.float32)

        vol = jax.jit(build_volume, static_argnums=(2, 3))(
            f1, f2p.reshape(-1, C), Hp, Wp)
        vol_b = vol.astype(jnp.bfloat16)

        if check:
            a = np.asarray(jax.jit(slab_lookup)(vol, sy, sx, fx, fy, vq))
            b = np.asarray(jax.jit(patch_lookup)(
                f1_b, f2p_b, sy, sx, fx, fy, vq))
            print(f"L({Hp},{Wp}): max|d|={np.abs(a - b).max():.2e} "
                  f"rel={np.abs(a - b).max() / (np.abs(b).max() + 1e-9):.2e}")
            continue

        variants = [
            ("slab_f32", lambda s: jax.jit(slab_lookup)(vol, s, sx, fx, fy, vq)),
            ("slab_bf16", lambda s: jax.jit(slab_lookup)(vol_b, s, sx, fx, fy, vq)),
            ("patch", lambda s: jax.jit(patch_lookup)(f1_b, f2p_b, s, sx, fx, fy, vq)),
        ]
        for name, fn in variants:
            @jax.jit
            def chain(sy0):
                def body(i, c):
                    s, acc = c
                    d = fn(s)
                    s2 = (s + (d[0, 0] > 1e30).astype(jnp.int32)
                          ) % jnp.int32(Hp - T_TAPS)
                    return (s2, acc + d[0, 0])
                return jax.lax.fori_loop(0, 16, body,
                                         (sy0, jnp.float32(0)))[1]

            acc = float(np.asarray(chain(sy)))
            best = 1e9
            for _ in range(3):
                t0 = time.perf_counter()
                acc = float(np.asarray(chain(sy)))
                best = min(best, (time.perf_counter() - t0) / 16)
            print(f"L({Hp},{Wp}) {name}: {best * 1e3:.3f} ms/lookup")

    # volume build cost
    f2ps = [jnp.asarray(rng.randn(Hp, Wp, C).astype(np.float32)).reshape(-1, C)
            for Hp, Wp in shapes]
    f1 = jnp.asarray(rng.randn(N, C).astype(np.float32))

    @jax.jit
    def build_all(f1, f2ps):
        return [build_volume(f1, f2p, 1, f2p.shape[0]) for f2p in f2ps]

    outs = build_all(f1, f2ps)
    _ = float(np.asarray(outs[0][0, 0, 0]))
    best = 1e9
    for _ in range(5):
        t0 = time.perf_counter()
        outs = build_all(f1, f2ps)
        _ = float(np.asarray(outs[0][0, 0, 0]))
        best = min(best, time.perf_counter() - t0)
    print(f"volume build (4 levels): {best * 1e3:.3f} ms")


if __name__ == "__main__":
    main()
