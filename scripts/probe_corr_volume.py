"""Internal breakdown of the volume corr lookup at the production L0 shape:
slab gather vs one-hot column selection vs full lookup (incl. bilinear).

Usage: python scripts/probe_corr_volume.py
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

B = 1
h, w, C = 48, 160, 128
N = h * w
t = 8
SHAPES = [(62, 174), (38, 94), (26, 54), (20, 34)]


def chain_ms(fn, seed, k=16):
    @jax.jit
    def run(s):
        def body(i, c):
            sd, acc = c
            out = fn(sd)
            return (sd + (acc * 0).astype(sd.dtype),
                    acc + out.astype(jnp.float32))
        return jax.lax.fori_loop(0, k, body, (s, jnp.float32(0)))[1]

    _ = float(np.asarray(run(seed)))
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        _ = float(np.asarray(run(seed)))
        best = min(best, (time.perf_counter() - t0) / k)
    return best * 1e3


def main():
    rng = np.random.RandomState(0)
    for Hp, Wp in SHAPES:
        vol = jnp.asarray(rng.randn(N, Hp, Wp).astype(np.float32)
                          ).astype(jnp.bfloat16)
        sy = jnp.asarray(rng.randint(0, Hp - t, N).astype(np.int32))
        sx = jnp.asarray(rng.randint(0, Wp - t, N).astype(np.int32))
        n_iota = jnp.arange(N, dtype=jnp.int32)
        dnums = jax.lax.GatherDimensionNumbers(
            offset_dims=(1, 2), collapsed_slice_dims=(0,),
            start_index_map=(0, 1))

        def slabs_of(sy_):
            idx = jnp.stack([n_iota, sy_], axis=-1)
            return jax.lax.gather(
                vol, idx, dnums, slice_sizes=(1, t, Wp),
                mode=jax.lax.GatherScatterMode.PROMISE_IN_BOUNDS)

        ms_g = chain_ms(lambda sy_: slabs_of(sy_).astype(jnp.float32).sum(),
                        sy)

        w_iota = jnp.arange(Wp, dtype=jnp.int32)
        k_iota = jnp.arange(t, dtype=jnp.int32)

        def select(sy_):
            slabs = slabs_of(sy_)
            mask = (w_iota[None, :, None]
                    == sx[:, None, None] + k_iota[None, None, :]
                    ).astype(slabs.dtype)
            dots = jnp.einsum("nyw,nwk->nyk", slabs, mask,
                              preferred_element_type=jnp.float32)
            return dots.sum()

        ms_s = chain_ms(select, sy)

        def select_bm(sy_):
            # broadcast-multiply-reduce: XLA fuses the iota-compare mask
            # into one pass over the slabs (no mask materialization, no
            # batched tiny matmuls)
            slabs = slabs_of(sy_).astype(jnp.float32)
            sel = (w_iota[None, None, :, None]
                   == sx[:, None, None, None] + k_iota[None, None, None, :])
            dots = jnp.sum(slabs[:, :, :, None]
                           * sel.astype(slabs.dtype), axis=2)
            return dots.sum()

        ms_b = chain_ms(select_bm, sy)
        print(f"L({Hp:3d},{Wp:3d}): slab-gather {ms_g:6.3f} ms   "
              f"+col-matmul {ms_s:6.3f} (+{ms_s - ms_g:5.3f})   "
              f"+col-bmul {ms_b:6.3f} (+{ms_b - ms_g:5.3f})",
              flush=True)

        # aligned narrow-slab variants: gather (t, SW) at 8-aligned x from
        # an f32 volume padded to alignment, select from SW columns only
        for SW in (16, 64):
            Wpad = ((Wp - t) // 8) * 8 + SW
            volf = jnp.pad(vol.astype(jnp.float32),
                           ((0, 0), (0, 0), (0, max(0, Wpad - Wp))))
            dn2 = jax.lax.GatherDimensionNumbers(
                offset_dims=(1, 2), collapsed_slice_dims=(0,),
                start_index_map=(0, 1, 2))
            sx8 = (sx // 8) * 8
            off = sx - sx8
            sw_iota = jnp.arange(SW, dtype=jnp.int32)

            def select_aligned(sy_):
                idx = jnp.stack([n_iota, sy_, sx8], axis=-1)
                slabs = jax.lax.gather(
                    volf, idx, dn2, slice_sizes=(1, t, SW),
                    mode=jax.lax.GatherScatterMode.PROMISE_IN_BOUNDS)
                mask = (sw_iota[None, :, None]
                        == off[:, None, None] + k_iota[None, None, :]
                        ).astype(slabs.dtype)
                dots = jnp.einsum("nyw,nwk->nyk", slabs, mask,
                                  preferred_element_type=jnp.float32)
                return dots.sum()

            ms_a = chain_ms(select_aligned, sy)
            print(f"           aligned f32 SW={SW:3d}: {ms_a:6.3f} ms",
                  flush=True)


if __name__ == "__main__":
    main()
