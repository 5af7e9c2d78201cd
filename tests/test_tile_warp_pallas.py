"""Interpret-mode equality of the fused tile-warp kernel vs the exact
tile_warping path.  The compiled-kernel certificate is the on-chip gate
scripts/check_tile_warp_tpu.py (gn_window lesson: interpret equality
does not certify Mosaic compilation)."""

import numpy as np
import jax.numpy as jnp

from codd_tpu.ops.pallas.tile_warp import (tile_warp_cost,
                                           tile_warp_cost_reference)


def _mk(B, H, W, C, seed=0, max_d=None):
    rng = np.random.RandomState(seed)
    fl = rng.randn(B, H, W, C).astype(np.float32)
    fr = rng.randn(B, H, W, C).astype(np.float32)
    ht, wt = H // 4, W // 4
    max_d = max_d if max_d is not None else W * 0.8
    d = rng.rand(B, ht, wt).astype(np.float32) * max_d
    dx = rng.uniform(-1.2, 1.2, (B, ht, wt)).astype(np.float32)
    dy = rng.uniform(-1.2, 1.2, (B, ht, wt)).astype(np.float32)
    hyp3 = np.stack([d, dx, dy], axis=-1)
    return jnp.asarray(hyp3), jnp.asarray(fl), jnp.asarray(fr)


def _check(B, H, W, C, seed=0, max_d=None):
    hyp3, fl, fr = _mk(B, H, W, C, seed, max_d)
    ref = np.asarray(tile_warp_cost_reference(hyp3, fl, fr))
    got = np.asarray(tile_warp_cost(hyp3, fl, fr, interpret=True))
    assert got.shape == ref.shape == (B, H // 4, W // 4, 48)
    denom = np.abs(ref).max() + 1e-9
    rel = np.abs(got - ref).max() / denom
    assert rel < 1e-5, f"rel={rel:.3e} at {(B, H, W, C)}"


def test_tile_warp_small():
    _check(1, 32, 128, 16)


def test_tile_warp_batched_oddchan():
    _check(2, 16, 64, 24)


def test_tile_warp_edge_disparities():
    # disparities driving taps far out of image both sides (negative p and
    # p >= W) must reproduce the zeros-padding masking exactly
    _check(1, 16, 64, 16, seed=3, max_d=90.0)
