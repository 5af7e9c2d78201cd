"""Correlation pyramid lookup and point splatting."""

import numpy as np
import pytest

import jax.numpy as jnp

from codd_tpu.ops import build_corr_pyramid, corr_lookup, splat_render


def test_corr_volume_values():
    rng = np.random.RandomState(0)
    f1 = rng.randn(1, 4, 6, 8).astype(np.float32)
    f2 = rng.randn(1, 4, 6, 8).astype(np.float32)
    pyr = build_corr_pyramid(jnp.asarray(f1), jnp.asarray(f2), num_levels=2)
    # level0 entry (i,j)->(k,l) = <f1[i,j], f2[k,l]>/16
    vol = np.asarray(pyr[0]).reshape(4, 6, 4, 6)
    ref = np.einsum("ijc,klc->ijkl", f1[0], f2[0]) / 16.0
    np.testing.assert_allclose(vol, ref, atol=1e-5)


def test_corr_lookup_center_identity():
    """Looking up at integer coords with radius 0-offset recovers the volume."""
    rng = np.random.RandomState(1)
    f1 = rng.randn(1, 4, 4, 8).astype(np.float32)
    f2 = rng.randn(1, 4, 4, 8).astype(np.float32)
    pyr = build_corr_pyramid(jnp.asarray(f1), jnp.asarray(f2), num_levels=1)
    ys, xs = np.meshgrid(np.arange(4), np.arange(4), indexing="ij")
    coords = jnp.asarray(np.stack([xs, ys], -1)[None].astype(np.float32))
    out = np.asarray(corr_lookup(pyr, coords, radius=1))  # (1,4,4,9)
    center = out[0, :, :, 4]  # window center (dy=0,dx=0)
    vol = np.asarray(pyr[0]).reshape(4, 4, 4, 4)
    ref = np.stack([vol[i, j, i, j] for i in range(4) for j in range(4)]).reshape(4, 4)
    np.testing.assert_allclose(center, ref, atol=1e-5)


def test_splat_identity_points():
    """Points exactly on the pixel grid with identity motion reproduce the
    feature image and depth map."""
    rng = np.random.RandomState(2)
    H, W, C = 8, 10, 3
    depth = 2.0 + rng.rand(H, W).astype(np.float32)
    feat = rng.rand(H, W, C).astype(np.float32)
    fx = fy = 20.0
    cx, cy = (W - 1) / 2, (H - 1) / 2
    ys, xs = np.meshgrid(np.arange(H), np.arange(W), indexing="ij")
    X = depth * (xs - cx) / fx
    Y = depth * (ys - cy) / fy
    pts = np.stack([X, Y, depth], -1).reshape(1, -1, 3)

    out, zbuf = splat_render(
        jnp.asarray(pts), jnp.asarray(feat.reshape(1, -1, C)),
        # radius < 1: only the point's own pixel is covered (on-grid points
        # at distance exactly 1.0 from neighbors are fp32-knife-edge at r=1)
        jnp.asarray([[fx, fy, cx, cy]], dtype=jnp.float32), H=H, W=W, radius_px=0.7)
    out = np.asarray(out)[0]
    zbuf = np.asarray(zbuf)[0]
    # on-grid points land with alpha=1 at their own pixel (d=0) and alpha=0
    # at neighbors, so the composite is exactly the source feature
    np.testing.assert_allclose(out, feat, atol=1e-4)
    np.testing.assert_allclose(zbuf, depth, atol=1e-5)


def test_splat_occlusion_nearest_wins():
    """Two points on the same pixel: the nearer one dominates the composite
    and defines the zbuf."""
    pts = np.array([[[0.0, 0.0, 1.0], [0.0, 0.0, 5.0]]], np.float32)
    feat = np.array([[[1.0], [100.0]]], np.float32)
    intr = np.array([[10.0, 10.0, 2.0, 2.0]], np.float32)
    out, zbuf = splat_render(jnp.asarray(pts), jnp.asarray(feat),
                             jnp.asarray(intr), H=5, W=5, radius_px=1.0)
    assert abs(np.asarray(zbuf)[0, 2, 2] - 1.0) < 1e-6
    # alpha=1 for the near point (clipped to 1-1e-4): far point suppressed
    assert np.asarray(out)[0, 2, 2, 0] < 1.2


def test_splat_empty_pixels_zero():
    pts = np.zeros((1, 1, 3), np.float32)
    pts[0, 0] = [0, 0, -1.0]  # behind camera -> culled
    feat = np.ones((1, 1, 2), np.float32)
    out, zbuf = splat_render(jnp.asarray(pts), jnp.asarray(feat),
                             jnp.asarray([[10.0, 10, 2, 2]], np.float32),
                             H=4, W=4, radius_px=1.0)
    np.testing.assert_array_equal(np.asarray(out), 0.0)
    np.testing.assert_array_equal(np.asarray(zbuf), 0.0)
