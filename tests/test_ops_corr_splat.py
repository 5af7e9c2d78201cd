"""Correlation pyramid lookup and point splatting."""

import numpy as np
import pytest

import jax.numpy as jnp

from codd_tpu.ops import build_corr_pyramid, corr_lookup, splat_render


def _dense_corr_lookup(f1, f2, coords, radius, num_levels):
    """Numpy oracle: explicit all-pairs volume + pooled-volume bilinear
    sampling with zeros padding (the reference semantics)."""
    B, h, w, C = f1.shape
    vol = np.einsum("bijc,bklc->bijkl", f1, f2) / 16.0
    outs = []
    for lvl in range(num_levels):
        hl, wl = vol.shape[3], vol.shape[4]
        cl = coords / (2 ** lvl)
        win = []
        for dy in range(-radius, radius + 1):
            for dx in range(-radius, radius + 1):
                x = cl[..., 0] + dx
                y = cl[..., 1] + dy
                x0 = np.floor(x); y0 = np.floor(y)
                fx = x - x0; fy = y - y0
                acc = np.zeros((B, h, w), np.float32)
                for oy, wy in ((0, 1 - fy), (1, fy)):
                    for ox, wx in ((0, 1 - fx), (1, fx)):
                        xi = (x0 + ox).astype(int)
                        yi = (y0 + oy).astype(int)
                        ok = (xi >= 0) & (xi < wl) & (yi >= 0) & (yi < hl)
                        xi = np.clip(xi, 0, wl - 1)
                        yi = np.clip(yi, 0, hl - 1)
                        for b in range(B):
                            for i in range(h):
                                for j in range(w):
                                    if ok[b, i, j]:
                                        acc[b, i, j] += (wy if np.isscalar(wy) else wy[b, i, j]) * \
                                            (wx if np.isscalar(wx) else wx[b, i, j]) * \
                                            vol[b, i, j, yi[b, i, j], xi[b, i, j]]
                win.append(acc)
        outs.append(np.stack(win, -1))
        if lvl + 1 < num_levels:
            hl2, wl2 = hl // 2, wl // 2
            vol = vol[:, :, :, :hl2 * 2, :wl2 * 2].reshape(
                B, h, w, hl2, 2, wl2, 2).mean((4, 6))
    return np.concatenate(outs, -1)


@pytest.mark.parametrize("impl", ["patch", "volume"])
def test_corr_lookup_matches_dense_volume_oracle(impl):
    rng = np.random.RandomState(1)
    f1 = rng.randn(1, 4, 6, 8).astype(np.float32)
    f2 = rng.randn(1, 4, 6, 8).astype(np.float32)
    pyr = build_corr_pyramid(jnp.asarray(f1), jnp.asarray(f2), num_levels=2,
                             impl=impl, radius=1)
    coords = rng.uniform(-1.5, 7.0, size=(1, 4, 6, 2)).astype(np.float32)
    out = np.asarray(corr_lookup(pyr, jnp.asarray(coords), radius=1))
    ref = _dense_corr_lookup(f1, f2, coords, radius=1, num_levels=2)
    # pyramid features are stored bf16 (halved gather traffic): ~1e-2 rel
    np.testing.assert_allclose(out, ref, atol=3e-2)


def test_corr_volume_pallas_select_matches_xla():
    """The fused Pallas column-select (interpret mode on CPU) is bit-level
    equivalent to the one-hot einsum path at radius 3 (production radius)."""
    rng = np.random.RandomState(5)
    f1 = rng.randn(2, 8, 16, 8).astype(np.float32)
    f2 = rng.randn(2, 8, 16, 8).astype(np.float32)
    pyr = build_corr_pyramid(jnp.asarray(f1), jnp.asarray(f2), num_levels=2,
                             impl="volume", radius=3)
    coords = rng.uniform(-2.0, 17.0, size=(2, 8, 16, 2)).astype(np.float32)
    out_x = np.asarray(corr_lookup(pyr, jnp.asarray(coords), radius=3,
                                   select="xla"))
    out_p = np.asarray(corr_lookup(pyr, jnp.asarray(coords), radius=3,
                                   select="pallas"))
    np.testing.assert_allclose(out_p, out_x, atol=1e-5)


def test_corr_volume_reduce_select_matches_xla():
    """The VPU compare-select reduce is bit-identical to the one-hot
    einsum path (exactly one nonzero term per output element)."""
    rng = np.random.RandomState(9)
    f1 = rng.randn(2, 8, 16, 8).astype(np.float32)
    f2 = rng.randn(2, 8, 16, 8).astype(np.float32)
    pyr = build_corr_pyramid(jnp.asarray(f1), jnp.asarray(f2), num_levels=2,
                             impl="volume", radius=3)
    coords = rng.uniform(-2.0, 17.0, size=(2, 8, 16, 2)).astype(np.float32)
    out_x = np.asarray(corr_lookup(pyr, jnp.asarray(coords), radius=3,
                                   select="xla"))
    out_r = np.asarray(corr_lookup(pyr, jnp.asarray(coords), radius=3,
                                   select="reduce"))
    np.testing.assert_allclose(out_r, out_x, atol=0, rtol=0)


def test_corr_volume_wide_level():
    """Wide level (Wp > 128): both select backends match the dense oracle
    across several 128-column blocks and at both image edges."""
    rng = np.random.RandomState(7)
    f1 = rng.randn(1, 3, 128, 8).astype(np.float32)
    f2 = rng.randn(1, 3, 128, 8).astype(np.float32)
    pyr = build_corr_pyramid(jnp.asarray(f1), jnp.asarray(f2), num_levels=1,
                             impl="volume", radius=3)
    coords = rng.uniform(-3.0, 130.0, size=(1, 3, 128, 2)).astype(np.float32)
    out_x = np.asarray(corr_lookup(pyr, jnp.asarray(coords), radius=3,
                                   select="xla"))
    out_p = np.asarray(corr_lookup(pyr, jnp.asarray(coords), radius=3,
                                   select="pallas"))
    ref = _dense_corr_lookup(f1, f2, coords, radius=3, num_levels=1)
    np.testing.assert_allclose(out_x, ref, atol=3e-2)
    np.testing.assert_allclose(out_p, out_x, atol=1e-5)


def test_corr_lookup_center_identity():
    """Integer coords, window center recovers <f1,f2>/16 at the same pixel."""
    rng = np.random.RandomState(1)
    f1 = rng.randn(1, 4, 4, 8).astype(np.float32)
    f2 = rng.randn(1, 4, 4, 8).astype(np.float32)
    pyr = build_corr_pyramid(jnp.asarray(f1), jnp.asarray(f2), num_levels=1)
    ys, xs = np.meshgrid(np.arange(4), np.arange(4), indexing="ij")
    coords = jnp.asarray(np.stack([xs, ys], -1)[None].astype(np.float32))
    out = np.asarray(corr_lookup(pyr, coords, radius=1))  # (1,4,4,9)
    center = out[0, :, :, 4]
    ref = np.einsum("ijc,ijc->ij", f1[0], f2[0]) / 16.0
    np.testing.assert_allclose(center, ref, atol=3e-2)


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


@pytest.mark.parametrize("offset", [0.0, -0.5])
@pytest.mark.parametrize("impl", ["xla", "xla_gather"])
def test_splat_matches_bruteforce_compositor(impl, offset):
    """Random fractional points vs a per-pixel python compositor, under
    both pixel-center conventions (offset -0.5 = pytorch3d's half-integer
    screen convention, reference motion.py:106-128)."""
    rng = np.random.RandomState(5)
    H, W, C, N = 10, 12, 2, 60
    fx = fy = 15.0
    cx, cy = 5.5, 4.5
    Z = (0.5 + rng.rand(N) * 5).astype(np.float32)
    px = rng.uniform(-1, W, N).astype(np.float32)
    py = rng.uniform(-1, H, N).astype(np.float32)
    X = (px - cx) / fx * Z
    Y = (py - cy) / fy * Z
    pts = np.stack([X, Y, Z], -1)[None]
    feats = rng.rand(1, N, C).astype(np.float32)
    out, zbuf = splat_render(jnp.asarray(pts), jnp.asarray(feats),
                             jnp.asarray([[fx, fy, cx, cy]], np.float32),
                             H=H, W=W, radius_px=1.0, impl=impl,
                             pixel_center_offset=offset)
    out = np.asarray(out)[0]
    zbuf = np.asarray(zbuf)[0]

    # brute force: per pixel, gather fragments, sort by z, composite.
    # screen position of point n is px[n] + offset under the convention.
    ref = np.zeros((H, W, C), np.float32)
    refz = np.zeros((H, W), np.float32)
    for yy in range(H):
        for xx in range(W):
            frags = []
            for n in range(N):
                d2 = (px[n] + offset - xx) ** 2 + (py[n] + offset - yy) ** 2
                a = 1.0 - d2 / 1.0
                if a > 0:
                    frags.append((Z[n], min(a, 1 - 1e-4), feats[0, n]))
            frags.sort(key=lambda t: t[0])
            t = 1.0
            acc = np.zeros(C, np.float32)
            for z, a, f in frags[:8]:
                acc += t * a * f
                t *= 1 - a
            ref[yy, xx] = acc
            refz[yy, xx] = frags[0][0] if frags else 0.0
    np.testing.assert_allclose(out, ref, atol=1e-3)
    np.testing.assert_allclose(zbuf, refz, atol=1e-4)


def test_splat_pallas_matches_bruteforce_compositor():
    """The Pallas tile compositor (interpret mode on CPU) reproduces the
    per-pixel python compositor exactly (ops/pallas/splat_composite.py)."""
    rng = np.random.RandomState(5)
    H, W, C, N = 10, 12, 2, 60
    fx = fy = 15.0
    cx, cy = 5.5, 4.5
    Z = (0.5 + rng.rand(N) * 5).astype(np.float32)
    px = rng.uniform(-1, W, N).astype(np.float32)
    py = rng.uniform(-1, H, N).astype(np.float32)
    pts = np.stack([(px - cx) / fx * Z, (py - cy) / fy * Z, Z], -1)[None]
    feats = rng.rand(1, N, C).astype(np.float32)
    out, zbuf = splat_render(jnp.asarray(pts), jnp.asarray(feats),
                             jnp.asarray([[fx, fy, cx, cy]], np.float32),
                             H=H, W=W, radius_px=1.0, impl="pallas")
    out = np.asarray(out)[0]
    zbuf = np.asarray(zbuf)[0]

    ref = np.zeros((H, W, C), np.float32)
    refz = np.zeros((H, W), np.float32)
    for yy in range(H):
        for xx in range(W):
            frags = []
            for n in range(N):
                d2 = (px[n] - xx) ** 2 + (py[n] - yy) ** 2
                a = 1.0 - d2 / 1.0
                if a > 0:
                    frags.append((Z[n], min(a, 1 - 1e-4), feats[0, n]))
            frags.sort(key=lambda t: t[0])
            t = 1.0
            acc = np.zeros(C, np.float32)
            for z, a, f in frags[:8]:
                acc += t * a * f
                t *= 1 - a
            ref[yy, xx] = acc
            refz[yy, xx] = frags[0][0] if frags else 0.0
    np.testing.assert_allclose(out, ref, atol=1e-3)
    np.testing.assert_allclose(zbuf, refz, atol=1e-4)


def test_splat_empty_pixels_zero():
    pts = np.zeros((1, 1, 3), np.float32)
    pts[0, 0] = [0, 0, -1.0]  # behind camera -> culled
    feat = np.ones((1, 1, 2), np.float32)
    out, zbuf = splat_render(jnp.asarray(pts), jnp.asarray(feat),
                             jnp.asarray([[10.0, 10, 2, 2]], np.float32),
                             H=4, W=4, radius_px=1.0)
    np.testing.assert_array_equal(np.asarray(out), 0.0)
    np.testing.assert_array_equal(np.asarray(zbuf), 0.0)
