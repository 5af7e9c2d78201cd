"""Parity: windowed-reduction splat (ops.splat_window) vs the
_splat_one_gather oracle — identical compositing semantics, scan-free
formulation."""

import numpy as np
import jax.numpy as jnp

from codd_tpu.ops.splat import _splat_one_gather
from codd_tpu.ops.splat_window import splat_one_window


def _mk(N, C, H, W, seed=0, heavy_overlap=False):
    rng = np.random.RandomState(seed)
    if heavy_overlap:
        # many points landing on few pixels: exercises runs far longer
        # than the compositing window.  z values are well-separated so no
        # two fragments tie in the quantized-z sort key — tied fragments
        # at the ppp cap boundary are ordered arbitrarily by ANY impl
        # (verified: the gather oracle disagrees with itself under input
        # permutation), so tie-free data is required for exact parity.
        xy = rng.randn(N, 2) * 0.8 + np.asarray([[W / 2, H / 2]])
        z = 0.2 + np.arange(N) * (5.0 / N)
        rng.shuffle(z)
    else:
        xy = np.stack([rng.rand(N) * (W + 4) - 2,
                       rng.rand(N) * (H + 4) - 2], -1)
        z = rng.rand(N) * 5 + 0.2
    fx = fy = 20.0
    cx, cy = W / 2, H / 2
    X = (xy[:, 0] - cx) / fx * z
    Y = (xy[:, 1] - cy) / fy * z
    pts = np.stack([X, Y, z], -1).astype(np.float32)
    feats = rng.randn(N, C).astype(np.float32)
    intr = np.asarray([fx, fy, cx, cy], np.float32)
    return jnp.asarray(pts), jnp.asarray(feats), jnp.asarray(intr)


def _check(N, C, H, W, radius, ppp=8, seed=0, heavy_overlap=False):
    pts, feats, intr = _mk(N, C, H, W, seed, heavy_overlap)
    ref_o, ref_z = _splat_one_gather(pts, feats, intr, H, W, radius, ppp,
                                     0.0)
    got_o, got_z = splat_one_window(pts, feats, intr, H, W, radius, ppp,
                                    0.0)
    ref_o, ref_z = np.asarray(ref_o), np.asarray(ref_z)
    got_o, got_z = np.asarray(got_o), np.asarray(got_z)
    do = np.abs(got_o - ref_o).max() / (np.abs(ref_o).max() + 1e-9)
    dz = np.abs(got_z - ref_z).max() / (np.abs(ref_z).max() + 1e-9)
    # zbuf tolerance: fragments tied in the quantized-z sort key are
    # ordered arbitrarily by both impls; the winning fragment's EXACT z
    # then differs by up to the quantization step (~2^-(z_bits-9) rel).
    assert do < 1e-5 and dz < 1e-3, f"out rel={do:.2e} zbuf rel={dz:.2e}"


def test_window_splat_fullres_like():
    _check(1024, 6, 24, 32, radius=1.0)


def test_window_splat_quarterres_like():
    _check(512, 32, 16, 24, radius=2.0)


def test_window_splat_long_runs():
    # runs much longer than ppp + 1: the locality argument's edge case
    _check(2048, 4, 16, 16, radius=1.0, heavy_overlap=True)


def test_window_splat_ppp_cap():
    _check(2048, 4, 16, 16, radius=2.0, ppp=3, seed=2, heavy_overlap=True)


def test_window_splat_halfpixel_offset():
    pts, feats, intr = _mk(512, 6, 16, 24, 1)
    ref = _splat_one_gather(pts, feats, intr, 16, 24, 1.0, 8, -0.5)
    got = splat_one_window(pts, feats, intr, 16, 24, 1.0, 8, -0.5)
    assert np.abs(np.asarray(got[0]) - np.asarray(ref[0])).max() < 1e-5
    # zbuf: quantized-z tie-break tolerance (see _check)
    assert np.abs(np.asarray(got[1]) - np.asarray(ref[1])).max() < 1e-3


def test_window_sort_splat_matches_training_oracle():
    import jax
    from codd_tpu.ops.splat import _splat_one_sort
    from codd_tpu.ops.splat_window import splat_one_sort_window

    pts, feats, intr = _mk(1024, 6, 24, 32, 1)
    ref = _splat_one_sort(pts, feats, intr, 24, 32, 1.0, 8, 0.0)
    got = splat_one_sort_window(pts, feats, intr, 24, 32, 1.0, 8, 0.0)
    assert np.abs(np.asarray(got[0]) - np.asarray(ref[0])).max() < 1e-5
    assert np.abs(np.asarray(got[1]) - np.asarray(ref[1])).max() < 1e-3

    # differentiability: grads flow to points and features, finite, and
    # match the incumbent training path
    def loss_ref(p, f):
        o, z = _splat_one_sort(p, f, intr, 24, 32, 1.0, 8, 0.0)
        return jnp.sum(o * o) + jnp.sum(z)

    def loss_win(p, f):
        o, z = splat_one_sort_window(p, f, intr, 24, 32, 1.0, 8, 0.0)
        return jnp.sum(o * o) + jnp.sum(z)

    gr = jax.grad(loss_ref, argnums=(0, 1))(pts, feats)
    gw = jax.grad(loss_win, argnums=(0, 1))(pts, feats)
    for a, b in zip(gr, gw):
        a, b = np.asarray(a), np.asarray(b)
        assert np.isfinite(b).all()
        assert np.abs(a - b).max() / (np.abs(a).max() + 1e-9) < 2e-3
