"""Upsampling ops vs torch oracles (unfold/pixel_unshuffle/interpolate)."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402

import jax.numpy as jnp  # noqa: E402

from codd_tpu.ops import (  # noqa: E402
    cvx_upsample, to_plane, hyp_upsample, pixel_unshuffle, unfold3x3,
    interpolate_bilinear,
)


def test_pixel_unshuffle_matches_torch():
    rng = np.random.RandomState(0)
    x = rng.randn(2, 8, 12, 3).astype(np.float32)
    ours = np.asarray(pixel_unshuffle(jnp.asarray(x), 4))
    ref = torch.pixel_unshuffle(torch.from_numpy(x).permute(0, 3, 1, 2), 4)
    ref = ref.permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(ours, ref, atol=1e-6)


def test_unfold3x3_matches_torch():
    rng = np.random.RandomState(1)
    x = rng.randn(1, 5, 7, 2).astype(np.float32)
    ours = np.asarray(unfold3x3(jnp.asarray(x)))  # (B,H,W,9,C)
    ref = F.unfold(torch.from_numpy(x).permute(0, 3, 1, 2), [3, 3], padding=1)
    ref = ref.reshape(1, 2, 9, 5, 7).permute(0, 3, 4, 2, 1).numpy()
    np.testing.assert_allclose(ours, ref, atol=1e-6)


def test_to_plane_matches_torch_reference():
    """to_plane == nearest-upsample + a*dx + b*dy (propagation.py:10-23)."""
    rng = np.random.RandomState(2)
    d = rng.randn(1, 3, 4).astype(np.float32)
    dx = rng.randn(1, 3, 4).astype(np.float32)
    dy = rng.randn(1, 3, 4).astype(np.float32)
    size = 4
    ours = np.asarray(to_plane(jnp.asarray(d), jnp.asarray(dx), jnp.asarray(dy), size))

    c = np.linspace(-(size - 1) / 2, (size - 1) / 2, size).astype(np.float32)
    d4 = np.kron(d[0], np.ones((size, size), np.float32))
    dx4 = np.kron(dx[0], np.ones((size, size), np.float32))
    dy4 = np.kron(dy[0], np.ones((size, size), np.float32))
    a = np.tile(c, 4 * size * 3).reshape(3 * size, 4 * size)[: 3 * size, : 4 * size]
    a = np.tile(c[None, :], (3 * size, 4))
    b = np.tile(c[:, None], (3, 4 * size))
    ref = d4 + a * dx4 + b * dy4
    np.testing.assert_allclose(ours[0], ref, atol=1e-5)


def test_hyp_upsample_scales_disp_only():
    h = np.zeros((1, 2, 2, 5), np.float32)
    h[..., 0] = 3.0  # d
    h[..., 3] = 7.0  # descriptor ch
    up = np.asarray(hyp_upsample(jnp.asarray(h), scale=2, size=2))
    assert up.shape == (1, 4, 4, 5)
    np.testing.assert_allclose(up[..., 0], 6.0)   # disp doubled
    np.testing.assert_allclose(up[..., 3], 7.0)   # rest nearest-copied


def test_cvx_upsample_constant_preserved():
    """With any mask logits a constant field upsamples to the constant."""
    rng = np.random.RandomState(3)
    data = jnp.full((1, 3, 4, 2), 5.0)
    mask = jnp.asarray(rng.randn(1, 3, 4, 9 * 64).astype(np.float32))
    up = np.asarray(cvx_upsample(data, mask))
    assert up.shape == (1, 24, 32, 2)
    # zero padding of the 3x3 unfold leaks into the border ring (same as the
    # torch reference's F.unfold(padding=1)); interior must be exact
    np.testing.assert_allclose(up[:, 8:16, 8:24], 5.0, atol=1e-5)


def test_interpolate_bilinear_matches_torch():
    rng = np.random.RandomState(4)
    x = rng.randn(1, 5, 7, 3).astype(np.float32)
    ours = np.asarray(interpolate_bilinear(jnp.asarray(x), (10, 14)))
    ref = F.interpolate(torch.from_numpy(x).permute(0, 3, 1, 2), size=(10, 14),
                        mode="bilinear", align_corners=True)
    np.testing.assert_allclose(ours, ref.permute(0, 2, 3, 1).numpy(), atol=1e-5)
