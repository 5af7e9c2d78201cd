"""Parity tests for grid_sample / warps against torch (CPU oracle)."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402

import jax.numpy as jnp  # noqa: E402

from codd_tpu.ops import grid_sample, flow_warp, disp_warp  # noqa: E402


def _torch_grid_sample(img_nhwc, coords_xy, mode, padding_mode):
    """torch reference: pixel coords -> normalized grid, align_corners=True."""
    B, H, W, C = img_nhwc.shape
    img = torch.from_numpy(img_nhwc).permute(0, 3, 1, 2)
    gx = 2 * coords_xy[..., 0] / (W - 1) - 1
    gy = 2 * coords_xy[..., 1] / (H - 1) - 1
    grid = torch.from_numpy(np.stack([gx, gy], -1))
    out = F.grid_sample(img, grid, mode=mode, padding_mode=padding_mode,
                        align_corners=True)
    return out.permute(0, 2, 3, 1).numpy()


@pytest.mark.parametrize("mode", ["bilinear", "nearest"])
@pytest.mark.parametrize("padding", ["zeros", "border"])
def test_grid_sample_matches_torch(mode, padding):
    rng = np.random.RandomState(0)
    img = rng.randn(2, 13, 17, 3).astype(np.float32)
    # include in-range, out-of-range and exactly-on-border coords
    coords = rng.uniform(-4, 20, size=(2, 9, 11, 2)).astype(np.float32)
    coords[0, 0, 0] = [0.0, 0.0]
    coords[0, 0, 1] = [16.0, 12.0]
    coords[0, 0, 2] = [-1.0, -1.0]

    ours = np.asarray(grid_sample(jnp.asarray(img), jnp.asarray(coords),
                                  mode=mode, padding_mode=padding))
    ref = _torch_grid_sample(img, coords, mode, padding)
    np.testing.assert_allclose(ours, ref, atol=1e-5)


def test_flow_warp_matches_reference_semantics():
    rng = np.random.RandomState(1)
    img = rng.randn(1, 16, 20, 2).astype(np.float32)
    flow = rng.uniform(-3, 3, size=(1, 16, 20, 2)).astype(np.float32)

    warped, valid = flow_warp(jnp.asarray(img), jnp.asarray(flow),
                              padding_mode="zeros", mode="nearest")

    # oracle: torch grid_sample driven the same way as reference utils/warp.py
    B, H, W, C = img.shape
    ys, xs = np.meshgrid(np.arange(H), np.arange(W), indexing="ij")
    coords = np.stack([xs + flow[0, ..., 0], ys + flow[0, ..., 1]], -1)[None]
    ref = _torch_grid_sample(img, coords.astype(np.float32), "nearest", "zeros")
    np.testing.assert_allclose(np.asarray(warped), ref, atol=1e-5)

    ones = np.ones_like(img)
    vref = _torch_grid_sample(ones, coords.astype(np.float32), "nearest", "zeros")
    np.testing.assert_array_equal(np.asarray(valid), vref >= 0.9999)


def test_disp_warp_shifts_left():
    # constant disparity 2 -> output column i equals input column i-2
    img = np.tile(np.arange(12, dtype=np.float32)[None, None, :, None], (1, 4, 1, 1))
    disp = np.full((1, 4, 12), 2.0, np.float32)
    warped, valid = disp_warp(jnp.asarray(img), jnp.asarray(disp))
    np.testing.assert_allclose(np.asarray(warped[0, :, 5, 0]), 3.0, atol=1e-6)
    v = np.asarray(valid)
    assert v[0, :, 5, 0].all()        # in-bounds sample
    assert not v[0, :, 1, 0].any()    # samples x=-1 -> invalid (zeros-pad ones)
