"""Annotation-free image-dir dataset mode (reference --img-dir)."""

import os

import numpy as np

from codd_tpu.data.datasets import StereoVideoDataset


def test_from_dirs(tmp_path):
    import imageio.v2 as imageio
    rng = np.random.RandomState(0)
    for side in ("left", "right"):
        d = tmp_path / side / "seq0"
        os.makedirs(d)
        for i in range(3):
            imageio.imwrite(str(d / f"{i:04d}.png"),
                            (rng.rand(16, 24, 3) * 255).astype(np.uint8))
    ds = StereoVideoDataset.from_dirs(str(tmp_path / "left"),
                                      str(tmp_path / "right"),
                                      intrinsics=[10, 10, 12, 8])
    assert len(ds) == 1
    s = ds[0]
    assert s["imgs"].shape == (3, 16, 24, 3)
    assert s["r_imgs"].shape == (3, 16, 24, 3)
    assert "gt_disp" not in s
    assert s["meta"]["intrinsics"] == [10, 10, 12, 8]
