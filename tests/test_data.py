"""Data layer: codecs roundtrip, clip grouping, dataset loading, transforms."""

import os

import numpy as np
import pytest

from codd_tpu.data import io as dio
from codd_tpu.data.datasets import StereoVideoDataset, group_clips
from codd_tpu.data.loader import Prefetcher, batch_iterator, collate
from codd_tpu.data.transforms import (
    Normalize, Pad, PhotoMetricDistortion, RandomCrop, RandomOcclude,
)


def test_pfm_roundtrip(tmp_path):
    rng = np.random.RandomState(0)
    data = rng.rand(7, 9).astype(np.float32) * 100
    p = str(tmp_path / "x.pfm")
    dio.write_pfm(p, data)
    back, scale = dio.read_pfm(p)
    np.testing.assert_allclose(back, data, atol=1e-6)


def test_flo_roundtrip(tmp_path):
    rng = np.random.RandomState(1)
    flow = rng.randn(5, 6, 2).astype(np.float32)
    p = str(tmp_path / "x.flo")
    dio.write_flo(p, flow)
    np.testing.assert_allclose(dio.read_flo(p), flow, atol=1e-6)


def test_kitti_disp_codec(tmp_path):
    import imageio.v2 as imageio
    disp16 = (np.array([[0, 256, 12800]], np.uint16))
    p = str(tmp_path / "d.png")
    imageio.imwrite(p, disp16)
    out = dio.read_kitti_disparity(p)
    np.testing.assert_allclose(out, [0.0, 1.0, 50.0])  # squeezed like ref


def test_group_clips_train_windows():
    entries = [{"filename": f"seq_a/{i:04d}.png"} for i in range(4)]
    entries += [{"filename": f"seq_b/{i:04d}.png"} for i in range(3)]
    clips = group_clips(entries, num_frames=2, pattern=r"\d+.png")
    names = [[e["filename"] for e in c] for c in clips]
    assert names == [
        ["seq_a/0000.png", "seq_a/0001.png"],
        ["seq_a/0001.png", "seq_a/0002.png"],
        ["seq_a/0002.png", "seq_a/0003.png"],
        ["seq_b/0000.png", "seq_b/0001.png"],
        ["seq_b/0001.png", "seq_b/0002.png"],
    ]


def test_group_clips_test_mode_caps_sequences():
    entries = [{"filename": f"s/{i:05d}.png"} for i in range(120)]
    clips = group_clips(entries, num_frames=-1, pattern=r"\d+.png")
    assert [len(c) for c in clips] == [50, 50, 20]


@pytest.fixture
def tiny_dataset(tmp_path):
    import imageio.v2 as imageio
    rng = np.random.RandomState(0)
    lines = []
    for seq in ("a", "b"):
        for i in range(3):
            img = (rng.rand(32, 48, 3) * 255).astype(np.uint8)
            for side in ("left", "right"):
                d = tmp_path / side / seq
                os.makedirs(d, exist_ok=True)
                imageio.imwrite(str(d / f"{i:04d}.png"), img)
            dd = tmp_path / "disp" / seq
            os.makedirs(dd, exist_ok=True)
            dio.write_pfm(str(dd / f"{i:04d}.pfm"),
                          rng.rand(32, 48).astype(np.float32) * 50)
            fd = tmp_path / "flow" / seq
            os.makedirs(fd, exist_ok=True)
            dio.write_pfm(str(fd / f"{i:04d}.pfm"),
                          rng.rand(32, 48, 3).astype(np.float32))
            lines.append(" ".join([
                f"left/{seq}/{i:04d}.png", f"right/{seq}/{i:04d}.png",
                f"disp/{seq}/{i:04d}.pfm", f"flow/{seq}/{i:04d}.pfm"]))
    split = tmp_path / "split.txt"
    split.write_text("\n".join(lines) + "\n")
    return str(split), str(tmp_path)


def test_dataset_clip_loading(tiny_dataset):
    split, root = tiny_dataset
    ds = StereoVideoDataset(split, data_root=root, num_frames=2,
                            prefix_pattern=r"\d+.png", disp_backend="pfm",
                            flow_backend="pfm",
                            intrinsics=[100, 100, 24, 16])
    assert len(ds) == 4  # 2 sliding windows per 3-frame sequence x 2
    s = ds[0]
    assert s["imgs"].shape == (2, 32, 48, 3)
    assert s["gt_disp"].shape == (2, 32, 48, 1)
    assert s["gt_flow"].shape == (2, 32, 48, 2)
    assert "gt_disp2" not in s


def test_pipeline_and_collate(tiny_dataset):
    split, root = tiny_dataset
    rng = np.random.default_rng(0)
    pipeline = [
        RandomCrop((24, 32), rng=rng),
        PhotoMetricDistortion(asym=True, rng=rng),
        Normalize(),
        Pad(size_divisor=16),
        RandomOcclude(prob=1.0, rng=rng),
    ]
    ds = StereoVideoDataset(split, data_root=root, num_frames=2,
                            prefix_pattern=r"\d+.png", disp_backend="pfm",
                            flow_backend="pfm", pipeline=pipeline,
                            intrinsics=[100, 100, 24, 16])
    it = batch_iterator(ds, batch_size=2, epochs=1, seed=0)
    batches = list(Prefetcher(it))
    assert len(batches) == 2
    b = batches[0]
    assert b["l_img"].shape == (2, 2, 32, 32, 3)   # 24 padded to /16
    assert b["gt_disp"].shape == (2, 2, 32, 32, 1)
    assert b["meta"][0]["img_shape"] == (24, 32)   # pre-pad extent kept
    assert b["intrinsics"].shape == (2, 4)
    # crop shifted principal point
    assert b["meta"][0]["intrinsics"][2] <= 24


def test_host_sharding(tiny_dataset):
    split, root = tiny_dataset
    ds = StereoVideoDataset(split, data_root=root, num_frames=2,
                            prefix_pattern=r"\d+.png")
    b0 = list(batch_iterator(ds, 1, shuffle=False, epochs=1, host_id=0,
                             num_hosts=2))
    b1 = list(batch_iterator(ds, 1, shuffle=False, epochs=1, host_id=1,
                             num_hosts=2))
    assert len(b0) == 2 and len(b1) == 2
    f0 = {b["meta"][0]["filename"] for b in b0}
    f1 = {b["meta"][0]["filename"] for b in b1}
    assert not f0 & f1
