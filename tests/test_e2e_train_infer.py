"""End-to-end smoke: config -> dataset -> train steps -> checkpoint ->
inference eval, on a tiny synthetic stereo-video dataset (stereo-only model
to keep CPU compile small)."""

import os

import numpy as np
import pytest

from codd_tpu.data import io as dio


@pytest.fixture
def tiny_env(tmp_path):
    import imageio.v2 as imageio
    rng = np.random.RandomState(0)
    H, W = 64, 128
    lines = []
    for seq in ("a", "b"):
        for i in range(3):
            img = (rng.rand(H, W, 3) * 255).astype(np.uint8)
            for side in ("left", "right"):
                d = tmp_path / side / seq
                os.makedirs(d, exist_ok=True)
                imageio.imwrite(str(d / f"{i:04d}.png"), img)
            dd = tmp_path / "disp" / seq
            os.makedirs(dd, exist_ok=True)
            dio.write_pfm(str(dd / f"{i:04d}.pfm"),
                          rng.uniform(2, 40, (H, W)).astype(np.float32))
            fd = tmp_path / "flow" / seq
            os.makedirs(fd, exist_ok=True)
            dio.write_pfm(str(fd / f"{i:04d}.pfm"),
                          rng.uniform(-2, 2, (H, W, 3)).astype(np.float32))
            lines.append(" ".join([
                f"left/{seq}/{i:04d}.png", f"right/{seq}/{i:04d}.png",
                f"disp/{seq}/{i:04d}.pfm", f"flow/{seq}/{i:04d}.pfm"]))
    split = tmp_path / "split.txt"
    split.write_text("\n".join(lines) + "\n")

    cfg_file = tmp_path / "cfg.py"
    cfg_file.write_text(f"""
model = dict(
    type="ConsistentOnlineDynamicDepth",
    stereo=dict(type="HITNetMF", initialization=dict(max_disp=64),
                loss=dict(type="HITLoss", max_disp=64)),
    motion=None,
    fusion=None,
    train_cfg=dict(),
)
data = dict(
    train=dict(preset="scene_flow", split=r"{split}", data_root=r"{tmp_path}",
               num_frames=2, batch_size=2, disp_range=(1.0, 210.0),
               calib=1050, intrinsics=[100, 100, 64, 32],
               augment=dict(photometric=False)),
    test=dict(preset="scene_flow", split=r"{split}", data_root=r"{tmp_path}",
              num_frames=-1, disp_range=(1.0, 210.0), calib=1050,
              intrinsics=[100, 100, 64, 32], pad_divisor=64),
)
schedule = dict(kind="constant", base_lr=1e-4, total_steps=2, grad_clip=1.0)
runtime = dict(log_interval=1, seed=0)
checkpoint = dict(interval=2)
""")
    return str(cfg_file), str(tmp_path)


def test_train_checkpoint_infer(tiny_env):
    cfg_file, root = tiny_env
    import jax

    from codd_tpu.apis.inference import run_inference
    from codd_tpu.apis.train import build_dataset_from_cfg, train_estimator
    from codd_tpu.config import load_config
    from codd_tpu.models.builder import build_estimator
    from codd_tpu.train.checkpoint import restore_params

    cfg = load_config(cfg_file)
    work = os.path.join(root, "work")
    state = train_estimator(cfg, work, max_steps=2, log=lambda *a: None)
    assert int(state.step) == 2
    ckpt = os.path.join(work, "ckpt_2")
    assert os.path.isdir(ckpt)

    model = build_estimator(cfg["model"])
    dataset = build_dataset_from_cfg(dict(cfg["data"]["test"]), train=False)
    assert len(dataset) == 2  # two whole sequences

    params = restore_params(ckpt, state.params)
    csv = os.path.join(root, "metrics.csv")
    metrics = run_inference(model, params, dataset, evaluate=True,
                            out_csv=csv, log=lambda *a: None)
    assert "epe" in metrics and np.isfinite(metrics["epe"])
    assert "tepe" in metrics
    assert os.path.exists(csv)


def test_config_composition(tmp_path):
    from codd_tpu.config import load_config

    (tmp_path / "base.py").write_text("a = dict(x=1, y=2)\nb = 3\n")
    (tmp_path / "child.py").write_text(
        "_base_ = ['base.py']\na = dict(y=5, z=6)\n")
    cfg = load_config(str(tmp_path / "child.py"), options=["a.x=9", "c=ok"])
    assert cfg["a"] == {"x": 9, "y": 5, "z": 6}
    assert cfg["b"] == 3
    assert cfg["c"] == "ok"


def test_reference_configs_load():
    from codd_tpu.config import load_config
    from codd_tpu.models.builder import build_estimator, build_loss_config

    cfg = load_config("configs/training_config.py")
    model = build_estimator(cfg["model"])
    assert model.max_disp == 320 and model.iters == 16
    assert model.motion_type == "Motion" and model.fusion_type == "Fusion"
    lc = build_loss_config(cfg["model"])
    assert lc.motion_loss_weight == 0.5

    cfg2 = load_config("configs/models/stereo_motion.py")
    m2 = build_estimator(cfg2["model"])
    assert m2.fusion_type == "none" and m2.freeze_stereo
