"""Every shipped config file loads, composes its _base_ chain, and the
model configs build (reference configs/** tree parity, SURVEY §2 config
row)."""

import glob
import os

import pytest

from codd_tpu.config import load_config

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CONFIGS = sorted(glob.glob(os.path.join(ROOT, "configs", "**", "*.py"),
                           recursive=True))


@pytest.mark.parametrize("path", CONFIGS, ids=lambda p: os.path.relpath(
    p, os.path.join(ROOT, "configs")))
def test_config_loads(path):
    cfg = load_config(path)
    assert isinstance(cfg, dict) and cfg


def test_training_config_composition():
    cfg = load_config(os.path.join(ROOT, "configs", "training_config.py"))
    assert cfg["model"]["type"] == "ConsistentOnlineDynamicDepth"
    assert cfg["schedule"]["kind"] == "multi_gamma"
    assert "train" in cfg["data"]


def test_finetune_schedules_match_reference_budgets():
    # reference: stereo/motion 100k/8 @ 2e-5, fusion 50k/8 @ 2e-5 (OneCycle)
    for name, steps in (("stereo", 100000), ("motion", 100000),
                        ("fusion", 50000)):
        cfg = load_config(os.path.join(
            ROOT, "configs", "schedules", f"schedule_{name}_finetune.py"))
        assert cfg["schedule"]["kind"] == "one_cycle"
        assert cfg["schedule"]["base_lr"] == 2e-5
        assert cfg["schedule"]["total_steps"] == steps // 8


def test_model_configs_build():
    from codd_tpu.models.builder import build_estimator
    for name in ("codd.py", "stereo.py", "stereo_motion.py"):
        cfg = load_config(os.path.join(ROOT, "configs", "models", name))
        model = build_estimator(cfg["model"])
        assert model is not None


def test_runtime_knobs_reach_model_and_typos_rejected():
    """Every model.runtime switch must land on the CODD field of the same
    name (r4: tile_warp_variant was silently dropped by the builder and a
    CLI drive 'exercised' a path it never ran); unknown keys must raise."""
    import pytest

    from codd_tpu.models.builder import build_estimator
    cfg = load_config(os.path.join(ROOT, "configs", "models", "codd.py"))
    cfg["model"]["runtime"] = dict(
        init_cost_variant="map", tile_warp_variant="tilewin",
        gn_impl="windowed", gn_bf16_scores=True, splat_impl="sort",
        splat_impl_lr="pallas", corr_impl="volume", gn_unroll=4,
        pixel_center_offset=-0.5)
    m = build_estimator(cfg["model"])
    assert m.init_cost_variant == "map"
    assert m.tile_warp_variant == "tilewin"
    assert m.gn_impl == "windowed"
    assert m.corr_impl == "volume"
    assert m.gn_unroll == 4
    assert m.gn_bf16_scores is True
    assert m.splat_impl == "sort"
    assert m.splat_impl_lr == "pallas"
    assert m.pixel_center_offset == -0.5

    cfg["model"]["runtime"] = dict(tile_warp_varaint="tilewin")  # typo
    with pytest.raises(ValueError, match="unknown model.runtime"):
        build_estimator(cfg["model"])
