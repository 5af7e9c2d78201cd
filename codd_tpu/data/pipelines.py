"""Pipeline builders from config dicts (train/test recipes)."""

from __future__ import annotations

from typing import Any, Dict, List, Optional

import numpy as np

from .transforms import (
    Normalize, Pad, PhotoMetricDistortion, RandomCrop, RandomOcclude,
    RandomShiftRotate, StereoPhotoMetricDistortion,
)

__all__ = ["build_train_pipeline", "build_test_pipeline"]


def build_train_pipeline(aug: Optional[Dict[str, Any]], seed: int = 0) -> List:
    """Training recipe: crop -> photometric -> normalize [-> pad] plus the
    optional right-image perturbations (reference train_pipeline layouts in
    configs/datasets/*.py)."""
    aug = aug or {}
    rng = np.random.default_rng(seed)
    pipe: List = []
    if aug.get("crop_size"):
        pipe.append(RandomCrop(tuple(aug["crop_size"]), rng=rng))
    if aug.get("stereo_photometric"):
        pipe.append(StereoPhotoMetricDistortion(rng=rng))
    elif aug.get("photometric", True):
        pipe.append(PhotoMetricDistortion(asym=bool(aug.get("asym", False)),
                                          rng=rng))
    if aug.get("shift_rotate"):
        pipe.append(RandomShiftRotate(rng=rng))
    if aug.get("occlude"):
        pipe.append(RandomOcclude(rng=rng))
    pipe.append(Normalize())
    if aug.get("pad_size"):
        pipe.append(Pad(size=tuple(aug["pad_size"])))
    elif aug.get("pad_divisor"):
        pipe.append(Pad(size_divisor=int(aug["pad_divisor"])))
    return pipe


def build_test_pipeline(pad_divisor: int = 64) -> List:
    return [Normalize(), Pad(size_divisor=pad_divisor)]
