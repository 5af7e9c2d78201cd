"""Validity masks and gt disparity-change derivation (device-side).

Parity with reference utils/misc.py:12-59.  ``disp_range`` comes from the
dataset meta; BF_DEFAULT (=210) caps flow magnitude / disparity change.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax.numpy as jnp

from ..ops.warp import flow_warp

BF_DEFAULT = 1050 * 0.2

__all__ = ["compute_valid_mask", "compute_gt_disp_change", "BF_DEFAULT"]


def compute_valid_mask(
    gt_disp: jnp.ndarray,                    # (B,H,W,1)
    disp_range: Tuple[float, float],
    gt_semantic_seg: Optional[jnp.ndarray] = None,
    gt_flow_prev: Optional[jnp.ndarray] = None,   # (B,H,W,2)
    gt_disp_change: Optional[jnp.ndarray] = None,  # (B,H,W,1)
) -> jnp.ndarray:
    mask = (gt_disp > disp_range[0]) & (gt_disp < disp_range[1])
    if gt_semantic_seg is not None:
        mask &= gt_semantic_seg > 0
    if gt_flow_prev is not None:
        mag = jnp.sqrt(jnp.sum(gt_flow_prev ** 2, axis=-1, keepdims=True))
        mask &= mag < BF_DEFAULT
    if gt_disp_change is not None:
        mask &= jnp.abs(gt_disp_change) < BF_DEFAULT
    return mask


def compute_gt_disp_change(gt_flow_occ_prev, gt_disp_prev, gt_disp_curr, gt_flow):
    """Disparity change by flow-warping the next frame's disparity
    (misc.py:39-59).  Occluded / invalid pixels get BF_DEFAULT (excluded by
    compute_valid_mask downstream)."""
    warped, valid = flow_warp(gt_disp_curr, gt_flow, padding_mode="zeros",
                              mode="nearest")
    change = warped - gt_disp_prev
    change = jnp.where(valid, change, BF_DEFAULT)
    change = jnp.where(gt_flow_occ_prev, BF_DEFAULT, change)
    return change, warped
