"""GT-oracle motion: warp the memory by ground-truth flow/disparity-change.

Capability parity with reference model/motion/others.py (GTMotion): a
parameter-free baseline that replaces RAFT-3D with ground truth, producing
the same 5-slot transient memory and an identity transform field.
"""

from __future__ import annotations

import jax.numpy as jnp

from ...ops import se3
from ...ops.warp import flow_warp

__all__ = ["gt_motion"]


def gt_motion(memory_img, memory_feat, memory_disp, gt_flow, gt_disp_change,
              gt_flow_occ):
    """Returns (memory5, Ts_identity).

    memory_disp: (B,H,W); gt_flow (B,H,W,2); gt_disp_change / gt_flow_occ
    (B,H,W,1).  Occluded (occ>0) and out-of-view pixels are zeroed.
    """
    B, H, W, _ = memory_img.shape
    occ = gt_flow_occ > 0

    to_warp = jnp.concatenate([memory_img, memory_disp[..., None]], -1)
    warped, valid = flow_warp(to_warp, gt_flow, padding_mode="zeros",
                              mode="nearest")
    warped = jnp.where(valid, warped, 0.0)
    warped = jnp.where(occ, 0.0, warped)
    img_warp = warped[..., :3]
    disp_warp = warped[..., 3:4] - gt_disp_change
    disp_warp = jnp.where(valid[..., 3:4], disp_warp, 0.0)
    disp_warp = jnp.where(occ, 0.0, disp_warp)

    # reference quirk kept: the 1/4-res feature warp reuses the *full-res*
    # flow values subsampled at [2::4] without rescaling (others.py:51-56)
    feat_warp, fvalid = flow_warp(memory_feat, gt_flow[:, 2::4, 2::4],
                                  padding_mode="zeros", mode="nearest")
    feat_warp = jnp.where(fvalid, feat_warp, 0.0)

    flow_mem = jnp.concatenate([gt_flow, gt_disp_change], -1)
    confidence = jnp.ones_like(flow_mem)
    Ts = se3.identity((B, H, W), memory_img.dtype)
    memory5 = (img_warp, feat_warp, confidence, disp_warp[..., 0], flow_mem)
    return memory5, Ts
