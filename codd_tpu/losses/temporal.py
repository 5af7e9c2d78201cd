"""Motion (RAFT-style sequence) and fusion losses.

Definition parity with the reference (reference: model/losses/temporal.py).
Empty masked regions contribute 0 instead of NaN (divergence from torch's
empty-selection mean; strictly an improvement in robustness).
"""

from __future__ import annotations

from typing import Dict, List, Tuple

import jax.numpy as jnp

from ..ops.metrics import masked_mean

__all__ = ["motion_loss", "fusion_loss"]


def motion_loss(
    flow2d_est: List[jnp.ndarray],   # per-GN-iter (B,H,W,3) [fx, fy, dz]
    flow2d_rev: List[jnp.ndarray],   # per-GN-iter (B,H,W,2)
    flow_gt: jnp.ndarray,            # (B,H,W,3)
    mask: jnp.ndarray,               # (B,H,W,1) bool
    loss_weight: float = 1.0,
    rv_weight: float = 0.2,
    dz_weight: float = 210.0,
    gamma: float = 0.9,
) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """Exponentially weighted sequence loss over GN iterations
    (temporal.py:112-141).  Means are over *all* pixels scaled by the mask,
    exactly like the reference's ``(valid * err).mean()``."""
    m = mask.astype(flow_gt.dtype)
    fl_gt = flow_gt[..., :2]
    dz_gt = flow_gt[..., 2:]

    N = len(flow2d_est)
    total = 0.0
    for i in range(N):
        w = gamma ** (N - i - 1)
        fl_est = flow2d_est[i][..., :2]
        dz_est = flow2d_est[i][..., 2:]
        total = total + w * jnp.mean(m * jnp.abs(fl_est - fl_gt))
        total = total + w * dz_weight * jnp.mean(m * jnp.abs(dz_est - dz_gt))
        total = total + w * rv_weight * jnp.mean(m * jnp.abs(flow2d_rev[i] - fl_gt))

    # metrics from the final iteration (temporal.py:143-158)
    epe2d = jnp.sqrt(jnp.sum((fl_est - fl_gt) ** 2, -1, keepdims=True))
    epedz = jnp.abs(dz_est - dz_gt)
    mb = mask
    logs = {
        "epe2d_warp": masked_mean(epe2d, mb),
        "epedz_warp": masked_mean(epedz, mb),
        "1px_warp": masked_mean((epe2d < 1).astype(jnp.float32), mb),
        "3px_warp": masked_mean((epe2d < 3).astype(jnp.float32), mb),
        "5px_warp": masked_mean((epe2d < 5).astype(jnp.float32), mb),
    }
    return total * loss_weight, logs


def _smooth_l1(x):
    ax = jnp.abs(x)
    return jnp.where(ax < 1.0, 0.5 * x * x, ax - 0.5)


def fusion_loss(
    pred_disp: jnp.ndarray,       # fused (B,H,W,1)
    gt_disp: jnp.ndarray,
    fusion_weight: jnp.ndarray,
    reset_weight: jnp.ndarray,
    disp_curr: jnp.ndarray,
    disp_warp: jnp.ndarray,
    loss_weight: float = 1.0,
    wr_weight: float = 1.0,
    wf_weight: float = 1.0,
    min_disp: float = 1.0,
    max_disp: float = 320.0,
) -> jnp.ndarray:
    """Smooth-L1 on fused disparity + hinge supervision of fusion/reset
    weights by current-vs-warped error comparison (temporal.py:10-108)."""
    C1, C2 = 1.0, 5.0
    mask = (gt_disp >= min_disp) & (gt_disp <= max_disp)
    disp_l = masked_mean(_smooth_l1(pred_disp - gt_disp), mask)

    mask = mask & (disp_warp > 0)
    err_c = jnp.abs(disp_curr - gt_disp)
    err_w = jnp.abs(disp_warp - gt_disp)
    d = err_c - err_w

    def hinge(weight_warp, C, with_same):
        weight_curr = 1.0 - weight_warp
        closer = masked_mean(weight_warp, (d < -C) & mask)
        further = masked_mean(weight_curr, (d > C) & mask)
        out = closer + further
        if with_same:
            same = masked_mean(jnp.abs(weight_curr - 0.5),
                               (jnp.abs(d) <= C) & mask)
            out = out + same * 0.2
        return out

    wf_l = hinge(fusion_weight, C1, with_same=True)
    wr_l = hinge(reset_weight, C2, with_same=False)

    return (disp_l + wf_l * wf_weight + wr_l * wr_weight) * loss_weight
