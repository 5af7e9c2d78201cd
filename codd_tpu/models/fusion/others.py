"""Parameter-free fusion baselines: Null / GT-oracle / Kalman.

Capability parity with reference model/fusion/others.py.  These are pure
functions — the estimator dispatches on its ``fusion_type`` field.
"""

from __future__ import annotations

import jax.numpy as jnp

__all__ = ["gt_fusion", "kalman_fusion"]


def gt_fusion(pred_disp, pred_warp, gt_disp):
    """Oracle: per pixel pick whichever of current/warped is closer to gt;
    average when within 1px of each other (others.py:55-93)."""
    err_curr = jnp.abs(pred_disp - gt_disp)
    err_warp = jnp.abs(pred_warp - gt_disp)
    d = err_curr - err_warp
    fused = jnp.where(d < -1.0, pred_disp,
                      jnp.where(d > 1.0, pred_warp,
                                (pred_disp + pred_warp) / 2.0))
    fused = jnp.where(pred_warp <= 0.0, pred_disp, fused)
    fused = jnp.where(gt_disp > 0.0, fused, pred_disp)
    return fused


def kalman_fusion(pred_disp, pred_warp, P, R=1e-5, Q=1e-5):
    """Per-pixel scalar Kalman blend with outlier rejection
    (others.py:105-168).  Faithful to the reference: the covariance P is
    never written back after the measurement update, so the gain is the
    constant (P+Q)/(P+Q+R).  Returns (fused, P)."""
    Pminus = P + Q
    K = Pminus / (Pminus + R)
    fused = pred_warp + K * (pred_disp - pred_warp)
    outlier = jnp.abs(pred_warp - pred_disp) > 1.0
    fused = jnp.where(pred_warp <= 0.0, pred_disp, fused)
    fused = jnp.where(outlier, pred_disp, fused)
    return fused, P
