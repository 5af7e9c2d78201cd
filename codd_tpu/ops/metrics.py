"""Evaluation metrics (disparity, temporal, thresholded) as masked
on-device reductions.

Same definitions as the reference (reference: utils/metric.py, codd.py:435-575)
but computed without any per-frame host sync: every metric returns
(sum, count)-style aggregates or masked means that stay on device; the
caller accumulates across frames and transfers once per sequence
(cf. SURVEY §3.5 — the reference's per-frame ``.item()`` syncs are a known
anti-pattern we do not replicate).
"""

from __future__ import annotations

import jax.numpy as jnp

__all__ = ["masked_mean", "epe_metric", "thres_metric", "t_epe_metric"]


def masked_mean(x: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """Mean of x over mask; 0 if the mask is empty."""
    m = mask.astype(x.dtype)
    denom = jnp.sum(m)
    return jnp.sum(x * m) / jnp.maximum(denom, 1.0)


def epe_metric(d_est: jnp.ndarray, d_gt: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """Mean absolute disparity error over valid pixels."""
    return masked_mean(jnp.abs(d_est - d_gt), mask)


def thres_metric(d_est: jnp.ndarray, d_gt: jnp.ndarray, mask: jnp.ndarray,
                 thres: float) -> jnp.ndarray:
    """Fraction of valid pixels with |err| > thres."""
    err = (jnp.abs(d_est - d_gt) > thres).astype(jnp.float32)
    return masked_mean(err, mask)


def depth2normal(depth: jnp.ndarray) -> jnp.ndarray:
    """Normal map from a depth image (H, W) -> (H, W, 3) in [0, 1]
    (reference utils/metric.py:57-73)."""
    zy, zx = jnp.gradient(depth)
    normal = jnp.stack([-zx, -zy, jnp.ones_like(depth)], axis=-1)
    normal = normal / jnp.linalg.norm(normal, axis=-1, keepdims=True)
    return (normal + 1.0) / 2.0


def t_epe_metric(d_est_t0, d_gt_t0, d_est_t1, d_gt_t1, mask_t0, mask_t1):
    """Temporal EPE: |Δpred - Δgt| between flow-aligned frames.

    Returns (tepe_mean, tepe_rel_mean, th3_frac, th1_rel_frac) over the
    joint mask — the four temporal meters of the reference in one pass.
    """
    mask = mask_t0 & mask_t1
    d_est = d_est_t0 - d_est_t1
    d_gt = d_gt_t0 - d_gt_t1
    abs_err = jnp.abs(d_est - d_gt)
    rel_err = abs_err / (jnp.abs(d_gt) + 1e-3)
    return (
        masked_mean(abs_err, mask),
        masked_mean(rel_err, mask),
        masked_mean((abs_err > 3.0).astype(jnp.float32), mask),
        masked_mean((rel_err > 1.0).astype(jnp.float32), mask),
    )
