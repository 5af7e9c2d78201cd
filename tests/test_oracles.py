"""Oracle baselines: GTMotion / GTFusion / KalmanFusion / NullFusion."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from codd_tpu.models.codd import CODD
from codd_tpu.models.fusion.others import gt_fusion, kalman_fusion


def test_gt_fusion_selects_better():
    gt = jnp.full((1, 4, 4, 1), 10.0)
    curr = jnp.full((1, 4, 4, 1), 10.5)   # close
    warp = jnp.full((1, 4, 4, 1), 20.0)   # far
    fused = gt_fusion(curr, warp, gt)
    np.testing.assert_allclose(np.asarray(fused), 10.5)
    # invalid warp -> keep current
    fused2 = gt_fusion(curr, jnp.zeros_like(warp), gt)
    np.testing.assert_allclose(np.asarray(fused2), 10.5)
    # within 1px -> average
    fused3 = gt_fusion(curr, jnp.full_like(warp, 10.6), gt)
    np.testing.assert_allclose(np.asarray(fused3), (10.5 + 10.6) / 2)


def test_kalman_fusion_gain_and_outliers():
    P = jnp.zeros((1, 2, 2, 1))
    curr = jnp.full((1, 2, 2, 1), 10.5)
    warp = jnp.full((1, 2, 2, 1), 10.0)
    fused, P2 = kalman_fusion(curr, warp, P, R=1e-5, Q=1e-5)
    np.testing.assert_allclose(np.asarray(fused), 10.25)  # K = 0.5
    # outlier (>1px apart) -> keep current
    fused2, _ = kalman_fusion(curr, jnp.full_like(warp, 20.0), P)
    np.testing.assert_allclose(np.asarray(fused2), 10.5)


def test_gtmotion_gtfusion_pipeline():
    """Stereo + GTMotion + GTFusion runs end-to-end and produces the oracle
    outputs plus an identity transform field."""
    model = CODD(max_disp=64, motion_type="GTMotion", fusion_type="GTFusion")
    rng = np.random.RandomState(0)
    B, T, H, W = 1, 2, 64, 128
    l = jnp.asarray(rng.rand(B, T, H, W, 3).astype(np.float32))
    r = jnp.asarray(rng.rand(B, T, H, W, 3).astype(np.float32))
    intr = jnp.asarray([[100.0, 100.0, W / 2, H / 2]], jnp.float32)
    gt_seq = {
        "gt_disp": jnp.asarray(rng.uniform(2, 40, (B, T, H, W, 1)).astype(np.float32)),
        "gt_flow": jnp.asarray(rng.uniform(-2, 2, (B, T, H, W, 2)).astype(np.float32)),
        "gt_disp_change": jnp.zeros((B, T, H, W, 1), jnp.float32),
        "gt_flow_occ": jnp.zeros((B, T, H, W, 1), jnp.float32),
    }
    params = model.init(jax.random.PRNGKey(0), l, r, intr, gt_seq=gt_seq)
    outs = model.apply(params, l, r, intr, gt_seq=gt_seq)
    o1 = outs[1]
    assert "Ts" in o1
    # identity transform: quaternion w == 1
    np.testing.assert_allclose(np.asarray(o1["Ts"][..., 6]), 1.0, atol=1e-6)
    assert np.isfinite(np.asarray(o1["pred_disp"])).all()
    # GTFusion can only improve (or tie) the error vs stereo alone
    gt = np.asarray(gt_seq["gt_disp"][:, 1])
    err_fused = np.abs(np.asarray(o1["pred_disp"]) - gt).mean()
    err_curr = np.abs(np.asarray(o1["pred_curr"]) - gt).mean()
    assert err_fused <= err_curr + 1e-5
