"""Loss definitions vs hand-computed / torch oracles."""

import numpy as np
import pytest

import jax.numpy as jnp

from codd_tpu.losses.hitnet import (
    HITLossConfig, _non_match_cost, _subpix_cost, echo_loss, hit_loss,
    plane_fit_kernels,
)
from codd_tpu.losses.temporal import fusion_loss, motion_loss
from codd_tpu.train.optim import multi_gamma_schedule, one_cycle_schedule


def test_plane_fit_kernels_recover_plane():
    """Convolving a perfect plane d = 2x + 3y + 5 recovers (dx, dy)=(2, 3)."""
    kx, ky = plane_fit_kernels()
    ys, xs = np.meshgrid(np.arange(21), np.arange(21), indexing="ij")
    plane = (2.0 * xs + 3.0 * ys + 5.0).astype(np.float32)
    # valid interior (conv window fully inside)
    dx = np.sum(plane[6:15, 6:15] * kx)
    dy = np.sum(plane[6:15, 6:15] * ky)
    assert abs(dx - 2.0) < 1e-4
    assert abs(dy - 3.0) < 1e-4


def test_subpix_cost_interpolates():
    cost = jnp.asarray(np.arange(8, dtype=np.float32)[None, None, None, :] ** 2)
    disp = jnp.full((1, 1, 1, 1), 2.5)
    out = np.asarray(_subpix_cost(cost, disp, 8))
    assert abs(out[0, 0, 0, 0] - (0.5 * 9 + 0.5 * 4)) < 1e-5


def test_non_match_cost_excludes_band():
    cost = jnp.asarray(np.array([5.0, 0.1, 0.2, 0.3, 4.0, 9.0], np.float32)
                       [None, None, None, :])
    d_gt = jnp.full((1, 1, 1, 1), 2.0)  # band = [0.5, 3.5] -> exclude 1,2,3
    out = np.asarray(_non_match_cost(cost, d_gt))
    assert abs(out[0, 0, 0, 0] - 4.0) < 1e-6


def test_echo_loss_values():
    # alpha=2 limit is x^2/(2 c^2)... general formula at alpha=0.9, c=0.1
    x = jnp.asarray([0.0, 0.1])
    out = np.asarray(echo_loss(x, 0.9, 0.1))
    assert out[0] == 0.0
    ref = (abs(0.9 - 2) / 0.9) * (((1.0 ** 2) / abs(0.9 - 2) + 1) ** 0.45 - 1)
    assert abs(out[1] - ref) < 1e-5


def test_hit_loss_zero_for_perfect_prediction():
    """Perfect disparity + confident weights -> prop/slant losses ~0."""
    rng = np.random.RandomState(0)
    B, H, W = 1, 64, 64
    cfg = HITLossConfig(max_disp=64)
    d_gt = jnp.asarray(rng.uniform(5, 50, (B, H, W, 1)).astype(np.float32))
    # flat gt -> use constant disparity so slant gt is 0
    d_gt = jnp.full((B, H, W, 1), 20.0)
    from codd_tpu.losses.hitnet import _KX, _KY, _conv9x9
    prop = [d_gt] * 12
    # gt slants come from the zero-padded plane-fit conv (border ring is
    # nonzero even for constant disparity) -> predict exactly those
    dx = [_conv9x9(d_gt, _KX)] * 12
    dy = [_conv9x9(d_gt, _KY)] * 12
    w = [jnp.ones((B, H, W, 1))] * 8  # diff=0 -> closer -> relu(1-1)=0
    # init cost volumes: cost 0 within the gt match band, high elsewhere
    cvs = []
    for lvl, down in enumerate([64, 32, 16, 8, 4]):
        hh, ww = H // down, W // down
        D = 64 // (2 ** (4 - lvl))
        gt_lvl = 20.0 / (2 ** (4 - lvl))
        cand = np.arange(D, dtype=np.float32)
        cost = 2.0 * np.ones((B, hh, ww, D), np.float32)
        cost[..., :] = np.where(np.abs(cand - gt_lvl) < 1.6, 0.0, 2.0)
        cvs.append(jnp.asarray(cost))
    total, logs = hit_loss(cfg, cvs, prop, dx, dy, w, d_gt)
    assert float(logs["prop_loss"]) < 1e-6
    assert float(logs["slant_loss"]) < 1e-5
    assert float(logs["w_loss"]) < 1e-6
    # init loss: cost_gt=0, non-match cost=2 -> relu(1-2)=0 -> init 0
    assert float(logs["init_loss"]) < 1e-6
    assert float(total) < 1e-6


def test_motion_loss_decreasing_sequence_weighting():
    B, H, W = 1, 8, 8
    gt = jnp.zeros((B, H, W, 3))
    mask = jnp.ones((B, H, W, 1), bool)
    est_bad = [jnp.ones((B, H, W, 3))]
    est_good = [jnp.zeros((B, H, W, 3))]
    rev = [jnp.zeros((B, H, W, 2))]
    bad, _ = motion_loss(est_bad, rev, gt, mask)
    good, _ = motion_loss(est_good, rev, gt, mask)
    assert float(bad) > float(good)
    assert abs(float(good)) < 1e-7
    # bad: fl err mean 1 + 210 * dz err mean 1 (rev err 0)
    assert abs(float(bad) - 211.0) < 1e-4


def test_fusion_loss_prefers_correct_weighting():
    B, H, W = 1, 8, 8
    gt = jnp.full((B, H, W, 1), 10.0)
    disp_curr = jnp.full((B, H, W, 1), 10.0)   # current is perfect
    disp_warp = jnp.full((B, H, W, 1), 30.0)   # warp is bad
    fused = disp_curr
    # good: fusion weight ~0 (use current); bad: ~1 (use warp)
    good = fusion_loss(fused, gt, jnp.zeros_like(gt), jnp.zeros_like(gt),
                       disp_curr, disp_warp)
    bad = fusion_loss(fused, gt, jnp.ones_like(gt), jnp.ones_like(gt),
                      disp_curr, disp_warp)
    assert float(bad) > float(good)


def test_schedules():
    s = multi_gamma_schedule(4e-4, [100, 200, 300], [0.25, 0.4, 0.25])
    assert abs(float(s(0)) - 4e-4) < 1e-9
    assert abs(float(s(150)) - 1e-4) < 1e-9
    assert abs(float(s(250)) - 4e-5) < 1e-9
    oc = one_cycle_schedule(2e-4, 1000)
    assert float(oc(300)) == pytest.approx(2e-4, rel=1e-3)  # peak at pct_start
    assert float(oc(0)) == pytest.approx(2e-4 / 25, rel=1e-3)
