"""HITNet losses: initialization, propagation, slant, confidence.

Definition parity with the reference (reference: model/losses/hitnet.py),
with one structural change for TPU: the reference concatenates masked
selections (ragged!) across pyramid levels and takes one global mean.  We
keep static shapes by accumulating (weighted-sum, count) pairs per level —
numerically identical.

Two intentional divergences (documented):
  * empty masks yield 0 contribution instead of NaN (torch ``tensor[mask].mean()``
    of an empty selection is NaN);
  * the 9x9 plane-fit kernels used to derive gt slants are constants here;
    the reference stores them as trainable ``nn.Parameter`` (hitnet.py:99-104),
    almost surely unintentionally.
"""

from __future__ import annotations

from typing import Dict, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["HITLossConfig", "hit_loss", "plane_fit_kernels"]


def plane_fit_kernels() -> Tuple[np.ndarray, np.ndarray]:
    """9x9 least-squares plane-fit kernels for gt slant (hitnet.py:90-104).

    Returns (kx, ky): convolving gt disparity with these yields the
    least-squares dx (x-gradient) and dy fits over a 9x9 window.
    """
    A = np.zeros((81, 3))
    for i in range(81):
        A[i, 0] = i // 9 - 4
        A[i, 1] = i % 9 - 4
        A[i, 2] = 1
    B = np.linalg.inv(A.T @ A) @ A.T
    ky = B[0].reshape(9, 9)  # row-coordinate coefficient -> d/dy
    kx = B[1].reshape(9, 9)  # col-coordinate coefficient -> d/dx
    return kx.astype(np.float32), ky.astype(np.float32)


_KX, _KY = plane_fit_kernels()


def _conv9x9(x: jnp.ndarray, kernel: np.ndarray) -> jnp.ndarray:
    """x: (B,H,W,1); 9x9 same-padding conv with a fixed kernel."""
    k = jnp.asarray(kernel)[:, :, None, None]
    return jax.lax.conv_general_dilated(
        x, k, (1, 1), [(4, 4), (4, 4)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def echo_loss(x, alpha, c):
    """General-adaptive robust loss (arXiv 1701.03077; hitnet.py:52-63)."""
    a = abs(alpha - 2.0)
    return (a / alpha) * (((x / c) ** 2 / a + 1.0) ** (alpha / 2.0) - 1.0)


def _subpix_cost(cost, disp, maxdisp):
    """Linear interpolation of the cost volume at sub-pixel gt disparity
    (hitnet.py:10-25).  cost: (B,h,w,D); disp: (B,h,w,1)."""
    disp = jnp.clip(disp, 0.0, maxdisp - 2.0)
    d0 = jnp.floor(disp)
    idx0 = d0.astype(jnp.int32)
    c0 = jnp.take_along_axis(cost, idx0, axis=-1)
    c1 = jnp.take_along_axis(cost, idx0 + 1, axis=-1)
    return (disp - d0) * c1 + (d0 + 1.0 - disp) * c0


def _non_match_cost(cost, d_gt):
    """Min cost outside the +-1.5px match band (hitnet.py:28-49)."""
    D = cost.shape[-1]
    cand = jnp.arange(D, dtype=d_gt.dtype)
    far = (cand < d_gt - 1.5) | (cand > d_gt + 1.5)  # (B,h,w,D)
    masked = jnp.where(far, cost, jnp.inf)
    return jnp.min(masked, axis=-1, keepdims=True)


class HITLossConfig:
    def __init__(self, max_disp=320, lambda_init=1.0, lambda_prop=1.0,
                 lambda_slant=1.0, lambda_w=1.0, alpha=0.9, c=0.1):
        self.max_disp = max_disp
        self.lambda_init = lambda_init
        self.lambda_prop = lambda_prop
        self.lambda_slant = lambda_slant
        self.lambda_w = lambda_w
        self.alpha = alpha
        self.c = c


PROP_WEIGHTS = [1 / 64, 1 / 32, 1 / 32, 1 / 16, 1 / 16, 1 / 8, 1 / 8,
                1 / 4, 1 / 4, 1 / 4, 1 / 2, 1.0]
TRUNCATION_A = [1.0] * 9 + [10000.0] * 3
W_WEIGHTS = [1 / 32, 1 / 32, 1 / 16, 1 / 16, 1 / 8, 1 / 8, 1 / 4, 1 / 4]


def _maxpool(x, k):
    return jax.lax.reduce_window(x, -jnp.inf, jax.lax.max,
                                 (1, k, k, 1), (1, k, k, 1), "VALID")


def hit_loss(
    cfg: HITLossConfig,
    init_cv_pyramid: List[jnp.ndarray],    # coarse->fine, (B,h,w,D)
    prop_disp_pyramid: List[jnp.ndarray],  # 12 x (B,H,W,1)
    dx_pyramid: List[jnp.ndarray],
    dy_pyramid: List[jnp.ndarray],
    w_pyramid: List[jnp.ndarray],          # 8 x (B,H,W,1)
    d_gt: jnp.ndarray,                     # (B,H,W,1)
    seg_gt=None,
) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    if seg_gt is not None:
        d_gt = jnp.where(seg_gt == 0, 0.0, d_gt)
    dx_gt = _conv9x9(d_gt, _KX)
    dy_gt = _conv9x9(d_gt, _KY)

    L = len(init_cv_pyramid)
    # gt pyramid: maxpool by 4*2^i then /2^i; reversed to coarse-first
    gt_pyr = []
    for i in range(L):
        scale = 4 * (2 ** i)
        gt_pyr.append(_maxpool(d_gt, scale) / (scale / 4))
    gt_pyr = gt_pyr[::-1]

    def acc(v, m):
        m = m.astype(v.dtype)
        return jnp.sum(v * m), jnp.sum(m)

    # ---- initialization loss (hitnet.py:112-123,194-207) ----
    init_sum = init_cnt = 0.0
    for i, cv in enumerate(init_cv_pyramid):
        level_maxd = cfg.max_disp / (2 ** (L - 1 - i))
        gt = gt_pyr[i]
        mask = (gt > 0) & (gt < level_maxd)
        cost_gt = _subpix_cost(cv, gt, level_maxd)
        cost_nm = _non_match_cost(cv, gt)
        val = cfg.lambda_init * (cost_gt + jax.nn.relu(1.0 - cost_nm))
        s, c = acc(val, mask)
        init_sum, init_cnt = init_sum + s, init_cnt + c

    # ---- propagation loss (hitnet.py:125-136,210-236) ----
    mask = (d_gt > 0) & (d_gt < cfg.max_disp)
    prop_sum = prop_cnt = 0.0
    diffs = []
    for i, disp in enumerate(prop_disp_pyramid):
        diff = jnp.abs(d_gt - disp)
        diffs.append(diff)
        val = cfg.lambda_prop * PROP_WEIGHTS[i] * echo_loss(
            jnp.minimum(diff, TRUNCATION_A[i]), cfg.alpha, cfg.c)
        s, c = acc(val, mask)
        prop_sum, prop_cnt = prop_sum + s, prop_cnt + c

    # ---- slant loss (hitnet.py:138-143,239-262) ----
    slant_sum = slant_cnt = 0.0
    for i in range(len(dx_pyramid)):
        closer = diffs[i] < 1.0
        m = mask & closer
        val = cfg.lambda_slant * PROP_WEIGHTS[i] * (
            jnp.abs(dx_gt - dx_pyramid[i]) + jnp.abs(dy_gt - dy_pyramid[i]))
        s, c = acc(val, m)
        slant_sum, slant_cnt = slant_sum + s, slant_cnt + c

    # ---- confidence (w) loss (hitnet.py:145-160,265-275) ----
    C1, C2 = 1.0, 1.5
    w_sum = w_cnt = 0.0
    for i, w in enumerate(w_pyramid):
        diff = diffs[i + 1]  # no confidence at the first pyramid level
        closer = diff < C1
        further = diff > C2
        m = mask & (closer | further)
        val = cfg.lambda_w * W_WEIGHTS[i] * (
            jax.nn.relu(1.0 - w) * closer.astype(w.dtype)
            + jax.nn.relu(w) * further.astype(w.dtype))
        s, c = acc(val, m)
        w_sum, w_cnt = w_sum + s, w_cnt + c

    total_sum = init_sum + prop_sum + slant_sum + w_sum
    total_cnt = init_cnt + prop_cnt + slant_cnt + w_cnt
    total = total_sum / jnp.maximum(total_cnt, 1.0)
    logs = {
        "init_loss": init_sum / jnp.maximum(init_cnt, 1.0),
        "prop_loss": prop_sum / jnp.maximum(prop_cnt, 1.0),
        "slant_loss": slant_sum / jnp.maximum(slant_cnt, 1.0),
        "w_loss": w_sum / jnp.maximum(w_cnt, 1.0),
    }
    return total, logs


def hit_loss_with_depth(
    cfg: HITLossConfig,
    init_cv_pyramid, prop_disp_pyramid, dx_pyramid, dy_pyramid, w_pyramid,
    d_gt, seg_gt=None,
    calib: float = 1.0, eps: float = 1e-8,
    lambda_depth: float = 1.0, lambda_depth_grad: float = 1.0,
    lambda_depth_normal: float = 1.0,
):
    """HITLoss + log-depth, depth-gradient and surface-normal terms
    (reference hitnet.py:293-352, HITLossWithDepth)."""
    total, logs = hit_loss(cfg, init_cv_pyramid, prop_disp_pyramid,
                           dx_pyramid, dy_pyramid, w_pyramid, d_gt, seg_gt)
    logs = dict(logs)
    logs["hitnet_loss"] = total

    pred_disp = prop_disp_pyramid[-1]
    pred_depth = calib / (pred_disp + eps)
    target_depth = calib / (d_gt + eps)
    mask = (d_gt > 0) & (d_gt < cfg.max_disp)

    def comp_err(a, b):
        return jnp.log1p(jnp.abs(a - b))

    from ..ops.metrics import masked_mean

    depth_loss = lambda_depth * masked_mean(comp_err(pred_depth, target_depth),
                                            mask)
    logs["depth_loss"] = depth_loss
    total = total + depth_loss

    if lambda_depth_grad > 0 or lambda_depth_normal > 0:
        pm = pred_depth * mask
        tm = target_depth * mask
        pdx, pdy = _conv9x9(pm, _KX), _conv9x9(pm, _KY)
        tdx, tdy = _conv9x9(tm, _KX), _conv9x9(tm, _KY)
        grad_loss = (masked_mean(comp_err(pdx, tdx), mask)
                     + masked_mean(comp_err(pdy, tdy), mask))
        pn = jnp.concatenate([-pdx, -pdy, jnp.ones_like(pdx)], -1)
        tn = jnp.concatenate([-tdx, -tdy, jnp.ones_like(tdx)], -1)
        cos = jnp.sum(pn * tn, -1, keepdims=True) / (
            jnp.linalg.norm(pn, axis=-1, keepdims=True)
            * jnp.linalg.norm(tn, axis=-1, keepdims=True) + eps)
        normal_loss = masked_mean(jnp.abs(1.0 - cos), mask)
        logs["depth_grad_loss"] = lambda_depth_grad * grad_loss
        logs["depth_normal_loss"] = lambda_depth_normal * normal_loss
        total = total + logs["depth_grad_loss"] + logs["depth_normal_loss"]

    return total, logs
