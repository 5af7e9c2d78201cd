"""Whole-sequence streaming evaluation with on-device metric accumulation.

Replicates the reference's per-frame metric computation (reference:
model/codd.py:290-575 `inference` + `calc_metric`) with one structural
change: the reference calls ``.item()`` per frame (a host sync per metric
per frame, SURVEY §3.5); here every meter is a (sum, count) pair carried
through a ``lax.scan`` over the frame axis, and a single transfer returns
the sequence's metrics.

Metric contract (names match the reference tables, custom_stereo_mf.py:368-425):
  epe, th3                          — disparity
  tepe, th3_tepe, tepe_rel, th1_tepe_rel — temporal (flow-aligned)
  flow_mag                          — mean gt flow magnitude
  count, epe2d_scene_flow, epe2d_optical_flow, 1px_scene_flow,
  1px_optical_flow                  — SE(3)-induced scene-flow sums
"""

from __future__ import annotations

from functools import partial
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from ..models.codd import CODD, CoddCarry
from ..ops.metrics import masked_mean
from ..ops.projective import induced_flow
from ..ops.warp import flow_warp, meshgrid_xy
from ..utils.masks import BF_DEFAULT, compute_gt_disp_change, compute_valid_mask

__all__ = ["METER_NAMES", "SUM_NAMES", "make_sequence_evaluator"]

METER_NAMES = ("epe", "th3", "tepe", "th3_tepe", "tepe_rel", "th1_tepe_rel",
               "flow_mag")
SUM_NAMES = ("count", "epe2d_scene_flow", "epe2d_optical_flow",
             "1px_scene_flow", "1px_optical_flow")


def _meter_init():
    meters = {k: (jnp.zeros(()), jnp.zeros(())) for k in METER_NAMES}
    sums = {k: jnp.zeros(()) for k in SUM_NAMES}
    return meters, sums


def _meter_update(meters, name, value, has_valid):
    s, c = meters[name]
    w = has_valid.astype(s.dtype)
    meters[name] = (s + value * w, c + w)


def _crop_mask(H, W, img_h, img_w):
    x, y = meshgrid_xy(H, W)
    return ((x < img_w) & (y < img_h))[None, ..., None]


def make_sequence_evaluator(
    model: CODD,
    disp_range: Tuple[float, float] = (1.0, 210.0),
    has_disp2: bool = False,
    has_flow_occ: bool = False,
    has_disp_change: bool = False,
    has_disp_occ: bool = False,
):
    """Build a jitted evaluator over padded sequences.

    The returned fn signature:
      fn(params, batch) -> metrics dict
    where batch holds l_img/r_img (B,T,H,W,3), intrinsics (B,4), img_hw
    (2,) int32 pre-pad extent, frame_valid (T,) bool (padding mask), and
    whichever gt_* (B,T,H,W,C) the dataset provides.  B must be 1
    (streaming semantics, like the reference's test-time batch).
    """

    def evaluate(params, batch):
        l_seq, r_seq = batch["l_img"], batch["r_img"]
        intr = batch["intrinsics"]
        B, T, H, W, _ = l_seq.shape
        img_h, img_w = batch["img_hw"][0], batch["img_hw"][1]
        frame_valid = batch["frame_valid"]
        crop = _crop_mask(H, W, img_h, img_w)

        gt_disp_seq = batch.get("gt_disp")
        gt_flow_seq = batch.get("gt_flow")
        gt_disp2_seq = batch.get("gt_disp2") if has_disp2 else None
        gt_occ_seq = batch.get("gt_flow_occ") if has_flow_occ else None
        gt_change_seq = batch.get("gt_disp_change") if has_disp_change else None
        gt_disp_occ_seq = batch.get("gt_disp_occ") if has_disp_occ else None

        def frame_gt(t_slice, seq):
            return None if seq is None else t_slice(seq)

        meters, sums = _meter_init()

        # ---- frame 0 ----
        carry, out0 = model.apply(params, l_seq[:, 0], r_seq[:, 0], intr,
                                  method=CODD.first_step)
        pred0 = out0["pred_disp"]

        def disp_metrics(meters, pred, gt_disp, seg_occ, fvalid):
            mask = compute_valid_mask(gt_disp, disp_range, seg_occ) & crop
            has = mask.any() & fvalid
            _meter_update(meters, "epe",
                          masked_mean(jnp.abs(pred - gt_disp), mask), has)
            _meter_update(
                meters, "th3",
                masked_mean((jnp.abs(pred - gt_disp) > 3.0).astype(jnp.float32),
                            mask), has)
            return mask

        def occ0(t):
            if gt_disp_occ_seq is None:
                return None
            # reference convention: <=0 means non-occluded -> valid
            return (gt_disp_occ_seq[:, t] <= 0).astype(jnp.float32)

        mask0 = disp_metrics(meters, pred0, gt_disp_seq[:, 0], occ0(0),
                             jnp.asarray(True))

        if T == 1:
            return _finalize(meters, sums)

        # ---- frames 1..T-1 via scan ----
        xs = {
            "l": jnp.moveaxis(l_seq[:, 1:], 1, 0),
            "r": jnp.moveaxis(r_seq[:, 1:], 1, 0),
            "gt_disp": jnp.moveaxis(gt_disp_seq[:, 1:], 1, 0),
            "gt_disp_prev": jnp.moveaxis(gt_disp_seq[:, :-1], 1, 0),
            "fvalid": frame_valid[1:],
        }
        if gt_flow_seq is not None:
            xs["gt_flow_prev"] = jnp.moveaxis(gt_flow_seq[:, :-1], 1, 0)
        if gt_occ_seq is not None:
            xs["gt_occ_prev"] = jnp.moveaxis(gt_occ_seq[:, :-1], 1, 0)
        if gt_change_seq is not None:
            xs["gt_change_prev"] = jnp.moveaxis(gt_change_seq[:, :-1], 1, 0)
        if gt_disp2_seq is not None:
            xs["gt_disp2_prev"] = jnp.moveaxis(gt_disp2_seq[:, :-1], 1, 0)
        if gt_disp_occ_seq is not None:
            xs["gt_disp_occ"] = jnp.moveaxis(gt_disp_occ_seq[:, 1:], 1, 0)

        def body(state, x):
            carry, pred_prev, mask_prev, meters, sums = state
            new_carry, out = model.apply(params, carry, x["l"], x["r"], intr,
                                         method=CODD.step)
            pred = out["pred_disp"]
            gt_disp = x["gt_disp"]
            gt_disp_prev = x["gt_disp_prev"]
            fvalid = x["fvalid"]
            seg_occ = ((x["gt_disp_occ"] <= 0).astype(jnp.float32)
                       if "gt_disp_occ" in x else None)

            mask_disp = disp_metrics(meters, pred, gt_disp, seg_occ, fvalid)

            if "gt_flow_prev" in x:
                flow = x["gt_flow_prev"]
                # KITTI case: gt disparity may exist in only one frame; the
                # reference substitutes a dummy mid-range gt (codd.py:478-486)
                any_gt = (gt_disp > 0).any()
                dummy = jnp.full_like(gt_disp, BF_DEFAULT / 2.0)
                gt_for_mask = jnp.where(any_gt, gt_disp, dummy)
                mask = compute_valid_mask(gt_for_mask, disp_range, seg_occ,
                                          gt_flow_prev=flow) & crop

                to_warp = jnp.concatenate(
                    [gt_disp, pred, mask.astype(pred.dtype)], axis=-1)
                warped, valid_w = flow_warp(to_warp, flow,
                                            padding_mode="zeros", mode="nearest")
                warped_gt = warped[..., 0:1]
                warped_pred = warped[..., 1:2]
                mask_warp = warped[..., 2:3] > 0.5
                mask_curr = valid_w[..., 0:1] & mask_warp & mask
                if "gt_disp2_prev" in x:
                    warped_gt = x["gt_disp2_prev"]
                    mask_curr &= warped_gt > 0.0

                joint = mask_prev & mask_curr
                has = mask_prev.any() & mask_curr.any() & fvalid
                d_est = warped_pred - pred_prev
                d_gt = warped_gt - gt_disp_prev
                abs_err = jnp.abs(d_est - d_gt)
                rel_err = abs_err / (jnp.abs(d_gt) + 1e-3)
                _meter_update(meters, "tepe", masked_mean(abs_err, joint), has)
                _meter_update(meters, "tepe_rel",
                              masked_mean(rel_err, joint), has)
                _meter_update(meters, "th1_tepe_rel",
                              masked_mean((rel_err > 1.0).astype(jnp.float32),
                                          joint), has)
                _meter_update(meters, "th3_tepe",
                              masked_mean((abs_err > 3.0).astype(jnp.float32),
                                          joint), has)
                _meter_update(meters, "flow_mag",
                              jnp.mean(jnp.sqrt(jnp.sum(flow ** 2, -1))),
                              fvalid)

                # ---- SE(3)-induced scene-flow metrics (codd.py:521-575) ----
                if "Ts" in out and (has_flow_occ or has_disp_change or has_disp2):
                    if "gt_change_prev" in x:
                        change = x["gt_change_prev"]
                        occ_excl = None
                    elif "gt_occ_prev" in x:
                        change, _ = compute_gt_disp_change(
                            x["gt_occ_prev"] > 0, gt_disp_prev, gt_disp,
                            flow)
                        occ_excl = x["gt_occ_prev"] > 0
                    else:  # disp2
                        change = x["gt_disp2_prev"] - gt_disp_prev
                        change = jnp.where(x["gt_disp2_prev"] <= 0.0,
                                           BF_DEFAULT, change)
                        change = jnp.where(gt_disp_prev <= 0.0, BF_DEFAULT,
                                           change)
                        occ_excl = None
                    m3 = compute_valid_mask(gt_disp_prev, disp_range, seg_occ,
                                            gt_flow_prev=flow,
                                            gt_disp_change=change) & crop
                    if occ_excl is not None:
                        m3 &= ~occ_excl
                    depth1 = jnp.clip(
                        BF_DEFAULT / jnp.maximum(pred_prev[..., 0], 1e-5),
                        0.0, BF_DEFAULT)
                    flow2d_est, _, _ = induced_flow(out["Ts"], depth1, intr)
                    flow2d_est = flow2d_est.at[..., -1].multiply(BF_DEFAULT)
                    flow2d = jnp.concatenate([flow, change], axis=-1)
                    err = flow2d_est - flow2d
                    epe_sf = jnp.sqrt(jnp.sum(err ** 2, -1, keepdims=True))
                    epe_of = jnp.sqrt(jnp.sum(err[..., :2] ** 2, -1,
                                              keepdims=True))
                    m3f = (m3 & fvalid & m3.any()).astype(jnp.float32)
                    sums["count"] = sums["count"] + jnp.sum(m3f)
                    sums["epe2d_scene_flow"] += jnp.sum(epe_sf * m3f)
                    sums["epe2d_optical_flow"] += jnp.sum(epe_of * m3f)
                    sums["1px_scene_flow"] += jnp.sum((epe_sf < 1.0) * m3f)
                    sums["1px_optical_flow"] += jnp.sum((epe_of < 1.0) * m3f)

            return (new_carry, pred, mask_disp, meters, sums), None

        state = (carry, pred0, mask0, meters, sums)
        (carry, _, _, meters, sums), _ = jax.lax.scan(body, state, xs)
        return _finalize(meters, sums)

    def _finalize(meters, sums):
        out = {k: s / jnp.maximum(c, 1.0) for k, (s, c) in meters.items()}
        out.update(sums)
        return out

    return jax.jit(evaluate)
