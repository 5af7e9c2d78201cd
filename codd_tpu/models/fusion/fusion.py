"""Recurrent fusion network: blends current stereo disparity with the
motion-warped previous disparity via learned fusion + reset weights.

Capability port of the reference Fusion module (reference:
model/fusion/fusion.py).  Input cues: pixel-to-patch cross/self attention
over 3x3 dilation-2 patches, 3-hypothesis stereo photometric confidence at
1/4 res, warped flow/confidence/validity.  Output:
``disp = cur * (1 - wf*wr) + warp * wf*wr`` with both weight fields gated
by ``pred_warp > 0`` to block gradient shortcuts (fusion.py:382-394).
"""

from __future__ import annotations

import math
from typing import Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ...ops.gn import grad_clip
from ...ops.upsample import interpolate_nearest, unfold3x3
from ...ops.warp import disp_warp
from ..layers import Conv, mish

__all__ = ["Fusion"]


class _MishBlock(nn.Module):
    features: int

    @nn.compact
    def __call__(self, x):
        y = mish(Conv(self.features, 3, padding=1, name="conv1")(x))
        y = Conv(self.features, 3, padding=1, name="conv2")(y)
        return x + y


def _px2patch_corr(k, memory_k, self_corr: bool = False):
    """Pixel-to-patch correlation over 3x3 dilated-2 patches
    (fusion.py:168-198).  k/memory_k: (B,H,W,C).  Returns (B,H,W,9) or
    (B,H,W,8) when the center is dropped (self-correlation)."""
    C = k.shape[-1]
    patches = unfold3x3(memory_k, dilation=2)  # (B,H,W,9,C)
    if C == 1:
        kk = k[..., None, 0] - patches[..., 0]  # (B,H,W,9)
    else:
        kk = jnp.sum(k[..., None, :] * patches, axis=-1)
    if self_corr:
        keep = [i for i in range(9) if i != 4]
        kk = kk[..., keep]
    return kk / math.sqrt(C)


class Fusion(nn.Module):
    in_channels: int = 24
    fusion_channel: int = 32
    ds_scale: int = 4

    def setup(self):
        fc = self.fusion_channel
        self.key0 = Conv(fc, 1, name="key0")
        self.key_block = _MishBlock(fc, name="key_block")
        self.key1 = Conv(fc, 1, name="key1")
        self.conv_corr0 = Conv(fc * 2, 1, name="conv_corr0")
        self.conv_corr1 = Conv(fc, 1, name="conv_corr1")
        self.conv_disp0 = Conv(fc, 7, padding=3, name="conv_disp0")
        self.conv_disp1 = Conv(fc, 3, padding=1, name="conv_disp1")
        self.motion_conv = Conv(fc - 2, 7, padding=3, name="motion_conv")
        self.residual_conv = Conv(fc, 3, padding=1, name="residual_conv")
        self.weight_head0 = Conv(fc, 3, padding=1, name="weight_head0")
        self.weight_head1 = Conv(1, 1, name="weight_head1")
        self.forget_head0 = Conv(16, 1, name="forget_head0")
        self.forget_head1 = Conv(8, 3, padding=1, name="forget_head1")
        self.forget_head2 = Conv(1, 1, name="forget_head2")

    def project(self, left_feat):
        """key_layer: stereo features -> fusion features (fusion.py:74-80)."""
        x = nn.relu(self.key0(left_feat))
        x = nn.relu(self.key_block(x))
        return self.key1(x)

    def _disparity_confidence(self, pred_curr, pred_warp, fea_l, fea_r):
        """3-hypothesis photometric cost at 1/4 res (fusion.py:200-241)."""
        s = self.ds_scale
        o = s // 2 - 1
        pc = pred_curr[:, o::s, o::s]
        pw = pred_warp[:, o::s, o::s]
        norm = self.in_channels / 24.0
        cvs_pred, cvs_warp = [], []
        for k in (-1.0, 0.0, 1.0):
            for pred, acc in ((pw, cvs_warp), (pc, cvs_pred)):
                warped, _ = disp_warp(fea_r, pred[..., 0] / s + k,
                                      padding_mode="zeros")
                acc.append(jnp.sum(jnp.abs(fea_l - warped), -1, keepdims=True) / norm)
        return jnp.concatenate(cvs_pred, -1), jnp.concatenate(cvs_warp, -1)

    def __call__(
        self,
        pred_curr: jnp.ndarray,        # (B, H, W, 1) stereo disparity
        pred_warp: jnp.ndarray,        # (B, H, W, 1) motion-warped disparity
        feat_curr: jnp.ndarray,        # (B, H/4, W/4, fc) projected features
        feat_warp: jnp.ndarray,        # (B, H/4, W/4, fc) warped memory feats
        flow_warp: jnp.ndarray,        # (B, H, W, 3)
        confidence_warp: jnp.ndarray,  # (B, H, W, 3)
        fea_l: jnp.ndarray,            # (B, H/4, W/4, in_channels)
        fea_r: jnp.ndarray,
    ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
        fc = self.fusion_channel
        s = self.ds_scale

        # ---- input cues (fusion.py:243-318) ----
        cost_curr, cost_warp = self._disparity_confidence(
            pred_curr, pred_warp, fea_l, fea_r)

        feat_cross = _px2patch_corr(feat_curr, feat_warp)
        feat_self = jnp.concatenate(
            [_px2patch_corr(feat_curr, feat_curr, self_corr=True),
             _px2patch_corr(feat_warp, feat_warp, self_corr=True)], -1)
        disp_cross = jnp.abs(_px2patch_corr(pred_curr, pred_warp))
        disp_self = jnp.abs(jnp.concatenate(
            [_px2patch_corr(pred_curr, pred_curr, self_corr=True),
             _px2patch_corr(pred_warp, pred_warp, self_corr=True)], -1))

        corr_feat = jnp.concatenate(
            [feat_cross, feat_self, cost_curr, cost_warp], -1)       # 31ch, 1/4
        corr_feat_fr = jnp.concatenate(
            [disp_cross, disp_self, flow_warp,
             (pred_warp > 0).astype(pred_warp.dtype), confidence_warp], -1)  # 32ch

        # ---- fusion weights at 1/4 res (fusion.py:320-355) ----
        o = s // 2 - 1
        pc = pred_curr[:, o::s, o::s]
        pw = pred_warp[:, o::s, o::s]

        corr = nn.relu(self.conv_corr0(corr_feat))
        corr = nn.relu(self.conv_corr1(corr))
        disp = nn.relu(self.conv_disp0(jnp.concatenate([pc, pw], -1)))
        disp = nn.relu(self.conv_disp1(disp))
        mo = nn.relu(self.motion_conv(jnp.concatenate([corr, disp], -1)))
        inp = jnp.concatenate([feat_curr, mo, pc, pw], -1)
        net = nn.relu(self.residual_conv(inp)) + corr

        w = self.weight_head1(self.weight_head0(net))
        fusion_weights = jax.nn.sigmoid(grad_clip(w))
        fusion_weights = interpolate_nearest(fusion_weights, s)

        # ---- reset weights at full res (fusion.py:123-132, 387-390) ----
        r = self.forget_head2(self.forget_head1(self.forget_head0(corr_feat_fr)))
        reset_weights = jax.nn.sigmoid(grad_clip(r))

        valid = (pred_warp > 0.0).astype(pred_curr.dtype)
        fusion_weights = fusion_weights * valid
        reset_weights = reset_weights * valid
        wfr = fusion_weights * reset_weights
        disp_fused = pred_curr * (1.0 - wfr) + pred_warp * wfr

        return disp_fused, fusion_weights, reset_weights
