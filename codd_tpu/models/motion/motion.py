"""Motion module: RAFT-3D + forward-warping of the cross-frame memory.

Capability port of the reference Motion wrapper (reference:
model/motion/motion.py).  Converts disparities to clipped depth, estimates
the dense SE(3) field, then forward-splats the previous frame's
image/flow/confidence (full res) and fusion features (1/4 res) into the
current frame with the z-buffered point renderer (ops.splat — the TPU
replacement for pytorch3d).
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax.numpy as jnp
from flax import linen as nn

from ...ops import se3
from ...ops.projective import inv_project
from ...ops.splat import splat_render
from .raft3d import RAFT3D

BF_DEFAULT = 1050 * 0.2  # baseline * focal (reference: motion.py:45)

__all__ = ["Motion", "BF_DEFAULT", "disp_to_depth"]


def disp_to_depth(disp: jnp.ndarray) -> jnp.ndarray:
    """Disparity -> depth (up to scale), clipped to avoid inf
    (reference: motion.py:159-165)."""
    depth = BF_DEFAULT / (disp + 1e-5)
    return jnp.clip(depth, 0.0, BF_DEFAULT)


class Motion(nn.Module):
    """Estimates per-pixel rigid motion and warps memory forward.

    __call__ inputs are the flattened memory carry (no dict mutation — the
    reference's 3-tuple/5-tuple state dance becomes explicit arguments and
    returns).  Returns (warped 5-slot memory, raft outputs, new raft carry).
    """

    iters: int = 16
    ds_scale: int = 4
    # inference splat backend: "xla_gather" (post-sort row gathers — the
    # fast forward-only pipeline), "xla" (payload-through-sort), or
    # "pallas" (ops/pallas/splat_composite tile kernel).  Training always
    # uses the differentiable "xla" path (scatter-free backward).  The
    # full-res and quarter-res call sites have different shapes (C=6 r=1
    # vs C=32 r=2) and so different best backends; splat_impl_lr overrides
    # the backend for the quarter-res feature warp ("" = same as
    # splat_impl).
    splat_impl: str = "xla_gather"
    splat_impl_lr: str = ""
    # training splat backend — must be differentiable: "xla"
    # (payload-through-sort + segmented scans) or "xla_sort_window"
    # (shifted-window reduction: fewer scan stages, smaller train-step
    # HLO — built for the compile-helper timeout, BENCH_NOTES r4).
    splat_impl_train: str = "xla"
    # The reference splats the previous *image* too (motion.py:185), but
    # nothing downstream ever reads it (fusion.py:366 unpacks and drops
    # it), so by default we skip those 3 full-res channels.  Set True for
    # bit-level information-flow parity with the reference.
    warp_image: bool = False
    # 0.0 = integer pixel centers (self-consistent with ops.warp /
    # ops.projective); -0.5 reproduces pytorch3d's half-integer screen
    # convention (reference motion.py:106-128) for running reference-
    # trained weights bit-compatibly (see ops/splat.py docstring).
    pixel_center_offset: float = 0.0
    gn_impl: str = "auto"        # GN aggregation path (ops.gn.build_system)
    gn_bf16_scores: bool = False
    corr_impl: str = "auto"      # corr pyramid layout (ops.corr docstring)
    gn_unroll: int = 1           # eval-only GN scan unroll (raft3d.py)

    def setup(self):
        self.raft3d = RAFT3D(iters=self.iters, gn_impl=self.gn_impl,
                             gn_bf16_scores=self.gn_bf16_scores,
                             corr_impl=self.corr_impl,
                             gn_unroll=self.gn_unroll,
                             name="raft3d")

    def encode(self, image):
        """Frame-0 path: cache features only (reference: raft3d.py:203-206)."""
        return self.raft3d.encode(image)

    def __call__(
        self,
        img_curr: jnp.ndarray,       # (B, H, W, 3)
        disp_curr: jnp.ndarray,      # (B, H, W)
        memory_img: jnp.ndarray,     # (B, H, W, 3)   previous left image
        memory_feat: jnp.ndarray,    # (B, H/4, W/4, C) previous fusion features
        memory_disp: jnp.ndarray,    # (B, H, W)      previous fused disparity
        fmap_prev: jnp.ndarray,
        netinp_prev: jnp.ndarray,
        intrinsics: jnp.ndarray,     # (B, 4)
        train_mode: bool = False,
    ):
        B, H, W, _ = img_curr.shape
        depth_prev = disp_to_depth(memory_disp)
        depth_curr = disp_to_depth(disp_curr)

        raft_out, fmap_curr, netinp_curr = self.raft3d(
            img_curr, depth_prev, depth_curr, intrinsics,
            fmap_prev, netinp_prev, train_mode=train_mode)
        Ts = raft_out["Ts"]

        # full-res warp of [img?, induced flow, confidence] (motion.py:183-194)
        fields = [raft_out["flow2d_est_induced"], raft_out["weight"]]
        if self.warp_image:
            fields = [memory_img] + fields
        to_proj = jnp.concatenate(fields, -1)
        X1 = inv_project(depth_prev, intrinsics)
        X2 = se3.act(Ts, X1)
        nch = to_proj.shape[-1]
        impl = self.splat_impl_train if train_mode else self.splat_impl
        warped, zbuf = splat_render(
            X2.reshape(B, -1, 3), to_proj.reshape(B, -1, nch), intrinsics,
            H=H, W=W, radius_px=1.0, impl=impl,
            pixel_center_offset=self.pixel_center_offset)
        if self.warp_image:
            img_warp = warped[..., :3]
            flow_warp = warped[..., 3:6]
            confidence_warp = warped[..., 6:9]
        else:
            img_warp = jnp.zeros_like(memory_img)
            flow_warp = warped[..., :3]
            confidence_warp = warped[..., 3:6]
        disp_warp = BF_DEFAULT / (zbuf + 1e-5)
        disp_warp = jnp.where(disp_warp > W, 0.0, disp_warp)

        # low-res feature warp (motion.py:196-202)
        s = self.ds_scale
        o = s // 2 - 1
        Ts_lr = Ts[:, o::s, o::s]
        depth_lr = depth_prev[:, o::s, o::s]
        intr_lr = intrinsics / s
        X1l = inv_project(depth_lr, intr_lr)
        X2l = se3.act(Ts_lr, X1l)
        C = memory_feat.shape[-1]
        impl_lr = self.splat_impl_train if train_mode else (
            self.splat_impl_lr or self.splat_impl)
        feat_warp, _ = splat_render(
            X2l.reshape(B, -1, 3), memory_feat.reshape(B, -1, C), intr_lr,
            H=H // s, W=W // s, radius_px=2.0, impl=impl_lr,
            pixel_center_offset=self.pixel_center_offset)

        memory5 = (img_warp, feat_warp, confidence_warp, disp_warp, flow_warp)
        return memory5, raft_out, fmap_curr, netinp_curr
