"""RAFT-3D: dense-SE(3) scene flow via iterated Gauss-Newton refinement.

Capability port of the reference motion estimator (reference:
model/motion/raft3d/raft3d.py).  Per GRU iteration: project the previous
frame's points through the current transform field, sample the current
frame's inverse depth, index the correlation pyramid, run the ConvGRU
update producing (embedding, delta, weight, upsample-mask), then take one
damped Gauss-Newton step on the SE(3) field (ops.gn — the TPU replacement
for lietorch_extras).

TPU structure notes:
  * the refinement loop is an ``nn.scan`` over a single iteration module
    (params broadcast) — one trace instead of 16 unrolled copies, which
    keeps XLA compile time sane and lets the scheduler pipeline iterations;
  * per-iteration training outputs are emitted as *low-res* scan ys and
    upsampled outside the loop with one vmap; in eval they are dead code
    and jaxpr DCE removes them entirely;
  * the transform field is detached at the top of every iteration
    (raft3d.py:225 -> stop_gradient) so gradients flow through each GN
    step's local linearization only.
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ...ops import corr as corr_ops
from ...ops import se3
from ...ops.gn import gn_step, grad_clip
from ...ops.grid_sample import grid_sample
from ...ops.projective import induced_flow, projective_transform
from ...ops.upsample import cvx_upsample, upsample_se3
from ...ops.warp import meshgrid_xy
from ..layers import Conv
from .encoders import BasicEncoder
from .hrnet import HRNetSmall, ResizeConcatConv

__all__ = ["RAFT3D", "ConvGRU", "BasicUpdateBlock"]


class ConvGRU(nn.Module):
    """Dual-dilation gated update (reference: blocks/gru.py:9-35)."""

    hidden_dim: int = 128
    dilation: int = 4

    @nn.compact
    def __call__(self, h, *inputs):
        hd, dil = self.hidden_dim, self.dilation
        iz = ir = iq = 0.0
        for inp in inputs:
            iz = iz + inp[..., :hd]
            ir = ir + inp[..., hd:2 * hd]
            iq = iq + inp[..., 2 * hd:3 * hd]

        def gate(name):
            c1 = Conv(hd, 3, padding=1, name=f"{name}1")
            c2 = Conv(hd, 3, padding=dil, dilation=dil, name=f"{name}2")
            return c1, c2

        z1, z2 = gate("convz")
        r1, r2 = gate("convr")
        q1, q2 = gate("convq")
        z = jax.nn.sigmoid(z1(h) + z2(h) + iz)
        r = jax.nn.sigmoid(r1(h) + r2(h) + ir)
        q = jnp.tanh(q1(r * h) + q2(r * h) + iq)
        return (1 - z) * h + z * q


class BasicUpdateBlock(nn.Module):
    """GRU + output heads (reference: raft3d.py:44-106)."""

    hidden_dim: int = 128

    @nn.compact
    def __call__(self, net, inp, corr, flow, dz, twist):
        motion_info = jnp.concatenate([flow, 10.0 * dz, 10.0 * twist], axis=-1)
        motion_info = jnp.clip(motion_info, -50.0, 50.0)

        mot = nn.relu(Conv(128, 7, padding=3, name="flow_enc0")(motion_info))
        mot = Conv(3 * 128, 1, name="flow_enc1")(mot)
        cor = nn.relu(Conv(256, 3, padding=1, name="corr_enc0")(corr))
        cor = nn.relu(Conv(256, 3, padding=1, name="corr_enc1")(cor))
        cor = Conv(3 * 128, 1, name="corr_enc2")(cor)

        net = ConvGRU(self.hidden_dim, name="gru")(net, inp, cor, mot)

        def head(width, out, name, sigmoid=False):
            x = nn.relu(Conv(width, 3, padding=1, name=f"{name}0")(net))
            x = Conv(out, 1, name=f"{name}1")(x)
            if sigmoid:
                x = jax.nn.sigmoid(x)
            return grad_clip(x)

        ae = head(256, 32, "ae")
        delta = head(256, 3, "delta")
        weight = head(256, 3, "weight", sigmoid=True)
        mask = head(256, 64 * 9, "mask")
        return net, mask, ae, delta, weight


class GNIteration(nn.Module):
    """One GRU + Gauss-Newton refinement step (scan body).

    The per-iteration training supervision (full-res upsampled flows,
    reference raft3d.py:249-258) is computed *inside* the body: the
    (h/8, w/8, 8, 8, 9)-shaped convex-upsampling intermediates have a
    9-wide minor dim that pads 14x under TPU tiling, so they must stay
    transient per iteration rather than stacked over all 16 via vmap.
    In eval the stacked ys are unused and jaxpr DCE removes the compute.
    """

    hidden_dim: int = 128
    corr_radius: int = 3
    # static: emit per-iteration full-res supervision flows (training).
    # Explicitly gated rather than DCE'd: the remat-wrapped scan kept the
    # full-res cvx_upsample + induced_flow alive in eval (~every iteration
    # paid ~2 full-res upsamples it never used).
    emit_supervision: bool = False
    gn_impl: str = "auto"       # GN aggregation path (see ops.gn.build_system)
    gn_bf16_scores: bool = False
    corr_select: str = "xla"    # volume-path column select (ops.corr)

    @nn.compact
    def __call__(self, carry, _):
        (net, Ts, mask, weight, inp, pyramid, depth1_r8, zinv2, intr8,
         coords0, depth_prev, intrinsics) = carry
        Ts = jax.lax.stop_gradient(Ts)

        coords1_xyz, _ = projective_transform(Ts, depth1_r8, intr8)
        coords1 = coords1_xyz[..., :2]
        zinv_proj = coords1_xyz[..., 2:]
        zinv = grid_sample(zinv2[..., None], coords1, mode="bilinear",
                           padding_mode="zeros")

        corr = corr_ops.corr_lookup(pyramid, coords1, self.corr_radius,
                                    select=self.corr_select)
        flow = coords1 - coords0
        dz = zinv - zinv_proj
        twist = se3.log(Ts)

        dt = net.dtype  # keep the scan carry dtype-stable under bf16
        net2, mask, ae, delta, weight = BasicUpdateBlock(
            self.hidden_dim, name="update_block")(net, inp, corr, flow, dz,
                                                  twist)
        net = net2.astype(dt)
        mask = mask.astype(dt)
        weight = weight.astype(dt)
        target = (coords1_xyz + delta).astype(jnp.float32)
        Ts = gn_step(Ts, ae, target, weight, depth1_r8, intr8,
                     impl=self.gn_impl,
                     bf16_scores=self.gn_bf16_scores).astype(Ts.dtype)

        new_carry = (net, Ts, mask, weight, inp, pyramid, depth1_r8, zinv2,
                     intr8, coords0, depth_prev, intrinsics)
        if not self.emit_supervision:
            return new_carry, None
        rev_full = cvx_upsample(8.0 * (target[..., :2] - coords0), mask)
        Ts_up = upsample_se3(Ts, mask)
        est_full, _, _ = induced_flow(Ts_up, depth_prev, intrinsics)
        ys = {"est": est_full, "rev": rev_full}
        return new_carry, ys


# volume-layout corr impls and their column-select backend (ops.corr
# _lookup_level_volume): einsum one-hot ("xla"), fused VMEM kernel
# ("pallas"), or the fused VPU compare-select reduce ("reduce")
_CORR_SELECT = {"volume": "xla", "volume_pallas": "pallas",
                "volume_reduce": "reduce"}


class RAFT3D(nn.Module):
    """Dense SE(3) scene-flow estimator.

    Methods:
      encode(img)  -> (fmap, net_inp): per-frame features cached in the
                      cross-frame carry (reference: raft3d.py:203-206).
      __call__(...) -> dict with Ts (full res), flow2d_est_induced, weight,
                      and per-iteration training pyramids.
    """

    iters: int = 16
    corr_levels: int = 4
    corr_radius: int = 3
    hidden_dim: int = 128
    gn_impl: str = "auto"
    gn_bf16_scores: bool = False
    # corr pyramid layout: "patch" (differentiable; training), "volume"
    # (precomputed per-level volumes + slab gathers; fastest inference),
    # "auto" = volume_reduce in eval / patch in train (see ops.corr
    # docstring; reduce select adopted at bench level 2026-08-20:
    # 6.645 vs 6.551 FPS control, bit-identical to the einsum select)
    corr_impl: str = "auto"
    # lax.scan unroll factor for the GN refinement loop (EVAL only —
    # training keeps unroll=1 so remat + the train-step compile budget
    # are unaffected).  The scan body boundary is a fusion barrier: the
    # standalone GN aggregation chain runs 0.57 ms/iter but costs
    # ~1.6 ms/iter in-context (probe_gn_fused, 2026-08-19); unrolling
    # lets XLA fuse across iteration boundaries.  Compile time grows
    # ~linearly in the factor — keep it a divisor of ``iters``.
    gn_unroll: int = 1

    def setup(self):
        self.fnet = BasicEncoder(128, name="fnet")
        self.cnet = HRNetSmall(name="cnet")
        self.cnet_out = ResizeConcatConv(128 * 4, name="cnet_out")

    def _make_scan(self, train_mode: bool):
        # remat only in training: recompute each iteration's activations in
        # the backward pass instead of keeping 16 copies alive.  Eval skips
        # both remat and the per-iteration supervision outputs.
        body = (nn.remat(GNIteration, prevent_cse=False) if train_mode
                else GNIteration)
        ScanIter = nn.scan(
            body,
            variable_broadcast="params",
            split_rngs={"params": False},
            length=self.iters,
            unroll=1 if train_mode else self.gn_unroll,
        )
        corr_impl = self.corr_impl
        if corr_impl == "auto":
            corr_impl = "patch" if train_mode else "volume_reduce"
        return ScanIter(hidden_dim=self.hidden_dim,
                        corr_radius=self.corr_radius,
                        emit_supervision=train_mode,
                        gn_impl=self.gn_impl,
                        gn_bf16_scores=self.gn_bf16_scores,
                        corr_select=_CORR_SELECT.get(corr_impl, "xla"),
                        name="gn_iter")

    def encode(self, image):
        fmap = self.fnet(image)
        net_inp = self.cnet_out(self.cnet(image))
        return fmap, net_inp

    @nn.compact
    def __call__(
        self,
        image_curr: jnp.ndarray,     # (B, H, W, 3)
        depth_prev: jnp.ndarray,     # (B, H, W)
        depth_curr: jnp.ndarray,     # (B, H, W)
        intrinsics: jnp.ndarray,     # (B, 4)
        fmap_prev: jnp.ndarray,      # (B, H/8, W/8, 128) from prev frame
        netinp_prev: jnp.ndarray,    # (B, H/8, W/8, 512) from prev frame
        train_mode: bool = False,
    ) -> Tuple[Dict[str, Any], jnp.ndarray, jnp.ndarray]:
        B, H, W, _ = image_curr.shape
        h8, w8 = H // 8, W // 8

        fmap_curr = self.fnet(image_curr)
        corr_impl = self.corr_impl
        if corr_impl == "auto":
            corr_impl = "patch" if train_mode else "volume_reduce"
        pyr_impl = ("volume" if corr_impl in _CORR_SELECT else corr_impl)
        pyramid = corr_ops.build_corr_pyramid(fmap_prev, fmap_curr,
                                              self.corr_levels,
                                              impl=pyr_impl)
        net = jnp.tanh(netinp_prev[..., :128])
        inp = nn.relu(netinp_prev[..., 128:])

        intr8 = intrinsics / 8.0
        depth1_r8 = depth_prev[:, 3::8, 3::8]
        depth2_r8 = depth_curr[:, 3::8, 3::8]
        zinv2 = 1.0 / jnp.maximum(depth2_r8, 1e-8)

        x0, y0 = meshgrid_xy(h8, w8, image_curr.dtype)
        coords0 = jnp.broadcast_to(jnp.stack([x0, y0], -1)[None], (B, h8, w8, 2))

        Ts0 = se3.identity((B, h8, w8), image_curr.dtype)
        mask0 = jnp.zeros((B, h8, w8, 64 * 9), image_curr.dtype)
        weight0 = jnp.zeros((B, h8, w8, 3), image_curr.dtype)
        carry0 = (net, Ts0, mask0, weight0, inp, pyramid, depth1_r8, zinv2,
                  intr8, coords0, depth_prev, intrinsics)
        carry, ys = self._make_scan(train_mode)(carry0, None)
        _, Ts, mask, weight = carry[:4]

        Ts_up = upsample_se3(Ts, mask)
        flow2d_est_induced, _, _ = induced_flow(Ts_up, depth_prev, intrinsics)
        weight_up = cvx_upsample(weight, mask)

        out = {
            "Ts": Ts_up,                                # (B, H, W, 7)
            "flow2d_est_induced": flow2d_est_induced,   # (B, H, W, 3)
            "weight": weight_up,                        # (B, H, W, 3)
        }
        if train_mode:
            out["flow2d_est"] = [ys["est"][i] for i in range(self.iters)]
            out["flow2d_rev"] = [ys["rev"][i] for i in range(self.iters)]

        # fresh features for the next frame's carry (raft3d.py:277-278)
        netinp_curr = self.cnet_out(self.cnet(image_curr))
        return out, fmap_curr, netinp_curr
