"""HRNet backbone (w18-small config) — the RAFT-3D context network.

Behavioral port of the mmseg HRNet consumed by the reference
(configs/models/codd.py:44-74; raft3d.py:154-160): stem to 1/4 res,
bottleneck layer1, then 2/3/4-branch high-resolution stages with
cross-resolution fusion.  All norms are FrozenBatchNorm (the reference
freezes SyncBN stats: norm_eval=True, requires_grad=False).

Output: list of the four branch features at [1/4, 1/8, 1/16, 1/32];
``ResizeConcatConv`` resamples them all to 1/8 (the fnet resolution) and
projects to the GRU context width (raft3d.py:109-137).
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax.numpy as jnp
from flax import linen as nn

from ...ops.upsample import interpolate_bilinear
from ..layers import Conv
from .encoders import FrozenBatchNorm

__all__ = ["HRNetSmall", "ResizeConcatConv"]


class _ConvBN(nn.Module):
    features: int
    kernel: int = 3
    stride: int = 1
    relu: bool = True

    @nn.compact
    def __call__(self, x):
        p = (self.kernel - 1) // 2
        x = Conv(self.features, self.kernel, stride=self.stride, padding=p,
                 use_bias=False, name="conv")(x)
        x = FrozenBatchNorm(name="bn")(x)
        return nn.relu(x) if self.relu else x


class _Bottleneck(nn.Module):
    planes: int
    stride: int = 1
    expansion: int = 4

    @nn.compact
    def __call__(self, x):
        out_c = self.planes * self.expansion
        y = _ConvBN(self.planes, 1, name="c1")(x)
        y = _ConvBN(self.planes, 3, stride=self.stride, name="c2")(y)
        y = _ConvBN(out_c, 1, relu=False, name="c3")(y)
        if x.shape[-1] != out_c or self.stride != 1:
            x = _ConvBN(out_c, 1, stride=self.stride, relu=False, name="down")(x)
        return nn.relu(x + y)


class _BasicBlock(nn.Module):
    planes: int

    @nn.compact
    def __call__(self, x):
        y = _ConvBN(self.planes, 3, name="c1")(x)
        y = _ConvBN(self.planes, 3, relu=False, name="c2")(y)
        return nn.relu(x + y)


class _HRModule(nn.Module):
    """Parallel branches + full cross-resolution fusion."""

    channels: Tuple[int, ...]
    num_blocks: Tuple[int, ...]

    @nn.compact
    def __call__(self, xs):
        n = len(self.channels)
        ys = []
        for i in range(n):
            y = xs[i]
            for b in range(self.num_blocks[i]):
                y = _BasicBlock(self.channels[i], name=f"branch{i}_blk{b}")(y)
            ys.append(y)

        fused = []
        for i in range(n):
            acc = None
            for j in range(n):
                if j == i:
                    t = ys[j]
                elif j > i:
                    # lower-res -> conv1x1 + bn, bilinear upsample 2^(j-i)
                    t = _ConvBN(self.channels[i], 1, relu=False,
                                name=f"fuse{i}_{j}")(ys[j])
                    t = interpolate_bilinear(
                        t, (ys[i].shape[1], ys[i].shape[2]), align_corners=False)
                else:
                    # higher-res -> chain of stride-2 convs
                    t = ys[j]
                    for s in range(i - j):
                        last = s == i - j - 1
                        c = self.channels[i] if last else self.channels[j]
                        t = _ConvBN(c, 3, stride=2, relu=not last,
                                    name=f"fuse{i}_{j}_{s}")(t)
                acc = t if acc is None else acc + t
            fused.append(nn.relu(acc))
        return fused


class HRNetSmall(nn.Module):
    """HRNet-w18-small: stages (64,) / (18,36) / (18,36,72)x3 / (18,36,72,144)x2."""

    stage_channels: Tuple[Tuple[int, ...], ...] = ((64,), (18, 36), (18, 36, 72), (18, 36, 72, 144))
    stage_modules: Tuple[int, ...] = (1, 1, 3, 2)
    stage_blocks: Tuple[Tuple[int, ...], ...] = ((2,), (2, 2), (2, 2, 2), (2, 2, 2, 2))

    @nn.compact
    def __call__(self, x):
        x = _ConvBN(64, 3, stride=2, name="stem1")(x)
        x = _ConvBN(64, 3, stride=2, name="stem2")(x)

        # layer1: bottlenecks at 1/4
        for b in range(self.stage_blocks[0][0]):
            x = _Bottleneck(self.stage_channels[0][0], name=f"layer1_{b}")(x)

        xs = [x]
        for stage in (1, 2, 3):
            chans = self.stage_channels[stage]
            # transition: adapt existing branches, spawn the new lowest one
            new_xs = []
            for i, c in enumerate(chans):
                if i < len(xs):
                    if xs[i].shape[-1] != c:
                        new_xs.append(_ConvBN(c, 3, name=f"trans{stage}_{i}")(xs[i]))
                    else:
                        new_xs.append(xs[i])
                else:
                    new_xs.append(_ConvBN(c, 3, stride=2,
                                          name=f"trans{stage}_{i}")(xs[-1]))
            xs = new_xs
            for m in range(self.stage_modules[stage]):
                xs = _HRModule(chans, self.stage_blocks[stage],
                               name=f"stage{stage + 1}_m{m}")(xs)
        return xs


class ResizeConcatConv(nn.Module):
    """Resize all branches to branch-1 (1/8) resolution, concat, 1x1 conv
    (reference: raft3d.py:109-137)."""

    out_channels: int = 512

    @nn.compact
    def __call__(self, xs: Sequence[jnp.ndarray]):
        target = (xs[1].shape[1], xs[1].shape[2])
        ups = [interpolate_bilinear(x, target, align_corners=True) for x in xs]
        x = jnp.concatenate(ups, axis=-1)
        x = Conv(self.out_channels, 1, use_bias=False, name="conv")(x)
        return nn.relu(x)
