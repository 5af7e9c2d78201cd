"""RAFT feature encoder and norm helpers (reference: blocks/extractor.py)."""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..layers import Conv

__all__ = ["instance_norm", "FrozenBatchNorm", "BasicEncoder"]


def instance_norm(x, eps: float = 1e-5):
    """torch nn.InstanceNorm2d default: per-sample, per-channel, no affine."""
    mean = jnp.mean(x, axis=(1, 2), keepdims=True)
    var = jnp.var(x, axis=(1, 2), keepdims=True)
    return (x - mean) * jax.lax.rsqrt(var + eps)


class FrozenBatchNorm(nn.Module):
    """BatchNorm evaluated with stored statistics (never updated).

    The reference runs its HRNet context net with SyncBN frozen in eval mode
    (configs/models/codd.py:46-47, norm_eval=True, requires_grad=False), so
    batch statistics are load-time constants.  We keep mean/var as
    non-trainable variables ("batch_stats" collection) and scale/bias as
    parameters — ported torch checkpoints drop in directly; from-scratch
    training sees a learnable affine.
    """

    epsilon: float = 1e-5

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (c,))
        bias = self.param("bias", nn.initializers.zeros, (c,))
        mean = self.variable("batch_stats", "mean", lambda: jnp.zeros(c)).value
        var = self.variable("batch_stats", "var", lambda: jnp.ones(c)).value
        inv = scale / jnp.sqrt(var + self.epsilon)
        return x * inv + (bias - mean * inv)


class _ResidualBlock(nn.Module):
    planes: int
    stride: int = 1

    @nn.compact
    def __call__(self, x):
        y = Conv(self.planes, 3, stride=self.stride, padding=1, name="conv1")(x)
        y = nn.relu(instance_norm(y))
        y = Conv(self.planes, 3, padding=1, name="conv2")(y)
        y = nn.relu(instance_norm(y))
        if self.stride != 1 or x.shape[-1] != self.planes:
            x = instance_norm(Conv(self.planes, 1, stride=self.stride,
                                   name="downsample")(x))
        return nn.relu(x + y)


class BasicEncoder(nn.Module):
    """RAFT feature encoder at 1/8 resolution (extractor.py:119-199),
    instance-norm variant as configured by the reference (raft3d.py:151)."""

    output_dim: int = 128

    @nn.compact
    def __call__(self, x):
        x = Conv(64, 7, stride=2, padding=3, name="conv1")(x)
        x = nn.relu(instance_norm(x))
        x = _ResidualBlock(64, 1, name="layer1_0")(x)
        x = _ResidualBlock(64, 1, name="layer1_1")(x)
        x = _ResidualBlock(96, 2, name="layer2_0")(x)
        x = _ResidualBlock(96, 1, name="layer2_1")(x)
        x = _ResidualBlock(128, 2, name="layer3_0")(x)
        x = _ResidualBlock(128, 1, name="layer3_1")(x)
        return Conv(self.output_dim, 1, name="conv2")(x)
