"""Shared flax building blocks (NHWC).

Naming follows the reference's torch modules so layer-by-layer comparisons
(and optional weight ports, with a HWIO transpose) stay mechanical.
"""

from __future__ import annotations

from typing import Any, Callable, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

__all__ = ["lrelu", "Conv", "ConvTranspose", "SharedStrideConv", "mish"]


def lrelu(x, slope: float = 0.2):
    return nn.leaky_relu(x, negative_slope=slope)


def mish(x):
    return x * jnp.tanh(jax.nn.softplus(x))


class Conv(nn.Module):
    """2D conv with torch-style integer padding and dilation."""

    features: int
    kernel: int = 3
    stride: int = 1
    padding: int = 0
    dilation: int = 1
    use_bias: bool = True

    @nn.compact
    def __call__(self, x):
        p = self.padding
        return nn.Conv(
            self.features,
            (self.kernel, self.kernel),
            strides=(self.stride, self.stride),
            padding=((p, p), (p, p)),
            kernel_dilation=(self.dilation, self.dilation),
            use_bias=self.use_bias,
            name="conv",
        )(x)


class ConvTranspose(nn.Module):
    """torch ConvTranspose2d(kernel, stride, padding=0) equivalent."""

    features: int
    kernel: int = 2
    stride: int = 2

    @nn.compact
    def __call__(self, x):
        return nn.ConvTranspose(
            self.features,
            (self.kernel, self.kernel),
            strides=(self.stride, self.stride),
            padding="VALID",
            name="conv",
        )(x)


class SharedStrideConv(nn.Module):
    """A conv whose weights are shared across calls with different strides.

    Needed for the tile-feature extractor: the reference mutates
    ``conv.stride`` at runtime to compute right-image tile features at every
    horizontal position (reference: initialization.py:119-148).
    """

    features: int
    kernel: Tuple[int, int]

    @nn.compact
    def __call__(self, x, strides: Tuple[int, int], padding="VALID"):
        in_feat = x.shape[-1]
        k = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (self.kernel[0], self.kernel[1], in_feat, self.features),
        )
        b = self.param("bias", nn.initializers.zeros, (self.features,))
        y = jax.lax.conv_general_dilated(
            x, k, window_strides=strides, padding=padding,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        return y + b
