"""Shared building blocks: per-channel PReLU, norm helpers, init policies.

All modules in this package use channels-last layouts (NHWC / NDHWC /
(B, T, C)) so XLA tiles convs and matmuls directly onto the MXU; the
reference's NCHW layouts are a CUDA convention, not a semantic choice.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
from flax import linen as nn


class PReLU(nn.Module):
    """Per-channel parametric ReLU, init 0.25 (torch nn.PReLU semantics).

    flax's built-in PReLU is single-parameter; the reference uses
    per-channel slopes throughout (e.g. resnet.py:41-42).
    """

    channels: int
    init: float = 0.25

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        alpha = self.param(
            "alpha", lambda _: jnp.full((self.channels,), self.init, jnp.float32)
        )
        alpha = alpha.astype(x.dtype)
        return jnp.where(x >= 0, x, alpha * x)


def leaky_relu(x: jax.Array, slope: float = 0.2) -> jax.Array:
    return nn.leaky_relu(x, negative_slope=slope)


def kaiming_conv_init() -> Callable:
    """He-normal (fan_out) conv init, matching the reference ResNet policy
    (resnet.py:85-88: std = sqrt(2 / (k*k*out_ch)))."""
    return nn.initializers.variance_scaling(2.0, "fan_out", "normal")


def batch_norm(train: bool, name: str | None = None) -> nn.BatchNorm:
    """BatchNorm with torch-equivalent momentum/eps (momentum 0.1 torch ==
    0.9 flax EMA decay)."""
    return nn.BatchNorm(
        use_running_average=not train,
        momentum=0.9,
        epsilon=1e-5,
        name=name,
    )
