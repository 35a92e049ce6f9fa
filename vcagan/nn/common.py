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


def batch_norm(
    train: bool, name: str | None = None, dtype: jnp.dtype | None = None
) -> nn.BatchNorm:
    """BatchNorm with torch-equivalent momentum/eps (momentum 0.1 torch ==
    0.9 flax EMA decay).

    ``dtype`` is the flax compute/output dtype: under bf16 compute it keeps
    activations in bfloat16 THROUGH the norm instead of promoting every
    post-conv tensor back to fp32 (flax still computes the batch statistics
    in fp32 internally, and scale/bias/running stats stay fp32 params).
    The stem's (B,T,56,56,64) post-BN tensors are the largest activations
    in the network, so the promotion doubled their HBM traffic."""
    return nn.BatchNorm(
        use_running_average=not train,
        momentum=0.9,
        epsilon=1e-5,
        dtype=dtype,
        name=name,
    )


def s2d_stem_conv3d(
    video: jax.Array, kernel: jax.Array, dtype=jnp.float32
) -> jax.Array:
    """The visual stem conv (k(5,7,7) s(1,2,2), C_in=1) as a space-to-depth
    conv — numerically EXACT, but MXU-friendly.

    A single-input-channel stride-2 conv is the worst case for the TPU conv
    emitter (input features packed one-per-sublane; the profile showed the
    stem's forward+weight-grad at ~24 ms/step of a 149 ms train step).
    Rearranging 2x2 spatial blocks into 4 channels turns it into a
    stride-1, C_in=4 conv over a 56x56 grid computing the identical sum:

      out[t,i,j] = sum_{dt,di,dj} V[t+dt-2, 2i+di-3, 2j+dj-3] K[dt,di,dj]
                 = sum_{dt,dp,dq,a,b} V2[t+dt-2, i-2+dp, j-2+dq, 2a+b]
                                      K'[dt, 2dp+a, 2dq+b]

    with V2 the 2x2 space-to-depth of V, and K' the kernel zero-padded by
    one leading tap in H and W (di = 2dp+a-1 maps [0,7) onto the 8-slot
    grid).  The kernel parameter keeps its reference shape (5,7,7,1,C) so
    checkpoints and the torch converter are untouched.

    Reference: src/models/visual_front.py:10-12.
    """
    b, t, h, w, cin = video.shape
    cout = kernel.shape[-1]
    assert cin == 1 and kernel.shape[:4] == (5, 7, 7, 1), (
        "s2d stem is specialized to the reference stem geometry"
    )
    if h % 2 or w % 2:  # odd spatial dims: fall back to the plain conv
        return jax.lax.conv_general_dilated(
            video.astype(dtype),
            kernel.astype(dtype),
            (1, 2, 2),
            ((2, 2), (3, 3), (3, 3)),
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
        )
    v2 = video.reshape(b, t, h // 2, 2, w // 2, 2)
    v2 = v2.transpose(0, 1, 2, 4, 3, 5).reshape(b, t, h // 2, w // 2, 4)
    kp = jnp.pad(kernel, ((0, 0), (1, 0), (1, 0), (0, 0), (0, 0)))
    k2 = kp.reshape(5, 4, 2, 4, 2, cout)
    k2 = k2.transpose(0, 1, 3, 2, 4, 5).reshape(5, 4, 4, 4, cout)
    return jax.lax.conv_general_dilated(
        v2.astype(dtype),
        k2.astype(dtype),
        (1, 1, 1),
        ((2, 2), (2, 1), (2, 1)),
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
    )
