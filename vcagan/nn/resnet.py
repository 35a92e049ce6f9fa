"""ResNet-18 trunk for per-frame lip features (channels-last NHWC).

Capability parity with reference src/models/resnet.py:25-123: BasicBlock
(conv3x3-BN-act x2 + shortcut), layout [2,2,2,2], PReLU activations, global
average pool to a 512-d vector.  The trunk runs on (B*T, 28, 28, 64) inputs
produced by the 3D stem, so the batch dimension is large — exactly what the
MXU wants.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from vcagan.nn.common import PReLU, batch_norm, kaiming_conv_init


class _ConvParams(nn.Module):
    """Declare a conv's (kernel, bias) without computing it — the fused
    serving kernel consumes the raw arrays but the param tree must stay
    identical to the ``nn.Conv`` it replaces (checkpoints/fold walker)."""

    shape: tuple

    @nn.compact
    def __call__(self):
        return (
            self.param("kernel", kaiming_conv_init(), self.shape),
            self.param("bias", nn.initializers.zeros, (self.shape[-1],)),
        )


class _AlphaParams(nn.Module):
    """PReLU slope param only (same tree as common.PReLU)."""

    channels: int
    init: float = 0.25

    @nn.compact
    def __call__(self):
        return self.param(
            "alpha", lambda _: jnp.full((self.channels,), self.init, jnp.float32)
        )


class BasicBlock(nn.Module):
    """conv3x3 -> BN -> PReLU -> conv3x3 -> BN -> (+shortcut) -> PReLU.

    ``fold_bn``: serving mode — every conv -> BN pair is pre-folded into a
    biased conv (vcagan.nn.fold), so the BN ops are skipped entirely.
    Eval-only (asserted): folded params carry frozen statistics.

    ``fused``: additionally run the stride-1 identity-shortcut blocks as
    ONE Pallas kernel (vcagan.kernels.fused_block) — requires fold_bn.
    Projection blocks keep the XLA path.
    """

    planes: int
    stride: int = 1
    relu_type: str = "prelu"
    dtype: jnp.dtype = jnp.float32
    fold_bn: bool = False
    fused: bool = False

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = True) -> jax.Array:
        assert not (self.fold_bn and train), "fold_bn is an eval-only mode"
        in_planes = x.shape[-1]
        needs_proj = self.stride != 1 or in_planes != self.planes

        if (
            self.fused
            and self.fold_bn
            and not needs_proj
            and self.relu_type == "prelu"
        ):
            from vcagan.kernels.fused_block import fused_basic_block

            w1, b1 = _ConvParams((3, 3, in_planes, self.planes), name="conv1")()
            a1 = _AlphaParams(self.planes, name="act1")()
            w2, b2 = _ConvParams((3, 3, self.planes, self.planes), name="conv2")()
            a2 = _AlphaParams(self.planes, name="act2")()
            return fused_basic_block(
                x.astype(self.dtype), w1, b1, a1, w2, b2, a2
            )

        out = nn.Conv(
            self.planes,
            (3, 3),
            strides=(self.stride, self.stride),
            padding=1,
            use_bias=self.fold_bn,
            kernel_init=kaiming_conv_init(),
            dtype=self.dtype,
            name="conv1",
        )(x)
        if not self.fold_bn:
            out = batch_norm(train, "bn1", self.dtype)(out)
        out = self._act("act1", out)
        out = nn.Conv(
            self.planes,
            (3, 3),
            padding=1,
            use_bias=self.fold_bn,
            kernel_init=kaiming_conv_init(),
            dtype=self.dtype,
            name="conv2",
        )(out)
        if not self.fold_bn:
            out = batch_norm(train, "bn2", self.dtype)(out)

        residual = x
        if needs_proj:
            # 1x1-conv-BN downsample variant (reference resnet.py:10-14)
            residual = nn.Conv(
                self.planes,
                (1, 1),
                strides=(self.stride, self.stride),
                use_bias=self.fold_bn,
                kernel_init=kaiming_conv_init(),
                dtype=self.dtype,
                name="down_conv",
            )(x)
            if not self.fold_bn:
                residual = batch_norm(train, "down_bn", self.dtype)(residual)

        out = out + residual
        return self._act("act2", out)

    def _act(self, name: str, x: jax.Array) -> jax.Array:
        if self.relu_type == "prelu":
            return PReLU(self.planes, name=name)(x)
        return nn.relu(x)


class ResNetTrunk(nn.Module):
    """Stacked BasicBlocks [2,2,2,2] -> global avg pool -> (N, 512)."""

    layers: Sequence[int] = (2, 2, 2, 2)
    relu_type: str = "prelu"
    dtype: jnp.dtype = jnp.float32
    fold_bn: bool = False
    fused: bool = False

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = True) -> jax.Array:
        plan = [(64, 1), (128, 2), (256, 2), (512, 2)]
        for stage, (planes, first_stride) in enumerate(plan):
            for block in range(self.layers[stage]):
                x = BasicBlock(
                    planes,
                    stride=first_stride if block == 0 else 1,
                    relu_type=self.relu_type,
                    dtype=self.dtype,
                    fold_bn=self.fold_bn,
                    fused=self.fused,
                    name=f"layer{stage + 1}_{block}",
                )(x, train)
        # Global spatial mean == AvgPool2d(4) on the final 4x4 map
        # (reference resnet.py:82,121).
        return jnp.mean(x, axis=(1, 2))
