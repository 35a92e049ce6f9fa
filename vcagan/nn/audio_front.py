"""Audio frontend: mel -> per-video-frame 512-d features.

Capability parity with reference src/models/audio_front.py:5-36 (the main
training path never imports it — the sync critic re-implements the same
topology inline — but the ASR evaluation stacks build on variants of it, so
it is a first-class module here).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from vcagan.nn.common import PReLU, batch_norm
from vcagan.nn.resnet import BasicBlock


class AudioFront(nn.Module):
    """conv3x3 s2 (->ch1) -> BN -> PReLU -> conv3x3 s2 (->ch2) -> BN ->
    PReLU -> BasicBlock(ch2) -> flatten freq -> Dense(out_dim).

    Defaults give the reference audio_front.py shape (128/256 -> 512); the
    GRID ASR stack uses the 32/64 -> 256 variant
    (ASR_model/GRID/src/models/audio_front.py:11-25, kernel 5).
    """

    ch1: int = 128
    ch2: int = 256
    out_dim: int = 512
    kernel: int = 3
    # reference audio fronts use a plain-ReLU BasicBlock (audio_front.py:21)
    # except the GRID ASR variant, which passes relu_type='prelu'
    res_relu_type: str = "relu"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, mel: jax.Array, train: bool = True) -> jax.Array:
        # mel: (B, 80, T_mel, 1) -> (B, T_mel//4, out_dim)
        k = self.kernel
        x = jnp.transpose(mel, (0, 2, 1, 3))  # (B, T_mel, 80, 1)
        x = nn.Conv(
            self.ch1,
            (k, k),
            strides=(2, 2),
            padding=k // 2,
            dtype=self.dtype,
            name="conv1",
        )(x)
        x = batch_norm(train, "bn1", self.dtype)(x)
        x = PReLU(self.ch1, name="act1")(x)
        x = nn.Conv(
            self.ch2,
            (k, k),
            strides=(2, 2),
            padding=k // 2,
            dtype=self.dtype,
            name="conv2",
        )(x)
        x = batch_norm(train, "bn2", self.dtype)(x)
        x = PReLU(self.ch2, name="act2")(x)
        x = BasicBlock(
            self.ch2, relu_type=self.res_relu_type, dtype=self.dtype, name="res"
        )(x, train)
        b, s, f, c = x.shape
        return nn.Dense(self.out_dim, name="proj")(x.reshape(b, s, f * c))
