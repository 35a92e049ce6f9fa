"""Multi-scale mel discriminators and the audio-visual sync critic.

Capability parity with reference src/models/generator.py:51-92 (ResBlk),
267-317 (Discriminator), 319-361 (sync_Discriminator).

Layouts (channels-last):
- mel inputs: (B, F, T, 1) with (F, T) in {(20, T), (40, 2T), (80, 4T)}
- conditioning ``sent``: (B, T, 512) (time-major; the reference passes
  (B, 512, T) and means over time — identical math)
"""

from __future__ import annotations

import math
from typing import Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from vcagan.nn.common import PReLU, batch_norm, leaky_relu
from vcagan.nn.resnet import BasicBlock

_INV_SQRT2 = 1.0 / math.sqrt(2.0)


class ResBlk(nn.Module):
    """Downsampling residual block: LReLU-conv5 (+avgpool2) x2 with learned
    shortcut, 1/sqrt(2) scaling (reference generator.py:51-92; used with
    normalize=False, downsample=True at generator.py:283)."""

    out_channels: int
    downsample: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        in_channels = x.shape[-1]

        h = leaky_relu(x)
        h = nn.Conv(
            in_channels, (5, 5), padding=2, dtype=self.dtype, name="conv1"
        )(h)
        if self.downsample:
            h = nn.avg_pool(h, (2, 2), strides=(2, 2))
        h = leaky_relu(h)
        h = nn.Conv(
            self.out_channels, (5, 5), padding=2, dtype=self.dtype, name="conv2"
        )(h)

        sc = x
        if in_channels != self.out_channels:
            sc = nn.Conv(
                self.out_channels,
                (1, 1),
                use_bias=False,
                dtype=self.dtype,
                name="conv1x1",
            )(sc)
        if self.downsample:
            sc = nn.avg_pool(sc, (2, 2), strides=(2, 2))
        return (h + sc) * _INV_SQRT2


class Discriminator(nn.Module):
    """One scale of the 3-scale mel discriminator with unconditional and
    sentence-conditioned heads (reference generator.py:267-317).

    ``phase`` '1'/'2'/'3' selects 2/3/4 downsampling blocks so every scale
    reduces to a (B, 5, T//4, 512) map.
    """

    phase: str = "1"
    base_channels: int = 32
    max_channels: int = 512
    num_class: int = 1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self, mel: jax.Array, sent: jax.Array
    ) -> Tuple[jax.Array, jax.Array]:
        # mel: (B, F, T, 1); sent: (B, T_v, 512)
        repeat = {"1": 2, "2": 3, "3": 4}[self.phase]
        if mel.shape[2] // (2 ** repeat) < 5:
            raise ValueError(
                f"Discriminator phase {self.phase}: time dim {mel.shape[2]} "
                f"downsamples below the 5x5 VALID head (needs >= {5 * 2 ** repeat} "
                "mel frames, i.e. video window >= 20 frames)"
            )

        x = nn.Conv(
            self.base_channels, (5, 5), padding=2, dtype=self.dtype, name="conv_in"
        )(mel)
        ch = self.base_channels
        for i in range(repeat):
            ch = min(ch * 2, self.max_channels)
            x = ResBlk(ch, downsample=True, dtype=self.dtype, name=f"block{i}")(x)
        # x: (B, 5, f_len, ch) where f_len = T//4 at this scale

        # Unconditional head: LReLU -> 5x5 VALID conv -> LReLU -> global
        # mean -> Linear (reference generator.py:288-294).
        u = leaky_relu(x)
        u = nn.Conv(
            ch, (5, 5), padding="VALID", dtype=self.dtype, name="uncond_conv"
        )(u)
        u = leaky_relu(u)
        u = jnp.mean(u, axis=(1, 2))
        u = nn.Dense(self.num_class, name="uncond_out")(u)

        # Conditional head: time-averaged sent tiled over the map, concat on
        # channels (reference generator.py:296-313).
        c = jnp.mean(sent, axis=1)  # (B, 512)
        c = jnp.broadcast_to(
            c[:, None, None, :], (x.shape[0], x.shape[1], x.shape[2], c.shape[-1])
        ).astype(x.dtype)
        y = jnp.concatenate([x, c], axis=-1)
        y = leaky_relu(y)
        y = nn.Conv(ch, (5, 5), padding=2, dtype=self.dtype, name="cond_conv1")(y)
        y = leaky_relu(y)
        y = nn.Conv(
            ch, (5, 5), padding="VALID", dtype=self.dtype, name="cond_conv2"
        )(y)
        y = leaky_relu(y)
        y = jnp.mean(y, axis=(1, 2))
        y = nn.Dense(self.num_class, name="cond_out")(y)

        return u, y


class SyncDiscriminator(nn.Module):
    """Audio-visual synchronization critic (reference generator.py:319-361).

    The audio encoder maps mel (B, 80, 4S, 1) -> per-video-frame 512-d
    features aligned with ``phon``:
    conv3x3 s2 -> BN -> PReLU (x2: 128, 256 ch) -> BasicBlock(256) ->
    flatten freq -> Linear(20*256 -> 512).

    ``__call__`` returns the per-sample loss vector:
    - discriminator mode: symmetric InfoNCE over the (v_S, a_S) cosine
      matrix with temperature (generator.py:351-359)
    - generator mode (gen=True): 5 - mean |cosine(v, a)| (generator.py:347-349)
    """

    temp: float = 1.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        v_feat: jax.Array,
        mel: jax.Array,
        gen: bool = False,
        train: bool = True,
    ) -> jax.Array:
        # v_feat: (B, S, 512); mel: (B, 80, T_mel, 1), T_mel = 4S
        x = jnp.transpose(mel, (0, 2, 1, 3))  # (B, T_mel, 80, 1): time as rows
        x = nn.Conv(
            128, (3, 3), strides=(2, 2), padding=1, dtype=self.dtype, name="conv1"
        )(x)
        x = batch_norm(train, "bn1", self.dtype)(x)
        x = PReLU(128, name="act1")(x)
        x = nn.Conv(
            256, (3, 3), strides=(2, 2), padding=1, dtype=self.dtype, name="conv2"
        )(x)
        x = batch_norm(train, "bn2", self.dtype)(x)
        x = PReLU(256, name="act2")(x)  # (B, S, 20, 256)
        # plain-ReLU BasicBlock (reference generator.py:332-334 uses the
        # relu_type='relu' default here, unlike the visual ResNet)
        x = BasicBlock(256, relu_type="relu", dtype=self.dtype, name="res")(x, train)

        b, s, f, c = x.shape
        a_feat = nn.Dense(512, name="proj")(x.reshape(b, s, f * c))  # (B, S, 512)

        if gen:
            cos = _cosine(v_feat, a_feat)  # (B, S)
            return 5.0 - jnp.mean(jnp.abs(cos), axis=1)

        v_n = _l2_normalize(v_feat)
        a_n = _l2_normalize(a_feat)
        sim = jnp.einsum("bsd,btd->bst", v_n, a_n) / self.temp  # (B, v_S, a_S)
        diag = jnp.arange(s)
        nce_va = jnp.mean(
            jax.nn.log_softmax(sim, axis=2)[:, diag, diag], axis=1
        )
        nce_av = jnp.mean(
            jax.nn.log_softmax(sim, axis=1)[:, diag, diag], axis=1
        )
        return -0.5 * (nce_va + nce_av)


def _l2_normalize(x: jax.Array, axis: int = -1, eps: float = 1e-12) -> jax.Array:
    norm = jnp.sqrt(jnp.sum(x * x, axis=axis, keepdims=True))
    return x / jnp.maximum(norm, eps)


def _cosine(a: jax.Array, b: jax.Array, eps: float = 1e-8) -> jax.Array:
    num = jnp.sum(a * b, axis=-1)
    den = jnp.maximum(
        jnp.linalg.norm(a, axis=-1) * jnp.linalg.norm(b, axis=-1), eps
    )
    return num / den
