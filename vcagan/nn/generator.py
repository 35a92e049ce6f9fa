"""Mel-spectrogram generator ("Decoder"), Postnet, and their residual blocks.

Capability parity with reference src/models/generator.py:8-49 (ResBlk1D),
94-131 (GenResBlk), 173-192 (Postnet), 194-265 (Decoder).

Layouts (channels-last):
- spectrogram feature maps: (B, F, T, C) with F = freq bins, T = mel frames
- the generator emits three scales: (B, 20, T, 1) / (B, 40, 2T, 1) /
  (B, 80, 4T, 1), squeezed to (B, F, T') at the API.

The reference's `.cuda()` noise injection (generator.py:248) becomes an
explicit PRNG argument — deterministic and shardable.
"""

from __future__ import annotations

import math
from typing import Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from vcagan.nn.attention import AVAttention
from vcagan.nn.common import batch_norm, leaky_relu

_INV_SQRT2 = 1.0 / math.sqrt(2.0)


class GenResBlk(nn.Module):
    """Pre-activation residual block: BN-LReLU-conv5x5 x2, optional x2
    nearest upsample (both F and T), 1x1 learned shortcut on channel change,
    1/sqrt(2) output scaling (reference generator.py:94-131)."""

    out_channels: int
    upsample: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = True) -> jax.Array:
        in_channels = x.shape[-1]

        h = batch_norm(train, "norm1", self.dtype)(x)
        h = leaky_relu(h)
        if self.upsample:
            h = _nearest_up2(h)
        h = nn.Conv(
            self.out_channels, (5, 5), padding=2, dtype=self.dtype, name="conv1"
        )(h)
        h = batch_norm(train, "norm2", self.dtype)(h)
        h = leaky_relu(h)
        h = nn.Conv(
            self.out_channels, (5, 5), padding=2, dtype=self.dtype, name="conv2"
        )(h)

        sc = x
        if self.upsample:
            sc = _nearest_up2(sc)
        if in_channels != self.out_channels:
            sc = nn.Conv(
                self.out_channels,
                (1, 1),
                use_bias=False,
                dtype=self.dtype,
                name="conv1x1",
            )(sc)
        return (h + sc) * _INV_SQRT2


class ResBlk1D(nn.Module):
    """1-D residual block for the postnet: LReLU-conv5 x2 + 1x1 shortcut,
    1/sqrt(2) scaling (reference generator.py:8-49, used non-normalized,
    non-downsampling at generator.py:181-183).  Operates on (B, T, C)."""

    out_channels: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        in_channels = x.shape[-1]
        h = leaky_relu(x)
        h = nn.Conv(
            in_channels, (5,), padding=2, dtype=self.dtype, name="conv1"
        )(h)
        h = leaky_relu(h)
        h = nn.Conv(
            self.out_channels, (5,), padding=2, dtype=self.dtype, name="conv2"
        )(h)
        sc = x
        if in_channels != self.out_channels:
            sc = nn.Conv(
                self.out_channels,
                (1,),
                use_bias=False,
                dtype=self.dtype,
                name="conv1x1",
            )(sc)
        return (h + sc) * _INV_SQRT2


def _nearest_up2(x: jax.Array) -> jax.Array:
    """x2 nearest-neighbor upsample of (B, F, T, C) in F and T."""
    b, f, t, c = x.shape
    x = x[:, :, None, :, None, :]
    x = jnp.broadcast_to(x, (b, f, 2, t, 2, c))
    return x.reshape(b, 2 * f, 2 * t, c)


class _ToMel(nn.Module):
    """BN -> LReLU -> 1x1 conv -> tanh head (reference generator.py:208-225)."""

    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = True) -> jax.Array:
        x = batch_norm(train, "norm", self.dtype)(x)
        x = leaky_relu(x)
        x = nn.Conv(1, (1, 1), dtype=self.dtype, name="conv")(x)
        return jnp.tanh(x)[..., 0]  # (B, F, T)


class Decoder(nn.Module):
    """Synthesizes normalized log-mels at 3 scales with visual-context
    attention after the first two stages (reference generator.py:194-265)."""

    noise_dim: int = 128
    base_bins: int = 20
    attention_dim: int = 256
    attention_inner: int = 1280
    use_pallas_attention: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        sent: jax.Array,
        phon: jax.Array,
        lengths: jax.Array,
        train: bool = True,
        noise: jax.Array | None = None,
    ) -> Tuple[jax.Array, jax.Array, jax.Array]:
        # sent: (B, T, 512), phon: (B, S, 512), lengths: (B,)
        #
        # NOTE the role split (reference generator.py:245-256, called as
        # gen(sent, phon) at train.py:174): the per-frame PHON features are
        # tiled over the 20 coarse freq bins as the synthesis input, while
        # the SENT context feeds the cross-attention keys/values.
        b, t, c = phon.shape
        f = self.base_bins

        # Tile phoneme features over the 20 coarse freq bins and concat
        # Gaussian noise (reference generator.py:248-250).  ``noise`` may be
        # injected explicitly (parity tests, deterministic inference).
        x = jnp.broadcast_to(phon[:, None, :, :], (b, f, t, c))
        if noise is None:
            noise = jax.random.normal(
                self.make_rng("noise"), (b, f, t, self.noise_dim), self.dtype
            )
        x = jnp.concatenate([x, noise.astype(x.dtype)], axis=-1)

        # Bottleneck: 640 -> 512 -> 256 -> 256 at (20, T).
        for i, ch in enumerate((512, 256, 256)):
            x = GenResBlk(ch, dtype=self.dtype, name=f"decode_{i}")(x, train)

        # Stage 1 at (20, T): -> 128.
        for i, ch in enumerate((128, 128, 128)):
            x = GenResBlk(ch, dtype=self.dtype, name=f"g1_{i}")(x, train)
        g1 = x

        c1 = AVAttention(
            self.attention_dim,
            self.attention_inner,
            use_pallas=self.use_pallas_attention,
            name="att1",
        )(sent, g1, lengths)  # (B, 20, T, 64)
        x = nn.Conv(128, (5, 5), padding=2, dtype=self.dtype, name="attconv1")(
            jnp.concatenate([x, c1], axis=-1)
        )

        # Stage 2 upsamples to (40, 2T): -> 64.
        x = GenResBlk(64, upsample=True, dtype=self.dtype, name="g2_0")(x, train)
        x = GenResBlk(64, dtype=self.dtype, name="g2_1")(x, train)
        x = GenResBlk(64, dtype=self.dtype, name="g2_2")(x, train)
        g2 = x

        c2 = AVAttention(
            self.attention_dim,
            self.attention_inner,
            use_pallas=self.use_pallas_attention,
            name="att2",
        )(sent, g2, lengths)  # (B, 40, 2T, 32)
        x = nn.Conv(64, (5, 5), padding=2, dtype=self.dtype, name="attconv2")(
            jnp.concatenate([x, c2], axis=-1)
        )

        # Stage 3 upsamples to (80, 4T): -> 32.
        x = GenResBlk(32, upsample=True, dtype=self.dtype, name="g3_0")(x, train)
        x = GenResBlk(32, dtype=self.dtype, name="g3_1")(x, train)
        x = GenResBlk(32, dtype=self.dtype, name="g3_2")(x, train)

        mel1 = _ToMel(dtype=self.dtype, name="to_mel1")(g1, train)  # (B, 20, T)
        mel2 = _ToMel(dtype=self.dtype, name="to_mel2")(g2, train)  # (B, 40, 2T)
        mel3 = _ToMel(dtype=self.dtype, name="to_mel3")(x, train)  # (B, 80, 4T)
        return mel1, mel2, mel3


class Postnet(nn.Module):
    """Mel -> 321-bin linear-magnitude refiner (reference generator.py:173-192).

    Input (B, 80, T) normalized mel; output (B, 321, T) linear magnitudes.
    Internally time-major (B, T, C) so convs run along time with channels on
    the lane dimension.
    """

    channels: int = 256
    linear_bins: int = 321
    dtype: jnp.dtype = jnp.float32
    fold_bn: bool = False  # serving: conv_in->bn_in pre-folded (nn/fold.py)

    @nn.compact
    def __call__(self, mel: jax.Array, train: bool = True) -> jax.Array:
        assert not (self.fold_bn and train), "fold_bn is an eval-only mode"
        x = jnp.swapaxes(mel, 1, 2)  # (B, T, 80)
        x = nn.Conv(128, (7,), padding=3, dtype=self.dtype, name="conv_in")(x)
        if not self.fold_bn:
            x = batch_norm(train, "bn_in", self.dtype)(x)
        x = leaky_relu(x)
        x = ResBlk1D(self.channels, dtype=self.dtype, name="res1")(x)
        x = ResBlk1D(self.channels, dtype=self.dtype, name="res2")(x)
        x = ResBlk1D(self.channels, dtype=self.dtype, name="res3")(x)
        x = nn.Conv(
            self.linear_bins, (1,), use_bias=False, dtype=self.dtype, name="conv_out"
        )(x)
        return jnp.swapaxes(x, 1, 2)  # (B, 321, T)
