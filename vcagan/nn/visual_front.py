"""Visual frontend: 3D conv stem -> per-frame ResNet-18 -> biGRU context.

Capability parity with reference src/models/visual_front.py:4-37.
Layout is channels-last NDHWC: video (B, T, 112, 112, 1).

Outputs:
- ``phon``: per-frame "phoneme-level" features (B, T, 512)
- ``sent``: sentence-level context from the biGRU + projection (B, T, 512)

(The reference returns sent as (B, 512, T); this framework is uniformly
time-major.)
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from vcagan.nn.common import PReLU, batch_norm, s2d_stem_conv3d
from vcagan.nn.gru import BiGRU
from vcagan.nn.resnet import ResNetTrunk


class StemConv(nn.Module):
    """The reference's k(5,7,7) s(1,2,2) C_in=1 stem conv, computed via the
    exact space-to-depth rewrite (see common.s2d_stem_conv3d).  Parameter
    tree (``stem_conv/kernel``, shape (5,7,7,1,C)) and initialization are
    identical to the nn.Conv it replaces, so checkpoints and the torch
    converter are unaffected."""

    features: int
    dtype: jnp.dtype = jnp.float32
    use_bias: bool = False  # True only in fold_bn serving mode

    @nn.compact
    def __call__(self, video: jax.Array) -> jax.Array:
        kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (5, 7, 7, 1, self.features),
        )
        out = s2d_stem_conv3d(video, kernel, self.dtype)
        if self.use_bias:
            bias = self.param(
                "bias", nn.initializers.zeros, (self.features,)
            )
            out = out + bias.astype(out.dtype)
        return out


class VisualFront(nn.Module):
    stem_channels: int = 64
    feature_dim: int = 512
    gru_hidden: int = 512
    gru_layers: int = 2
    gru_dropout: float = 0.3
    frontend_dropout: float = 0.3
    dtype: jnp.dtype = jnp.float32
    fold_bn: bool = False  # serving: conv->BN pairs pre-folded (nn/fold.py)
    fused: bool = False  # serving: stride-1 ResNet blocks as one Pallas kernel

    @nn.compact
    def __call__(
        self, video: jax.Array, train: bool = True, remat_stem: bool = False
    ) -> Tuple[jax.Array, jax.Array]:
        assert not (self.fold_bn and train), "fold_bn is an eval-only mode"
        # video: (B, T, H, W, 1)
        b, t = video.shape[0], video.shape[1]

        # 3D stem: k(5,7,7) s(1,2,2) + BN + PReLU + maxpool (1,3,3)/(1,2,2)
        # (reference visual_front.py:10-15): 112 -> 56 -> 28.
        def _stem(mdl, v):
            y = StemConv(
                mdl.stem_channels,
                dtype=mdl.dtype,
                use_bias=mdl.fold_bn,
                name="stem_conv",
            )(v)
            if not mdl.fold_bn:
                y = batch_norm(train, "stem_bn", mdl.dtype)(y)
            y = PReLU(mdl.stem_channels, name="stem_act")(y)
            # NOTE: rewriting this pool as an elementwise max over the 9
            # strided window taps (to avoid select_and_scatter in the
            # backward, ~7.6 ms/step) was measured and REJECTED: that
            # backward materializes several (B,T,58,58,64) zero-padded grad
            # accumulators at 2x layout padding (~1 GB each at the GRID
            # train shape) and OOMs hbm; reduce_window's select_and_scatter
            # is the better memory/time trade on v5e.
            return nn.max_pool(
                y,
                window_shape=(1, 3, 3),
                strides=(1, 2, 2),
                padding=((0, 0), (1, 1), (1, 1)),
            )

        # The three 56x56x64 stem intermediates (conv/BN/PReLU outputs, BN
        # in fp32 even under bf16 compute) are the single largest residual
        # group in the train step (3x ~2 GB at bf16 batch 64).  The "stem"
        # remat site (train/step.py) checkpoints the whole chain so only
        # the 4x-smaller pooled output stays live; the backward recomputes
        # the cheap conv/BN/act/pool forward.  (A policy-based
        # save_anything_except_these_names remat over the whole visual
        # front was measured and REJECTED: forcing every OTHER intermediate
        # saveable more than doubled peak HBM, 12.8G -> >31G at b64.)
        stem = nn.remat(_stem) if remat_stem else _stem
        x = stem(self, video)

        # Per-frame trunk on a (B*T, 28, 28, 64) mega-batch.
        h, w, c = x.shape[2], x.shape[3], x.shape[4]
        x = x.reshape(b * t, h, w, c)
        x = ResNetTrunk(
            dtype=self.dtype, fold_bn=self.fold_bn, fused=self.fused,
            name="resnet",
        )(x, train)  # (B*T, 512)
        x = nn.Dropout(self.frontend_dropout, deterministic=not train)(x)
        phon = x.reshape(b, t, self.feature_dim)

        # Sentence context: 2-layer biGRU + Linear(1024 -> 512)
        # (reference visual_front.py:20-21,33-35).
        sent = BiGRU(
            hidden=self.gru_hidden,
            num_layers=self.gru_layers,
            dropout=self.gru_dropout,
            name="sentence_encoder",
        )(phon, train)
        sent = nn.Dense(self.feature_dim, name="fc")(sent)  # (B, T, 512)
        return phon, sent
