"""Bundle of the seven VCA-GAN modules and their initialization.

The reference constructs v_front / gen / post / dis1..3 / s_dis as separate
``nn.Module`` objects (reference: train.py:70-76); here they live in one
static container with a single ``init_all`` that returns the params and
batch-stats trees keyed by module name.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp

from vcagan.configs import ModelConfig, VCAGANConfig
from vcagan.nn import (
    Decoder,
    Discriminator,
    Postnet,
    SyncDiscriminator,
    VisualFront,
)

GENERATOR_SIDE = ("v_front", "gen", "post")
DISCRIMINATOR_SIDE = ("dis1", "dis2", "dis3", "s_dis")


@dataclasses.dataclass(frozen=True)
class VCAGANModules:
    v_front: VisualFront
    gen: Decoder
    post: Postnet
    dis1: Discriminator
    dis2: Discriminator
    dis3: Discriminator
    s_dis: SyncDiscriminator

    @classmethod
    def create(
        cls,
        config: ModelConfig | None = None,
        fold_bn: bool = False,
        fused_blocks: bool = False,
    ) -> "VCAGANModules":
        """``fold_bn=True`` builds the eval-only serving variant whose
        conv->BN pairs are pre-folded into biased convs; apply it with
        params transformed by ``vcagan.nn.fold.fold_generator_side``.
        ``fused_blocks=True`` (requires fold_bn) additionally runs the
        trunk's stride-1 ResNet blocks as single Pallas kernels
        (vcagan.kernels.fused_block)."""
        if fused_blocks and not fold_bn:
            raise ValueError("fused_blocks requires fold_bn=True (serving mode)")
        m = config or ModelConfig()
        dtype = jnp.bfloat16 if m.use_bfloat16 else jnp.float32
        return cls(
            v_front=VisualFront(
                stem_channels=m.stem_channels,
                feature_dim=m.feature_dim,
                gru_hidden=m.gru_hidden,
                gru_layers=m.gru_layers,
                gru_dropout=m.gru_dropout,
                frontend_dropout=m.frontend_dropout,
                dtype=dtype,
                fold_bn=fold_bn,
                fused=fused_blocks,
            ),
            gen=Decoder(
                noise_dim=m.noise_dim,
                base_bins=m.mel_base_bins,
                attention_dim=m.attention_dim,
                attention_inner=m.attention_inner,
                dtype=dtype,
            ),
            post=Postnet(
                channels=m.postnet_channels,
                linear_bins=m.linear_bins,
                dtype=dtype,
                fold_bn=fold_bn,
            ),
            dis1=Discriminator(
                phase="1",
                base_channels=m.disc_base_channels,
                max_channels=m.disc_max_channels,
                dtype=dtype,
            ),
            dis2=Discriminator(
                phase="2",
                base_channels=m.disc_base_channels,
                max_channels=m.disc_max_channels,
                dtype=dtype,
            ),
            dis3=Discriminator(
                phase="3",
                base_channels=m.disc_base_channels,
                max_channels=m.disc_max_channels,
                dtype=dtype,
            ),
            s_dis=SyncDiscriminator(temp=m.sync_temp, dtype=dtype),
        )

    def init_all(
        self,
        rng: jax.Array,
        batch_size: int = 2,
        video_frames: int = 20,  # discriminator minimum window
        image_size: int = 48,
        n_mels: int = 80,
    ) -> Tuple[Dict[str, Any], Dict[str, Any]]:
        """Initialize every module on tiny dummy shapes.

        Returns (params, batch_stats), each a dict keyed by module name.
        Shapes are polymorphic: convs/GRUs/attention are size-agnostic, so
        initializing at (2, 8) frames yields params valid for any (B, T).
        """
        import functools

        b, t = batch_size, video_frames
        keys = jax.random.split(rng, 8)
        rngs = lambda k: {"params": k, "dropout": keys[7], "noise": keys[7]}

        video = jnp.zeros((b, t, image_size, image_size, 1))
        sent = jnp.zeros((b, t, 512))
        phon = jnp.zeros((b, t, 512))
        lengths = jnp.full((b,), t, jnp.int32)
        mel3 = jnp.zeros((b, n_mels, 4 * t))
        mel1 = jnp.zeros((b, 20, t, 1))
        mel2 = jnp.zeros((b, 40, 2 * t, 1))
        mel3c = jnp.zeros((b, n_mels, 4 * t, 1))

        # Every init is jitted: unjitted flax init dispatches thousands of
        # tiny ops, which is pathological on remote/tunneled TPU backends.
        def jinit(module, *args, **static_kwargs):
            return jax.jit(functools.partial(module.init, **static_kwargs))(*args)

        variables = {
            "v_front": jinit(self.v_front, rngs(keys[0]), video, train=False),
            "gen": jinit(
                self.gen, rngs(keys[1]), sent, phon, lengths, train=False
            ),
            "post": jinit(self.post, rngs(keys[2]), mel3, train=False),
            "dis1": jinit(self.dis1, rngs(keys[3]), mel1, sent),
            "dis2": jinit(self.dis2, rngs(keys[4]), mel2, sent),
            "dis3": jinit(self.dis3, rngs(keys[5]), mel3c, sent),
            "s_dis": jinit(
                self.s_dis, rngs(keys[6]), phon, mel3c, gen=False, train=False
            ),
        }
        params = {k: v["params"] for k, v in variables.items()}
        batch_stats = {
            k: v.get("batch_stats", {}) for k, v in variables.items()
        }
        return params, batch_stats


def modules_from_config(config: VCAGANConfig) -> VCAGANModules:
    return VCAGANModules.create(config.model)
