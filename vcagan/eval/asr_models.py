"""ASR evaluation models: GRID char recognizer + LRW word classifier.

Capability parity with the reference's independent evaluation stacks
(SURVEY.md §2.5):
- GRID: Audio_front 32/64ch k5 -> 256-d per-step features
  (ASR_model/GRID/src/models/audio_front.py:11-25), 2-layer biGRU(256) +
  Linear(512 -> 28) over 27 chars + blank (classifier.py:3-16); greedy
  decode + WER/CER happen in vcagan.eval.text.
- LRW: Audio_front 128/256ch -> 512-d (identical to the main audio front),
  2-layer biGRU(512) + time-mean + Linear(1024 -> 500)
  (ASR_model/LRW/src/models/classifier.py:4-24).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from vcagan.nn.audio_front import AudioFront
from vcagan.nn.gru import BiGRU


class GridASR(nn.Module):
    """Normalized mel (B, 80, T_mel, 1) -> per-step char logits (B, T_mel/4, 28)."""

    vocab_size: int = 28

    @nn.compact
    def __call__(self, mel: jax.Array, train: bool = False) -> jax.Array:
        feats = AudioFront(
            ch1=32, ch2=64, out_dim=256, kernel=5, res_relu_type="prelu",
            name="audio_front",
        )(mel, train)
        x = BiGRU(hidden=256, num_layers=2, dropout=0.3, name="gru")(feats, train)
        return nn.Dense(self.vocab_size, name="fc")(x)


class LRWClassifier(nn.Module):
    """Normalized mel (B, 80, T_mel, 1) -> 500-way word logits (B, 500)."""

    num_classes: int = 500

    @nn.compact
    def __call__(self, mel: jax.Array, train: bool = False) -> jax.Array:
        feats = AudioFront(
            ch1=128, ch2=256, out_dim=512, kernel=3, name="audio_front"
        )(mel, train)
        x = BiGRU(hidden=512, num_layers=2, dropout=0.3, name="gru")(feats, train)
        x = jnp.mean(x, axis=1)
        return nn.Dense(self.num_classes, name="fc")(x)
