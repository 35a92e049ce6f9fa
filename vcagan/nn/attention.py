"""Visual-context cross-attention (AVAttention).

Capability parity with reference src/models/generator.py:142-171: the
generator's spectrogram feature map queries the per-frame visual features;
keys/values are masked past each clip's true length; the attended context is
projected back to a (freq, channel) residual map.

Layouts (channels-last):
- ``phon``: (B, S, 512) visual features (S = video frames)
- ``g``:    (B, F, T, C) generator feature map; F*C == 2560 at both hook
  points (128*20 and 64*40), so one module shape serves both.
- output:  (B, F, T, inner_dim // F)

The masked softmax-attention core runs as a fused Pallas TPU kernel
(vcagan.kernels.masked_attention) with an XLA einsum fallback; both paths
are numerically identical and covered by tests.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from vcagan.kernels.masked_attention import masked_cross_attention


class AVAttention(nn.Module):
    out_dim: int = 256
    inner_dim: int = 1280  # 20 * 64 (reference generator.py:151-152)
    use_pallas: bool = True

    @nn.compact
    def __call__(
        self, phon: jax.Array, g: jax.Array, lengths: jax.Array
    ) -> jax.Array:
        b, f, t, c = g.shape
        k = nn.Dense(self.out_dim, name="k")(phon)  # (B, S, D)
        v = nn.Dense(self.out_dim, name="v")(phon)  # (B, S, D)

        q_in = jnp.transpose(g, (0, 2, 1, 3)).reshape(b, t, f * c)
        q = nn.Dense(self.out_dim, name="q")(q_in)  # (B, T, D)

        ctx = masked_cross_attention(
            q, k, v, lengths, use_pallas=self.use_pallas
        )  # (B, T, D)

        out = nn.Dense(self.inner_dim, name="mel")(ctx)  # (B, T, F*c_out)
        out = out.reshape(b, t, f, self.inner_dim // f)
        return jnp.transpose(out, (0, 2, 1, 3))  # (B, F, T, c_out)
