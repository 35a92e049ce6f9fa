"""Bidirectional multi-layer GRU, TPU-shaped.

Replaces the reference's cuDNN ``nn.GRU(512, 512, 2, bidirectional=True,
dropout=0.3)`` (reference: visual_front.py:20).  The recurrence is the only
inherently sequential piece of the whole model, so it is factored to keep
the MXU busy:

- the input projection for ALL timesteps is hoisted out of the scan into a
  single (B*T, C) x (C, 3H) matmul;
- the ``lax.scan`` body does just one (B, H) x (H, 3H) matmul plus fused
  gate arithmetic;
- the backward direction reuses the same scan with ``reverse=True`` —
  no data flipping.

Gate math follows the torch convention so reference checkpoints can be
converted weight-for-weight:
    r = sigmoid(x W_ir + b_ir + h W_hr + b_hr)
    z = sigmoid(x W_iz + b_iz + h W_hz + b_hz)
    n = tanh(x W_in + b_in + r * (h W_hn + b_hn))
    h' = (1 - z) * n + z * h
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn


def _uniform_init(hidden: int):
    bound = 1.0 / jnp.sqrt(hidden)
    return nn.initializers.uniform(scale=2 * bound)  # then shifted below


class _GRUDirection(nn.Module):
    """One direction of one GRU layer."""

    hidden: int
    reverse: bool = False
    unroll: int = 8  # scan unrolling: fewer sequential dispatch points

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        # x: (B, T, C) -> (B, T, H)
        batch, _, in_dim = x.shape
        h = self.hidden
        k = 1.0 / jnp.sqrt(h)
        init = nn.initializers.uniform(scale=2.0)

        def u(key, shape):  # U(-k, k), torch's default GRU init
            return (init(key, shape) - 1.0) * k

        w_i = self.param("w_i", u, (in_dim, 3 * h))
        w_h = self.param("w_h", u, (h, 3 * h))
        b_i = self.param("b_i", u, (3 * h,))
        b_h = self.param("b_h", u, (3 * h,))

        # Hoisted input projection: one big MXU matmul for every timestep.
        x_proj = x @ w_i + b_i  # (B, T, 3H)
        x_proj = jnp.swapaxes(x_proj, 0, 1)  # (T, B, 3H) scan over leading axis

        def step(h_prev, xp):
            hp = h_prev @ w_h + b_h  # (B, 3H)
            xr, xz, xn = jnp.split(xp, 3, axis=-1)
            hr, hz, hn = jnp.split(hp, 3, axis=-1)
            r = jax.nn.sigmoid(xr + hr)
            z = jax.nn.sigmoid(xz + hz)
            n = jnp.tanh(xn + r * hn)
            h_new = (1.0 - z) * n + z * h_prev
            return h_new, h_new

        h0 = jnp.zeros((batch, h), x.dtype)
        _, ys = jax.lax.scan(
            step, h0, x_proj, reverse=self.reverse, unroll=self.unroll
        )
        return jnp.swapaxes(ys, 0, 1)  # (B, T, H)


class BiGRU(nn.Module):
    """Stacked bidirectional GRU with inter-layer dropout (torch semantics:
    dropout after every layer except the last)."""

    hidden: int = 512
    num_layers: int = 2
    dropout: float = 0.3
    unroll: int = 8

    @nn.compact
    def __call__(
        self, x: jax.Array, train: bool = True
    ) -> jax.Array:
        # x: (B, T, C) -> (B, T, 2H)
        for layer in range(self.num_layers):
            fwd = _GRUDirection(
                self.hidden, reverse=False, unroll=self.unroll,
                name=f"l{layer}_fwd",
            )(x)
            bwd = _GRUDirection(
                self.hidden, reverse=True, unroll=self.unroll,
                name=f"l{layer}_bwd",
            )(x)
            x = jnp.concatenate([fwd, bwd], axis=-1)
            if train and self.dropout > 0 and layer < self.num_layers - 1:
                x = nn.Dropout(self.dropout, deterministic=False)(x)
        return x
