"""Bidirectional multi-layer GRU, TPU-shaped.

Replaces the reference's cuDNN ``nn.GRU(512, 512, 2, bidirectional=True,
dropout=0.3)`` (reference: visual_front.py:20).  The recurrence is the only
inherently sequential piece of the whole model, so it is factored to keep
the MXU busy:

- the input projection for ALL timesteps is hoisted out of the scan into a
  single (B*T, C) x (C, 3H) matmul;
- BOTH directions of a layer run in ONE scan: the backward direction's
  inputs are time-reversed and stacked on a direction axis, so each scan
  step does a single (2, B, H) x (2, H, 3H) batched matmul instead of two
  sequential passes — half the sequential depth of a naive bi-RNN;
- the scan is partially unrolled to amortize loop overhead.

Gate math follows the torch convention so reference checkpoints convert
weight-for-weight:
    r = sigmoid(x W_ir + b_ir + h W_hr + b_hr)
    z = sigmoid(x W_iz + b_iz + h W_hz + b_hz)
    n = tanh(x W_in + b_in + r * (h W_hn + b_hn))
    h' = (1 - z) * n + z * h
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn


class _BiGRULayer(nn.Module):
    """One bidirectional layer; both directions share a single scan."""

    hidden: int
    unroll: int = 8

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        # x: (B, T, C) -> (B, T, 2H)
        batch, t, in_dim = x.shape
        h = self.hidden
        k = 1.0 / jnp.sqrt(h)
        init = nn.initializers.uniform(scale=2.0)

        def u(key, shape):  # U(-k, k), torch's default GRU init
            return (init(key, shape) - 1.0) * k

        # Parameter names keep the per-direction layout
        # (l{i}_fwd/l{i}_bwd) used by the torch-checkpoint converter.
        p = {}
        for d in ("fwd", "bwd"):
            p[d] = {
                "w_i": self.param(f"{d}_w_i", u, (in_dim, 3 * h)),
                "w_h": self.param(f"{d}_w_h", u, (h, 3 * h)),
                "b_i": self.param(f"{d}_b_i", u, (3 * h,)),
                "b_h": self.param(f"{d}_b_h", u, (3 * h,)),
            }

        w_h = jnp.stack([p["fwd"]["w_h"], p["bwd"]["w_h"]])  # (2, H, 3H)
        b_h = jnp.stack([p["fwd"]["b_h"], p["bwd"]["b_h"]])  # (2, 3H)

        # Hoisted input projections, bwd direction time-reversed so both
        # directions advance together in one scan.
        xf = x @ p["fwd"]["w_i"] + p["fwd"]["b_i"]  # (B, T, 3H)
        xb = x[:, ::-1] @ p["bwd"]["w_i"] + p["bwd"]["b_i"]
        xs = jnp.stack([xf, xb], axis=0)  # (2, B, T, 3H)
        xs = jnp.moveaxis(xs, 2, 0)  # (T, 2, B, 3H)

        def step(h_prev, xp):
            # h_prev: (2, B, H); xp: (2, B, 3H)
            hp = jnp.einsum("dbh,dhk->dbk", h_prev, w_h) + b_h[:, None, :]
            xr, xz, xn = jnp.split(xp, 3, axis=-1)
            hr, hz, hn = jnp.split(hp, 3, axis=-1)
            r = jax.nn.sigmoid(xr + hr)
            z = jax.nn.sigmoid(xz + hz)
            n = jnp.tanh(xn + r * hn)
            h_new = (1.0 - z) * n + z * h_prev
            return h_new, h_new

        h0 = jnp.zeros((2, batch, h), x.dtype)
        _, ys = jax.lax.scan(step, h0, xs, unroll=self.unroll)
        # ys: (T, 2, B, H) -> fwd (B, T, H) + bwd re-reversed
        fwd = jnp.moveaxis(ys[:, 0], 0, 1)
        bwd = jnp.moveaxis(ys[:, 1], 0, 1)[:, ::-1]
        return jnp.concatenate([fwd, bwd], axis=-1)


class BiGRU(nn.Module):
    """Stacked bidirectional GRU with inter-layer dropout (torch semantics:
    dropout after every layer except the last)."""

    hidden: int = 512
    num_layers: int = 2
    dropout: float = 0.3
    unroll: int = 8

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = True) -> jax.Array:
        # x: (B, T, C) -> (B, T, 2H)
        # The recurrence stays fp32 regardless of the surrounding compute
        # dtype: it is sequential (rounding compounds over T steps), costs
        # ~0.6 ms/step (profile note in CLAUDE.md), and its params are fp32
        # — a bf16 carry would also break the scan's carry-dtype invariant.
        x = x.astype(jnp.float32)
        for layer in range(self.num_layers):
            x = _BiGRULayer(
                self.hidden, unroll=self.unroll, name=f"l{layer}"
            )(x)
            if train and self.dropout > 0 and layer < self.num_layers - 1:
                x = nn.Dropout(self.dropout, deterministic=False)(x)
        return x
