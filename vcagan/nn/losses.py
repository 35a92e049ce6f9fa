"""GAN losses: non-saturating softplus loss and the R1 gradient penalty.

Reference: src/models/generator.py:363-366 (gan_loss) and the driver-side R1
computation via ``torch.autograd.grad`` on real mel inputs
(train.py:188-194).  In JAX the R1 penalty is ``jax.grad`` of the real-logit
sum w.r.t. the inputs — differentiated again w.r.t. discriminator params by
the surrounding ``value_and_grad``, i.e. the same second-order computation
without retain_graph bookkeeping.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp


def gan_loss(logits: jax.Array, real: bool) -> jax.Array:
    """softplus(-x) for real targets, softplus(x) for fake (non-saturating)."""
    sign = -1.0 if real else 1.0
    return jnp.mean(jax.nn.softplus(sign * logits))


def r1_penalty(
    logit_fn: Callable[[jax.Array], jax.Array], x: jax.Array
) -> jax.Array:
    """mean over batch of ||d sum(logits) / d x||^2.

    ``logit_fn`` maps the (real) input batch to per-sample logits; the
    penalty matches reference train.py:188-194: grad of the logit sum,
    squared L2 norm per sample, batch mean.
    """
    grads = jax.grad(lambda inp: jnp.sum(logit_fn(inp)))(x)
    flat = grads.reshape(grads.shape[0], -1)
    return jnp.mean(jnp.sum(flat * flat, axis=1))
