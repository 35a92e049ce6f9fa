"""Learning-rate schedules.

The reference uses ``MultiStepLR([500, 800], gamma=0.1)`` stepped per epoch
(reference: train.py:85-89,324-326).  Expressed here as a pure function of
the global step given a static steps-per-epoch, so it lives inside the
jitted update with no host-side scheduler object.
"""

from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp
import optax


def multistep_schedule(
    base_lr: float,
    milestones: Sequence[int],
    gamma: float,
    steps_per_epoch: int,
) -> optax.Schedule:
    miles = jnp.asarray(sorted(milestones), jnp.int32)

    def schedule(count):
        epoch = count // max(steps_per_epoch, 1)
        passed = jnp.sum(epoch >= miles)
        return base_lr * gamma ** passed.astype(jnp.float32)

    return schedule
