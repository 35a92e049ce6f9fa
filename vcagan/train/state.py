"""Train state: two optimizer chains over disjoint parameter sides.

Reproduces the reference optimization setup (train.py:78-89):
- G optimizer over {v_front, gen, post}, D optimizer over {dis1..3, s_dis}
- Adam with amsgrad (GRID) / plain Adam (LRS), torch-style coupled weight
  decay (decay added to the gradient BEFORE the moment updates)
- MultiStep LR decay per epoch

Unlike the reference checkpoint format, optimizer state is part of the
train state and IS checkpointed (the reference silently restarts Adam
moments on resume — SURVEY.md §5).
"""

from __future__ import annotations

from typing import Any, Dict, Sequence

import jax
from flax import struct
import optax

from vcagan.configs import TrainConfig
from vcagan.train.models import VCAGANModules


@struct.dataclass
class GANTrainState:
    step: jax.Array
    g_params: Dict[str, Any]
    d_params: Dict[str, Any]
    batch_stats: Dict[str, Any]
    g_opt_state: optax.OptState
    d_opt_state: optax.OptState


def make_optimizer(
    lr: float,
    weight_decay: float,
    amsgrad: bool,
    milestones: Sequence[int],
    gamma: float,
    steps_per_epoch: int,
) -> optax.GradientTransformation:
    from vcagan.train.schedule import multistep_schedule

    schedule = multistep_schedule(lr, milestones, gamma, steps_per_epoch)
    moments = (
        optax.scale_by_amsgrad() if amsgrad else optax.scale_by_adam()
    )
    return optax.chain(
        # torch-style coupled weight decay: applied to the raw gradient,
        # then run through the Adam moments (train.py:82-83 semantics).
        optax.add_decayed_weights(weight_decay),
        moments,
        optax.scale_by_learning_rate(schedule),
    )


def create_train_state(
    rng: jax.Array,
    modules: VCAGANModules,
    config: TrainConfig | None = None,
    steps_per_epoch: int = 1,
) -> tuple[GANTrainState, optax.GradientTransformation, optax.GradientTransformation]:
    """Initialize params + both optimizers.  Returns (state, g_tx, d_tx)."""
    import jax.numpy as jnp

    from vcagan.train.models import DISCRIMINATOR_SIDE, GENERATOR_SIDE

    cfg = config or TrainConfig()
    params, batch_stats = modules.init_all(rng)
    g_params = {k: params[k] for k in GENERATOR_SIDE}
    d_params = {k: params[k] for k in DISCRIMINATOR_SIDE}

    g_tx = make_optimizer(
        cfg.lr, cfg.weight_decay, cfg.amsgrad, cfg.lr_milestones, cfg.lr_gamma,
        steps_per_epoch,
    )
    d_tx = make_optimizer(
        cfg.lr, cfg.weight_decay, cfg.amsgrad, cfg.lr_milestones, cfg.lr_gamma,
        steps_per_epoch,
    )
    state = GANTrainState(
        step=jnp.zeros((), jnp.int32),
        g_params=g_params,
        d_params=d_params,
        batch_stats=batch_stats,
        g_opt_state=g_tx.init(g_params),
        d_opt_state=d_tx.init(d_params),
    )
    return state, g_tx, d_tx
