"""Shared synthetic train-step fixture for the perf/analysis tools.

bench_train.py, fusion_tail.py and mfu_report.py all measure the same
compiled program; building its inputs in one place keeps them measuring
the same program when Batch fields or conventions change.

The fixture uses ``mel_len = 4*window`` deliberately: these are full
windows at the GRID train shape, where the reference's ``num_a_frames``
and ``4*window`` coincide (CLAUDE.md pins the general formula for real
clips; the tools only need a static representative shape).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def train_fixture(batch_size: int, window: int, bf16: bool, seed: int = 0):
    """Returns (modules, cfg, g_tx, d_tx, state, batch) at the GRID
    train shape: batch x window 112^2 gray frames, 4*window mel/spec."""
    from vcagan.configs import ModelConfig, TrainConfig
    from vcagan.train import Batch, VCAGANModules, create_train_state
    from vcagan.train.state import make_optimizer

    modules = VCAGANModules.create(ModelConfig(use_bfloat16=bf16))
    cfg = TrainConfig()

    def mk():
        return make_optimizer(
            cfg.lr, cfg.weight_decay, cfg.amsgrad,
            cfg.lr_milestones, cfg.lr_gamma, 100,
        )

    state, _, _ = create_train_state(jax.random.PRNGKey(seed), modules, cfg, 100)
    rng = np.random.default_rng(seed)
    batch = Batch(
        video=jnp.asarray(
            rng.standard_normal((batch_size, window, 112, 112, 1)), jnp.float32
        ),
        mel=jnp.asarray(
            np.clip(rng.standard_normal((batch_size, 80, 4 * window)), -1, 1),
            jnp.float32,
        ),
        spec=jnp.asarray(
            np.abs(rng.standard_normal((batch_size, 321, 4 * window))),
            jnp.float32,
        ),
        vid_len=jnp.full((batch_size,), window, jnp.int32),
        mel_len=jnp.full((batch_size,), 4 * window, jnp.int32),
    )
    return modules, cfg, mk(), mk(), state, batch
