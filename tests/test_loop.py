"""End-to-end smoke: Trainer on synthetic data — fit a couple of steps,
validate with on-device vocoding + STOI, checkpoint round-trip."""

import tempfile

import jax
import numpy as np
import pytest

from vcagan.configs import grid_config
from vcagan.io import CheckpointManager
from vcagan.train.loop import Trainer


@pytest.fixture(scope="module")
def trainer(tmp_path_factory):
    log_dir = str(tmp_path_factory.mktemp("runs"))
    ckpt_dir = str(tmp_path_factory.mktemp("ckpt"))
    cfg = grid_config(
        **{
            "data.window_size": 20,
            "data.data_root": "/nonexistent",  # force synthetic
            "train.batch_size": 2,
            "train.eval_step": 0,  # no mid-fit validation
            "train.checkpoint_dir": ckpt_dir,
        }
    )
    return Trainer(cfg, log_dir=log_dir, use_mesh=True)


@pytest.mark.slow
class TestTrainerSmoke:
    def test_fit_two_steps(self, trainer):
        final = trainer.fit(epochs=1, max_steps=2)
        assert final >= 2
        assert int(trainer.state.step) >= 2

    def test_validate_returns_metrics(self, trainer):
        l1, stoi, estoi, _pesq = trainer.validate(fast=True, max_batches=1)
        assert np.isfinite(l1) and l1 > 0
        # untrained: STOI is low but must be a valid number in [-1, 1]
        assert -1.0 <= stoi <= 1.0
        assert -1.0 <= estoi <= 1.0

    def test_checkpoint_roundtrip(self, trainer):
        path = trainer.ckpt.save(trainer.state, epoch=0, stoi=0.5)
        restored = trainer.ckpt.restore(trainer.state, path)
        orig = jax.tree.leaves(trainer.state.g_params)[0]
        back = jax.tree.leaves(restored.g_params)[0]
        np.testing.assert_allclose(np.asarray(orig), np.asarray(back))
        # best pointer created (stoi improved over 0)
        assert trainer.ckpt.best() is not None
