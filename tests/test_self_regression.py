"""Numerical self-regression: model outputs under fixed seeds must not
drift across refactors (catches silent semantic changes that shape tests
and reference parity — which needs /root/reference mounted — would miss
when the reference is absent)."""

import os

import jax
import jax.numpy as jnp
import numpy as np

from vcagan.train import VCAGANModules

FIXTURE = os.path.join(os.path.dirname(__file__), "fixtures", "self_regression.npz")


def test_generator_side_outputs_stable():
    golden = np.load(FIXTURE)

    modules = VCAGANModules.create()
    params, stats = modules.init_all(
        jax.random.PRNGKey(0), batch_size=1, video_frames=20, image_size=48
    )
    video = jnp.asarray(
        np.random.default_rng(99).standard_normal((1, 20, 48, 48, 1)), jnp.float32
    )
    phon, sent = modules.v_front.apply(
        {"params": params["v_front"], "batch_stats": stats["v_front"]},
        video,
        train=False,
    )
    lens = jnp.asarray([20], jnp.int32)
    g1, g2, g3 = modules.gen.apply(
        {"params": params["gen"], "batch_stats": stats["gen"]},
        sent,
        phon,
        lens,
        train=False,
        rngs={"noise": jax.random.PRNGKey(5)},
    )
    gs = modules.post.apply(
        {"params": params["post"], "batch_stats": stats["post"]}, g3, train=False
    )

    for name, got in [
        ("phon", phon), ("sent", sent),
        ("g1", g1), ("g2", g2), ("g3", g3), ("gs", gs),
    ]:
        np.testing.assert_allclose(
            np.asarray(got), golden[name], rtol=1e-4, atol=1e-4,
            err_msg=f"{name} drifted from the recorded golden output",
        )
