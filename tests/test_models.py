"""Model shape/behavior tests against the documented reference tensor shapes
(SURVEY.md §2.1: B,S,512 / B,512,T / B,1,{20,40,80},{T,2T,4T})."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vcagan.nn import (
    AudioFront,
    AVAttention,
    Decoder,
    Discriminator,
    Postnet,
    ResNetTrunk,
    SyncDiscriminator,
    VisualFront,
    gan_loss,
)

B, T = 2, 8  # tiny video: 8 frames


@pytest.fixture(scope="module")
def rngs():
    return {
        "params": jax.random.PRNGKey(0),
        "dropout": jax.random.PRNGKey(1),
        "noise": jax.random.PRNGKey(2),
    }


class TestVisualFront:
    def test_shapes(self, rngs):
        model = VisualFront()
        video = jnp.zeros((B, T, 112, 112, 1))
        variables = model.init(rngs, video, train=False)
        (phon, sent), _ = model.apply(
            variables, video, train=False, mutable=["batch_stats"]
        )
        assert phon.shape == (B, T, 512)
        assert sent.shape == (B, T, 512)

    def test_train_mode_updates_batch_stats(self, rngs):
        model = VisualFront()
        video = jax.random.normal(jax.random.PRNGKey(3), (B, T, 112, 112, 1))
        variables = model.init(rngs, video, train=False)
        _, updates = model.apply(
            variables,
            video,
            train=True,
            mutable=["batch_stats"],
            rngs={"dropout": jax.random.PRNGKey(4)},
        )
        before = variables["batch_stats"]["stem_bn"]["mean"]
        after = updates["batch_stats"]["stem_bn"]["mean"]
        assert not np.allclose(np.asarray(before), np.asarray(after))


class TestResNet:
    def test_trunk_output(self, rngs):
        trunk = ResNetTrunk()
        x = jnp.zeros((4, 28, 28, 64))
        variables = trunk.init({"params": rngs["params"]}, x, train=False)
        out = trunk.apply(variables, x, train=False)
        assert out.shape == (4, 512)


class TestDecoder:
    def test_three_scales(self, rngs):
        dec = Decoder()
        sent = jnp.zeros((B, T, 512))
        phon = jnp.zeros((B, T, 512))
        lengths = jnp.full((B,), T, jnp.int32)
        variables = dec.init(rngs, sent, phon, lengths, train=False)
        (m1, m2, m3), _ = dec.apply(
            variables,
            sent,
            phon,
            lengths,
            train=False,
            mutable=["batch_stats"],
            rngs={"noise": jax.random.PRNGKey(7)},
        )
        assert m1.shape == (B, 20, T)
        assert m2.shape == (B, 40, 2 * T)
        assert m3.shape == (B, 80, 4 * T)
        # tanh heads bound outputs
        assert float(jnp.abs(m3).max()) <= 1.0

    def test_noise_changes_output(self, rngs):
        dec = Decoder()
        sent = jax.random.normal(jax.random.PRNGKey(5), (B, T, 512))
        phon = jax.random.normal(jax.random.PRNGKey(6), (B, T, 512))
        lengths = jnp.full((B,), T, jnp.int32)
        variables = dec.init(rngs, sent, phon, lengths, train=False)

        def run(seed):
            (m1, _, _), _ = dec.apply(
                variables,
                sent,
                phon,
                lengths,
                train=False,
                mutable=["batch_stats"],
                rngs={"noise": jax.random.PRNGKey(seed)},
            )
            return np.asarray(m1)

        assert not np.allclose(run(0), run(1))


class TestAttention:
    def test_masking(self, rngs):
        att = AVAttention(out_dim=32, inner_dim=40)
        phon = jax.random.normal(jax.random.PRNGKey(0), (2, 6, 512))
        g = jax.random.normal(jax.random.PRNGKey(1), (2, 4, 6, 16))
        variables = att.init({"params": rngs["params"]}, phon, g, jnp.array([6, 6]))

        full = att.apply(variables, phon, g, jnp.array([3, 3]))
        # zeroing keys past the mask must not change the output
        phon_zeroed = phon.at[:, 3:].set(123.0)
        masked = att.apply(variables, phon_zeroed, g, jnp.array([3, 3]))
        np.testing.assert_allclose(
            np.asarray(full), np.asarray(masked), rtol=1e-5, atol=1e-5
        )


class TestPostnet:
    def test_shape(self, rngs):
        post = Postnet()
        mel = jnp.zeros((B, 80, 4 * T))
        variables = post.init({"params": rngs["params"]}, mel, train=False)
        out, _ = post.apply(variables, mel, train=False, mutable=["batch_stats"])
        assert out.shape == (B, 321, 4 * T)


class TestDiscriminators:
    # window of 20 video frames: the discriminator's minimum (its 5x5 VALID
    # head needs >= 5 time steps after downsampling)
    TD = 20

    @pytest.mark.parametrize(
        "phase,bins,frames",
        [("1", 20, TD), ("2", 40, 2 * TD), ("3", 80, 4 * TD)],
    )
    def test_scales(self, rngs, phase, bins, frames):
        dis = Discriminator(phase=phase)
        mel = jnp.zeros((B, bins, frames, 1))
        sent = jnp.zeros((B, self.TD, 512))
        variables = dis.init({"params": rngs["params"]}, mel, sent)
        u, c = dis.apply(variables, mel, sent)
        assert u.shape == (B, 1)
        assert c.shape == (B, 1)

    def test_sync_modes(self, rngs):
        sdis = SyncDiscriminator(temp=1.0)
        v_feat = jax.random.normal(jax.random.PRNGKey(0), (B, T, 512))
        mel = jax.random.normal(jax.random.PRNGKey(1), (B, 80, 4 * T, 1))
        variables = sdis.init(
            {"params": rngs["params"]}, v_feat, mel, gen=False, train=False
        )
        d_loss, _ = sdis.apply(
            variables, v_feat, mel, gen=False, train=False, mutable=["batch_stats"]
        )
        g_loss, _ = sdis.apply(
            variables, v_feat, mel, gen=True, train=False, mutable=["batch_stats"]
        )
        assert d_loss.shape == (B,)
        assert g_loss.shape == (B,)
        # gen-mode loss is 5 - |cos| in [4, 5]
        assert np.all(np.asarray(g_loss) >= 4.0) and np.all(np.asarray(g_loss) <= 5.0)


class TestAudioFront:
    def test_shape(self, rngs):
        af = AudioFront()
        mel = jnp.zeros((B, 80, 4 * T, 1))
        variables = af.init({"params": rngs["params"]}, mel, train=False)
        out, _ = af.apply(variables, mel, train=False, mutable=["batch_stats"])
        assert out.shape == (B, T, 512)


class TestLosses:
    def test_gan_loss_direction(self):
        strong_real = jnp.full((4, 1), 10.0)
        assert float(gan_loss(strong_real, real=True)) < 1e-3
        assert float(gan_loss(strong_real, real=False)) > 9.0
