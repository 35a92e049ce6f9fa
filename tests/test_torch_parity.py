"""Numerical parity: reference PyTorch modules vs vcagan JAX modules.

Builds the REFERENCE implementation (imported in place from
/root/reference), converts its randomly-initialized weights through
tools/convert_torch_ckpt.py, runs both frameworks on identical inputs, and
compares outputs.  This validates both the converter and the faithfulness
of every reimplemented module, end to end, without needing the real
pretrained checkpoints.
"""

import os
import sys

import numpy as np
import pytest

REFERENCE = "/root/reference"
pytestmark = pytest.mark.skipif(
    not os.path.isdir(REFERENCE), reason="reference repo not mounted"
)

sys.path.insert(0, REFERENCE)
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from tools.convert_torch_ckpt import (  # noqa: E402
    convert_decoder,
    convert_discriminator,
    convert_postnet,
    convert_sync_discriminator,
    convert_visual_front,
)

TOL = dict(rtol=2e-4, atol=2e-4)


@pytest.fixture(autouse=True)
def _no_cuda(monkeypatch):
    monkeypatch.setattr(torch.Tensor, "cuda", lambda self, *a, **k: self)
    torch.manual_seed(0)
    torch.set_grad_enabled(False)


def test_visual_front_parity():
    from src.models.visual_front import Visual_front

    from vcagan.nn import VisualFront

    ref = Visual_front(in_channels=1).eval()
    variables = convert_visual_front(ref.state_dict())

    b, t = 2, 6
    x = np.random.default_rng(0).standard_normal((b, 1, t, 112, 112)).astype(np.float32)
    phon_t, sent_t = ref(torch.from_numpy(x))

    mine = VisualFront()
    video = jnp.asarray(x.transpose(0, 2, 3, 4, 1))  # B,T,H,W,C
    phon_j, sent_j = mine.apply(variables, video, train=False)

    np.testing.assert_allclose(np.asarray(phon_j), phon_t.numpy(), **TOL)
    # reference sent is (B, 512, T); ours (B, T, 512)
    np.testing.assert_allclose(
        np.asarray(sent_j), sent_t.numpy().transpose(0, 2, 1), **TOL
    )


def test_postnet_parity():
    from src.models.generator import Postnet as RefPostnet

    from vcagan.nn import Postnet

    ref = RefPostnet().eval()
    variables = convert_postnet(ref.state_dict())

    b, t = 2, 32
    mel = np.random.default_rng(1).standard_normal((b, 1, 80, t)).astype(np.float32)
    out_t = ref(torch.from_numpy(mel))  # (B,1,321,T)

    out_j = Postnet().apply(variables, jnp.asarray(mel[:, 0]), train=False)
    np.testing.assert_allclose(np.asarray(out_j), out_t.numpy()[:, 0], **TOL)


@pytest.mark.parametrize("phase", ["1", "2", "3"])
def test_discriminator_parity(phase):
    from src.models.generator import Discriminator as RefDis

    from vcagan.nn import Discriminator

    ref = RefDis(phase=phase).eval()
    variables = convert_discriminator(ref.state_dict(), phase)

    b, t_vid = 2, 20
    bins = {"1": 20, "2": 40, "3": 80}[phase]
    frames = {"1": t_vid, "2": 2 * t_vid, "3": 4 * t_vid}[phase]
    rng = np.random.default_rng(2)
    mel = rng.standard_normal((b, 1, bins, frames)).astype(np.float32)
    sent = rng.standard_normal((b, 512, t_vid)).astype(np.float32)

    u_t, c_t = ref(torch.from_numpy(mel), torch.from_numpy(sent), t_vid)

    u_j, c_j = Discriminator(phase=phase).apply(
        variables,
        jnp.asarray(mel[:, 0, :, :, None]),
        jnp.asarray(sent.transpose(0, 2, 1)),
    )
    np.testing.assert_allclose(np.asarray(u_j), u_t.numpy(), **TOL)
    np.testing.assert_allclose(np.asarray(c_j), c_t.numpy(), **TOL)


@pytest.mark.parametrize("gen_mode", [False, True])
def test_sync_discriminator_parity(gen_mode):
    from src.models.generator import sync_Discriminator as RefSync

    from vcagan.nn import SyncDiscriminator

    ref = RefSync(temp=1.0).eval()
    variables = convert_sync_discriminator(ref.state_dict())

    b, s = 2, 12
    rng = np.random.default_rng(3)
    v_feat = rng.standard_normal((b, s, 512)).astype(np.float32)
    mel = rng.standard_normal((b, 1, 80, 4 * s)).astype(np.float32)

    loss_t = ref(torch.from_numpy(v_feat), torch.from_numpy(mel), gen=gen_mode)

    loss_j = SyncDiscriminator(temp=1.0).apply(
        variables,
        jnp.asarray(v_feat),
        jnp.asarray(mel[:, 0, :, :, None]),
        gen=gen_mode,
        train=False,
    )
    np.testing.assert_allclose(np.asarray(loss_j), loss_t.numpy(), **TOL)


def test_decoder_parity(monkeypatch):
    from src.models import generator as ref_gen_mod

    from vcagan.nn import Decoder

    ref = ref_gen_mod.Decoder().eval()
    variables = convert_decoder(ref.state_dict())

    b, t = 2, 12
    rng = np.random.default_rng(4)
    sent = rng.standard_normal((b, 512, t)).astype(np.float32)
    phon = rng.standard_normal((b, t, 512)).astype(np.float32)
    noise = rng.standard_normal((b, 128, 20, t)).astype(np.float32)
    lengths = np.asarray([t, t - 3])

    # pin the reference's internal noise draw to our fixed array
    monkeypatch.setattr(
        ref_gen_mod.torch, "randn", lambda *shape: torch.from_numpy(noise)
    )
    g1_t, g2_t, g3_t = ref(
        torch.from_numpy(sent), torch.from_numpy(phon), torch.from_numpy(lengths)
    )

    g1_j, g2_j, g3_j = Decoder().apply(
        variables,
        jnp.asarray(sent.transpose(0, 2, 1)),
        jnp.asarray(phon),
        jnp.asarray(lengths),
        train=False,
        noise=jnp.asarray(noise.transpose(0, 2, 3, 1)),  # B,F,T,C
    )
    np.testing.assert_allclose(np.asarray(g1_j), g1_t.numpy()[:, 0], **TOL)
    np.testing.assert_allclose(np.asarray(g2_j), g2_t.numpy()[:, 0], **TOL)
    np.testing.assert_allclose(np.asarray(g3_j), g3_t.numpy()[:, 0], **TOL)
