"""LRW ASR checkpoint-converter parity: reference torch modules vs
LRWClassifier through tools/convert_torch_ckpt.convert_lrw_asr.

Builds the reference ASR_model/LRW Audio_front + Backend in place with
random weights, converts them, and pins the 500-way logits to 2e-4 —
same discipline as tests/test_torch_parity.py for the GAN modules.
"""

import importlib.util
import os
import sys

import numpy as np
import pytest

REFERENCE = "/root/reference"
pytestmark = pytest.mark.skipif(
    not os.path.isdir(REFERENCE), reason="reference repo not mounted"
)

# the LRW audio_front does `from src.models.resnet import BasicBlock`;
# the main reference tree's copy is identical in everything BasicBlock uses
sys.path.insert(0, REFERENCE)
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from tools.convert_torch_ckpt import convert_lrw_asr  # noqa: E402

TOL = dict(rtol=2e-4, atol=2e-4)


def _load(path, name):
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture(scope="module")
def ref_modules():
    torch.manual_seed(0)
    af_mod = _load(
        f"{REFERENCE}/ASR_model/LRW/src/models/audio_front.py", "lrw_audio_front"
    )
    cls_mod = _load(
        f"{REFERENCE}/ASR_model/LRW/src/models/classifier.py", "lrw_classifier"
    )
    front = af_mod.Audio_front(in_channels=1).eval()
    back = cls_mod.Backend(logits=True).eval()
    return front, back


def test_lrw_logits_parity(ref_modules):
    from vcagan.eval.asr_models import LRWClassifier

    front, back = ref_modules
    variables = convert_lrw_asr(front.state_dict(), back.state_dict())

    b, t_mel = 2, 116  # the LRW fixed 29-frame clips (vid_aud_lrw_test.py:76)
    mel = np.random.default_rng(0).standard_normal((b, 1, 80, t_mel)).astype(
        np.float32
    )
    with torch.no_grad():
        logits_t = back(front(torch.from_numpy(mel))).numpy()

    model = LRWClassifier(num_classes=500)
    logits_j = np.asarray(
        model.apply(variables, jnp.asarray(mel[:, 0, :, :, None]), train=False)
    )
    assert logits_j.shape == logits_t.shape == (b, 500)
    np.testing.assert_allclose(logits_j, logits_t, **TOL)


def test_lrw_feature_parity(ref_modules):
    """Audio_front features alone (isolates frontend from GRU)."""
    from vcagan.eval.asr_models import LRWClassifier

    front, back = ref_modules
    variables = convert_lrw_asr(front.state_dict(), back.state_dict())

    mel = np.random.default_rng(1).standard_normal((1, 1, 80, 116)).astype(
        np.float32
    )
    with torch.no_grad():
        feats_t = front(torch.from_numpy(mel)).numpy()  # (B, T/4, 512)

    from vcagan.nn.audio_front import AudioFront

    af = AudioFront(ch1=128, ch2=256, out_dim=512, kernel=3)
    feats_j = np.asarray(
        af.apply(
            {
                "params": variables["params"]["audio_front"],
                "batch_stats": variables["batch_stats"]["audio_front"],
            },
            jnp.asarray(mel[:, 0, :, :, None]),
            train=False,
        )
    )
    np.testing.assert_allclose(feats_j, feats_t, **TOL)
