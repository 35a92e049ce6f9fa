"""Inverse (synthesis) DSP chain: reference torch implementation IN PLACE
vs vcagan.dsp, waveform for waveform.

Round 2 pinned the analysis direction (waveform -> mel) against an
independent numpy recomputation; this file pins the synthesis direction —
``STFT.inverse`` with window-sumsquare correction (reference
src/data/stft.py:100-129), ``griffin_lim`` (audio_processing.py:51-68),
``inverse_mel``'s transpose-pseudo-inverse x1000 + de-emphasis
(vid_aud_grid.py:190-210) and ``inverse_spec`` (vid_aud_grid.py:212-224) —
against the torch code itself.  Griffin-Lim's phase init is
``np.random.rand`` (seedable), so the comparison is deterministic at the
waveform level, not statistical: the same seeded angles are injected into
vcagan's ``init_phase`` seam.

The image lacks librosa/torchaudio/torchvision, which the reference data
modules import; minimal shims are installed first.  The librosa pieces the
exercised code actually calls (pad_center, tiny, normalize(norm=None),
filters.mel) are implemented here — filters.mel delegates to
vcagan.dsp.mel.mel_filterbank, whose slaney parity is pinned separately
(tests/test_dsp.py + the torchaudio-gated cross-check), so the mel basis
enters both frameworks identically and the comparison isolates the
inverse-chain COMPOSITION.
"""

import os
import sys
import types

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


def _install_shims():
    """Stand-ins for librosa/torchaudio/torchvision so the reference data
    modules import; only functions the exercised code path calls are real."""
    if "librosa" not in sys.modules:
        lu = types.ModuleType("librosa.util")

        def pad_center(data, size, axis=-1, **kw):
            data = np.asarray(data)
            n = data.shape[axis]
            lpad = (size - n) // 2
            widths = [(0, 0)] * data.ndim
            widths[axis] = (lpad, size - n - lpad)
            return np.pad(data, widths)

        def tiny(x):
            dt = np.asarray(x).dtype
            if not np.issubdtype(dt, np.floating):
                dt = np.dtype(np.float32)
            return np.finfo(dt).tiny

        def normalize(S, norm=np.inf, **kw):
            if norm is None:  # the only mode window_sumsquare uses
                return np.asarray(S)
            raise NotImplementedError("shim supports norm=None only")

        lu.pad_center = pad_center
        lu.tiny = tiny
        lu.normalize = normalize

        lf = types.ModuleType("librosa.filters")
        from vcagan.dsp.mel import mel_filterbank

        lf.mel = lambda sr, n_fft, n_mels, fmin, fmax: np.asarray(
            mel_filterbank(sr, n_fft, n_mels, fmin, fmax)
        ).astype(np.float64)

        lib = types.ModuleType("librosa")
        lib.util = lu
        lib.filters = lf
        sys.modules["librosa"] = lib
        sys.modules["librosa.util"] = lu
        sys.modules["librosa.filters"] = lf

    if "torchaudio" not in sys.modules:
        ta = types.ModuleType("torchaudio")
        ta.__vcagan_shim__ = True  # real-library-gated tests must still skip
        sys.modules["torchaudio"] = ta
    if "torchvision" not in sys.modules:
        tv = types.ModuleType("torchvision")
        tvt = types.ModuleType("torchvision.transforms")
        tvf = types.ModuleType("torchvision.transforms.functional")
        tvt.functional = tvf
        tv.transforms = tvt
        sys.modules["torchvision"] = tv
        sys.modules["torchvision.transforms"] = tvt
        sys.modules["torchvision.transforms.functional"] = tvf


_install_shims()

from vcagan.configs import AudioConfig  # noqa: E402
from vcagan.dsp import MelPipeline  # noqa: E402
from vcagan.dsp.griffin_lim import griffin_lim, griffin_lim_mxu  # noqa: E402
from vcagan.dsp.stft import STFTParams, istft, stft_magnitude  # noqa: E402

PARAMS = STFTParams(640, 160, 640)


@pytest.fixture(autouse=True)
def _torch_setup():
    torch.manual_seed(0)
    torch.set_grad_enabled(False)
    yield


def _ref_stft():
    from src.data.stft import STFT

    return STFT(filter_length=640, hop_length=160, win_length=640)


def _speechish(n, seed):
    rng = np.random.default_rng(seed)
    t = np.arange(n) / 16000.0
    x = np.zeros_like(t)
    for f0 in (150.0, 450.0, 1200.0):
        am = 0.5 + 0.5 * np.sin(2 * np.pi * rng.uniform(2, 5) * t)
        x += am * np.sin(2 * np.pi * f0 * t + rng.uniform(0, 6))
    return (0.5 * x / np.abs(x).max()).astype(np.float32)


def _seeded_angles(shape_torch, seed=0):
    """The reference's phase init (audio_processing.py:59) under a fixed
    numpy seed; shape is the torch layout (B, bins, T)."""
    np.random.seed(seed)
    return np.angle(np.exp(2j * np.pi * np.random.rand(*shape_torch))).astype(
        np.float32
    )


class TestISTFT:
    def test_inverse_matches_torch(self):
        """STFT.inverse (conv_transpose + window-sumsquare + hop scale +
        center trim, stft.py:100-129) == vcagan istft, same mag/phase."""
        b, t = 2, 41
        rng = np.random.default_rng(0)
        mag = np.abs(rng.standard_normal((b, 321, t))).astype(np.float32)
        phase = rng.uniform(-np.pi, np.pi, (b, 321, t)).astype(np.float32)

        out_t = _ref_stft().inverse(torch.from_numpy(mag), torch.from_numpy(phase))
        out_j = istft(
            jnp.asarray(mag.transpose(0, 2, 1)),
            jnp.asarray(phase.transpose(0, 2, 1)),
            PARAMS,
        )
        np.testing.assert_allclose(
            np.asarray(out_j), out_t.numpy()[:, 0], atol=1e-4, rtol=1e-4
        )

    def test_transform_matches_torch(self):
        """STFT.transform (conv1d DFT basis, stft.py:70-98) == vcagan
        stft_magnitude on the same waveform, in place."""
        y = np.stack([_speechish(6400, s) for s in range(2)])
        mag_t, phase_t = _ref_stft().transform(torch.from_numpy(y))
        mag_j, phase_j = stft_magnitude(jnp.asarray(y), PARAMS)
        np.testing.assert_allclose(
            np.asarray(mag_j), mag_t.numpy().transpose(0, 2, 1), atol=2e-4, rtol=2e-4
        )
        # phases only where magnitude is not vanishing (atan2 of noise else)
        m = mag_t.numpy().transpose(0, 2, 1) > 1e-3
        dphi = np.asarray(phase_j) - phase_t.numpy().transpose(0, 2, 1)
        dphi = (dphi + np.pi) % (2 * np.pi) - np.pi
        assert np.abs(dphi[m]).max() < 1e-2


class TestGriffinLim:
    def _mag(self, b=2, n=6400):
        y = np.stack([_speechish(n, 7 + s) for s in range(b)])
        mag, _ = _ref_stft().transform(torch.from_numpy(y))
        return mag.numpy()  # (B, 321, T) consistent magnitudes

    def test_seeded_waveform_parity(self):
        """60 torch ISTFT/STFT python rounds == one vcagan lax.scan, same
        injected phase init, waveform for waveform."""
        from src.data.audio_processing import griffin_lim as ref_gl

        mag = self._mag()
        angles = _seeded_angles(mag.shape, seed=0)

        np.random.seed(0)  # ref_gl draws the same angles internally
        wav_t = ref_gl(torch.from_numpy(mag), _ref_stft(), 60).numpy()

        wav_j = griffin_lim(
            jnp.asarray(mag.transpose(0, 2, 1)),
            jax.random.PRNGKey(0),  # unused with init_phase
            PARAMS,
            n_iters=60,
            init_phase=jnp.asarray(angles.transpose(0, 2, 1)),
        )
        np.testing.assert_allclose(np.asarray(wav_j), wav_t, atol=2e-4, rtol=1e-3)

    def test_mxu_variant_matches_torch(self):
        """The windowed-DFT-matmul Griffin-Lim (the TPU production path) in
        fp32 against the same torch chain."""
        from src.data.audio_processing import griffin_lim as ref_gl

        mag = self._mag()
        angles = _seeded_angles(mag.shape, seed=1)
        np.random.seed(1)
        wav_t = ref_gl(torch.from_numpy(mag), _ref_stft(), 60).numpy()
        wav_j = griffin_lim_mxu(
            jnp.asarray(mag.transpose(0, 2, 1)),
            jax.random.PRNGKey(0),
            PARAMS,
            n_iters=60,
            compute_dtype=jnp.float32,
            init_phase=jnp.asarray(angles.transpose(0, 2, 1)),
        )
        np.testing.assert_allclose(np.asarray(wav_j), wav_t, atol=2e-4, rtol=1e-3)


class TestInverseChains:
    """MultiDataset.inverse_mel / inverse_spec (vid_aud_grid.py:190-224) in
    place vs MelPipeline, same seeded Griffin-Lim phase."""

    def _dataset_and_stft(self):
        from src.data.vid_aud_grid import MultiDataset, TacotronSTFT

        ds = MultiDataset.__new__(MultiDataset)  # methods only, no file lists
        stft = TacotronSTFT(640, 160, 640, 80, 16000, 55.0, 7500.0)
        return ds, stft

    def test_inverse_spec_matches_torch(self):
        ds, stft = self._dataset_and_stft()
        y = np.stack([_speechish(6400, 11 + s) for s in range(2)])
        mag, _ = _ref_stft().transform(torch.from_numpy(y))
        spec = mag.numpy()[:, None]  # (B, 1, 321, T)
        angles = _seeded_angles((spec.shape[0], 321, spec.shape[-1]), seed=2)

        np.random.seed(2)
        wav_t = ds.inverse_spec(torch.from_numpy(spec), stft)

        pipe = MelPipeline(AudioConfig())
        wav_j = pipe.inverse_spec(
            jnp.asarray(spec[:, 0].transpose(0, 2, 1)),
            jax.random.PRNGKey(0),
            init_phase=jnp.asarray(angles.transpose(0, 2, 1)),
        )
        np.testing.assert_allclose(np.asarray(wav_j), wav_t, atol=2e-4, rtol=1e-3)

    def test_inverse_mel_matches_torch(self):
        ds, stft = self._dataset_and_stft()
        # realistic normalized mels: the analysis chain of a speechlike clip
        y = np.stack([_speechish(6400, 17 + s) for s in range(2)])
        mel, _ = stft.mel_spectrogram(torch.from_numpy(y))  # (B, 80, T)
        log1e5 = np.log(1e-5)
        mel_norm = (mel.numpy() - log1e5) / (-log1e5 / 2.0) - 1.0
        mel_norm = mel_norm[:, None]  # (B, 1, 80, T)
        angles = _seeded_angles((mel_norm.shape[0], 321, mel_norm.shape[-1]), seed=3)

        np.random.seed(3)
        wav_t = ds.inverse_mel(torch.from_numpy(mel_norm.astype(np.float32)), stft)

        pipe = MelPipeline(AudioConfig())
        wav_j = pipe.inverse_mel(
            jnp.asarray(mel_norm[:, 0].transpose(0, 2, 1).astype(np.float32)),
            jax.random.PRNGKey(0),
            init_phase=jnp.asarray(angles.transpose(0, 2, 1)),
        )
        np.testing.assert_allclose(np.asarray(wav_j), wav_t, atol=5e-4, rtol=1e-3)
