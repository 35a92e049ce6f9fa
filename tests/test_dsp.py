"""DSP parity tests: STFT/ISTFT vs scipy, mel vs torchaudio, filters vs scipy."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import scipy.signal

from vcagan.dsp import (
    MelPipeline,
    STFTParams,
    deemphasis,
    dynamic_range_compression,
    frame_count,
    griffin_lim,
    istft,
    mel_denormalize,
    mel_filterbank,
    mel_normalize,
    preemphasis,
    stft,
    stft_magnitude,
)

PARAMS = STFTParams(n_fft=640, hop_length=160, win_length=640)


def chirp(n, sr=16000, f0=100.0, f1=4000.0, seed=0):
    t = np.arange(n) / sr
    sig = scipy.signal.chirp(t, f0=f0, t1=t[-1], f1=f1).astype(np.float32)
    rng = np.random.default_rng(seed)
    return sig * 0.7 + 0.01 * rng.standard_normal(n).astype(np.float32)


class TestSTFT:
    def test_magnitude_matches_scipy(self):
        y = chirp(16000)
        mag, _ = stft_magnitude(jnp.asarray(y)[None], PARAMS)
        mag = np.asarray(mag)[0]  # (T, 321)

        # scipy with identical convention: periodic hann, centered, no scaling
        win = scipy.signal.get_window("hann", 640, fftbins=True)
        _, _, z = scipy.signal.stft(
            y,
            window=win,
            nperseg=640,
            noverlap=640 - 160,
            boundary="even",  # scipy reflect == 'even' at edges
            padded=False,
            scaling="spectrum",
        )
        ref = np.abs(z).T * win.sum()  # undo scipy's 1/win.sum() scaling
        t = min(mag.shape[0], ref.shape[0])
        np.testing.assert_allclose(mag[:t], ref[:t], rtol=1e-4, atol=1e-4)

    def test_frame_count(self):
        y = jnp.asarray(chirp(48000))[None]
        mag, _ = stft_magnitude(y, PARAMS)
        assert mag.shape == (1, frame_count(48000, PARAMS), 321)

    def test_round_trip(self):
        y = chirp(16000 * 2)
        mag, phase = stft_magnitude(jnp.asarray(y)[None], PARAMS)
        rec = np.asarray(istft(mag, phase, PARAMS))[0]
        n = min(len(y), len(rec))
        # centered STFT is perfectly invertible away from edges
        np.testing.assert_allclose(rec[320:n - 320], y[320:n - 320], atol=1e-4)

    def test_batched(self):
        ys = np.stack([chirp(8000, seed=i) for i in range(3)])
        mag, phase = stft_magnitude(jnp.asarray(ys), PARAMS)
        assert mag.shape[0] == 3
        single, _ = stft_magnitude(jnp.asarray(ys[1:2]), PARAMS)
        np.testing.assert_allclose(np.asarray(mag[1]), np.asarray(single[0]), rtol=1e-5, atol=1e-5)


class TestMelFilterbank:
    def test_matches_torchaudio_slaney(self):
        torchaudio = pytest.importorskip("torchaudio")
        if getattr(torchaudio, "__vcagan_shim__", False):
            # test_inverse_dsp_parity installs a stub so the reference data
            # modules import; only the real library can validate this
            pytest.skip("torchaudio in sys.modules is the parity-test shim")
        fb = mel_filterbank(16000, 640, 80, 55.0, 7500.0)  # (80, 321)
        ref = torchaudio.functional.melscale_fbanks(
            n_freqs=321,
            f_min=55.0,
            f_max=7500.0,
            n_mels=80,
            sample_rate=16000,
            norm="slaney",
            mel_scale="slaney",
        ).numpy().T  # torchaudio returns (n_freqs, n_mels)
        np.testing.assert_allclose(fb, ref, rtol=1e-4, atol=1e-6)

    def test_shape_and_coverage(self):
        fb = mel_filterbank(16000, 640, 80, 55.0, 7500.0)
        assert fb.shape == (80, 321)
        assert (fb >= 0).all()
        # every mel band has support
        assert (fb.sum(axis=1) > 0).all()


class TestEmphasis:
    def test_preemphasis_matches_lfilter(self):
        y = chirp(4000)
        out = np.asarray(preemphasis(jnp.asarray(y)[None]))[0]
        ref = scipy.signal.lfilter([1, -0.97], [1], y)
        np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-6)

    def test_deemphasis_matches_lfilter(self):
        y = chirp(4000)
        out = np.asarray(deemphasis(jnp.asarray(y)[None]))[0]
        ref = scipy.signal.lfilter([1], [1, -0.97], y)
        np.testing.assert_allclose(out, ref, rtol=1e-3, atol=1e-3)

    def test_inverse_pair(self):
        y = chirp(4000)
        rec = np.asarray(deemphasis(preemphasis(jnp.asarray(y)[None])))[0]
        np.testing.assert_allclose(rec, y, rtol=1e-3, atol=1e-3)


class TestMelNormalization:
    def test_round_trip(self):
        x = jnp.linspace(np.log(1e-5), 0.0, 100)
        np.testing.assert_allclose(
            np.asarray(mel_denormalize(mel_normalize(x))), np.asarray(x), atol=1e-5
        )

    def test_range(self):
        # log-mel in [log 1e-5, 0] maps into [-1, 1]
        x = jnp.array([np.log(1e-5), 0.0])
        out = np.asarray(mel_normalize(x))
        np.testing.assert_allclose(out, [-1.0, 1.0], atol=1e-6)

    def test_compression_clamps(self):
        out = np.asarray(dynamic_range_compression(jnp.array([0.0, 1e-7, 1.0])))
        np.testing.assert_allclose(out[:2], np.log(1e-5), atol=1e-5)
        np.testing.assert_allclose(out[2], 0.0, atol=1e-6)


class TestGriffinLim:
    def test_reconstruction_quality(self):
        """GL from true magnitudes should reconstruct an audible signal."""
        sr = 16000
        t = np.arange(sr) / sr
        y = (0.5 * np.sin(2 * np.pi * 440 * t)).astype(np.float32)
        mag = jnp.abs(stft(jnp.asarray(y)[None], PARAMS))
        rec = np.asarray(
            griffin_lim(mag, jax.random.PRNGKey(0), PARAMS, n_iters=60)
        )[0]
        mag_rec = np.asarray(jnp.abs(stft(jnp.asarray(rec)[None], PARAMS)))[0]
        mag_np = np.asarray(mag)[0]
        # spectral convergence
        sc = np.linalg.norm(mag_rec - mag_np) / np.linalg.norm(mag_np)
        assert sc < 0.25, f"spectral convergence too poor: {sc}"

    def test_output_length(self):
        mag = jnp.ones((2, 101, 321)) * 0.01
        wav = griffin_lim(mag, jax.random.PRNGKey(1), PARAMS, n_iters=2)
        assert wav.shape == (2, 160 * 100)


class TestMelPipeline:
    def test_forward_shapes(self):
        pipe = MelPipeline()
        wav = jnp.asarray(chirp(48000))[None]
        wav = pipe.condition_waveform(wav)
        mel, spec = pipe.mel_spectrogram(wav)
        assert mel.shape == (1, 301, 80)
        assert spec.shape == (1, 301, 321)
        # log-compressed mel is bounded below by log(1e-5)
        assert float(mel.min()) >= np.log(1e-5) - 1e-5

    def test_inverse_mel_runs(self):
        pipe = MelPipeline()
        wav = pipe.condition_waveform(jnp.asarray(chirp(16000))[None])
        mel, spec = pipe.mel_spectrogram(wav)
        mel_norm = mel_normalize(mel)
        out = pipe.inverse_mel(mel_norm, jax.random.PRNGKey(0))
        assert out.shape[0] == 1
        assert np.abs(np.asarray(out)).max() <= 1.0

    def test_mel_roundtrip_preserves_speechband_energy(self):
        """mel -> pseudo-inverse linear keeps the band structure."""
        pipe = MelPipeline()
        wav = pipe.condition_waveform(jnp.asarray(chirp(16000))[None])
        mel, spec = pipe.mel_spectrogram(wav)
        approx = pipe.mel_to_linear(mel_normalize(mel))
        spec_np, approx_np = np.asarray(spec)[0], np.asarray(approx)[0]
        # log-domain correlation between true and mel-reconstructed spectra
        # (300-4000 Hz bins) — the perceptually relevant comparison
        lo, hi = 12, 160
        a = np.log(1e-5 + spec_np[:, lo:hi]).ravel()
        b = np.log(1e-5 + approx_np[:, lo:hi]).ravel()
        corr = np.corrcoef(a, b)[0, 1]
        assert corr > 0.8, f"mel pseudo-inverse correlation too low: {corr}"


class TestGriffinLimMXU:
    def test_f32_matches_fft_variant(self):
        """The windowed-DFT-matmul Griffin-Lim is numerically equivalent to
        the FFT implementation in fp32."""
        from vcagan.dsp.griffin_lim import griffin_lim_mxu

        sr = 16000
        t = np.arange(sr) / sr
        y = (0.5 * np.sin(2 * np.pi * 440 * t)).astype(np.float32)
        mag = jnp.abs(stft(jnp.asarray(y)[None], PARAMS))
        r_fft = np.asarray(griffin_lim(mag, jax.random.PRNGKey(0), PARAMS, 20))
        r_mxu = np.asarray(
            griffin_lim_mxu(
                mag, jax.random.PRNGKey(0), PARAMS, 20, compute_dtype=jnp.float32
            )
        )
        assert r_fft.shape == r_mxu.shape
        np.testing.assert_allclose(r_mxu, r_fft, atol=5e-5)

    def test_bf16_converges(self):
        from vcagan.dsp.griffin_lim import griffin_lim_mxu

        sr = 16000
        t = np.arange(sr) / sr
        y = (0.4 * np.sin(2 * np.pi * 660 * t)).astype(np.float32)
        mag = jnp.abs(stft(jnp.asarray(y)[None], PARAMS))
        rec = griffin_lim_mxu(mag, jax.random.PRNGKey(1), PARAMS, 40)
        m2 = jnp.abs(stft(rec, PARAMS))
        sc = float(jnp.linalg.norm(m2 - mag) / jnp.linalg.norm(mag))
        assert sc < 0.25, sc

    def test_bf16_gl_quality_vs_fp32(self):
        """bf16 GL matmuls (the serving gl_dtype) converge as well as fp32.

        GL's phase trajectory is chaotic, so waveforms diverge between the
        dtypes — the meaningful comparison is GL's own objective (spectral
        convergence of the reconstruction to the target magnitudes) and the
        log-magnitude agreement of the two reconstructions."""
        from vcagan.dsp.griffin_lim import griffin_lim_mxu

        rng = np.random.default_rng(7)
        sr, dur = 16000, 1.0
        t = np.arange(int(sr * dur)) / sr
        # multi-tone + noise floor: spectrally busier than a pure sine
        y = (
            0.3 * np.sin(2 * np.pi * 220 * t)
            + 0.2 * np.sin(2 * np.pi * 1310 * t)
            + 0.05 * rng.standard_normal(t.shape)
        ).astype(np.float32)
        mag = jnp.abs(stft(jnp.asarray(y)[None], PARAMS))

        def sc_of(dtype, seed):
            rec = griffin_lim_mxu(
                mag, jax.random.PRNGKey(seed), PARAMS, 60, compute_dtype=dtype
            )
            m2 = jnp.abs(stft(rec, PARAMS))
            sc = float(jnp.linalg.norm(m2 - mag) / jnp.linalg.norm(mag))
            return sc, np.asarray(m2)

        sc32, m32 = sc_of(jnp.float32, 3)
        sc16, m16 = sc_of(jnp.bfloat16, 3)
        # absolute caps: catch a shared convergence regression that would
        # otherwise slip through the relative bound (both dtypes diverging
        # together).  Measured: sc32 ~= sc16 ~= 0.26 on this signal.
        assert sc32 < 0.35, sc32
        assert sc16 < 0.40, sc16
        # bf16 must converge essentially as well as fp32
        assert sc16 < sc32 * 1.2 + 0.02, (sc16, sc32)
        # and the reconstructed magnitudes must agree closely in log domain
        a = np.log(1e-5 + m32).ravel()
        b = np.log(1e-5 + m16).ravel()
        corr = np.corrcoef(a, b)[0, 1]
        assert corr > 0.99, corr
