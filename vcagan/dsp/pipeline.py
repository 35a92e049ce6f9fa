"""End-to-end mel pipeline: waveform -> (mel, linear) and the inverse paths.

TPU-native replacement for the reference's ``TacotronSTFT`` + the dataset
``inverse_mel`` / ``inverse_spec`` helpers (reference: vid_aud_grid.py:190-224,
270-307).  All methods are pure functions of their inputs and jit-compile;
time-major layout (B, T, bins) throughout, with (B, bins, T) adapters at the
model boundary.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from vcagan.configs import AudioConfig
from vcagan.dsp import audio as audio_ops
from vcagan.dsp.griffin_lim import griffin_lim
from vcagan.dsp.mel import mel_filterbank
from vcagan.dsp.stft import STFTParams, stft_magnitude


class MelPipeline:
    """Stateless (weights are constants) audio feature pipeline."""

    def __init__(self, config: AudioConfig | None = None, gl_dtype=None):
        self.config = config or AudioConfig()
        c = self.config
        self.stft_params = STFTParams(c.n_fft, c.hop_length, c.win_length)
        self.mel_basis = np.asarray(
            mel_filterbank(c.sample_rate, c.n_fft, c.n_mels, c.f_min, c.f_max)
        )  # (n_mels, n_linear)
        # Griffin-Lim matmul compute dtype.  fp32 (the default, and what
        # every shipped serving path uses — bench.py, cli/test.py,
        # train/loop.py all leave gl_dtype unset) keeps the MXU
        # windowed-DFT variant bit-equivalent to the FFT path — the
        # torch-parity harness depends on that.  bf16 is a CANDIDATE
        # serving mode, opt-in via gl_dtype (tools/bench_gl_dtype.py
        # measured it neutral at serving shapes, which is why it doesn't
        # ship): phase estimation is self-correcting
        # (tests/test_dsp.py::test_bf16_converges pins convergence,
        # tests/test_bf16_and_lrs_train.py pins quality).
        self.gl_dtype = jnp.float32 if gl_dtype is None else gl_dtype

    # ---------------------------------------------------------------- forward

    def condition_waveform(self, wav: jax.Array) -> jax.Array:
        """Peak-normalize x0.9, pre-emphasize, clamp to [-1, 1].

        Mirrors reference vid_aud_grid.py:142-144.
        """
        wav = audio_ops.peak_normalize(wav, 0.9)
        wav = audio_ops.preemphasis(wav, self.config.preemphasis)
        return jnp.clip(wav, -1.0, 1.0)

    def mel_spectrogram(self, wav: jax.Array):
        """(B, L) waveform in [-1,1] -> (log-mel (B, T, n_mels), linear mag (B, T, n_linear)).

        Equivalent of reference TacotronSTFT.mel_spectrogram
        (vid_aud_grid.py:291-307): STFT magnitude, mel projection (an MXU
        matmul here), log compression.
        """
        mag, _ = stft_magnitude(wav, self.stft_params)
        return self.compress_mel(mag), mag

    def compress_mel(self, mag: jax.Array) -> jax.Array:
        """Linear magnitudes (B, T, n_linear) -> log-mel (B, T, n_mels):
        mel projection (an MXU matmul) + log compression
        (reference: vid_aud_grid.py:303-306)."""
        mel = mag @ jnp.asarray(self.mel_basis.T, mag.dtype)
        return audio_ops.dynamic_range_compression(mel)

    # ---------------------------------------------------------------- inverse

    def mel_to_linear(self, mel_norm: jax.Array) -> jax.Array:
        """Normalized log-mel (B, T, n_mels) -> approx linear magnitudes.

        Denormalize -> exp -> transpose-as-pseudo-inverse mel projection ->
        x1000 scale (reference: vid_aud_grid.py:190-200).
        """
        mel = audio_ops.mel_denormalize(mel_norm)
        mel = audio_ops.dynamic_range_decompression(mel)
        spec = mel @ jnp.asarray(self.mel_basis, mel.dtype)  # (B, T, n_linear)
        return spec * self.config.mel_inversion_scale

    def inverse_mel(
        self, mel_norm: jax.Array, key: jax.Array, init_phase: jax.Array | None = None
    ) -> jax.Array:
        """Normalized log-mel (B, T, n_mels) -> waveform (B, L), clipped.

        Griffin-Lim (60 iters) + de-emphasis, entirely on-device
        (reference: vid_aud_grid.py:190-210 round-trips via numpy/scipy).
        """
        spec = self.mel_to_linear(mel_norm)
        return self._vocode(spec, key, init_phase)

    def inverse_spec(
        self, spec: jax.Array, key: jax.Array, init_phase: jax.Array | None = None
    ) -> jax.Array:
        """Linear magnitudes (B, T, n_linear) -> waveform (B, L), clipped.

        Reference: vid_aud_grid.py:212-224.  ``init_phase`` (B, T, n_linear)
        overrides the random Griffin-Lim phase init (torch-parity harness).
        """
        return self._vocode(spec, key, init_phase)

    def _vocode(
        self, spec: jax.Array, key: jax.Array, init_phase: jax.Array | None = None
    ) -> jax.Array:
        if jax.default_backend() == "tpu":
            # MXU windowed-DFT Griffin-Lim: 3.4x faster than XLA FFT at the
            # 640-pt production size, bit-equivalent in fp32.
            from vcagan.dsp.griffin_lim import griffin_lim_mxu

            wav = griffin_lim_mxu(
                spec,
                key,
                self.stft_params,
                self.config.griffin_lim_iters,
                compute_dtype=self.gl_dtype,
                init_phase=init_phase,
            )
        else:
            wav = griffin_lim(
                spec,
                key,
                self.stft_params,
                self.config.griffin_lim_iters,
                init_phase=init_phase,
            )
        wav = audio_ops.deemphasis(wav, self.config.preemphasis)
        return jnp.clip(wav, -1.0, 1.0)
