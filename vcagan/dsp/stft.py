"""Batched STFT / ISTFT as pure XLA programs.

The reference computes the STFT as a conv1d against a precomputed DFT basis
and the inverse as a conv_transpose1d (reference: src/data/stft.py:35-134) —
a GPU-era trick that wastes MXU FLOPs on an O(N^2) transform.  Here both
directions are expressed TPU-natively:

- analysis  = reflect-pad -> strided framing -> window -> ``jnp.fft.rfft``
- synthesis = ``jnp.fft.irfft`` -> window -> vectorized overlap-add ->
  window-sum-square envelope correction (the librosa-0.6 semantics of
  reference: src/data/audio_processing.py:7-48)

Overlap-add avoids scatter ops entirely when ``n_fft % hop == 0`` (true for
the 640/160 VCA-GAN configuration): each frame is split into ``n_fft//hop``
hop-sized chunks and the result is a sum of R shifted reshapes — pure
element-wise adds that XLA fuses.

Shapes use time-major layout ``(batch, frames, bins)`` so the FFT axis is the
minor (lane) dimension.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class STFTParams:
    n_fft: int = 640
    hop_length: int = 160
    win_length: int = 640

    @property
    def n_bins(self) -> int:
        return self.n_fft // 2 + 1


@functools.lru_cache(maxsize=8)
def _hann_window(win_length: int, n_fft: int) -> np.ndarray:
    """Periodic Hann window, zero-padded (centered) to n_fft.

    Matches ``scipy.signal.get_window('hann', win, fftbins=True)`` +
    ``librosa.util.pad_center`` used by the reference (stft.py:59-60).
    """
    n = np.arange(win_length)
    win = 0.5 - 0.5 * np.cos(2.0 * np.pi * n / win_length)
    pad = (n_fft - win_length) // 2
    out = np.zeros(n_fft, dtype=np.float64)
    out[pad : pad + win_length] = win
    return out


def window(params: STFTParams, dtype=jnp.float32) -> jax.Array:
    return jnp.asarray(_hann_window(params.win_length, params.n_fft), dtype=dtype)


def frame_count(num_samples: int, params: STFTParams) -> int:
    """Number of STFT frames for a centered transform of ``num_samples``."""
    return 1 + num_samples // params.hop_length


def _frame(y: jax.Array, params: STFTParams, center: bool = True) -> jax.Array:
    """(B, L) -> (B, T, n_fft) frames.

    ``center=True`` reflect-pads n_fft//2 each side (the reference's
    full-clip semantics, stft.py:70-98); ``center=False`` frames the signal
    as-is — used by the input pipeline, where the host has already
    reflect-padded around the TRUE clip edges and sliced the window
    (vcagan.data.audio_host.stft_segment).

    When n_fft % hop == 0 (the 640/160 production config) framing is pure
    reshape + R shifted slices + concat — no gather op at all, the exact
    inverse of the overlap-add trick below.  Inside Griffin-Lim this runs
    60x per call, so avoiding the gather matters.
    """
    n_fft, hop = params.n_fft, params.hop_length
    if center:
        pad = n_fft // 2
        y = jnp.pad(y, ((0, 0), (pad, pad)), mode="reflect")
    n_frames = 1 + (y.shape[1] - n_fft) // hop

    if n_fft % hop == 0:
        r_factor = n_fft // hop
        usable = hop * (n_frames - 1) + n_fft
        rows = y[:, : hop * (usable // hop)].reshape(y.shape[0], -1, hop)
        chunks = [rows[:, r : r + n_frames, :] for r in range(r_factor)]
        return jnp.concatenate(chunks, axis=-1)

    starts = np.arange(n_frames) * hop
    idx = starts[:, None] + np.arange(n_fft)[None, :]
    return y[:, idx]


def stft(y: jax.Array, params: STFTParams, center: bool = True) -> jax.Array:
    """Complex STFT.  y: (B, L) float -> (B, T, n_fft//2+1) complex64."""
    frames = _frame(y, params, center=center) * window(params, y.dtype)
    return jnp.fft.rfft(frames, n=params.n_fft, axis=-1)


def stft_magnitude(y: jax.Array, params: STFTParams, center: bool = True):
    """Magnitude + phase, mirroring reference STFT.transform (stft.py:70-98).

    Returns (mag, phase), each (B, T, n_bins).
    """
    z = stft(y, params, center=center)
    return jnp.abs(z), jnp.angle(z)


def _overlap_add(frames: jax.Array, params: STFTParams) -> jax.Array:
    """(B, T, n_fft) -> (B, n_fft + hop*(T-1)) via shifted reshapes.

    Requires n_fft % hop == 0.  Each frame contributes R = n_fft//hop
    hop-sized chunks; chunk r of frame t lands at output block (t + r).
    Summing R shifted, zero-padded reshapes gives the overlap-add with no
    scatter.
    """
    n_fft, hop = params.n_fft, params.hop_length
    assert n_fft % hop == 0, "fast overlap-add needs n_fft % hop == 0"
    r_factor = n_fft // hop
    b, t, _ = frames.shape
    out_len = n_fft + hop * (t - 1)
    chunks = frames.reshape(b, t, r_factor, hop)
    total = jnp.zeros((b, t + r_factor - 1, hop), frames.dtype)
    for r in range(r_factor):
        shifted = jnp.pad(
            chunks[:, :, r, :], ((0, 0), (r, r_factor - 1 - r), (0, 0))
        )
        total = total + shifted
    return total.reshape(b, -1)[:, :out_len]


@functools.lru_cache(maxsize=16)
def _window_sumsquare(n_frames: int, params: STFTParams) -> np.ndarray:
    """Sum-square window envelope (reference: audio_processing.py:7-48)."""
    win_sq = _hann_window(params.win_length, params.n_fft) ** 2
    n = params.n_fft + params.hop_length * (n_frames - 1)
    x = np.zeros(n, dtype=np.float64)
    for i in range(n_frames):
        s = i * params.hop_length
        x[s : min(n, s + params.n_fft)] += win_sq[: max(0, min(params.n_fft, n - s))]
    return x


def istft(
    magnitude: jax.Array,
    phase: jax.Array,
    params: STFTParams,
    trim_center: bool = True,
) -> jax.Array:
    """Inverse STFT with window-sum-square correction.

    magnitude, phase: (B, T, n_bins) -> (B, hop * (T-1)) when trimming the
    centering pad (matching reference STFT.inverse, stft.py:100-129).
    """
    # Build the complex spectrum from real parts — complex exp is not
    # universally supported on the TPU backend.
    return istft_complex(
        magnitude * jnp.cos(phase), magnitude * jnp.sin(phase), params, trim_center
    )


def istft_complex(
    real: jax.Array,
    imag: jax.Array,
    params: STFTParams,
    trim_center: bool = True,
) -> jax.Array:
    """ISTFT from explicit real/imag spectra (transcendental-free path used
    by Griffin-Lim, which carries unit phasors instead of angles)."""
    z = jax.lax.complex(real, imag)
    frames = jnp.fft.irfft(z, n=params.n_fft, axis=-1).astype(real.dtype)
    frames = frames * window(params, real.dtype)
    y = _overlap_add(frames, params)

    wss = _window_sumsquare(int(real.shape[1]), params)
    tiny = np.finfo(np.float32).tiny
    correction = np.where(wss > tiny, 1.0 / np.maximum(wss, tiny), 1.0)
    y = y * jnp.asarray(correction, dtype=y.dtype)

    if trim_center:
        pad = params.n_fft // 2
        y = y[:, pad:-pad]
    return y
