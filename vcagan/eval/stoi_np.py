"""STOI / ESTOI reference implementation (numpy, single pair).

Short-Time Objective Intelligibility (Taal et al., ICASSP 2011) and the
extended variant (Jensen & Taal, TASLP 2016), implemented from the papers
with the standard parameterization used by the pystoi package the reference
depends on (reference: train.py:393-396 — pystoi is not installed in this
image, so the metric stack is native here).  Serves as the oracle for the
batched JAX implementation in vcagan.eval.stoi.

Parameters: fs 10 kHz, 256-sample Hann frames, 50% overlap, 512-pt FFT,
15 one-third-octave bands from 150 Hz, 384 ms (30-frame) segments,
40 dB silent-frame dynamic range, -15 dB SDR clip.
"""

from __future__ import annotations

import functools

import numpy as np

FS = 10_000
N_FRAME = 256
NFFT = 512
NUMBAND = 15
MINFREQ = 150
N_SEG = 30
BETA = -15.0
DYN_RANGE = 40.0


def _resample_to_10k(x: np.ndarray, fs: int) -> np.ndarray:
    if fs == FS:
        return x
    from math import gcd

    from scipy.signal import resample_poly

    g = gcd(fs, FS)
    return resample_poly(x, FS // g, fs // g)


@functools.lru_cache(maxsize=1)
def _third_octave_matrix() -> np.ndarray:
    """(15, 257) one-third-octave band matrix at 10 kHz / 512-pt FFT."""
    f = np.linspace(0, FS, NFFT, endpoint=False)[: NFFT // 2 + 1]
    k = np.arange(NUMBAND)
    cf = MINFREQ * 2.0 ** (k / 3.0)
    lo = cf * 2.0 ** (-1.0 / 6.0)
    hi = cf * 2.0 ** (1.0 / 6.0)
    obm = np.zeros((NUMBAND, len(f)))
    for j in range(NUMBAND):
        # nearest bins to the band edges (paper/pystoi convention)
        lo_idx = np.argmin((f - lo[j]) ** 2)
        hi_idx = np.argmin((f - hi[j]) ** 2)
        obm[j, lo_idx:hi_idx] = 1.0
    return obm


def _frames(x: np.ndarray) -> np.ndarray:
    hop = N_FRAME // 2
    n = 1 + (len(x) - N_FRAME) // hop if len(x) >= N_FRAME else 0
    idx = hop * np.arange(max(n, 0))[:, None] + np.arange(N_FRAME)[None, :]
    return x[idx]


def _hann() -> np.ndarray:
    # symmetric hann of length N (pystoi uses scipy.hanning(N+2)[1:-1])
    n = np.arange(1, N_FRAME + 1)
    return 0.5 - 0.5 * np.cos(2 * np.pi * n / (N_FRAME + 1))


def _remove_silent_frames(x: np.ndarray, y: np.ndarray):
    """Drop frames where the CLEAN signal is > 40 dB below its loudest
    frame; rebuild both signals by 50%-overlap-add of kept frames."""
    win = _hann()
    xf = _frames(x) * win
    yf = _frames(y) * win
    if len(xf) == 0:
        return x, y
    energies = 20 * np.log10(np.linalg.norm(xf, axis=1) + 1e-14)
    mask = energies > (energies.max() - DYN_RANGE)
    xf, yf = xf[mask], yf[mask]
    hop = N_FRAME // 2
    n_out = N_FRAME + hop * (len(xf) - 1) if len(xf) else 0
    x_out = np.zeros(n_out)
    y_out = np.zeros(n_out)
    for i in range(len(xf)):
        x_out[i * hop : i * hop + N_FRAME] += xf[i]
        y_out[i * hop : i * hop + N_FRAME] += yf[i]
    return x_out, y_out


def _band_decomposition(x: np.ndarray) -> np.ndarray:
    """(L,) -> (15, M) one-third-octave band envelope."""
    win = _hann()
    frames = _frames(x) * win
    spec = np.fft.rfft(frames, NFFT, axis=1)  # (M, 257)
    power = np.abs(spec) ** 2
    return np.sqrt(_third_octave_matrix() @ power.T)  # (15, M)


def stoi_np(clean: np.ndarray, degraded: np.ndarray, fs: int = 10_000) -> float:
    """Classic STOI in [~0, 1]."""
    x = _resample_to_10k(np.asarray(clean, np.float64), fs)
    y = _resample_to_10k(np.asarray(degraded, np.float64), fs)
    n = min(len(x), len(y))
    x, y = x[:n], y[:n]
    x, y = _remove_silent_frames(x, y)

    X = _band_decomposition(x)
    Y = _band_decomposition(y)
    m_total = X.shape[1]
    if m_total < N_SEG:
        return float("nan")

    c = 10 ** (-BETA / 20.0)
    d_sum, count = 0.0, 0
    for m in range(N_SEG, m_total + 1):
        Xs = X[:, m - N_SEG : m]  # (15, 30)
        Ys = Y[:, m - N_SEG : m]
        alpha = np.sqrt(
            (Xs ** 2).sum(axis=1, keepdims=True)
            / ((Ys ** 2).sum(axis=1, keepdims=True) + 1e-14)
        )
        Ys_n = np.minimum(alpha * Ys, Xs * (1 + c))
        xm = Xs - Xs.mean(axis=1, keepdims=True)
        ym = Ys_n - Ys_n.mean(axis=1, keepdims=True)
        corr = (xm * ym).sum(axis=1) / (
            np.linalg.norm(xm, axis=1) * np.linalg.norm(ym, axis=1) + 1e-14
        )
        d_sum += corr.sum()
        count += NUMBAND
    return float(d_sum / count)


def estoi_np(clean: np.ndarray, degraded: np.ndarray, fs: int = 10_000) -> float:
    """Extended STOI (row+column normalized segment correlation)."""
    x = _resample_to_10k(np.asarray(clean, np.float64), fs)
    y = _resample_to_10k(np.asarray(degraded, np.float64), fs)
    n = min(len(x), len(y))
    x, y = x[:n], y[:n]
    x, y = _remove_silent_frames(x, y)

    X = _band_decomposition(x)
    Y = _band_decomposition(y)
    m_total = X.shape[1]
    if m_total < N_SEG:
        return float("nan")

    d_sum, count = 0.0, 0
    for m in range(N_SEG, m_total + 1):
        Xs = X[:, m - N_SEG : m]
        Ys = Y[:, m - N_SEG : m]
        # row (time) normalization
        Xr = Xs - Xs.mean(axis=1, keepdims=True)
        Xr = Xr / (np.linalg.norm(Xr, axis=1, keepdims=True) + 1e-14)
        Yr = Ys - Ys.mean(axis=1, keepdims=True)
        Yr = Yr / (np.linalg.norm(Yr, axis=1, keepdims=True) + 1e-14)
        # column (band) normalization
        Xc = Xr - Xr.mean(axis=0, keepdims=True)
        Xc = Xc / (np.linalg.norm(Xc, axis=0, keepdims=True) + 1e-14)
        Yc = Yr - Yr.mean(axis=0, keepdims=True)
        Yc = Yc / (np.linalg.norm(Yc, axis=0, keepdims=True) + 1e-14)
        d_sum += float((Xc * Yc).sum() / N_SEG)
        count += 1
    return float(d_sum / count)
