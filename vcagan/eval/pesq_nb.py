"""Native narrowband PESQ-style perceptual quality estimate (MOS-LQO scale).

The reference scores PESQ through the compiled ITU pesq package
(reference: train.py:398, test.py:148), which is not available in this
image.  This module implements the P.862 narrowband processing chain
natively, following the published algorithm structure:

  level align -> 8 kHz frames -> Bark-domain pitch power densities ->
  partial frequency/gain compensation -> Zwicker loudness -> signed +
  asymmetric disturbances -> two-stage Lp aggregation -> raw score ->
  P.862.1 MOS-LQO logistic map.

Bark decomposition and the loudness law use the standard formulas
(Zwicker & Fastl) rather than the ITU lookup tables, so this is an
ESTIMATE of P.862.1 MOS-LQO, not the ITU number.  Measured calibration
bound (tools/ and tests/test_pesq.py):

- anchors: the published P.862-NB white-noise curve — MOS ~= 4.2 / 3.6 /
  2.9 / 2.1 / 1.8 / 1.5 at SNR 40 / 30 / 20 / 10 / 5 / 0 dB — over two
  synthetic harmonic voices (120 / 200 Hz f0).  The raw->disturbance
  mapping below is least-squares fit to those 12 anchors with the
  asymmetric-disturbance coefficient pinned to ITU's 0.0309.
- residual on the anchors: mean |err| 0.22 MOS, max 0.44 MOS (the two
  voices bracket the target curve by ~+/-0.25).
- noise-color dependence: pink noise at the same global SNR scores up to
  ~0.9 MOS above the white-noise curve (monotone in SNR in all cases).

Treat scores as a RELATIVE metric (monotone in distortion, stable
ordering); absolute parity with the ITU binary at the 0.5% level is NOT
demonstrable with this estimator.  When the compiled ``pesq`` wheel is
installed this module defers to it and reports true P.862.1 numbers.
"""

from __future__ import annotations

import numpy as np

try:  # strict ITU implementation when available
    from pesq import pesq as _itu_pesq

    _HAS_ITU = True
except Exception:  # pragma: no cover
    _HAS_ITU = False

_FS = 8000
_FRAME = 256  # 32 ms
_HOP = 128
_NBARK = 42


def _resample_to_8k(x: np.ndarray, fs: int) -> np.ndarray:
    if fs == _FS:
        return x
    from math import gcd

    from scipy.signal import resample_poly

    g = gcd(fs, _FS)
    return resample_poly(x, _FS // g, fs // g)


def _hz_to_bark(f):
    return 7.0 * np.arcsinh(np.asarray(f, np.float64) / 650.0)


def _bark_to_hz(z):
    return 650.0 * np.sinh(np.asarray(z, np.float64) / 7.0)


def _bark_filterbank():
    """(42, 129) rectangular Bark bands over the 0-4 kHz half spectrum."""
    freqs = np.linspace(0, _FS / 2, _FRAME // 2 + 1)
    z_max = _hz_to_bark(_FS / 2)
    edges_z = np.linspace(0.0, z_max, _NBARK + 1)
    edges_hz = _bark_to_hz(edges_z)
    fb = np.zeros((_NBARK, len(freqs)))
    widths = np.zeros(_NBARK)
    for j in range(_NBARK):
        sel = (freqs >= edges_hz[j]) & (freqs < edges_hz[j + 1])
        if not sel.any():
            sel[np.argmin(np.abs(freqs - edges_hz[j]))] = True
        fb[j, sel] = 1.0
        widths[j] = max(edges_hz[j + 1] - edges_hz[j], freqs[1])
    centers = _bark_to_hz((edges_z[:-1] + edges_z[1:]) / 2.0)
    return fb, widths, centers


_FB, _WIDTHS, _CENTERS = _bark_filterbank()

# Terhardt absolute hearing threshold (dB SPL) at band centers
_THRESH_DB = (
    3.64 * (_CENTERS / 1000.0) ** -0.8
    - 6.5 * np.exp(-0.6 * (_CENTERS / 1000.0 - 3.3) ** 2)
    + 1e-3 * (_CENTERS / 1000.0) ** 4
)
_P0 = 10.0 ** (_THRESH_DB / 10.0)  # internal threshold powers


def _frames_power(x: np.ndarray) -> np.ndarray:
    """(L,) -> (M, 129) Hann-windowed power spectra."""
    n = 1 + max(len(x) - _FRAME, 0) // _HOP
    win = np.hanning(_FRAME)
    idx = _HOP * np.arange(n)[:, None] + np.arange(_FRAME)[None, :]
    frames = x[idx] * win
    spec = np.fft.rfft(frames, axis=1)
    return np.abs(spec) ** 2


def _pitch_power(x: np.ndarray) -> np.ndarray:
    """Bark-domain 'pitch power densities' (M, 42)."""
    power = _frames_power(x)
    return power @ _FB.T / _WIDTHS[None, :] * (_FS / _FRAME)


def _loudness(pp: np.ndarray) -> np.ndarray:
    """Zwicker loudness per (frame, band)."""
    s_l = 1.0
    ratio = np.maximum(pp / _P0[None, :], 0.0)
    loud = (
        s_l
        * (_P0[None, :] / 0.5) ** 0.23
        * ((0.5 + 0.5 * ratio) ** 0.23 - 1.0)
    )
    return np.maximum(loud, 0.0)


def _level_align(x: np.ndarray) -> np.ndarray:
    """Scale to a fixed active-band power (P.862 aligns both signals to a
    standard listening level using 325-3250 Hz power)."""
    from scipy.signal import butter, sosfilt

    sos = butter(4, [325 / (_FS / 2), 3250 / (_FS / 2)], "bandpass", output="sos")
    banded = sosfilt(sos, x)
    p = np.mean(banded**2) + 1e-12
    return x * np.sqrt(1e4 / p)


def _time_align(ref: np.ndarray, deg: np.ndarray) -> np.ndarray:
    """Envelope cross-correlation delay estimate; shifts deg onto ref.

    FFT-based correlation: identical argmax to the direct O(n^2) product
    (numerically, to ~1e-9 relative on these envelope signals) at
    O(n log n) — the direct form dominated the whole PESQ chain (~0.2 s of
    the ~0.28 s per 3 s clip)."""
    from scipy.signal import correlate, fftconvolve

    def env(s):
        e = np.abs(s)
        k = np.ones(64) / 64.0
        return fftconvolve(e, k, mode="same")

    a, b = env(ref), env(deg)
    n = min(len(a), len(b))
    a, b = a[:n] - a[:n].mean(), b[:n] - b[:n].mean()
    max_lag = min(_FS // 2, n // 4)  # +/-0.5 s search
    corr = correlate(a, b, mode="full", method="fft")
    mid = n - 1
    window = corr[mid - max_lag : mid + max_lag + 1]
    delay = int(np.argmax(window)) - max_lag
    if delay > 0:
        deg = np.concatenate([np.zeros(delay), deg])[: len(deg)]
    elif delay < 0:
        deg = np.concatenate([deg[-delay:], np.zeros(-delay)])
    return deg


def pesq_nb(
    ref: np.ndarray, deg: np.ndarray, fs: int = 8000, align: bool = True
) -> float:
    """Narrowband perceptual quality score on the MOS-LQO scale [~1.0, 4.64].

    Mirrors the reference call signature pesq(8000, ref, deg, 'nb').
    """
    if _HAS_ITU:
        try:
            return float(_itu_pesq(fs, np.asarray(ref), np.asarray(deg), "nb"))
        except Exception:
            pass

    x = _resample_to_8k(np.asarray(ref, np.float64), fs)
    y = _resample_to_8k(np.asarray(deg, np.float64), fs)
    n = min(len(x), len(y))
    if n < _FRAME * 4:
        raise ValueError("signals too short for PESQ framing")
    x, y = _level_align(x[:n]), _level_align(y[:n])
    if align:
        y = _time_align(x, y)

    px = _pitch_power(x)
    py = _pitch_power(y)

    # speech-active frames of the reference
    frame_pow = px.mean(axis=1)
    active = frame_pow > frame_pow.max() * 1e-3
    if active.sum() < 4:
        active = np.ones(len(px), bool)
    px, py = px[active], py[active]

    # partial frequency compensation (bounded band gain on the reference);
    # +/-10 dB bound keeps gross spectral mismatch penalized — wider bounds
    # let near-silent degraded signals drag the reference down to match
    band_gain = (py.mean(axis=0) + 1e3) / (px.mean(axis=0) + 1e3)
    band_gain = np.clip(band_gain, 0.1, 10.0)
    px_eq = px * band_gain[None, :]

    # partial gain compensation per frame (bounded)
    frame_gain = (px_eq.sum(axis=1) + 5e3) / (py.sum(axis=1) + 5e3)
    frame_gain = np.clip(frame_gain, 3e-4, 5.0)
    py_eq = py * frame_gain[:, None]

    lx = _loudness(px_eq)
    ly = _loudness(py_eq)

    # signed disturbance with the P.862 deadzone mask
    d = ly - lx
    m = 0.25 * np.minimum(lx, ly)
    d = np.where(d > m, d - m, np.where(d < -m, d + m, 0.0))

    # asymmetry factor: additive distortions weigh more
    asym = ((py_eq + 50.0) / (px_eq + 50.0)) ** 1.2
    asym = np.where(asym < 3.0, 0.0, np.minimum(asym, 12.0))

    w = np.sqrt(_WIDTHS / _WIDTHS.sum())
    # loudness-relative disturbances: normalizing by the reference frame
    # loudness replaces the ITU tables' absolute calibration
    ref_norm = np.sqrt(np.sum((lx * w[None, :]) ** 2, axis=1)) + 1.0
    d_frame = np.sqrt(np.sum((d * w[None, :]) ** 2, axis=1)) / ref_norm
    da_frame = np.sum(np.abs(d) * asym * w[None, :], axis=1) / ref_norm

    def two_stage(frame_vals, p1=6.0, p2=2.0, span=20):
        n_sp = max(len(frame_vals) // span, 1)
        chunks = np.array_split(frame_vals, n_sp)
        l6 = np.asarray([np.mean(c**p1) ** (1 / p1) for c in chunks])
        return np.mean(l6**p2) ** (1 / p2)

    d_total = two_stage(d_frame)
    da_total = two_stage(da_frame)

    # coefficients calibrated on the white-noise SNR anchors (module
    # docstring); 0.0309 is ITU P.862's asymmetric-disturbance weight
    raw = 4.5 - 0.4634 * d_total**0.8 - 0.0309 * da_total
    # P.862.1 raw -> MOS-LQO logistic map
    mos = 0.999 + 4.0 / (1.0 + np.exp(-1.4945 * raw + 4.6607))
    return float(np.clip(mos, 1.0, 4.64))


def pesq_batch(refs, degs, fs: int = 16_000, workers: int | None = None):
    """Batched scoring; returns list (NaN where scoring fails, mirroring
    the reference's try/except skip, train.py:397-404).

    Samples are independent, so they fan out over a thread pool (numpy/
    scipy FFT and filtering release the GIL); ``workers=None`` sizes it to
    the CPU count.  Order is preserved."""
    import os
    from concurrent.futures import ThreadPoolExecutor

    def one(pair):
        r, d = pair
        try:
            return pesq_nb(np.asarray(r), np.asarray(d), fs)
        except Exception:
            return float("nan")

    pairs = list(zip(refs, degs))
    n_workers = workers or min(len(pairs), os.cpu_count() or 1)
    if n_workers <= 1 or len(pairs) <= 1:
        return [one(p) for p in pairs]
    with ThreadPoolExecutor(max_workers=n_workers) as pool:
        return list(pool.map(one, pairs))
