"""Batched on-device STOI / ESTOI.

JAX port of the algorithm in vcagan.eval.stoi_np: the whole metric — 16->10
kHz polyphase resample, silent-frame removal (with frame compaction done as
one gather), one-third-octave band decomposition, 30-frame segment
correlations — runs as a single jitted program over the batch, replacing the
reference's per-sample pystoi CPU loop (reference: train.py:392-404, a
validation hot loop per SURVEY.md §3.2).

Dynamic frame counts (silent-frame removal keeps a data-dependent number of
frames) are handled with static shapes + masks: kept frames are compacted to
the front via argsort, the overlap-add uses the full static length, and
segment statistics are masked by the per-sample kept count.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from vcagan.eval import stoi_np as ref

# pystoi uses machine epsilon (stoi_np.EPS == np.finfo(float64).eps); keep
# the same constant here so the silent-frame 40 dB threshold and the
# normalization denominators agree with the oracle on near-silent frames.
# (Computation is f32 on device, where adding 2.2e-16 is a no-op guard for
# any representable nonzero norm — the value only decides degenerate
# all-zero cases, identically to pystoi.)
_EPS = float(np.finfo(np.float64).eps)


@functools.lru_cache(maxsize=1)
def _resample_filter() -> np.ndarray:
    """FIR low-pass for 16k -> 10k polyphase resampling (up 5, down 8)
    using pystoi's exact Octave-compatible window (stoi_np
    .resample_window_oct), normalized to unit DC gain then scaled by
    ``up`` exactly as scipy.resample_poly does with an explicit window."""
    up, down = 5, 8
    h = ref.resample_window_oct(up, down)
    return (h / np.sum(h) * up).astype(np.float32)


def _resample_16k_to_10k(x: jax.Array) -> jax.Array:
    """(B, L) @16 kHz -> (B, ceil(L*5/8)) @10 kHz via dilated conv."""
    up, down = 5, 8
    taps = jnp.asarray(_resample_filter())
    n_taps = taps.shape[0]
    # scipy centers the filter: output[i] = sum h[k] x_up[i*down + k - half]
    half = n_taps // 2
    lhs = x[:, None, :]  # (B, C=1, L)
    rhs = taps[None, None, ::-1]  # OIH, flipped for convolution
    out = jax.lax.conv_general_dilated(
        lhs,
        rhs,
        window_strides=(down,),
        padding=[(half, half)],
        lhs_dilation=(up,),
        dimension_numbers=("NCH", "OIH", "NCH"),
    )
    n_out = int(np.ceil(x.shape[1] * up / down))
    return out[:, 0, :n_out]


def _frame(x: jax.Array, n: int = ref.N_FRAME) -> jax.Array:
    # pystoi framing: range(0, L - n, hop) — the frame starting exactly at
    # L - n is EXCLUDED (stoi_np._frame_starts)
    hop = n // 2
    m = len(ref._frame_starts(x.shape[-1]))
    idx = hop * np.arange(m)[:, None] + np.arange(n)[None, :]
    return x[:, idx]  # (B, M, N)


def _hann() -> np.ndarray:
    n = np.arange(1, ref.N_FRAME + 1)
    return (0.5 - 0.5 * np.cos(2 * np.pi * n / (ref.N_FRAME + 1))).astype(np.float32)


def _overlap_add_50(frames: jax.Array) -> jax.Array:
    """(B, M, N) 50%-overlap OLA -> (B, N/2*(M+1))."""
    b, m, n = frames.shape
    hop = n // 2
    first, second = frames[:, :, :hop], frames[:, :, hop:]
    total = jnp.zeros((b, m + 1, hop), frames.dtype)
    total = total.at[:, :m].add(first)
    total = total.at[:, 1:].add(second)
    return total.reshape(b, -1)


def _compact_silent_frames(xf, yf, win, frame_ok=None):
    """Keep frames where clean energy is within 40 dB of the max; compact
    kept frames to the front.  Returns (xk, yk, counts).

    ``frame_ok`` (B, M) bool, optional: frames outside a sample's true
    length are forced out BEFORE the energy max, reproducing pystoi's
    exclusive framing of the trimmed signal."""
    energy_db = 20.0 * jnp.log10(
        jnp.linalg.norm(xf * win, axis=-1) + _EPS
    )  # (B, M)
    if frame_ok is not None:
        energy_db = jnp.where(frame_ok, energy_db, -jnp.inf)
    keep = energy_db > (
        jnp.max(energy_db, axis=-1, keepdims=True) - ref.DYN_RANGE
    )
    counts = jnp.sum(keep, axis=-1)  # (B,)
    # stable argsort of (not keep) moves kept frames to the front in order
    order = jnp.argsort(~keep, axis=-1, stable=True)  # (B, M)
    xk = jnp.take_along_axis(xf * win[None, None, :], order[:, :, None], axis=1)
    yk = jnp.take_along_axis(yf * win[None, None, :], order[:, :, None], axis=1)
    mask = jnp.arange(xf.shape[1])[None, :] < counts[:, None]
    xk = xk * mask[:, :, None]
    yk = yk * mask[:, :, None]
    return xk, yk, counts


def _band_envelopes(sig: jax.Array, win: jax.Array, obm: jax.Array) -> jax.Array:
    frames = _frame(sig) * win
    spec = jnp.fft.rfft(frames, ref.NFFT, axis=-1)
    power = jnp.real(spec) ** 2 + jnp.imag(spec) ** 2
    return jnp.sqrt(jnp.einsum("jf,bmf->bjm", obm, power) + 0.0)  # (B, 15, M)


def _segments(x: jax.Array) -> jax.Array:
    """(B, J, M) -> (B, M-29, J, 30) sliding segments."""
    m = x.shape[-1]
    n_seg = m - ref.N_SEG + 1
    idx = np.arange(n_seg)[:, None] + np.arange(ref.N_SEG)[None, :]
    return jnp.transpose(x[:, :, idx], (0, 2, 1, 3))


def _stoi_front(clean, degraded, extended_unused, input_rate, lengths):
    """Shared (E)STOI front end: resample -> frame -> silent-frame
    compaction -> OLA -> third-octave band envelopes -> 30-frame segments.
    Returns (Xs, Ys, valid)."""
    x = clean.astype(jnp.float32)
    y = degraded.astype(jnp.float32)
    if input_rate == 16_000:
        x = _resample_16k_to_10k(x)
        y = _resample_16k_to_10k(y)

    win = jnp.asarray(_hann())
    obm = jnp.asarray(ref._third_octave_matrix().astype(np.float32))

    xf = _frame(x)
    yf = _frame(y)
    frame_ok = None
    if lengths is not None:
        l10 = lengths if input_rate == 10_000 else -(-lengths * 5 // 8)
        hop = ref.N_FRAME // 2
        m_valid = jnp.where(
            l10 > ref.N_FRAME, (l10 - ref.N_FRAME + hop - 1) // hop, 0
        )
        frame_ok = jnp.arange(xf.shape[1])[None, :] < m_valid[:, None]
    xk, yk, counts = _compact_silent_frames(xf, yf, win, frame_ok)
    x_rec = _overlap_add_50(xk)
    y_rec = _overlap_add_50(yk)
    X = _band_envelopes(x_rec, win, obm)  # (B, 15, M)
    Y = _band_envelopes(y_rec, win, obm)

    Xs = _segments(X)  # (B, S, 15, 30)
    Ys = _segments(Y)
    n_seg_slots = Xs.shape[1]
    # c kept signal frames OLA to 256 + 128*(c-1) samples, which pystoi's
    # exclusive framing turns into c-1 band frames; segment s uses band
    # frames [s, s+30)
    band_frames = counts - 1
    valid = (
        np.arange(n_seg_slots)[None, :] + ref.N_SEG
        <= band_frames[:, None]
    )  # (B, S)
    return Xs, Ys, valid


def _estoi_tail(Xs, Ys, valid):
    def rownorm(a, axis):
        a = a - jnp.mean(a, axis=axis, keepdims=True)
        return a / (jnp.linalg.norm(a, axis=axis, keepdims=True) + _EPS)

    Xn = rownorm(rownorm(Xs, -1), -2)
    Yn = rownorm(rownorm(Ys, -1), -2)
    d_seg = jnp.sum(Xn * Yn, axis=(-1, -2)) / ref.N_SEG  # (B, S)
    score = jnp.sum(d_seg * valid, axis=1) / jnp.maximum(
        jnp.sum(valid, axis=1), 1
    )
    # pystoi returns 1e-5 when there are fewer than 30 band frames
    return jnp.where(jnp.any(valid, axis=1), score, 1e-5)


def _stoi_tail(Xs, Ys, valid):
    c = 10.0 ** (-ref.BETA / 20.0)
    # pystoi normalizes by the norm ratio with EPS on the denominator
    alpha = jnp.linalg.norm(Xs, axis=-1, keepdims=True) / (
        jnp.linalg.norm(Ys, axis=-1, keepdims=True) + _EPS
    )
    Yc = jnp.minimum(alpha * Ys, Xs * (1 + c))
    xm = Xs - jnp.mean(Xs, axis=-1, keepdims=True)
    ym = Yc - jnp.mean(Yc, axis=-1, keepdims=True)
    corr = jnp.sum(xm * ym, axis=-1) / (
        jnp.linalg.norm(xm, axis=-1) * jnp.linalg.norm(ym, axis=-1) + _EPS
    )  # (B, S, 15)
    d_seg = jnp.mean(corr, axis=-1)  # (B, S)
    score = jnp.sum(d_seg * valid, axis=1) / jnp.maximum(
        jnp.sum(valid, axis=1), 1
    )
    return jnp.where(jnp.any(valid, axis=1), score, 1e-5)


@functools.partial(jax.jit, static_argnames=("input_rate",))
def stoi_estoi_batch(
    clean: jax.Array,
    degraded: jax.Array,
    input_rate: int = 16_000,
    lengths: jax.Array | None = None,
):
    """Both STOI and ESTOI from ONE program: the front end (resample,
    framing, silent-frame compaction, band envelopes, segmentation) is
    ~the whole cost and is identical for the two metrics, so eval drivers
    scoring both (cli/test_lrs.py, train/loop.py validate — mirroring
    reference train.py:393-396) pay it once and one host round trip
    instead of two."""
    assert input_rate in (16_000, 10_000)
    Xs, Ys, valid = _stoi_front(clean, degraded, False, input_rate, lengths)
    return _stoi_tail(Xs, Ys, valid), _estoi_tail(Xs, Ys, valid)


@functools.partial(jax.jit, static_argnames=("extended", "input_rate"))
def stoi_batch(
    clean: jax.Array,
    degraded: jax.Array,
    extended: bool = False,
    input_rate: int = 16_000,
    lengths: jax.Array | None = None,
) -> jax.Array:
    """Batched (E)STOI: (B, L), (B, L) waveforms -> (B,) scores.

    ``lengths`` (B,) int, optional: per-sample TRUE lengths in input-rate
    samples for zero-padded variable-length batches.  With it, frames whose
    start falls at or beyond ``true_len - 256`` (at 10 kHz) are excluded
    exactly like pystoi's ``range(0, len(x) - 256, 128)`` framing of the
    trimmed signal — without it, padded samples include one extra boundary
    frame (a tiny deviation, acceptable for fixed-length batches where
    padding is absent anyway).
    """
    assert input_rate in (16_000, 10_000)
    Xs, Ys, valid = _stoi_front(clean, degraded, extended, input_rate, lengths)
    if extended:
        return _estoi_tail(Xs, Ys, valid)
    return _stoi_tail(Xs, Ys, valid)
