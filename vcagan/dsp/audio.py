"""Waveform- and mel-domain scalar DSP ops (batched, jit-friendly).

Covers the reference's audio conditioning chain: peak-normalize, FIR
pre-emphasis, IIR de-emphasis (via log-depth associative scan rather than a
sequential loop), log dynamic-range compression, and the [-1, 1] mel
normalization (reference: vid_aud_grid.py:142-144,226-240,
audio_processing.py:71-86).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

LOG1E5 = math.log(1e-5)  # reference: vid_aud_grid.py:22


def peak_normalize(wav: jax.Array, target: float = 0.9, axis: int = -1) -> jax.Array:
    """wav / max|wav| * target (reference: vid_aud_grid.py:142)."""
    peak = jnp.max(jnp.abs(wav), axis=axis, keepdims=True)
    return wav / jnp.maximum(peak, 1e-8) * target


def preemphasis(wav: jax.Array, coef: float = 0.97) -> jax.Array:
    """y[n] = x[n] - coef * x[n-1]; y[0] = x[0].

    Equals ``scipy.signal.lfilter([1, -coef], [1], x)``
    (reference: vid_aud_grid.py:226-228).  Works on (..., L).
    """
    return jnp.concatenate(
        [wav[..., :1], wav[..., 1:] - coef * wav[..., :-1]], axis=-1
    )


def deemphasis(wav: jax.Array, coef: float = 0.97) -> jax.Array:
    """Inverse of :func:`preemphasis`: y[n] = x[n] + coef * y[n-1].

    The reference runs this as a sequential scipy IIR on host after pulling
    waveforms off-device (vid_aud_grid.py:230-232).  Here the first-order
    linear recurrence is evaluated with ``lax.associative_scan`` — O(log L)
    depth, fully on-device, batched.
    """
    coefs = jnp.full_like(wav, coef)

    def combine(left, right):
        a_l, b_l = left
        a_r, b_r = right
        return a_l * a_r, b_r + a_r * b_l

    _, y = jax.lax.associative_scan(combine, (coefs, wav), axis=-1)
    return y


def dynamic_range_compression(x: jax.Array, clip_val: float = 1e-5) -> jax.Array:
    """log(clamp(x, min=clip_val)) (reference: audio_processing.py:71-77)."""
    return jnp.log(jnp.maximum(x, clip_val))


def dynamic_range_decompression(x: jax.Array) -> jax.Array:
    """exp(x) (reference: audio_processing.py:80-86)."""
    return jnp.exp(x)


def mel_normalize(mel: jax.Array) -> jax.Array:
    """Map log-mel from [log 1e-5, ~0] to [-1, 1] (reference: vid_aud_grid.py:234-236)."""
    return (mel - LOG1E5) / (-LOG1E5 / 2.0) - 1.0


def mel_denormalize(mel: jax.Array) -> jax.Array:
    """Inverse of :func:`mel_normalize` (reference: vid_aud_grid.py:238-240)."""
    return (mel + 1.0) * (-LOG1E5 / 2.0) + LOG1E5
