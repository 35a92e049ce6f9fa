"""Batched Griffin-Lim phase reconstruction as a single compiled scan.

The reference iterates 60 Python-level ISTFT/STFT rounds per call
(reference: src/data/audio_processing.py:51-68), each a separate CUDA
launch chain.  Here the whole loop is one ``lax.scan`` inside jit: the
magnitudes stay resident on-chip, every iteration is two batched FFTs plus
fused element-wise work, and the batch dimension rides the VPU/MXU freely.

Two TPU-specific choices:
- the phase is carried as a UNIT PHASOR (re, im) rather than an angle, so
  each iteration is transcendental-free (a normalize replaces
  angle -> cos/sin);
- the scan is partially unrolled to amortize while-loop overhead.

This op dominates the mel-frames/sec benchmark path.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from vcagan.dsp.stft import STFTParams, istft_complex, stft


def griffin_lim(
    magnitudes: jax.Array,
    key: jax.Array,
    params: STFTParams,
    n_iters: int = 60,
    unroll: int = 5,
) -> jax.Array:
    """Reconstruct waveforms from linear-magnitude spectrograms.

    magnitudes: (B, T, n_bins) non-negative.
    Returns (B, hop * (T-1)) waveforms.

    Semantics match the reference: random uniform phase init, then
    ``n_iters`` rounds of phase re-estimation, final synthesis with the
    original magnitudes throughout.
    """
    angles = jax.random.uniform(
        key, magnitudes.shape, magnitudes.dtype, minval=-jnp.pi, maxval=jnp.pi
    )
    phasor = (jnp.cos(angles), jnp.sin(angles))

    def one_round(phasor, _):
        re, im = phasor
        signal = istft_complex(magnitudes * re, magnitudes * im, params)
        z = stft(signal, params)
        zr = jnp.real(z).astype(magnitudes.dtype)
        zi = jnp.imag(z).astype(magnitudes.dtype)
        inv_norm = jax.lax.rsqrt(zr * zr + zi * zi + 1e-16)
        return (zr * inv_norm, zi * inv_norm), None

    phasor, _ = jax.lax.scan(
        one_round, phasor, None, length=n_iters, unroll=min(unroll, n_iters)
    )
    re, im = phasor
    return istft_complex(magnitudes * re, magnitudes * im, params)
