"""Batched Griffin-Lim phase reconstruction as a single compiled scan.

The reference iterates 60 Python-level ISTFT/STFT rounds per call
(reference: src/data/audio_processing.py:51-68), each a separate CUDA
launch chain.  Here the whole loop is one ``lax.scan`` inside jit: the
magnitudes stay resident on-chip, every iteration is two batched FFTs plus
fused element-wise work, and the batch dimension rides the VPU/MXU freely.
This op dominates the mel-frames/sec benchmark path.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from vcagan.dsp.stft import STFTParams, istft, stft


def griffin_lim(
    magnitudes: jax.Array,
    key: jax.Array,
    params: STFTParams,
    n_iters: int = 60,
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

    def one_round(angles, _):
        signal = istft(magnitudes, angles, params)
        new_angles = jnp.angle(stft(signal, params))
        return new_angles.astype(magnitudes.dtype), None

    angles, _ = jax.lax.scan(one_round, angles, None, length=n_iters)
    return istft(magnitudes, angles, params)
