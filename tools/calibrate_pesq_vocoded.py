"""Calibrate the PESQ-NB estimate on the product's own distortion family.

The estimator (vcagan/eval/pesq_nb.py) is anchored on the published
white-noise P.862 curve; nothing previously exercised it on the distortion
it actually scores in this framework: GRIFFIN-LIM VOCODED speech — phase
reconstruction error that varies with GL iteration count, plus mel-domain
prediction error.  This tool runs the product's exact inversion chain
(normalized log-mel -> mel_to_linear -> GL(k) -> de-emphasis,
vcagan/dsp/pipeline.py) on synthetic harmonic voices and sweeps

  - GL iterations k in {1, 2, 5, 10, 20, 60}   (phase-error axis)
  - mel-domain noise sigma in {0, .02, .05, .1, .2, .4}  at k=60
    (prediction-error axis, the shape of a bad generator)

and reports the estimator's scores with STOI alongside.  The claim being
calibrated: scores are MONOTONE and well-separated along both axes, i.e.
the estimate orders vocoded outputs by true distortion the way the ITU
binary would.  Reference consumer of the real PESQ: train.py:397-404.

Usage:  python tools/calibrate_pesq_vocoded.py [--voices 3] [--seconds 3.0]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from vcagan.runtime import enable_compilation_cache

enable_compilation_cache()

import jax
import jax.numpy as jnp
import numpy as np


def harmonic_voice(n, sr, seed):
    """Enveloped harmonic complex, the same family as tests/test_pesq.py."""
    rng = np.random.default_rng(seed)
    t = np.arange(n) / sr
    f0 = 100 + 80 * rng.random()
    env = np.clip(np.sin(2 * np.pi * (1.5 + rng.random()) * t) + 0.4, 0, None)
    sig = sum(
        np.sin(2 * np.pi * f0 * k * t + rng.random() * 6.28) / k
        for k in range(1, 10)
    )
    return (env * sig * 0.1).astype(np.float32)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--voices", type=int, default=3)
    p.add_argument("--seconds", type=float, default=3.0)
    p.add_argument("--sr", type=int, default=16_000)
    args = p.parse_args()

    from vcagan.configs import AudioConfig
    from vcagan.dsp import MelPipeline
    from vcagan.dsp.audio import mel_normalize
    from vcagan.eval.pesq_nb import pesq_nb
    from vcagan.eval.stoi_np import stoi_np

    n = int(args.seconds * args.sr)
    gts = np.stack([harmonic_voice(n, args.sr, s) for s in range(args.voices)])

    base_pipe = MelPipeline(AudioConfig())
    cond = jax.jit(base_pipe.condition_waveform)(jnp.asarray(gts))
    mel_log, _ = jax.jit(base_pipe.mel_spectrogram)(cond)
    mel_norm = np.asarray(jax.jit(mel_normalize)(mel_log))
    # GT for scoring: what the de-emphasized vocode chain reconstructs
    # toward — peak-normalized input (the GRID val comparison's raw["wav"])
    gt_score = np.asarray(gts / np.abs(gts).max(axis=1, keepdims=True) * 0.9)

    def vocode(mel_n, iters, key):
        pipe = MelPipeline(AudioConfig(griffin_lim_iters=iters))
        return np.asarray(
            jax.jit(pipe.inverse_mel)(jnp.asarray(mel_n), jax.random.PRNGKey(key))
        )

    def score(wavs):
        L = min(wavs.shape[1], gt_score.shape[1])
        ps = [pesq_nb(gt_score[i][:L], wavs[i][:L], args.sr) for i in range(len(wavs))]
        ss = [stoi_np(gt_score[i][:L], wavs[i][:L], args.sr) for i in range(len(wavs))]
        return round(float(np.mean(ps)), 3), round(float(np.mean(ss)), 4)

    gl_axis = {}
    for k in (1, 2, 5, 10, 20, 60):
        pesq_m, stoi_m = score(vocode(mel_norm, k, 0))
        gl_axis[k] = {"pesq": pesq_m, "stoi": stoi_m}

    rng = np.random.default_rng(7)
    noise = rng.standard_normal(mel_norm.shape).astype(np.float32)
    noise_axis = {}
    for sig in (0.0, 0.02, 0.05, 0.1, 0.2, 0.4):
        noisy = np.clip(mel_norm + sig * noise, -1.0, 1.0)
        pesq_m, stoi_m = score(vocode(noisy, 60, 0))
        noise_axis[sig] = {"pesq": pesq_m, "stoi": stoi_m}

    gl_scores = [gl_axis[k]["pesq"] for k in sorted(gl_axis)]
    noise_scores = [noise_axis[s]["pesq"] for s in sorted(noise_axis)]
    out = {
        "gl_iters_axis": gl_axis,
        "mel_noise_axis": noise_axis,
        "gl_monotone_nondecreasing": bool(
            all(b >= a - 0.05 for a, b in zip(gl_scores, gl_scores[1:]))
        ),
        "noise_monotone_nonincreasing": bool(
            all(b <= a + 0.05 for a, b in zip(noise_scores, noise_scores[1:]))
        ),
        "gl_range": round(gl_scores[-1] - gl_scores[0], 3),
        "noise_range": round(noise_scores[0] - noise_scores[-1], 3),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
