"""GRID ASR content-accuracy evaluation on generated artifacts.

Capability parity with reference ASR_model/GRID/test.py +
src/data/vid_aud_GRID_test.py: globs generated <sub>/<file>.npz mels (or
wavs) produced by the test driver, loads ground-truth transcripts from GRID
``.align`` files (skipping SIL/SP), runs the CTC-style char recognizer, and
reports greedy-decode WER/CER.
"""

from __future__ import annotations

import glob
import os
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from vcagan.configs import AudioConfig
from vcagan.dsp import MelPipeline, mel_denormalize, mel_normalize
from vcagan.eval.asr_models import GridASR
from vcagan.eval.text import greedy_decode_batch


def read_align_words(path: str) -> List[str]:
    """GRID .align -> spoken words, SIL/SP removed
    (reference vid_aud_GRID_test.py:74-82)."""
    words = []
    with open(path) as f:
        for line in f:
            parts = line.strip().split()
            if len(parts) >= 3 and parts[2] not in ("SIL", "SP", "sil", "sp"):
                words.append(parts[2])
    return words


def list_generated(data_dir: str, wav: bool = False) -> List[str]:
    ext = "*.wav" if wav else "*.npz"
    return sorted(glob.glob(os.path.join(data_dir, "*", ext)))


def load_mel_from_npz(path: str, max_mel_frames: int) -> Tuple[np.ndarray, int]:
    """Generated npz -> denormalized log-mel (80, T), padded with 0.0
    (reference vid_aud_GRID_test.py:106-117)."""
    data = np.load(path)
    mel = np.asarray(data["mel"])  # (1, 80, T) normalized [-1, 1]
    data.close()
    mel = mel.reshape(mel.shape[-2], mel.shape[-1])
    mel = np.asarray(mel_denormalize(jnp.asarray(mel)))
    t = mel.shape[-1]
    if t < max_mel_frames:
        mel = np.pad(mel, ((0, 0), (0, max_mel_frames - t)))
    return mel[:, :max_mel_frames], min(t, max_mel_frames)


def load_mel_from_wav(
    path: str, pipeline: MelPipeline, max_mel_frames: int
) -> Tuple[np.ndarray, int]:
    from vcagan.io.wav import read_wav

    sr, wav = read_wav(path)
    wav = jnp.asarray(wav)[None]
    wav = pipeline.condition_waveform(wav)
    mel, _ = pipeline.mel_spectrogram(wav)  # (1, T, 80) log-domain
    mel = np.asarray(mel)[0].T  # (80, T)
    t = mel.shape[-1]
    if t < max_mel_frames:
        mel = np.pad(mel, ((0, 0), (0, max_mel_frames - t)))
    return mel[:, :max_mel_frames], min(t, max_mel_frames)


def evaluate(
    data_dir: str,
    gt_path: str,
    variables,
    wav: bool = False,
    batch_size: int = 16,
    max_timesteps: int = 75,
    audio_config: Optional[AudioConfig] = None,
) -> Tuple[float, float]:
    """Returns (WER, CER) over all generated artifacts in ``data_dir``.

    ``variables`` are GridASR flax variables ({'params', 'batch_stats'}),
    e.g. converted from a reference torch checkpoint via
    tools/convert_torch_ckpt.py.
    """
    pipeline = MelPipeline(audio_config or AudioConfig())
    model = GridASR()
    max_mel = max_timesteps * 4

    @jax.jit
    def forward(mel_batch):
        # model consumes the same log-domain mel the reference feeds it
        return model.apply(variables, mel_batch, train=False)

    files = list_generated(data_dir, wav)
    if not files:
        raise FileNotFoundError(f"no generated {'wav' if wav else 'npz'} under {data_dir}")

    wers, cers = [], []
    for start in range(0, len(files), batch_size):
        chunk = files[start : start + batch_size]
        mels, labels = [], []
        for path in chunk:
            sub_dir, fname = os.path.split(path)
            sub = os.path.basename(sub_dir)
            align = os.path.join(
                gt_path, sub.split("_")[0], "align",
                os.path.splitext(fname)[0] + ".align",
            )
            words = read_align_words(align) if os.path.exists(align) else []
            labels.append(" ".join(words).upper())
            if wav:
                mel, _ = load_mel_from_wav(path, pipeline, max_mel)
            else:
                mel, _ = load_mel_from_npz(path, max_mel)
            mels.append(mel)
        batch = jnp.asarray(np.stack(mels))[..., None]  # (B, 80, T, 1)
        logits = forward(batch)
        w, c, _ = greedy_decode_batch(logits, labels)
        wers.append(w)
        cers.append(c)
    return float(np.mean(wers)), float(np.mean(cers))
