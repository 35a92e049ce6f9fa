"""LRW word-classification accuracy on generated artifacts.

Capability parity with reference ASR_model/LRW/test.py +
src/data/vid_aud_lrw_test.py: globs <class>/<split>/<class>_<n>.npz (or
wav), label = filename word prefix, fixed 29-frame clips (116 mel frames),
500-way classification; reports ACC and WER = 1 - ACC.
"""

from __future__ import annotations

import glob
import os
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from vcagan.configs import AudioConfig
from vcagan.dsp import MelPipeline, mel_denormalize
from vcagan.eval.asr_models import LRWClassifier

LRW_MEL_FRAMES = 116  # 29 video frames x 4 (reference vid_aud_lrw_test.py:76)


def load_class_list(path: str) -> List[str]:
    with open(path) as f:
        return [line.strip().upper() for line in f if line.strip()]


def evaluate(
    data_dir: str,
    class_list: List[str],
    variables,
    wav: bool = False,
    batch_size: int = 32,
    audio_config: Optional[AudioConfig] = None,
) -> Tuple[float, float]:
    """Returns (accuracy, wer=1-accuracy)."""
    word2int = {w: i for i, w in enumerate(class_list)}
    pipeline = MelPipeline(audio_config or AudioConfig())
    model = LRWClassifier(num_classes=len(class_list))

    ext = "*.wav" if wav else "*.npz"
    files = sorted(glob.glob(os.path.join(data_dir, "*", "*", ext)))
    if not files:
        raise FileNotFoundError(f"no generated artifacts under {data_dir}")

    @jax.jit
    def forward(mels):
        return model.apply(variables, mels, train=False)

    correct, total = 0, 0
    for start in range(0, len(files), batch_size):
        chunk = files[start : start + batch_size]
        mels, targets = [], []
        for path in chunk:
            word = os.path.split(path)[-1].split("_")[0].upper()
            targets.append(word2int[word])
            if wav:
                from vcagan.io.wav import read_wav

                _, w = read_wav(path)
                w = pipeline.condition_waveform(jnp.asarray(w)[None])
                mel, _ = pipeline.mel_spectrogram(w)
                mel = np.asarray(mel)[0].T
            else:
                data = np.load(path)
                mel = np.asarray(data["mel"])
                data.close()
                mel = mel.reshape(mel.shape[-2], mel.shape[-1])
                mel = np.asarray(mel_denormalize(jnp.asarray(mel)))
            t = mel.shape[-1]
            if t < LRW_MEL_FRAMES:
                mel = np.pad(mel, ((0, 0), (0, LRW_MEL_FRAMES - t)))
            mels.append(mel[:, :LRW_MEL_FRAMES])
        logits = forward(jnp.asarray(np.stack(mels))[..., None])
        preds = np.argmax(np.asarray(logits), axis=-1)
        correct += int((preds == np.asarray(targets)).sum())
        total += len(chunk)
    acc = correct / max(total, 1)
    return acc, 1.0 - acc
