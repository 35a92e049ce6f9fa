"""Device-side input pipeline: raw decoded batches -> model-ready Batch.

One jitted XLA program per batch does everything the reference's DataLoader
workers did in per-frame Python (SURVEY.md §3.1 hot loop (c)): clip
transform (crop/resize/flip/gray/normalize/erase), waveform conditioning,
STFT + mel projection, normalization, and padding — all batched on the MXU.
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp

from vcagan.configs import AudioConfig, DataConfig
from vcagan.data.transforms import prepare_clip
from vcagan.dsp import MelPipeline, mel_normalize
from vcagan.train.step import Batch


def make_device_pipeline(
    audio_config: Optional[AudioConfig] = None,
    data_config: Optional[DataConfig] = None,
    augment: bool = False,
):
    """Returns jitted ``process(video_raw, wav, vid_len, mel_len, key) -> Batch``."""
    acfg = audio_config or AudioConfig()
    dcfg = data_config or DataConfig()
    pipe = MelPipeline(acfg)

    @jax.jit
    def process(video_raw, wav, vid_len, mel_len, key):
        b, w = video_raw.shape[0], video_raw.shape[1]
        keys = jax.random.split(key, b)
        video = jax.vmap(
            lambda fr, k: prepare_clip(
                fr,
                k,
                crop_box=dcfg.grid_crop_box,
                out_size=dcfg.crop_size,
                augment=augment,
                erase_size=dcfg.erase_size,
            )
        )(video_raw, keys)  # (B, W, 112, 112, 1)

        wav_c = pipe.condition_waveform(wav)
        mel, spec = pipe.mel_spectrogram(wav_c)  # (B, T+1, 80/321)
        n_mel = w * acfg.mel_per_video_frame
        mel = mel_normalize(mel[:, :n_mel])  # truncate the odd centered frame
        spec = spec[:, :n_mel]

        return Batch(
            video=video,
            mel=jnp.swapaxes(mel, 1, 2),  # (B, 80, 4W)
            spec=jnp.swapaxes(spec, 1, 2),  # (B, 321, 4W)
            vid_len=vid_len,
            mel_len=mel_len,
        )

    return process
