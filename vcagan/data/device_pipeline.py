"""Device-side input pipeline: raw decoded batches -> model-ready Batch.

One jitted XLA program per batch does everything heavy that the reference's
DataLoader workers did in per-frame Python (SURVEY.md §3.1 hot loop (c)):
clip transform (crop/resize/flip/gray/normalize/erase), STFT framing + DFT
+ mel projection on the MXU, normalization, and pad masking.

The cheap scalar audio chain (full-clip peak-norm, pre-emphasis, clamp,
reflect pad) runs on host in ``vcagan.data.audio_host`` so it is
numerically identical to the reference's per-item scipy ops: the host
hands this pipeline ``raw["aud_cond"]``, a slice of the reflect-padded
conditioned FULL clip positioned so that non-centered framing here equals
the reference's full-clip centered STFT frames of the chosen window
(reference: vid_aud_grid.py:140-161).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from vcagan.configs import AudioConfig, DataConfig
from vcagan.data.transforms import prepare_clip
from vcagan.dsp import MelPipeline, mel_normalize
from vcagan.dsp.stft import stft_magnitude
from vcagan.train.step import Batch


def make_device_pipeline(
    audio_config: Optional[AudioConfig] = None,
    data_config: Optional[DataConfig] = None,
    augment: bool = False,
):
    """Returns jitted ``process(raw: dict, key) -> Batch``.

    ``raw`` is a GridDataset._collate dict: video_raw (B, W, H, W, 3) uint8,
    aud_cond (B, W*4*160 + n_fft) conditioned audio, wav (raw window audio),
    vid_len, mel_len.
    """
    acfg = audio_config or AudioConfig()
    dcfg = data_config or DataConfig()
    pipe = MelPipeline(acfg)

    @jax.jit
    def process(raw, key):
        video_raw = raw["video_raw"]
        b, w = video_raw.shape[0], video_raw.shape[1]
        keys = jax.random.split(key, b)
        video = jax.vmap(
            lambda fr, k: prepare_clip(
                fr,
                k,
                crop_box=None if dcfg.host_crop else dcfg.grid_crop_box,
                out_size=dcfg.crop_size,
                augment=augment,
                erase_size=dcfg.erase_size,
            )
        )(video_raw, keys)  # (B, W, 112, 112, 1)

        # Full-clip-faithful mel: the host already conditioned + positioned
        # the segment; frame WITHOUT extra padding.  The segment yields
        # 4W+1 frames (the train crop uses [0, 4W), matching the
        # reference's mel[:, :, 4st:4st+4W] window, vid_aud_grid.py:182).
        mag, _ = stft_magnitude(raw["aud_cond"], pipe.stft_params, center=False)
        mel = pipe.compress_mel(mag)
        n_mel = w * acfg.mel_per_video_frame
        mel = mel_normalize(mel[:, :n_mel])
        spec = mag[:, :n_mel]

        # Reference pads NORMALIZED mel and raw spec with 0.0
        # (vid_aud_grid.py:160-161); mel_len carries num_a_frames.
        mel_len = raw["mel_len"]
        valid = (jnp.arange(n_mel)[None, :] < mel_len[:, None])[:, :, None]
        mel = jnp.where(valid, mel, 0.0)
        spec = jnp.where(valid, spec, 0.0)

        return Batch(
            video=video,
            mel=jnp.swapaxes(mel, 1, 2),  # (B, 80, 4W)
            spec=jnp.swapaxes(spec, 1, 2),  # (B, 321, 4W)
            vid_len=raw["vid_len"],
            mel_len=mel_len,
        )

    return process
