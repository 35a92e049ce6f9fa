"""GRID dataset: host-side decode + device-side feature pipeline.

Replaces the reference's torch ``MultiDataset`` + DataLoader worker pool
(reference: vid_aud_grid.py:24-170, SURVEY.md §2.2) with a thin host loader:

- decode: cv2 video frames + wav audio (this image has no ffmpeg/librosa;
  the preprocessing CLI emits 16 kHz wav next to each clip)
- per-clip python work is ONLY file IO and window selection; the transform
  (crop/resize/flip/normalize/erase) and the mel pipeline run batched
  on-device (vcagan.data.transforms, vcagan.dsp)
- batches come out as vcagan.train.Batch with static shapes

When the real corpus is absent, ``SyntheticGridSource`` (vcagan.data
.synthetic) provides structurally identical clips for tests/benchmarks.
"""

from __future__ import annotations

import os
from typing import Iterator, List, Optional, Tuple

import numpy as np

from vcagan.configs import AudioConfig, DataConfig
from vcagan.data.splits import grid_file_list
from vcagan.data.synthetic import SyntheticLipSpeech


def decode_video(path: str) -> np.ndarray:
    """mp4/mpg -> (T, H, W, 3) uint8 via OpenCV."""
    import cv2

    cap = cv2.VideoCapture(path)
    frames = []
    while True:
        ok, frame = cap.read()
        if not ok:
            break
        frames.append(cv2.cvtColor(frame, cv2.COLOR_BGR2RGB))
    cap.release()
    if not frames:
        raise IOError(f"no frames decoded from {path}")
    return np.stack(frames)


def load_audio(path: str, sample_rate: int = 16_000) -> np.ndarray:
    """wav -> float32 mono in [-1, 1].  (The reference loads flac via
    librosa; this framework's preprocessing emits wav.)"""
    import scipy.io.wavfile as wavfile

    sr, data = wavfile.read(path)
    if data.ndim > 1:
        data = data.mean(axis=1)
    if data.dtype == np.int16:
        data = data.astype(np.float32) / 32768.0
    elif data.dtype == np.int32:
        data = data.astype(np.float32) / 2147483648.0
    else:
        data = data.astype(np.float32)
    if sr != sample_rate:
        from scipy.signal import resample_poly
        from math import gcd

        g = gcd(sr, sample_rate)
        data = resample_poly(data, sample_rate // g, sr // g).astype(np.float32)
    return data


def audio_path_for(video_path: str) -> str:
    """<...>/video/<f>.mp4 -> <...>/audio/<f>.wav (reference swaps
    'video'->'audio' and .mp4->.flac, vid_aud_grid.py:130)."""
    base = video_path.replace("/video/", "/audio/")
    return os.path.splitext(base)[0] + ".wav"


class GridClipSource:
    """Real-corpus clip source with the reference's split semantics."""

    def __init__(self, config: DataConfig, mode: str, splits_dir: str = "./data"):
        self.config = config
        self.mode = mode
        self.files = grid_file_list(
            config.data_root, mode, config.subject, splits_dir
        )

    def __len__(self) -> int:
        return len(self.files)

    def clip(self, idx: int) -> Tuple[np.ndarray, np.ndarray]:
        path = self.files[idx]
        video = decode_video(path)
        audio = load_audio(audio_path_for(path))
        return video, audio

    def name(self, idx: int) -> str:
        return os.path.splitext(
            os.path.relpath(self.files[idx], self.config.data_root)
        )[0]


class GridDataset:
    """Batched iterator producing model-ready numpy arrays.

    The device-side half (transform + mel) lives in
    ``vcagan.data.device_pipeline``; this class handles file lists,
    shuffling, window sampling, and padding to static shapes.
    """

    def __init__(
        self,
        source,
        audio_config: Optional[AudioConfig] = None,
        data_config: Optional[DataConfig] = None,
        mode: str = "train",
        seed: int = 0,
    ):
        self.source = source
        self.audio = audio_config or AudioConfig()
        self.data = data_config or DataConfig()
        self.mode = mode
        self.sample_window = mode == "train"
        self.rng = np.random.default_rng(seed)
        self.max_frames = (
            self.data.window_size if self.sample_window else self.data.max_v_timesteps
        )

    def __len__(self) -> int:
        return len(self.source)

    def epoch(self, batch_size: int, shuffle: bool = True) -> Iterator[dict]:
        """Yield raw (host-side) batches; the caller feeds them through the
        jitted device pipeline."""
        order = np.arange(len(self.source))
        if shuffle:
            self.rng.shuffle(order)
        for start in range(0, len(order) - batch_size + 1, batch_size):
            idxs = order[start : start + batch_size]
            yield self._collate(idxs)

    def _collate(self, idxs: List[int]) -> dict:
        w = self.max_frames
        mel_per = self.audio.mel_per_video_frame
        hop = self.audio.hop_length
        videos, wavs, vid_lens = [], [], []
        for i in idxs:
            video, audio = self.source.clip(int(i))
            t = video.shape[0]
            if self.sample_window:
                st = int(self.rng.integers(0, max(t - w, 0) + 1))
                video = video[st : st + w]
                a0 = st * mel_per * hop
                audio = audio[a0 : a0 + w * mel_per * hop]
            else:
                video = video[:w]
                audio = audio[: w * mel_per * hop]
            vid_lens.append(video.shape[0])
            # pad video to w frames, audio to full window
            if video.shape[0] < w:
                pad = np.zeros((w - video.shape[0],) + video.shape[1:], video.dtype)
                video = np.concatenate([video, pad])
            need = w * mel_per * hop
            if audio.shape[0] < need:
                audio = np.concatenate(
                    [audio, np.zeros(need - audio.shape[0], np.float32)]
                )
            videos.append(video)
            wavs.append(audio)
        return {
            "video_raw": np.stack(videos),  # (B, W, H, W, 3) uint8
            "wav": np.stack(wavs),  # (B, W*4*160) float32
            "vid_len": np.asarray(vid_lens, np.int32),
            "mel_len": np.asarray([v * mel_per for v in vid_lens], np.int32),
        }


def make_grid_dataset(
    config_data: DataConfig,
    config_audio: AudioConfig,
    mode: str,
    splits_dir: str = "./data",
    synthetic_fallback: bool = True,
    seed: int = 0,
) -> GridDataset:
    """Real corpus if present, synthetic fixtures otherwise."""
    use_synthetic = False
    try:
        source = GridClipSource(config_data, mode, splits_dir)
        if len(source) == 0:
            use_synthetic = True
    except (FileNotFoundError, OSError):
        use_synthetic = True
    if use_synthetic:
        if not synthetic_fallback:
            raise FileNotFoundError(
                f"GRID corpus/splits not found under {config_data.data_root} / {splits_dir}"
            )
        source = SyntheticLipSpeech(num_clips=16)
    return GridDataset(source, config_audio, config_data, mode, seed)
