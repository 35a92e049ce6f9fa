"""LRS2 / LRS3 datasets: crop-coordinate-joined file lists, variable-length
clips, dynamic per-frame lip crops, and the LRS spec-normalization chain.

Capability parity with reference src/data/vid_aud_lrs2.py / vid_aud_lrs3.py:
- file lists joined with per-frame lip-center tables
  (vid_aud_lrs2.py:40-85; LRS3 uses 3 partition crop files and the SVTS
  unseen splits, vid_aud_lrs3.py:27-85)
- 80x80 crop around the stored lip center with +/-5 px train jitter,
  resized to 112^2 (build_tensor, vid_aud_lrs2.py:87-120) — implemented
  on-device as a vmapped dynamic_slice over padded frames
- long clips truncated at max_v_timesteps (vid_aud_lrs2.py:163-169)
- LRS spec chain: per-clip min-max -> log compression -> [-1, 1]
  (vid_aud_lrs2.py:176-178), inverted with the x14 global scale
  (denormalize_spec, vid_aud_lrs2.py:290-296)
- variable-length batches padded with -1.0 (collate_fn,
  vid_aud_lrs2.py:203-233) and bucketed to a few static shapes so XLA
  never recompiles per batch
"""

from __future__ import annotations

import os
from typing import Dict, Iterator, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from vcagan.configs import AudioConfig, DataConfig
from vcagan.data import audio_host
from vcagan.data.grid import decode_video, load_audio
from vcagan.data.splits import load_crop_table
from vcagan.data.transforms import PIXEL_MEAN, PIXEL_STD, host_luma_u8
from vcagan.dsp import MelPipeline, dynamic_range_compression, mel_normalize
from vcagan.dsp.stft import stft_magnitude
from vcagan.train.step import Batch

SPEC_DENORM_SCALE = 14.0  # reference vid_aud_lrs2.py:295


def lrs_normalize_spec(
    spec: jax.Array, valid: Optional[jax.Array] = None
) -> jax.Array:
    """Per-clip min-max -> log -> [-1, 1] (reference vid_aud_lrs2.py:176-178).

    spec: (B, T, 321) linear magnitudes; min/max per clip over all bins.
    ``valid`` (B, T) bool restricts the min/max to real (unpadded) frames —
    the reference normalizes the windowed spec BEFORE padding, so padding
    never enters the statistics.
    """
    if valid is not None:
        m = valid[:, :, None]
        lo = jnp.min(jnp.where(m, spec, jnp.inf), axis=(1, 2), keepdims=True)
        hi = jnp.max(jnp.where(m, spec, -jnp.inf), axis=(1, 2), keepdims=True)
    else:
        lo = jnp.min(spec, axis=(1, 2), keepdims=True)
        hi = jnp.max(spec, axis=(1, 2), keepdims=True)
    unit = (spec - lo) / jnp.maximum(hi - lo, 1e-8)
    return mel_normalize(dynamic_range_compression(unit))


def lrs_denormalize_spec(spec_norm: jax.Array) -> jax.Array:
    """[-1,1] log-spec -> linear magnitudes scaled by 14
    (reference inverse_spec chain, vid_aud_lrs2.py:257-272)."""
    from vcagan.dsp import mel_denormalize

    return jnp.exp(mel_denormalize(spec_norm)) * SPEC_DENORM_SCALE


def crop_resize_dynamic(
    frames: jax.Array,
    centers: jax.Array,
    jitter: jax.Array,
    out_size: int = 112,
    half: int = 40,
) -> jax.Array:
    """Per-frame 2*half-square crops around lip centers -> resize.

    frames: (T, H, W, C) uint8/float; centers: (T, 2) int (x, y);
    jitter: scalar int shift (the reference draws one shift per clip).
    Out-of-bounds crops read zero padding (PIL crop semantics).
    """
    t, h, w, c = frames.shape
    x = frames.astype(jnp.float32)
    if frames.dtype == jnp.uint8:
        x = x / 255.0
    pad = half + 8  # covers +/-5 jitter and degenerate centers near edges
    x = jnp.pad(x, ((0, 0), (pad, pad), (pad, pad), (0, 0)))

    def one(frame, center):
        cx = jnp.clip(center[0] + jitter, -8, w + 8)
        cy = jnp.clip(center[1] + jitter, -8, h + 8)
        y0 = cy - half + pad
        x0 = cx - half + pad
        return jax.lax.dynamic_slice(
            frame, (y0, x0, 0), (2 * half, 2 * half, c)
        )

    crops = jax.vmap(one)(x, centers.astype(jnp.int32))  # (T, 80, 80, C)
    crops = jax.image.resize(crops, (t, out_size, out_size, c), "bilinear")
    if c == 3:
        luma = jnp.asarray([0.299, 0.587, 0.114], crops.dtype)
        crops = jnp.sum(crops * luma, axis=-1, keepdims=True)
    return (crops - PIXEL_MEAN) / PIXEL_STD


SUP_MARGIN = 8  # > max |train jitter| (5); matches crop_resize_dynamic's pad


def precrop_superset(
    video: np.ndarray,
    coords: np.ndarray,
    half: int = 40,
    margin: int = SUP_MARGIN,
):
    """Host half of DataConfig.host_crop for LRS: cut a (2*(half+margin))^2
    zero-padded superset around each frame's CLIPPED lip center so only
    ~96^2 pixels cross the host->device link instead of the full frame.

    clip() is 1-Lipschitz, so the device's jittered window position
    ``clip(c + j)`` (|j| <= 5 < margin) never strays more than ``margin``
    from ``clip(c)`` — the 2*half window always lies inside the superset,
    with identical zero-padding semantics to crop_resize_dynamic's
    whole-frame pad.  Returns (superset (T', S, S, C) uint8, clipped
    centers (T', 2) int32) with T' = min(len(video), len(coords)).
    """
    t = min(video.shape[0], coords.shape[0])
    h, w = video.shape[1:3]
    s = half + margin
    cm = np.stack(
        [
            np.clip(coords[:t, 0], -margin, w + margin),
            np.clip(coords[:t, 1], -margin, h + margin),
        ],
        axis=1,
    ).astype(np.int32)
    out = np.zeros((t, 2 * s, 2 * s, video.shape[3]), video.dtype)
    for i in range(t):
        x0, y0 = int(cm[i, 0]) - s, int(cm[i, 1]) - s
        ys0, ys1 = max(y0, 0), min(y0 + 2 * s, h)
        xs0, xs1 = max(x0, 0), min(x0 + 2 * s, w)
        if ys1 > ys0 and xs1 > xs0:
            out[i, ys0 - y0 : ys1 - y0, xs0 - x0 : xs1 - x0] = video[
                i, ys0:ys1, xs0:xs1
            ]
    return out, cm


def crop_resize_dynamic_sup(
    sup: jax.Array,
    centers: jax.Array,
    centers_m: jax.Array,
    hw: jax.Array,
    jitter: jax.Array,
    out_size: int = 112,
    half: int = 40,
    margin: int = SUP_MARGIN,
) -> jax.Array:
    """crop_resize_dynamic over host-precropped supersets (host_crop path).

    sup: (T, S, S, C) from precrop_superset; centers: ORIGINAL (T, 2)
    (x, y); centers_m: clipped centers the supersets were cut around;
    hw: (2,) original (h, w) — the jitter clip bounds.  Reads the exact
    pixels (and zero padding) the full-frame path would.
    """
    t, _, _, c = sup.shape
    x = sup.astype(jnp.float32)
    if sup.dtype == jnp.uint8:
        x = x / 255.0
    h, w = hw[0], hw[1]

    def one(frame, ct, cm):
        cx = jnp.clip(ct[0] + jitter, -margin, w + margin)
        cy = jnp.clip(ct[1] + jitter, -margin, h + margin)
        return jax.lax.dynamic_slice(
            frame,
            (cy - cm[1] + margin, cx - cm[0] + margin, 0),
            (2 * half, 2 * half, c),
        )

    crops = jax.vmap(one)(x, centers.astype(jnp.int32), centers_m)
    crops = jax.image.resize(crops, (t, out_size, out_size, c), "bilinear")
    if c == 3:
        luma = jnp.asarray([0.299, 0.587, 0.114], crops.dtype)
        crops = jnp.sum(crops * luma, axis=-1, keepdims=True)
    return (crops - PIXEL_MEAN) / PIXEL_STD


class LRSClipSource:
    """LRS2/LRS3 clips with lip-center tables."""

    def __init__(self, config: DataConfig, mode: str, splits_dir: str = "./data"):
        self.config = config
        self.mode = mode
        self.dataset = config.dataset
        self.crops: Dict[str, List[int]] = {}
        self.files: List[str] = []
        self._build(splits_dir)

    def _build(self, splits_dir: str):
        base = os.path.join(splits_dir, self.dataset)
        if self.dataset == "LRS2":
            crop_dir = os.path.join(base, "LRS2_crop")
            partitions = ["main"] + (["pretrain"] if self.mode == "train" else [])
            for part in partitions:
                table_path = os.path.join(crop_dir, f"preprocess_{part}.txt")
                if os.path.exists(table_path):
                    self.crops.update(load_crop_table(table_path, part))
            list_name = {"train": "train.txt", "val": "val.txt", "test": "test.txt"}[
                self.mode
            ]
            names = []
            list_path = os.path.join(base, list_name)
            with open(list_path) as f:
                for line in f:
                    entry = line.strip().split()[0] if line.strip() else ""
                    if entry:
                        names.append(f"main/{entry}")
            if self.mode == "train":
                pre = os.path.join(base, "pretrain.txt")
                if os.path.exists(pre):
                    with open(pre) as f:
                        names += [
                            f"pretrain/{l.strip()}" for l in f if l.strip()
                        ]
            self.files = [n for n in names if n in self.crops]
            self.audio_tree = "LRS2-BBC_audio"
            self.video_tree = "LRS2-BBC"
        else:  # LRS3
            crop_dir = os.path.join(base, "LRS3_crop")
            for part in ("pretrain", "trainval", "test"):
                table_path = os.path.join(crop_dir, f"preprocess_{part}.txt")
                if os.path.exists(table_path):
                    self.crops.update(load_crop_table(table_path, part))
            split_path = os.path.join(base, f"lrs3_unseen_{self.mode}.txt")
            with open(split_path) as f:
                names = [l.strip() for l in f if l.strip()]
            self.files = [n for n in names if n in self.crops]
            self.audio_tree = "LRS3-TED_audio"
            self.video_tree = "LRS3-TED"

    def __len__(self) -> int:
        return len(self.files)

    def frame_count(self, idx: int) -> int:
        """Video frame count from the crop table (one (x, y) row per frame)
        — available WITHOUT decoding, so multi-host bucket decisions can be
        made over the global batch (the reference asserts crop/frame
        agreement at vid_aud_lrs2.py:192, so this equals the decoded
        length)."""
        return len(self.crops[self.files[idx]]) // 2

    def clip(self, idx: int):
        name = self.files[idx]
        root = self.config.data_root
        video = decode_video(os.path.join(root, name + ".mp4"))
        audio = load_audio(
            os.path.join(
                root.replace(self.video_tree, self.audio_tree), name + ".wav"
            )
        )
        coords = np.asarray(self.crops[name], np.int32).reshape(-1, 2)
        return video, audio, coords

    def name(self, idx: int) -> str:
        return self.files[idx]


class SyntheticLRSSource:
    """Synthetic variable-length clips with lip-center tracks (tests)."""

    def __init__(
        self,
        num_clips: int = 8,
        min_frames: int = 30,
        max_frames: int = 90,
        lengths=None,
    ):
        from vcagan.data.synthetic import SyntheticLipSpeech

        self._rng = np.random.default_rng(7)
        if lengths is not None:  # explicit per-clip frame counts (tests)
            self._lengths = np.asarray(lengths, np.int64)
        else:
            self._lengths = self._rng.integers(min_frames, max_frames + 1, num_clips)
        self._gen = SyntheticLipSpeech(num_clips=len(self._lengths), video_frames=1)

    def __len__(self):
        return len(self._lengths)

    def frame_count(self, idx: int) -> int:
        return int(self._lengths[idx])

    def clip(self, idx: int):
        from vcagan.data.synthetic import SyntheticLipSpeech

        t = int(self._lengths[idx])
        gen = SyntheticLipSpeech(num_clips=len(self._lengths), video_frames=t)
        video, audio = gen.clip(idx)
        # lip center track: mouth at (0.5 W, 0.68 H) with small wander
        cx = (video.shape[2] * 0.5 + 3 * np.sin(np.arange(t) / 7)).astype(np.int32)
        cy = np.full(t, int(video.shape[1] * 0.68), np.int32)
        return video, audio, np.stack([cx, cy], axis=1)

    def name(self, idx: int) -> str:
        return f"synthetic/{idx:05d}"


class LRSDataset:
    """Variable-length batching with shape bucketing."""

    BUCKETS = (40, 80, 120, 160)  # video-frame buckets for eval collation

    def __init__(
        self,
        source,
        audio_config: Optional[AudioConfig] = None,
        data_config: Optional[DataConfig] = None,
        mode: str = "train",
        seed: int = 0,
        workers: int = 0,
    ):
        self.source = source
        self.audio = audio_config or AudioConfig(f_max=7600.0)
        self.data = data_config or DataConfig(
            dataset="LRS2", window_size=50, max_v_timesteps=160
        )
        self.mode = mode
        self.sample_window = mode == "train"
        self.rng = np.random.default_rng(seed)
        self._pool = None
        if workers and workers > 1:
            from concurrent.futures import ThreadPoolExecutor

            self._pool = ThreadPoolExecutor(max_workers=workers)

    def close(self) -> None:
        """Shut down the decode worker pool (idempotent)."""
        if self._pool is not None:
            self._pool.shutdown(wait=False, cancel_futures=True)
            self._pool = None

    def __del__(self):  # best-effort backstop for ephemeral datasets
        try:
            self.close()
        except Exception:
            pass

    def _fetch(self, idx: int):
        """Decode + full-clip conditioning (the parallelizable part).
        Returns (video, audio, coords, normed, cond, centers_m, hw):
        with host_crop, ``video`` is the 96^2 per-frame superset around the
        clipped centers ``centers_m`` and ``hw`` the original frame size
        (the device's jitter clip bounds); otherwise centers_m is None."""
        video, audio, coords = self.source.clip(int(idx))
        hw = video.shape[1:3]
        cm = None
        if self.data.host_crop:
            video, cm = precrop_superset(video, coords)
        if self.data.host_gray and video.shape[-1] == 3:
            video = host_luma_u8(video)
        normed = audio_host.peak_normalize_clip(audio)
        cond = audio_host.preemphasize_clamp(normed, self.audio.preemphasis)
        return video, audio, coords, normed, cond, cm, hw

    def _fetch_all(self, idxs):
        if self._pool is not None:
            return list(self._pool.map(self._fetch, idxs))
        return [self._fetch(i) for i in idxs]

    def __len__(self) -> int:
        return len(self.source)

    def _bucket(self, n: int) -> int:
        for b in self.BUCKETS:
            if n <= b and b <= self.data.max_v_timesteps:
                return b
        return self.data.max_v_timesteps

    def epoch(
        self,
        batch_size: int,
        shuffle: bool = True,
        drop_last: bool = True,
        process_slice: Optional[slice] = None,
        sort_by_length: bool = False,
    ) -> Iterator[dict]:
        """See GridDataset.epoch for the drop_last / process_slice contract.

        Eval-mode bucket selection is a function of the GLOBAL batch: the
        bucket is chosen from source metadata frame counts (crop-table
        rows, no decode needed) over ALL of the batch's clips BEFORE the
        process slice, so every host picks the same static shape — like
        the window-start draws, which are also made globally.

        ``sort_by_length`` (eval only, ignored under shuffle): order clips
        by metadata frame count so batches are length-homogeneous — each
        batch then lands in the SMALLEST bucket that fits it instead of
        the max over an arbitrary mix, cutting flip-TTA forward + GL
        compute roughly in proportion to the length distribution
        (the LRS-scale eval is ~73% vocode+forward, CLAUDE.md).  Identity
        is preserved via the ``idx`` array in each raw batch.
        """
        n = len(self.source)
        if n == 0 or (drop_last and n < batch_size):
            raise ValueError(
                f"dataset has {n} clips < batch_size {batch_size}: "
                "every epoch would yield zero batches"
            )
        sl = process_slice if process_slice is not None else slice(None)
        order = np.arange(n)
        if shuffle:
            self.rng.shuffle(order)
        elif sort_by_length:
            counts = np.asarray(
                [self.source.frame_count(int(i)) for i in order]
            )
            order = order[np.argsort(counts, kind="stable")]

        def _starts_u():
            # full-global-batch draws before slicing (see GridDataset.epoch)
            return self.rng.random(batch_size)[sl] if self.sample_window else None

        def _bucket_of(global_idxs) -> Optional[int]:
            if self.sample_window:
                return None  # fixed window, host-uniform already
            longest = min(
                max(self.source.frame_count(int(i)) for i in global_idxs),
                self.data.max_v_timesteps,
            )
            return self._bucket(longest)

        for start in range(0, n - batch_size + 1, batch_size):
            gidx = order[start : start + batch_size]
            yield self._collate(
                gidx[sl], starts_u=_starts_u(), bucket=_bucket_of(gidx)
            )
        rem = n % batch_size
        if not drop_last and rem:
            idxs = np.concatenate(
                [order[n - rem :], np.resize(order, batch_size - rem)]
            )
            # local slice's real-clip count (see GridDataset.epoch)
            local_valid = int((np.arange(batch_size)[sl] < rem).sum())
            yield self._collate(
                idxs[sl],
                n_valid=local_valid,
                starts_u=_starts_u(),
                bucket=_bucket_of(idxs),
            )

    def _collate(
        self,
        idxs,
        n_valid: Optional[int] = None,
        starts_u: Optional[np.ndarray] = None,
        bucket: Optional[int] = None,
    ) -> dict:
        """Host half, faithful to the reference per-item chain
        (vid_aud_lrs2.py:150-201): the FULL clip is peak-normalized (the
        returned waveform too — the LRS datasets mutate ``audio`` in place,
        :152), pre-emphasized, clamped, and the window is cropped out of
        the full-clip mel/spec; ``mel_len`` carries ``num_a_frames``.

        ``starts_u``: see GridDataset._collate — per-item uniforms mapped
        to window starts, pre-drawn by epoch() for multi-host alignment.
        """
        mel_per = self.audio.mel_per_video_frame
        hop = self.audio.hop_length
        n_fft = self.audio.n_fft
        clips = self._fetch_all(idxs)
        if self.sample_window and starts_u is None:
            starts_u = self.rng.random(len(idxs))

        if self.sample_window:
            w = self.data.window_size
        elif bucket is not None:
            w = bucket  # global, host-identical decision from epoch()
        else:
            longest = min(
                max(v.shape[0] for v, *_ in clips), self.data.max_v_timesteps
            )
            w = self._bucket(longest)
        seg_frames = w * mel_per + 1

        videos, wavs, segs, centers, vid_lens, mel_lens = [], [], [], [], [], []
        centers_m, vid_hw = [], []
        for j, (video, audio, coords, normed, cond, cm, hw) in enumerate(clips):
            t = min(video.shape[0], coords.shape[0])
            video, coords = video[:t], coords[:t]
            if self.sample_window:
                n_starts = max(t - w, 0) + 1
                st = min(int(starts_u[j] * n_starts), n_starts - 1)
            else:
                st = 0
            video = video[st : st + w]
            coords = coords[st : st + w]
            if cm is not None:
                cm = cm[st : st + w]
            n = video.shape[0]
            vid_lens.append(n)
            if n < w:
                video = np.concatenate(
                    [video, np.zeros((w - n,) + video.shape[1:], video.dtype)]
                )
                coords = np.concatenate(
                    [coords, np.repeat(coords[-1:], w - n, axis=0)]
                )
                if cm is not None:
                    cm = np.concatenate([cm, np.repeat(cm[-1:], w - n, axis=0)])
            if cm is not None:
                centers_m.append(cm)
                vid_hw.append(hw)

            segs.append(
                audio_host.stft_segment(cond, st * mel_per, seg_frames, n_fft, hop)
            )
            full = audio_host.full_frame_count(audio.shape[0], hop)
            mel_lens.append(max(min(full - st * mel_per, w * mel_per), 0))

            a0 = st * mel_per * hop
            wav = normed[a0 : a0 + w * mel_per * hop]
            need = w * mel_per * hop
            if wav.shape[0] < need:
                wav = np.concatenate([wav, np.zeros(need - wav.shape[0], np.float32)])
            videos.append(video)
            wavs.append(wav.astype(np.float32))
            centers.append(coords)
        raw = {
            "video_raw": np.stack(videos),
            "centers": np.stack(centers),
            "aud_cond": np.stack(segs),
            "wav": np.stack(wavs),
            "vid_len": np.asarray(vid_lens, np.int32),
            "mel_len": np.asarray(mel_lens, np.int32),
            "n_valid": np.int32(len(idxs) if n_valid is None else n_valid),
            # global clip ids: artifact naming stays correct under
            # sort_by_length / shuffled orders
            "idx": np.asarray(idxs, np.int32),
        }
        if centers_m:
            raw["centers_m"] = np.stack(centers_m)
            raw["vid_hw"] = np.asarray(vid_hw, np.int32)
        return raw


def make_lrs_device_pipeline(
    audio_config: Optional[AudioConfig] = None,
    augment: bool = False,
    host_crop: bool = True,
):
    """jitted ``process(raw: dict, key) -> Batch`` for LRS (dynamic crops +
    the LRS spec chain over host-conditioned full-clip audio).

    ``host_crop`` must match the producing LRSDataset's
    DataConfig.host_crop (both default True): the raw dict then carries
    96^2 supersets + centers_m/vid_hw instead of full frames."""
    acfg = audio_config or AudioConfig(f_max=7600.0)
    pipe = MelPipeline(acfg)

    @jax.jit
    def process(raw, key):
        video_raw, centers = raw["video_raw"], raw["centers"]
        b, w = video_raw.shape[0], video_raw.shape[1]
        keys = jax.random.split(key, b)

        def one(frames, cts, k, cms=None, hw=None):
            k_j, k_f = jax.random.split(k)
            jitter = jax.random.randint(k_j, (), -5, 6) if augment else jnp.int32(0)
            if host_crop:
                clip = crop_resize_dynamic_sup(frames, cts, cms, hw, jitter)
            else:
                clip = crop_resize_dynamic(frames, cts, jitter)
            if augment:
                flip = jax.random.bernoulli(k_f, 0.5)
                clip = jnp.where(flip, clip[:, :, ::-1, :], clip)
            return clip

        if host_crop:
            video = jax.vmap(one)(
                video_raw, centers, keys, raw["centers_m"], raw["vid_hw"]
            )
        else:
            video = jax.vmap(one)(video_raw, centers, keys)

        mag, _ = stft_magnitude(raw["aud_cond"], pipe.stft_params, center=False)
        n_mel = w * acfg.mel_per_video_frame
        mel = mel_normalize(pipe.compress_mel(mag)[:, :n_mel])

        mel_len = raw["mel_len"]
        valid = jnp.arange(n_mel)[None, :] < mel_len[:, None]
        spec = lrs_normalize_spec(mag[:, :n_mel], valid)

        # pad with the reference's -1.0 (vid_aud_lrs2.py:181-182)
        mel = jnp.where(valid[:, :, None], mel, -1.0)
        spec = jnp.where(valid[:, :, None], spec, -1.0)

        return Batch(
            video=video,
            mel=jnp.swapaxes(mel, 1, 2),
            spec=jnp.swapaxes(spec, 1, 2),
            vid_len=raw["vid_len"],
            mel_len=mel_len,
        )

    return process
