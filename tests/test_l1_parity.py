"""L1 (data-pipeline) numerical parity against the reference chain.

Recomputes the reference's per-item processing INDEPENDENTLY in
numpy/scipy — full clip: peak-normalize x0.9 -> lfilter pre-emphasis ->
clamp -> centered STFT (reflect pad, Hann, rfft) -> mel projection -> log
compression -> THEN window crop -> normalize -> constant pad (0.0 GRID /
-1.0 LRS) — and asserts the framework's host collate + device pipeline
reproduce it for several window offsets, train and eval modes.

Reference chain: vid_aud_grid.py:126-170 (conditioning 142-144, mel 146,
window 151-152/172-188, normalize 157, pad 160-161);
vid_aud_lrs2.py:150-201 (in-place peak-norm 152, spec chain 176-178,
-1.0 pad 181-182).
"""

import numpy as np
import pytest
from scipy.signal import lfilter

import jax

from vcagan.configs import AudioConfig, DataConfig
from vcagan.data.device_pipeline import make_device_pipeline
from vcagan.data.grid import GridDataset
from vcagan.data.synthetic import SyntheticLipSpeech
from vcagan.dsp.mel import mel_filterbank

LOG1E5 = np.log(1e-5)
TOL = dict(atol=2e-4, rtol=2e-4)


def hann_periodic(n):
    k = np.arange(n)
    return 0.5 - 0.5 * np.cos(2.0 * np.pi * k / n)


def reference_full_mel(audio, acfg: AudioConfig):
    """Full-clip conditioning + centered STFT + mel, reference order."""
    aud = audio / np.abs(audio).max() * 0.9
    aud = lfilter([1.0, -acfg.preemphasis], [1.0], aud)
    aud = np.clip(aud, -1.0, 1.0)
    pad = acfg.n_fft // 2
    padded = np.pad(aud, (pad, pad), mode="reflect")
    n_frames = len(aud) // acfg.hop_length + 1
    frames = np.stack(
        [
            padded[k * acfg.hop_length : k * acfg.hop_length + acfg.n_fft]
            for k in range(n_frames)
        ]
    )
    mag = np.abs(np.fft.rfft(frames * hann_periodic(acfg.n_fft), acfg.n_fft, axis=-1))
    basis = np.asarray(
        mel_filterbank(acfg.sample_rate, acfg.n_fft, acfg.n_mels, acfg.f_min, acfg.f_max)
    )
    mel = np.log(np.maximum(mag @ basis.T, 1e-5))
    return mel, mag  # (T, 80), (T, 321)


def mel_norm(x):
    return (x - LOG1E5) / (-LOG1E5 / 2.0) - 1.0


class _FixedRng:
    """Stand-in for the dataset rng that pins the window start: _collate
    maps uniform u to st = floor(u * (t - w + 1)), so returning
    (st + 0.5) / n_starts selects st exactly."""

    def __init__(self, st, n_starts):
        assert 0 <= st < n_starts
        self.u = (st + 0.5) / n_starts

    def random(self, n):
        return np.full(n, self.u)

    def shuffle(self, x):
        pass


def _grid_reference_window(audio, acfg, st, w, train, pad_value=0.0):
    """Window + normalize + pad, reference vid_aud_grid.py:151-161."""
    mel_full, spec_full = reference_full_mel(audio, acfg)
    mp = acfg.mel_per_video_frame
    if train:
        mel_w = mel_full[st * mp : st * mp + w * mp]
        spec_w = spec_full[st * mp : st * mp + w * mp]
    else:
        mel_w = mel_full[: w * mp]
        spec_w = spec_full[: w * mp]
    n_real = mel_w.shape[0]
    mel_n = mel_norm(mel_w)
    out_mel = np.full((w * mp, acfg.n_mels), pad_value, np.float64)
    out_spec = np.full((w * mp, acfg.n_linear), pad_value, np.float64)
    out_mel[:n_real] = mel_n
    out_spec[:n_real] = spec_w
    return out_mel, out_spec, n_real


class TestGridL1Parity:
    @pytest.mark.parametrize("st", [0, 7, 35])
    def test_train_window_matches_reference_chain(self, st):
        acfg, w = AudioConfig(), 40
        source = SyntheticLipSpeech(num_clips=2, video_frames=75)
        ds = GridDataset(source, acfg, DataConfig(window_size=w), mode="train")
        ds.rng = _FixedRng(st, n_starts=75 - w + 1)
        raw = ds._collate([0])
        batch = make_device_pipeline(acfg, DataConfig(), augment=False)(
            raw, jax.random.PRNGKey(0)
        )

        _, audio = source.clip(0)
        ref_mel, ref_spec, _ = _grid_reference_window(audio, acfg, st, w, True)

        np.testing.assert_allclose(
            np.asarray(batch.mel[0]).T, ref_mel, **TOL
        )
        np.testing.assert_allclose(
            np.asarray(batch.spec[0]).T, ref_spec, **TOL
        )
        # raw (unconditioned) window audio is the metric ground truth
        # (extract_window receives the raw tensor, vid_aud_grid.py:152)
        a0 = st * acfg.mel_per_video_frame * acfg.hop_length
        np.testing.assert_allclose(
            raw["wav"][0], audio[a0 : a0 + w * 4 * 160].astype(np.float32), atol=1e-7
        )

    def test_eval_mode_full_clip_and_zero_pad(self):
        acfg, maxv = AudioConfig(), 75
        # short clip -> real frames then the reference's 0.0 pad
        source = SyntheticLipSpeech(num_clips=2, video_frames=60)
        ds = GridDataset(
            source, acfg, DataConfig(max_v_timesteps=maxv), mode="val"
        )
        raw = ds._collate([1])
        batch = make_device_pipeline(
            acfg, DataConfig(max_v_timesteps=maxv), augment=False
        )(raw, jax.random.PRNGKey(0))

        _, audio = source.clip(1)
        ref_mel, ref_spec, _ = _grid_reference_window(audio, acfg, 0, maxv, False)
        n_real = int(raw["mel_len"][0])
        # the reference's num_a_frames = full centered frame count
        assert n_real == min(len(audio) // acfg.hop_length + 1, maxv * 4)

        got_mel = np.asarray(batch.mel[0]).T
        got_spec = np.asarray(batch.spec[0]).T
        np.testing.assert_allclose(got_mel[:n_real], ref_mel[:n_real], **TOL)
        np.testing.assert_allclose(got_spec[:n_real], ref_spec[:n_real], **TOL)
        # pad region is exactly the reference's 0.0 constant
        assert (got_mel[n_real:] == 0.0).all()
        assert (got_spec[n_real:] == 0.0).all()

    def test_window_peak_is_clip_peak(self):
        """The round-1 bug: per-window peak-normalization. A quiet window
        of a loud clip must NOT be renormalized to full scale."""
        acfg, w = AudioConfig(), 20
        rng = np.random.default_rng(0)
        audio = np.zeros(75 * 640, np.float32)
        audio[: 10 * 640] = rng.standard_normal(10 * 640).astype(np.float32)
        audio[30 * 640 :] += 0.01 * rng.standard_normal(45 * 640).astype(np.float32)

        class _Src:
            def __len__(self):
                return 1

            def clip(self, idx):
                vid = np.zeros((75, 256, 256, 3), np.uint8)
                return vid, audio

        ds = GridDataset(_Src(), acfg, DataConfig(window_size=w), mode="train")
        ds.rng = _FixedRng(40, n_starts=75 - w + 1)  # quiet region
        raw = ds._collate([0])
        batch = make_device_pipeline(acfg, DataConfig(), augment=False)(
            raw, jax.random.PRNGKey(0)
        )
        ref_mel, _, _ = _grid_reference_window(audio, acfg, 40, w, True)
        np.testing.assert_allclose(np.asarray(batch.mel[0]).T, ref_mel, **TOL)
        # sanity: the window really is quiet relative to the clip peak
        seg = raw["aud_cond"][0]
        assert np.abs(seg).max() < 0.2


class TestLRSL1Parity:
    def test_train_window_matches_reference_chain(self):
        from vcagan.data.lrs import LRSDataset, SyntheticLRSSource, make_lrs_device_pipeline

        acfg = AudioConfig(f_max=7600.0)
        w, st = 24, 5
        source = SyntheticLRSSource(num_clips=2, min_frames=60, max_frames=60)
        ds = LRSDataset(
            source, acfg, DataConfig(dataset="LRS2", window_size=w), mode="train"
        )
        ds.rng = _FixedRng(st, n_starts=60 - w + 1)
        raw = ds._collate([0])
        batch = make_lrs_device_pipeline(acfg, augment=False)(
            raw, jax.random.PRNGKey(0)
        )

        _, audio, _ = source.clip(0)
        mel_full, spec_full = reference_full_mel(audio, acfg)
        mp = acfg.mel_per_video_frame
        mel_w = mel_norm(mel_full[st * mp : st * mp + w * mp])
        spec_w = spec_full[st * mp : st * mp + w * mp]
        # LRS spec chain: min-max over the WINDOW -> log -> [-1, 1]
        # (vid_aud_lrs2.py:176-178)
        unit = (spec_w - spec_w.min()) / (spec_w.max() - spec_w.min())
        spec_n = mel_norm(np.log(np.maximum(unit, 1e-5)))

        np.testing.assert_allclose(np.asarray(batch.mel[0]).T, mel_w, **TOL)
        np.testing.assert_allclose(np.asarray(batch.spec[0]).T, spec_n, **TOL)

        # LRS ground-truth wav is the PEAK-NORMALIZED window (the reference
        # mutates `audio` before windowing, vid_aud_lrs2.py:152)
        normed = audio / np.abs(audio).max() * 0.9
        a0 = st * mp * acfg.hop_length
        np.testing.assert_allclose(
            raw["wav"][0],
            normed[a0 : a0 + w * mp * acfg.hop_length].astype(np.float32),
            atol=1e-6,
        )

    def test_short_clip_pads_minus_one_and_masked_minmax(self):
        from vcagan.data.lrs import LRSDataset, SyntheticLRSSource, make_lrs_device_pipeline

        acfg = AudioConfig(f_max=7600.0)
        source = SyntheticLRSSource(num_clips=3, min_frames=30, max_frames=36)
        ds = LRSDataset(
            source, acfg, DataConfig(dataset="LRS2", window_size=50), mode="val"
        )
        raw = next(ds.epoch(3, shuffle=False))
        batch = make_lrs_device_pipeline(acfg, augment=False)(
            raw, jax.random.PRNGKey(0)
        )
        mp = acfg.mel_per_video_frame
        for b in range(3):
            _, audio, _ = source.clip(b)
            w = raw["video_raw"].shape[1]
            n_real = int(raw["mel_len"][b])
            assert n_real == min(len(audio) // acfg.hop_length + 1, w * mp)
            mel_full, spec_full = reference_full_mel(audio, acfg)
            spec_w = spec_full[:n_real]
            unit = (spec_w - spec_w.min()) / (spec_w.max() - spec_w.min())
            ref_spec = mel_norm(np.log(np.maximum(unit, 1e-5)))
            got_spec = np.asarray(batch.spec[b]).T
            np.testing.assert_allclose(got_spec[:n_real], ref_spec, **TOL)
            got_mel = np.asarray(batch.mel[b]).T
            np.testing.assert_allclose(
                got_mel[:n_real], mel_norm(mel_full[:n_real]), **TOL
            )
            # the reference pad value
            assert (got_mel[n_real:] == -1.0).all()
            assert (got_spec[n_real:] == -1.0).all()


class TestWorkers:
    def test_worker_pool_is_deterministic(self):
        """workers>1 must produce bit-identical batches to workers=0: the
        rng draws stay on the epoch thread, only decode+conditioning fans
        out."""
        acfg, dcfg = AudioConfig(), DataConfig(window_size=20)
        src = SyntheticLipSpeech(num_clips=6, video_frames=40)
        a = GridDataset(src, acfg, dcfg, mode="train", seed=3, workers=0)
        b = GridDataset(src, acfg, dcfg, mode="train", seed=3, workers=4)
        for ra, rb in zip(a.epoch(3, shuffle=True), b.epoch(3, shuffle=True)):
            for k in ra:
                np.testing.assert_array_equal(ra[k], rb[k])


class TestEpochContract:
    def test_small_dataset_raises_loudly(self):
        ds = GridDataset(
            SyntheticLipSpeech(num_clips=3, video_frames=30),
            AudioConfig(),
            DataConfig(window_size=20),
            mode="train",
        )
        with pytest.raises(ValueError, match="zero batches"):
            next(ds.epoch(8))

    def test_tail_batch_kept_with_n_valid(self):
        ds = GridDataset(
            SyntheticLipSpeech(num_clips=5, video_frames=30),
            AudioConfig(),
            DataConfig(window_size=20),
            mode="val",
        )
        batches = list(ds.epoch(2, shuffle=False, drop_last=False))
        assert len(batches) == 3
        assert int(batches[0]["n_valid"]) == 2
        assert int(batches[-1]["n_valid"]) == 1
        assert batches[-1]["video_raw"].shape[0] == 2  # still static shape
