"""LRS pipeline tests: crop tables, dynamic crops, spec chain, bucketing."""

import os
import tempfile

import jax
import jax.numpy as jnp
import numpy as np

from vcagan.configs import AudioConfig, DataConfig
from vcagan.data.lrs import (
    LRSDataset,
    SyntheticLRSSource,
    crop_resize_dynamic,
    lrs_denormalize_spec,
    lrs_normalize_spec,
    make_lrs_device_pipeline,
)
from vcagan.data.splits import load_crop_table


class TestCropTable:
    def test_parse_reference_format(self):
        with tempfile.TemporaryDirectory() as d:
            path = os.path.join(d, "preprocess_main.txt")
            with open(path, "w") as f:
                f.write("6330311066473698535/00011.mp4 85/118/85/117/86/117\n")
            table = load_crop_table(path, "main")
            key = "main/6330311066473698535/00011"
            assert key in table
            assert table[key] == [85, 118, 85, 117, 86, 117]


class TestDynamicCrop:
    def test_crop_follows_center(self):
        t, h, w = 4, 160, 160
        frames = np.zeros((t, h, w, 3), np.uint8)
        # bright 8x8 block at a moving center
        centers = np.asarray([[40, 40], [80, 80], [120, 120], [40, 120]], np.int32)
        for i, (cx, cy) in enumerate(centers):
            frames[i, cy - 4 : cy + 4, cx - 4 : cx + 4] = 255
        out = crop_resize_dynamic(
            jnp.asarray(frames), jnp.asarray(centers), jnp.int32(0)
        )
        assert out.shape == (t, 112, 112, 1)
        # the bright block should land at the crop center for every frame
        out_np = np.asarray(out)
        for i in range(t):
            peak = np.unravel_index(np.argmax(out_np[i, :, :, 0]), (112, 112))
            assert abs(peak[0] - 56) < 12 and abs(peak[1] - 56) < 12

    def test_out_of_bounds_center_is_padded(self):
        frames = jnp.asarray(
            np.full((2, 100, 100, 3), 200, np.uint8)
        )
        centers = jnp.asarray([[2, 2], [98, 98]], jnp.int32)
        out = crop_resize_dynamic(frames, centers, jnp.int32(0))
        assert np.isfinite(np.asarray(out)).all()


class TestSpecChain:
    def test_normalize_bounds(self):
        spec = jnp.asarray(
            np.abs(np.random.default_rng(0).standard_normal((2, 40, 321))), jnp.float32
        )
        norm = lrs_normalize_spec(spec)
        assert float(norm.min()) >= -1.0 - 1e-5
        assert float(norm.max()) <= 1.0 + 1e-5

    def test_denormalize_range(self):
        norm = jnp.asarray([[[-1.0, 0.0, 1.0]]])
        out = np.asarray(lrs_denormalize_spec(norm))
        # -1 -> 1e-5*14, +1 -> 14
        np.testing.assert_allclose(out[0, 0, 0], 14e-5, rtol=1e-3)
        np.testing.assert_allclose(out[0, 0, 2], 14.0, rtol=1e-3)


class TestLRSDataset:
    def test_train_windows(self):
        ds = LRSDataset(
            SyntheticLRSSource(num_clips=4, min_frames=60, max_frames=90),
            AudioConfig(f_max=7600.0),
            DataConfig(dataset="LRS2", window_size=50, max_v_timesteps=160),
            mode="train",
        )
        raw = next(ds.epoch(2))
        assert raw["video_raw"].shape[1] == 50
        assert raw["centers"].shape == (2, 50, 2)

    def test_eval_bucketing(self):
        ds = LRSDataset(
            SyntheticLRSSource(num_clips=4, min_frames=30, max_frames=70),
            AudioConfig(f_max=7600.0),
            DataConfig(dataset="LRS2", window_size=50, max_v_timesteps=160),
            mode="val",
        )
        raw = next(ds.epoch(4, shuffle=False))
        assert raw["video_raw"].shape[1] in LRSDataset.BUCKETS
        assert (raw["vid_len"] <= raw["video_raw"].shape[1]).all()

    def test_sort_by_length_shrinks_buckets_and_keeps_identity(self):
        """Length-sorted eval batching: batches become length-homogeneous
        (early batches land in SMALLER buckets than the unsorted max-mix),
        every clip is still scored exactly once, and the 'idx' ids map
        each row back to its source clip."""
        src = SyntheticLRSSource(num_clips=6, min_frames=20, max_frames=110)
        ds = LRSDataset(
            src,
            AudioConfig(f_max=7600.0),
            DataConfig(dataset="LRS2", window_size=50, max_v_timesteps=160),
            mode="val",
        )
        batches = list(
            ds.epoch(2, shuffle=False, drop_last=False, sort_by_length=True)
        )
        seen = []
        prev_bucket = 0
        for raw in batches:
            w = raw["video_raw"].shape[1]
            assert w in LRSDataset.BUCKETS or w == 160
            assert w >= prev_bucket  # sorted -> buckets non-decreasing
            prev_bucket = w
            nv = int(raw["n_valid"])
            for b in range(nv):
                gid = int(raw["idx"][b])
                assert int(raw["vid_len"][b]) == min(src.frame_count(gid), 160)
                seen.append(gid)
        assert sorted(seen) == list(range(6))
        # the sort must actually help: first batch strictly smaller than
        # the max bucket (the synthetic spread guarantees a short pair)
        assert batches[0]["video_raw"].shape[1] < batches[-1]["video_raw"].shape[1]

    def test_device_pipeline(self):
        ds = LRSDataset(
            SyntheticLRSSource(num_clips=2, min_frames=40, max_frames=60),
            AudioConfig(f_max=7600.0),
            DataConfig(dataset="LRS2", window_size=24, max_v_timesteps=160),
            mode="train",
        )
        raw = next(ds.epoch(2))
        process = make_lrs_device_pipeline(AudioConfig(f_max=7600.0), augment=True)
        batch = process(raw, jax.random.PRNGKey(0))
        assert batch.video.shape == (2, 24, 112, 112, 1)
        assert batch.mel.shape == (2, 80, 96)
        assert np.isfinite(np.asarray(batch.mel)).all()


class TestHostCropLRS:
    def test_superset_matches_full_frame_path(self):
        """host_crop ships 96^2 supersets around the clipped lip centers;
        the device's jittered dynamic crop out of the superset must read
        the EXACT pixels (and zero padding) the full-frame path reads —
        including degenerate centers near/off the frame edge, where the
        reference's clip(center + jitter, -8, size + 8) semantics bite."""
        import dataclasses as _dc

        from vcagan.data.lrs import LRSDataset, SyntheticLRSSource, make_lrs_device_pipeline

        class EdgeCaseSource(SyntheticLRSSource):
            # push some centers to (and past) the frame border
            def clip(self, idx):
                video, audio, coords = super().clip(idx)
                if idx % 2 == 0:
                    coords[:, 0] = np.linspace(
                        -12, video.shape[2] + 12, len(coords)
                    ).astype(np.int32)
                    coords[:, 1] = 2
                return video, audio, coords

        src = EdgeCaseSource(num_clips=4, min_frames=40, max_frames=60)
        acfg = AudioConfig(f_max=7600.0)
        base = DataConfig(dataset="LRS2", window_size=24, max_v_timesteps=160)
        batches = {}
        for on in (True, False):
            dcfg = base if on else _dc.replace(base, host_crop=False)
            ds = LRSDataset(src, acfg, dcfg, mode="train", seed=5)
            raw = next(ds.epoch(4))
            proc = make_lrs_device_pipeline(acfg, augment=True, host_crop=on)
            batches[on] = proc(raw, jax.random.PRNGKey(11))
        np.testing.assert_array_equal(
            np.asarray(batches[True].video), np.asarray(batches[False].video)
        )

    def test_host_gray_within_quantization(self):
        """LRS host_gray: uint8 luma of the superset vs the device's
        float-luma-after-resize — bounded by one uint8 rounding
        (0.5/255/0.17 normalized); zero padding maps to luma 0 so the
        out-of-frame semantics are unchanged."""
        import dataclasses as _dc

        from vcagan.data.lrs import LRSDataset, SyntheticLRSSource, make_lrs_device_pipeline

        src = SyntheticLRSSource(num_clips=4, min_frames=40, max_frames=60)
        acfg = AudioConfig(f_max=7600.0)
        base = DataConfig(dataset="LRS2", window_size=24, max_v_timesteps=160)
        batches = {}
        for gray in (True, False):
            dcfg = _dc.replace(base, host_gray=gray)
            ds = LRSDataset(src, acfg, dcfg, mode="train", seed=5)
            raw = next(ds.epoch(4))
            proc = make_lrs_device_pipeline(acfg, augment=False, host_crop=True)
            batches[gray] = proc(raw, jax.random.PRNGKey(11))
        diff = np.abs(
            np.asarray(batches[True].video) - np.asarray(batches[False].video)
        )
        assert diff.max() <= 0.5 / 255.0 / 0.17 + 1e-6


class TestPerSampleVocodingLength:
    def test_padded_vs_trimmed_vocoding_agree_on_valid_region(self):
        """The LRS test driver vocodes the padded batch with the padded
        spec frames zero-masked, then trims per sample
        (vcagan/cli/test_lrs.py; reference test_LRS.py:160-165 slices
        per-sample before Griffin-Lim).  Zero-magnitude padding must not
        corrupt the valid region: re-analyzed magnitudes of the padded
        vocode match the target as well as an exactly-trimmed vocode."""
        from vcagan.dsp.griffin_lim import griffin_lim
        from vcagan.dsp.stft import STFTParams, stft_magnitude

        acfg = AudioConfig()
        params = STFTParams(acfg.n_fft, acfg.hop_length, acfg.win_length)
        sr = acfg.sample_rate
        t = np.arange(sr) / sr
        wav = (0.5 * np.sin(2 * np.pi * (200 + 600 * t) * t)).astype(np.float32)
        mag, _ = stft_magnitude(jnp.asarray(wav[None]), params)
        n_valid = 64
        target = mag[:, :n_valid]

        key = jax.random.PRNGKey(0)
        w_trim = griffin_lim(target, key, params, 60)
        padded = jnp.concatenate(
            [target, jnp.zeros((1, 32, target.shape[2]), target.dtype)], axis=1
        )
        w_pad = griffin_lim(padded, key, params, 60)

        def rel_err(w):
            m, _ = stft_magnitude(w, params)
            m = m[:, :n_valid]
            return float(
                jnp.linalg.norm(m - target) / jnp.linalg.norm(target)
            )

        e_trim, e_pad = rel_err(w_trim), rel_err(w_pad)
        # both approximate the target; padding adds no material error
        assert e_trim < 0.5, e_trim
        assert e_pad < e_trim * 1.25 + 0.05, (e_pad, e_trim)
        # the padded region of the padded vocode is essentially silent
        tail = np.asarray(w_pad[0, n_valid * acfg.hop_length :])
        valid = np.asarray(w_pad[0, : n_valid * acfg.hop_length])
        assert np.sqrt(np.mean(tail**2)) < 0.05 * np.sqrt(np.mean(valid**2))
