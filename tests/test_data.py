"""Data pipeline tests: splits parsing, transforms, synthetic end-to-end."""

import os
import tempfile

import jax
import jax.numpy as jnp
import numpy as np

from vcagan.configs import AudioConfig, DataConfig
from vcagan.data import SyntheticLipSpeech, grid_file_list, prepare_clip
from vcagan.data.device_pipeline import make_device_pipeline
from vcagan.data.grid import GridDataset


class TestSplits:
    def test_overlap_and_subject_lists(self):
        with tempfile.TemporaryDirectory() as d:
            with open(os.path.join(d, "overlap_train.txt"), "w") as f:
                f.write("mpg_6000/s1/bbaf2n\nmpg_6000/s2/bbaf3s\n")
            files = grid_file_list("/corpus", "train", "overlap", splits_dir=d)
            assert files == ["/corpus/s1/bbaf2n.mp4", "/corpus/s2/bbaf3s.mp4"]

            with open(os.path.join(d, "train_4.txt"), "w") as f:
                f.write("s1/video/a.mp4\ns29/video/b.mp4\n")
            only_s1 = grid_file_list("/corpus", "train", "s1", splits_dir=d)
            assert only_s1 == ["/corpus/s1/video/a.mp4"]
            four = grid_file_list("/corpus", "train", "four", splits_dir=d)
            assert len(four) == 2

    def test_unseen_mode_filter(self):
        with tempfile.TemporaryDirectory() as d:
            with open(os.path.join(d, "unseen_splits.txt"), "w") as f:
                f.write("train/s1/a\nval/s2/b\ntest/s3/c\n")
            files = grid_file_list(
                "/corpus", "val", "unseen", splits_dir=d, check_exists=False
            )
            assert files == ["/corpus/s2/video/b.mp4"]


class TestTransforms:
    def test_prepare_clip_shapes_and_stats(self):
        frames = jnp.asarray(
            np.random.default_rng(0).integers(0, 255, (5, 256, 256, 3), np.uint8)
        )
        out = prepare_clip(frames, augment=False)
        assert out.shape == (5, 112, 112, 1)
        # normalized: uniform [0,1] pixels -> mean approx (0.5-0.4136)/0.17
        assert abs(float(out.mean()) - (0.5 - 0.4136) / 0.17) < 0.1

    def test_flip_is_clip_consistent(self):
        frames = jnp.asarray(
            np.random.default_rng(1).integers(0, 255, (4, 256, 256, 3), np.uint8)
        )
        # find a key that flips
        for seed in range(10):
            key = jax.random.PRNGKey(seed)
            k_flip, _ = jax.random.split(key)
            if bool(jax.random.bernoulli(k_flip, 0.5)):
                break
        flipped = prepare_clip(frames, key, augment=False)  # no aug -> identity
        base = prepare_clip(frames)
        np.testing.assert_allclose(np.asarray(flipped), np.asarray(base))

    def test_random_erase_zeroes_patch(self):
        from vcagan.data.transforms import random_erase

        x = jnp.ones((3, 112, 112, 1))
        out = random_erase(x, jax.random.PRNGKey(0), 56)
        frac = float((out == 0).mean())
        assert 0.05 < frac < 0.35  # 56^2/112^2 = 0.25 max, less when clipped


class TestHostCrop:
    def test_host_crop_matches_device_crop(self):
        """host_crop slices the box on the host in uint8; slice-then-resize
        must be BIT-identical to the device crop of the full frame (same
        pixels reach jax.image.resize either way)."""
        import dataclasses as _dc

        source = SyntheticLipSpeech(num_clips=2, video_frames=24)
        cfgs = {
            on: DataConfig(window_size=20)
            if on
            else _dc.replace(DataConfig(window_size=20), host_crop=False)
            for on in (True, False)
        }
        batches = {}
        for on, dcfg in cfgs.items():
            ds = GridDataset(source, AudioConfig(), dcfg, mode="train", seed=3)
            raw = next(ds.epoch(batch_size=2))
            proc = make_device_pipeline(AudioConfig(), dcfg, augment=True)
            batches[on] = proc(raw, jax.random.PRNGKey(7))
        np.testing.assert_array_equal(
            np.asarray(batches[True].video), np.asarray(batches[False].video)
        )
        np.testing.assert_array_equal(
            np.asarray(batches[True].mel), np.asarray(batches[False].mel)
        )

    def test_host_gray_within_quantization(self):
        """host_gray rounds luma to uint8 on the host; vs the device
        float-luma-after-resize path the error is bounded by one uint8
        rounding: 0.5/255 in [0,1] pixels = 0.0116 normalized (resize is
        a convex average, so per-pixel rounding cannot amplify)."""
        import dataclasses as _dc

        source = SyntheticLipSpeech(num_clips=2, video_frames=24)
        batches = {}
        for gray in (True, False):
            dcfg = _dc.replace(DataConfig(window_size=20), host_gray=gray)
            ds = GridDataset(source, AudioConfig(), dcfg, mode="train", seed=3)
            raw = next(ds.epoch(batch_size=2))
            proc = make_device_pipeline(AudioConfig(), dcfg, augment=False)
            batches[gray] = proc(raw, jax.random.PRNGKey(7))
        diff = np.abs(
            np.asarray(batches[True].video) - np.asarray(batches[False].video)
        )
        assert diff.max() <= 0.5 / 255.0 / 0.17 + 1e-6
        np.testing.assert_array_equal(
            np.asarray(batches[True].mel), np.asarray(batches[False].mel)
        )


    def test_host_resize_within_quantization(self):
        """host_resize (opt-in) applies the DEVICE kernel's exact bilinear
        weights on the host (matrix extracted by resizing the identity —
        cv2's non-antialiased INTER_LINEAR was measured 0.31 off and
        rejected), so the only residual is one uint8 rounding for the
        wire: 0.5/255 in [0,1] pixels = 0.0116 normalized."""
        import dataclasses as _dc

        source = SyntheticLipSpeech(num_clips=2, video_frames=24)
        batches = {}
        for hr in (True, False):
            dcfg = _dc.replace(DataConfig(window_size=20), host_resize=hr)
            ds = GridDataset(source, AudioConfig(), dcfg, mode="train", seed=3)
            raw = next(ds.epoch(batch_size=2))
            if hr:
                assert raw["video_raw"].shape[2:4] == (112, 112)
            proc = make_device_pipeline(AudioConfig(), dcfg, augment=False)
            batches[hr] = proc(raw, jax.random.PRNGKey(7))
        diff = np.abs(
            np.asarray(batches[True].video) - np.asarray(batches[False].video)
        )
        assert diff.max() <= 0.5 / 255.0 / 0.17 + 1e-6, diff.max()
        np.testing.assert_array_equal(
            np.asarray(batches[True].mel), np.asarray(batches[False].mel)
        )


class TestSyntheticEndToEnd:
    def test_batch_through_device_pipeline(self):
        source = SyntheticLipSpeech(num_clips=4, video_frames=30)
        ds = GridDataset(
            source,
            AudioConfig(),
            DataConfig(window_size=20),
            mode="train",
            seed=0,
        )
        raw = next(ds.epoch(batch_size=2))
        # host_crop slices the static GRID box (136x136) and host_gray
        # collapses RGB to uint8 luma before upload
        assert raw["video_raw"].shape == (2, 20, 136, 136, 1)
        assert raw["wav"].shape == (2, 20 * 4 * 160)

        process = make_device_pipeline(AudioConfig(), DataConfig(), augment=True)
        batch = process(raw, jax.random.PRNGKey(0))
        assert batch.video.shape == (2, 20, 112, 112, 1)
        assert batch.mel.shape == (2, 80, 80)
        assert batch.spec.shape == (2, 321, 80)
        mel_np = np.asarray(batch.mel)
        assert np.isfinite(mel_np).all()
        assert mel_np.min() >= -1.0 - 1e-5 and mel_np.max() <= 1.0 + 1e-5

    def test_eval_mode_full_clips(self):
        source = SyntheticLipSpeech(num_clips=2, video_frames=75)
        ds = GridDataset(
            source, AudioConfig(), DataConfig(max_v_timesteps=75), mode="val"
        )
        raw = next(ds.epoch(batch_size=2, shuffle=False))
        assert raw["video_raw"].shape[1] == 75
        assert (raw["vid_len"] == 75).all()


class TestEpochSlicing:
    def test_tail_n_valid_is_per_slice(self):
        """drop_last=False + process_slice: n_valid must count the LOCAL
        slice's real clips, not the global remainder — a host whose slice
        holds only wrap-padding must report 0 so [:n_valid] trimming never
        scores padded duplicates."""
        from vcagan.configs import AudioConfig, DataConfig
        from vcagan.data.grid import GridDataset
        from vcagan.data.synthetic import SyntheticLipSpeech

        def build():
            return GridDataset(
                SyntheticLipSpeech(num_clips=6, video_frames=30),
                AudioConfig(),
                DataConfig(window_size=20),
                mode="train",
                seed=3,
            )

        # global batch 4 over 6 clips -> tail remainder 2
        tails = []
        for sl in (slice(0, 2), slice(2, 4)):
            batches = list(build().epoch(4, drop_last=False, process_slice=sl))
            tails.append(batches[-1])
        assert int(tails[0]["n_valid"]) == 2  # positions 0,1 are real
        assert int(tails[1]["n_valid"]) == 0  # positions 2,3 are padding
        # single-process tail keeps the global remainder
        full = list(build().epoch(4, drop_last=False))[-1]
        assert int(full["n_valid"]) == 2
        # and the assembled slices equal the single-process tail batch
        np.testing.assert_array_equal(
            np.concatenate([tails[0]["wav"], tails[1]["wav"]]), full["wav"]
        )
