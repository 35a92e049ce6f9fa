"""IO layer: wav round-trip, checkpoint manager semantics, metric writer."""

import json
import os

import numpy as np
import pytest

from vcagan.io import CheckpointManager, MetricWriter, write_wav
from vcagan.io.wav import read_wav


class TestWav:
    def test_roundtrip(self, tmp_path):
        path = str(tmp_path / "a.wav")
        wav = np.sin(np.linspace(0, 100, 16000)).astype(np.float32) * 0.5
        write_wav(path, wav, 16000)
        sr, back = read_wav(path)
        assert sr == 16000
        np.testing.assert_allclose(back, wav, atol=1e-3)

    def test_clipping(self, tmp_path):
        path = str(tmp_path / "b.wav")
        write_wav(path, np.asarray([2.0, -2.0, 0.0]), 16000)
        _, back = read_wav(path)
        assert back.max() <= 1.0 and back.min() >= -1.0


class TestServingNpz:
    @staticmethod
    def _trees():
        r = np.random.default_rng(0)
        params = {
            "v_front": {"conv": {"kernel": r.standard_normal((3, 3, 8, 5000)).astype(np.float32)}},
            "gen": {"dense": {"kernel": r.standard_normal((64, 128)).astype(np.float32),
                               "bias": r.standard_normal(128).astype(np.float32)}},
            "post": {"w": r.standard_normal((16, 16)).astype(np.float32)},
            "dis1": {"ignored": np.zeros(3, np.float32)},  # not generator-side
        }
        stats = {
            "v_front": {"bn": {"mean": r.standard_normal(8).astype(np.float32),
                                "var": np.abs(r.standard_normal(8)).astype(np.float32)}},
            "gen": {},
            "post": {},
        }
        return params, stats

    def test_fp16_roundtrip(self, tmp_path):
        from vcagan.io.serving_npz import load_serving_npz, save_serving_npz

        params, stats = self._trees()
        path = str(tmp_path / "s.npz")
        save_serving_npz(params, stats, path)
        g, s = load_serving_npz(path, params, stats)
        np.testing.assert_allclose(
            g["gen"]["dense"]["kernel"], params["gen"]["dense"]["kernel"],
            rtol=2e-3, atol=2e-3,
        )
        np.testing.assert_allclose(
            s["v_front"]["bn"]["var"], stats["v_front"]["bn"]["var"],
            rtol=2e-3, atol=2e-3,
        )

    def test_q8_roundtrip_and_size(self, tmp_path):
        """q8: large param leaves stored int8 + per-channel scales; BN
        stats and small leaves stay fp16.  Error bounded by scale/2 =
        max|w|/254 per channel."""
        from vcagan.io.serving_npz import load_serving_npz, save_serving_npz

        params, stats = self._trees()
        p16 = str(tmp_path / "fp16.npz")
        pq8 = str(tmp_path / "q8.npz")
        save_serving_npz(params, stats, p16)
        save_serving_npz(params, stats, pq8, quantize="q8")
        assert os.path.getsize(pq8) < 0.7 * os.path.getsize(p16)

        g, s = load_serving_npz(pq8, params, stats)
        big = params["v_front"]["conv"]["kernel"]
        got = g["v_front"]["conv"]["kernel"]
        bound = np.max(np.abs(big), axis=(0, 1, 2)) / 127.0
        assert np.all(np.abs(got - big) <= bound[None, None, None, :] * 0.51 + 1e-7)
        # small leaves bypass quantization entirely (fp16 path)
        np.testing.assert_allclose(
            g["gen"]["dense"]["bias"], params["gen"]["dense"]["bias"],
            rtol=2e-3, atol=2e-3,
        )
        np.testing.assert_allclose(
            s["v_front"]["bn"]["mean"], stats["v_front"]["bn"]["mean"],
            rtol=2e-3, atol=2e-3,
        )


class TestCheckpointManager:
    def _state(self, value):
        return {"params": {"w": np.full((3,), value, np.float32)},
                "step": np.asarray(value, np.int32)}

    def test_save_restore_latest(self, tmp_path):
        mgr = CheckpointManager(str(tmp_path))
        mgr.save(self._state(1), epoch=1, stoi=0.1)
        mgr.save(self._state(7), epoch=7, stoi=0.05)
        latest = mgr.latest()
        assert "Epoch_0007" in latest
        restored = mgr.restore(self._state(0), latest)
        assert int(restored["step"]) == 7

    def test_best_pointer_semantics(self, tmp_path):
        """Best_* follows the best STOI and replaces the previous best
        (reference train.py:311-322)."""
        mgr = CheckpointManager(str(tmp_path))
        mgr.save(self._state(1), epoch=1, stoi=0.3)
        first_best = mgr.best()
        assert first_best and "stoi_0.300" in first_best
        mgr.save(self._state(2), epoch=2, stoi=0.2)  # worse: best unchanged
        assert mgr.best() == first_best
        mgr.save(self._state(3), epoch=3, stoi=0.5)  # better: best replaced
        best = mgr.best()
        assert "stoi_0.500" in best
        # only one Best_* exists
        import glob

        assert len(glob.glob(os.path.join(str(tmp_path), "Best_*"))) == 1

    def test_best_survives_manager_restart(self, tmp_path):
        mgr = CheckpointManager(str(tmp_path))
        mgr.save(self._state(1), epoch=1, stoi=0.4)
        mgr2 = CheckpointManager(str(tmp_path))
        assert abs(mgr2.best_metric - 0.4) < 1e-6
        mgr2.save(self._state(2), epoch=2, stoi=0.3)
        assert "stoi_0.400" in mgr2.best()


class TestMetricWriter:
    def test_jsonl_stream(self, tmp_path):
        w = MetricWriter(str(tmp_path), use_tensorboard=False)
        w.scalars({"train/loss": 1.5}, step=1)
        w.scalars({"train/loss": 1.2}, step=2)
        w.close()
        lines = [json.loads(l) for l in open(w.path)]
        assert lines[0]["train/loss"] == 1.5
        assert lines[1]["step"] == 2


class TestGridDecode:
    def test_video_audio_decode(self, tmp_path):
        cv2 = pytest.importorskip("cv2")
        from vcagan.data.grid import audio_path_for, decode_video, load_audio

        vdir = tmp_path / "s1" / "video"
        adir = tmp_path / "s1" / "audio"
        vdir.mkdir(parents=True)
        adir.mkdir(parents=True)
        vid_path = str(vdir / "clip.avi")
        writer = cv2.VideoWriter(
            vid_path, cv2.VideoWriter_fourcc(*"MJPG"), 25, (64, 64)
        )
        rng = np.random.default_rng(0)
        for _ in range(8):
            writer.write(rng.integers(0, 255, (64, 64, 3), np.uint8))
        writer.release()

        frames = decode_video(vid_path)
        assert frames.shape == (8, 64, 64, 3)

        wav = rng.standard_normal(16000).astype(np.float32) * 0.3
        write_wav(str(adir / "clip.wav"), wav)
        # audio_path_for maps video path -> audio tree
        apath = audio_path_for(str(vdir / "clip.mp4"))
        assert apath == str(adir / "clip.wav")
        loaded = load_audio(str(adir / "clip.wav"))
        assert abs(len(loaded) - 16000) < 2

    def test_load_audio_resamples(self, tmp_path):
        import scipy.io.wavfile as wavfile

        from vcagan.data.grid import load_audio

        path = str(tmp_path / "x.wav")
        wav8k = np.sin(np.linspace(0, 200, 8000)).astype(np.float32)
        wavfile.write(path, 8000, (wav8k * 32767).astype(np.int16))
        out = load_audio(path, 16000)
        assert abs(len(out) - 16000) < 4
