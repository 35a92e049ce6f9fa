"""Input-pipeline throughput benchmark: decoded clips/s vs the train step.

Fabricates a real on-disk corpus (MJPG avi + wav, the same cv2/scipy
decode path as GRID mp4s), then measures GridDataset collate throughput at
several worker counts.  The number to beat is the TPU train step's
consumption rate (~104 clips/s for batch-16 40-frame windows, see
tools/bench_train.py); the reference sustains its GPUs with 6-10
DataLoader worker processes (reference train.py:139-146).

Usage: python tools/bench_input.py [--clips 64] [--frames 75]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def build_corpus(root: str, n_clips: int, frames: int, hw: int = 256):
    import cv2

    from vcagan.io import write_wav

    rng = np.random.default_rng(0)
    paths = []
    for i in range(n_clips):
        vdir = os.path.join(root, "s1", "video")
        adir = os.path.join(root, "s1", "audio")
        os.makedirs(vdir, exist_ok=True)
        os.makedirs(adir, exist_ok=True)
        vpath = os.path.join(vdir, f"clip{i:03d}.avi")
        writer = cv2.VideoWriter(
            vpath, cv2.VideoWriter_fourcc(*"MJPG"), 25, (hw, hw)
        )
        base = rng.integers(0, 255, (hw, hw, 3), np.uint8)
        for t in range(frames):
            frame = np.roll(base, t * 3, axis=1)
            writer.write(frame)
        writer.release()
        wav = (0.3 * np.sin(2 * np.pi * 220 * np.arange(frames * 640) / 16000)).astype(
            np.float32
        )
        write_wav(os.path.join(adir, f"clip{i:03d}.wav"), wav)
        paths.append(vpath)
    return paths


class DiskSource:
    def __init__(self, paths):
        self.files = paths

    def __len__(self):
        return len(self.files)

    def clip(self, idx):
        from vcagan.data.grid import audio_path_for, decode_video, load_audio

        path = self.files[idx]
        return decode_video(path), load_audio(audio_path_for(path))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--clips", type=int, default=48)
    p.add_argument("--frames", type=int, default=75)
    p.add_argument("--batch_size", type=int, default=16)
    p.add_argument("--workers", type=int, nargs="*", default=[0, 2, 4, 8])
    args = p.parse_args()

    from vcagan.configs import AudioConfig, DataConfig
    from vcagan.data.grid import GridDataset

    with tempfile.TemporaryDirectory() as root:
        paths = build_corpus(root, args.clips, args.frames)
        results = {}
        for w in args.workers:
            ds = GridDataset(
                DiskSource(paths),
                AudioConfig(),
                DataConfig(window_size=40),
                mode="train",
                workers=w,
            )
            # warmup (page cache) then timed epoch
            for _ in ds.epoch(args.batch_size, shuffle=False):
                pass
            t0 = time.perf_counter()
            n = 0
            for batch in ds.epoch(args.batch_size, shuffle=False):
                n += batch["video_raw"].shape[0]
            dt = time.perf_counter() - t0
            results[f"workers_{w}"] = round(n / dt, 1)
            print(
                json.dumps(
                    {
                        "metric": "input_clips_per_sec",
                        "workers": w,
                        "value": round(n / dt, 1),
                        "unit": "clips/s",
                    }
                ),
                flush=True,
            )
        best = max(results.values())
        print(
            json.dumps(
                {
                    "metric": "input_pipeline_headroom",
                    "value": round(best / 104.0, 2),
                    "unit": "x train-step consumption (104 clips/s)",
                    "host_cpus": os.cpu_count(),
                    "note": (
                        "cv2 MJPG/h264 decode releases the GIL; worker"
                        " threads scale ~linearly with host cores. On a"
                        " 1-vCPU host (this dev box) decode is"
                        " hardware-bound and worker count cannot help;"
                        " production v5e hosts have >100 vCPUs."
                    ),
                }
            )
        )


if __name__ == "__main__":
    main()
