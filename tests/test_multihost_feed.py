"""Multi-host input feeding: two real processes, Gloo collectives, each
decoding its slice of the global batch (the executable version of the DCN
claim — VCA-GAN's reference has no multi-node story at all, SURVEY §2.6).

The workers mirror what Trainer.fit does when jax.process_count() > 1:
epoch(process_slice=local_batch_slice(...)) -> globalize -> jitted device
pipeline over global arrays.  Both processes must report the same global
mel mean, equal to a single-process run over the same (seed-determined)
batch.
"""

import os
import socket
import subprocess
import sys

import numpy as np
import pytest

HERE = os.path.dirname(__file__)
WORKER = os.path.join(HERE, "helpers", "multihost_worker.py")


def _free_port() -> int:
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_input_feeding():
    port = _free_port()
    procs = [
        subprocess.Popen(
            [sys.executable, WORKER, str(i), "2", str(port)],
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            text=True,
        )
        for i in range(2)
    ]
    # generous: two fresh jax processes compile the pipeline concurrently
    # on a possibly single-core CI host under full-suite load
    outs = [p.communicate(timeout=600)[0] for p in procs]
    for p, out in zip(procs, outs):
        assert p.returncode == 0, out[-2000:]

    results = []
    for out in outs:
        lines = [l for l in out.splitlines() if l.startswith("RESULT ")]
        assert lines, out[-2000:]
        results.append([float(x) for x in lines[0].split()[1:]])
    # both hosts computed the same global statistics
    np.testing.assert_allclose(results[0], results[1], rtol=1e-6)

    # equal to a single-process run over the full global batch
    from vcagan.configs import AudioConfig, DataConfig
    from vcagan.data.grid import GridDataset
    from vcagan.data.synthetic import SyntheticLipSpeech

    ds = GridDataset(
        SyntheticLipSpeech(num_clips=8, video_frames=30),
        AudioConfig(),
        DataConfig(window_size=20),
        mode="train",
        seed=5,
    )
    raw = next(ds.epoch(4, shuffle=True))
    assert abs(float(np.mean(raw["wav"])) - results[0][1]) < 1e-6


def test_two_process_lrs_eval_bucketing():
    """Variable-length LRS eval across two processes: the bucket (static
    shape) decision must be global, or the hosts' slices cannot assemble.
    Both hosts must report identical shapes and global content stats."""
    port = _free_port()
    procs = [
        subprocess.Popen(
            [sys.executable, WORKER, str(i), "2", str(port), "lrs_eval"],
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            text=True,
        )
        for i in range(2)
    ]
    outs = [p.communicate(timeout=600)[0] for p in procs]
    for p, out in zip(procs, outs):
        assert p.returncode == 0, out[-2000:]

    results = []
    for out in outs:
        lines = [l for l in out.splitlines() if l.startswith("RESULT ")]
        assert lines, out[-2000:]
        results.append([float(x) for x in lines[0].split()[1:]])
    np.testing.assert_allclose(results[0], results[1], rtol=1e-6)

    # buckets equal the single-process (no-slice) decision; the lengths are
    # chosen (see the worker) so a LOCAL decision would have differed on
    # every batch — i.e. this test bites
    from vcagan.data.lrs import LRSDataset, SyntheticLRSSource

    LENGTHS = [50, 90, 30, 35, 82, 41, 44, 39]
    ds = LRSDataset(SyntheticLRSSource(lengths=LENGTHS), mode="val", seed=5)
    single_buckets = [
        raw["video_raw"].shape[1]
        for raw in ds.epoch(4, shuffle=False, drop_last=False)
    ]
    two_proc_buckets = results[0][0::3]
    np.testing.assert_allclose(two_proc_buckets, single_buckets)
    # host 1's slice of batch 0 is [30, 35] -> local bucket 40, while the
    # global decision is 120: a local decision WOULD have desynced
    assert ds._bucket(max(LENGTHS[2], LENGTHS[3])) != single_buckets[0]
