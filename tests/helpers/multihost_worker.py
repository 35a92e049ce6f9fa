"""Worker process for the multi-host input-feeding test.

Each process decodes only its slice of the global batch
(GridDataset.epoch(process_slice=...)), assembles global arrays with
vcagan.parallel.multihost.globalize, and runs the jitted device pipeline
SPMD across processes.  Prints the global mel mean — identical on every
host, and equal to a single-process run over the full batch.

Usage: python multihost_worker.py <process_id> <num_processes> <port> [mode]

mode "grid_train" (default): windowed GRID training batches.
mode "lrs_eval": variable-length LRS eval batches — exercises the GLOBAL
bucket decision (epoch() picks the static shape from global metadata, so
both hosts' slices assemble; a local decision would desync the shapes and
globalize() would fail).
"""

import sys

pid, n_proc, port = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]
mode = sys.argv[4] if len(sys.argv) > 4 else "grid_train"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 2)
jax.distributed.initialize(
    f"localhost:{port}", num_processes=n_proc, process_id=pid
)

import numpy as np  # noqa: E402
import jax.numpy as jnp  # noqa: E402

sys.path.insert(0, __file__.rsplit("/tests/", 1)[0])

from vcagan.configs import AudioConfig, DataConfig  # noqa: E402
from vcagan.data.device_pipeline import make_device_pipeline  # noqa: E402
from vcagan.data.grid import GridDataset  # noqa: E402
from vcagan.data.synthetic import SyntheticLipSpeech  # noqa: E402
from vcagan.parallel import batch_sharding, make_mesh  # noqa: E402
from vcagan.parallel.multihost import globalize, local_batch_slice  # noqa: E402

GLOBAL_BATCH = 4

mesh = make_mesh(model_parallel=1)  # (data=4, model=1) over both processes

if mode == "lrs_eval":
    from vcagan.data.lrs import LRSDataset, SyntheticLRSSource

    # lengths chosen so a LOCAL bucket decision would desync the hosts in
    # BOTH batches (h0 picks 120 where h1 would pick 40 / 80)
    LENGTHS = [50, 90, 30, 35, 82, 41, 44, 39]
    lrs = LRSDataset(SyntheticLRSSource(lengths=LENGTHS), mode="val", seed=5)
    sh = batch_sharding(mesh)
    stats = []
    with mesh:
        for raw in lrs.epoch(
            GLOBAL_BATCH,
            shuffle=False,
            drop_last=False,
            process_slice=local_batch_slice(GLOBAL_BATCH),
        ):
            assert raw["video_raw"].shape[0] == GLOBAL_BATCH // n_proc
            vid_g = globalize(np.asarray(raw["video_raw"]), sh)
            wav_g = globalize(np.asarray(raw["wav"]), sh)
            # per-batch static shape (the bucket) + global content stats
            stats += [
                float(vid_g.shape[1]),
                float(jnp.mean(vid_g)),
                float(jnp.mean(wav_g)),
            ]
    print("RESULT " + " ".join(f"{s:.8f}" for s in stats), flush=True)
    sys.exit(0)

ds = GridDataset(
    SyntheticLipSpeech(num_clips=8, video_frames=30),
    AudioConfig(),
    DataConfig(window_size=20),
    mode="train",
    seed=5,
)
raw = next(
    ds.epoch(GLOBAL_BATCH, shuffle=True, process_slice=local_batch_slice(GLOBAL_BATCH))
)
assert raw["video_raw"].shape[0] == GLOBAL_BATCH // n_proc

sh = batch_sharding(mesh)
raw_global = {
    k: globalize(np.asarray(v), sh) if np.asarray(v).ndim > 0 else v
    for k, v in raw.items()
}
process = make_device_pipeline(AudioConfig(), DataConfig(), augment=False)
with mesh:
    batch = process(raw_global, jax.random.PRNGKey(0))
    mel_mean = float(jnp.mean(batch.mel))
    wav_mean = float(jnp.mean(raw_global["wav"]))
print(f"RESULT {mel_mean:.8f} {wav_mean:.8f}", flush=True)
