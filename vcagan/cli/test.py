"""GRID inference + metric/artifact dump CLI — argv-compatible with the
reference test.py (reference: test.py:25-53).

Runs flip-TTA inference, Griffin-Lim vocoding, STOI/ESTOI scoring, and dumps
./test/spec_mel/<sub>/<file>.npz + ./test/wav/<sub>/<file>.wav + metric.txt
(reference: test.py:131-170).
"""

from __future__ import annotations

import argparse
import os

import jax
import jax.numpy as jnp
import numpy as np

from vcagan.configs import grid_config
from vcagan.data.device_pipeline import make_device_pipeline
from vcagan.data.grid import make_grid_dataset
from vcagan.dsp import MelPipeline
from vcagan.eval import stoi_estoi_batch
from vcagan.eval.pesq_nb import pesq_batch
from vcagan.io import CheckpointManager, write_wav
from vcagan.train.models import VCAGANModules
from vcagan.train.state import create_train_state
from vcagan.train.step import make_eval_step


def parse_args(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--grid", default="Data_dir")
    p.add_argument("--checkpoint_dir", type=str, default="./data/checkpoints/GRID")
    p.add_argument("--checkpoint", type=str, default=None)
    p.add_argument("--batch_size", type=int, default=100)
    p.add_argument("--epochs", type=int, default=1000)
    p.add_argument("--lr", type=float, default=0.0001)
    p.add_argument("--weight_decay", type=float, default=0.00001)
    p.add_argument("--workers", type=int, default=10)
    p.add_argument("--seed", type=int, default=1)
    p.add_argument("--subject", type=str, default="overlap")
    p.add_argument("--start_epoch", type=int, default=0)
    p.add_argument("--augmentations", default=True)
    p.add_argument("--window_size", type=int, default=40)
    p.add_argument("--max_timesteps", type=int, default=75)
    p.add_argument("--temp", type=float, default=1.0)
    p.add_argument("--dataparallel", default=False, action="store_true")
    p.add_argument("--gpu", type=str, default="0,1")
    p.add_argument("--save_mel", default=False, action="store_true")
    p.add_argument("--save_wav", default=False, action="store_true")
    # TPU-native extensions
    p.add_argument("--out_dir", type=str, default="./test")
    p.add_argument("--synthetic", action="store_true")
    p.add_argument("--platform", type=str, default=None,
                   help="force a jax platform (e.g. cpu); must be set before device use")
    p.add_argument("--max_batches", type=int, default=None)
    p.add_argument("--bf16", action="store_true",
                   help="bf16 serving mode: conv/matmul compute in bfloat16 "
                        "(params and the Griffin-Lim vocoder stay fp32; "
                        "quality pinned by tests/test_bf16_and_lrs_train.py)")
    return p.parse_args(argv)


def main(argv=None):
    from vcagan.runtime import enable_compilation_cache

    enable_compilation_cache()
    args = parse_args(argv)
    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    cfg = grid_config(
        **{
            "data.data_root": args.grid,
            "data.subject": args.subject,
            "data.window_size": args.window_size,
            "data.max_v_timesteps": args.max_timesteps,
            "data.augmentations": False,
            "model.sync_temp": args.temp,
            "model.use_bfloat16": args.bf16,
        }
    )

    modules = VCAGANModules.create(cfg.model)
    state, _, _ = create_train_state(
        jax.random.PRNGKey(args.seed), modules, cfg.train, 1
    )
    if args.checkpoint is not None:
        ckpt = CheckpointManager(os.path.dirname(args.checkpoint) or ".")
        state = ckpt.restore(state, args.checkpoint)
    eval_fn = make_eval_step(modules, flip_tta=True)
    process = make_device_pipeline(cfg.audio, cfg.data, augment=False)
    pipe = MelPipeline(cfg.audio)

    ds = make_grid_dataset(
        cfg.data, cfg.audio, "test", synthetic_fallback=True, seed=0
    )
    rng = jax.random.PRNGKey(args.seed)

    stois, estois, pesqs = [], [], []
    os.makedirs(args.out_dir, exist_ok=True)
    from vcagan.data.prefetch import prefetch_iterator

    # overlap decode/collate with device compute + host metric scoring
    # (raw stays on host: wav/mel_len are consumed by numpy below)
    for i, raw in enumerate(
        prefetch_iterator(
            ds.epoch(args.batch_size, shuffle=False, drop_last=False), depth=2
        )
    ):
        if args.max_batches is not None and i >= args.max_batches:
            break
        nv = int(raw.get("n_valid", args.batch_size))
        rng, k_pipe, k_noise, k_gl = jax.random.split(rng, 4)
        batch = process(raw, k_pipe)
        g3, gs = eval_fn(
            state.g_params, state.batch_stats, batch.video, batch.vid_len, k_noise
        )
        # vocode the raw postnet output sliced to the first sample's valid
        # frames, exactly like the reference (test.py:143 vocodes
        # gs[:, :, :, :mel_len[0]] unclamped)
        ml0 = int(np.asarray(raw["mel_len"])[0])
        spec = jnp.swapaxes(gs, 1, 2)[:, :ml0]
        wav_pred = np.asarray(pipe.inverse_spec(spec, k_gl))
        wav_gt = raw["wav"][:, : wav_pred.shape[1]]

        s_b, e_b = stoi_estoi_batch(jnp.asarray(wav_gt), jnp.asarray(wav_pred))
        stois.append(np.asarray(s_b)[:nv])
        estois.append(np.asarray(e_b)[:nv])
        pesqs.append(
            np.asarray(pesq_batch(np.asarray(wav_gt), wav_pred, fs=16_000))[:nv]
        )

        g3_np, gs_np = np.asarray(g3), np.asarray(gs)
        for b in range(nv):
            name = (
                ds.source.name(i * args.batch_size + b)
                if hasattr(ds.source, "name")
                else f"clip_{i * args.batch_size + b:05d}"
            )
            parts = name.split("/")
            sub = parts[0] if len(parts) > 1 else "synthetic"
            fname = parts[-1]
            mel_dir = os.path.join(args.out_dir, "spec_mel", sub)
            wav_dir = os.path.join(args.out_dir, "wav", sub)
            os.makedirs(mel_dir, exist_ok=True)
            os.makedirs(wav_dir, exist_ok=True)
            n_mel = int(raw["mel_len"][b])
            np.savez(
                os.path.join(mel_dir, f"{fname}.npz"),
                mel=g3_np[b : b + 1, :, :n_mel],
                spec=gs_np[b : b + 1, :, :n_mel],
            )
            write_wav(os.path.join(wav_dir, f"{fname}.wav"), wav_pred[b])

    stoi_m = float(np.nanmean(np.concatenate(stois))) if stois else 0.0
    estoi_m = float(np.nanmean(np.concatenate(estois))) if estois else 0.0
    pesq_m = float(np.nanmean(np.concatenate(pesqs))) if pesqs else 0.0
    print("STOI: ", stoi_m)
    print("ESTOI: ", estoi_m)
    print("PESQ: ", pesq_m)
    with open(os.path.join(args.out_dir, "metric.txt"), "w") as f:
        f.write(f"STOI : {stoi_m}")
        f.write(f"ESTOI : {estoi_m}")
        f.write(f"PESQ : {pesq_m}")


if __name__ == "__main__":
    main()
