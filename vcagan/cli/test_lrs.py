"""LRS2/LRS3 inference CLI — argv-compatible with the reference test_LRS.py.

Flip-TTA inference, LRS spec-chain inversion, per-sample Griffin-Lim on
mel_len, STOI/ESTOI, artifact dump ./test/<dataset>/{mel,wav}/... +
metric.txt (reference: test_LRS.py:60-188).
"""

from __future__ import annotations

import argparse
import os

import jax
import jax.numpy as jnp
import numpy as np

from vcagan.cli.train_lrs import build_config
from vcagan.data.lrs import (
    LRSClipSource,
    LRSDataset,
    SyntheticLRSSource,
    lrs_denormalize_spec,
    make_lrs_device_pipeline,
)
from vcagan.dsp import MelPipeline
from vcagan.eval import stoi_estoi_batch
from vcagan.eval.pesq_nb import pesq_batch
from vcagan.io import CheckpointManager, write_wav
from vcagan.train.models import VCAGANModules
from vcagan.train.state import create_train_state
from vcagan.train.step import make_eval_step


def parse_args(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--data", default="Data_dir")
    p.add_argument("--data_name", type=str, default="LRS2")
    p.add_argument("--checkpoint_dir", type=str, default="./data/checkpoints/LRS")
    p.add_argument("--checkpoint", type=str, default=None)
    p.add_argument("--batch_size", type=int, default=8)
    p.add_argument("--epochs", type=int, default=1)
    p.add_argument("--lr", type=float, default=0.0001)
    p.add_argument("--weight_decay", type=float, default=0.00001)
    p.add_argument("--workers", type=int, default=3)
    p.add_argument("--seed", type=int, default=1)
    p.add_argument("--start_epoch", type=int, default=0)
    p.add_argument("--augmentations", default=False)
    p.add_argument("--window_size", type=int, default=50)
    p.add_argument("--max_timesteps", type=int, default=160)
    p.add_argument("--temp", type=float, default=1.0)
    p.add_argument("--f_min", type=float, default=55.0)
    p.add_argument("--f_max", type=float, default=7600.0)
    p.add_argument("--dataparallel", default=False, action="store_true")
    p.add_argument("--gpu", type=str, default="0")
    p.add_argument("--eval_step", type=int, default=0)
    p.add_argument("--model_parallel", type=int, default=1)
    # TPU-native extensions
    p.add_argument("--out_dir", type=str, default="./test")
    p.add_argument("--synthetic", action="store_true")
    p.add_argument("--platform", type=str, default=None,
                   help="force a jax platform (e.g. cpu); must be set before device use")
    p.add_argument("--max_batches", type=int, default=None)
    p.add_argument("--synthetic_clips", type=int, default=4,
                   help="clip count for the synthetic fallback corpus "
                        "(LRS-scale timing runs use ~1300)")
    p.add_argument("--no_sort_by_length", action="store_true",
                   help="disable length-sorted batching (sorted batching "
                        "puts same-length clips together so each batch "
                        "runs at the smallest bucket shape that fits)")
    p.add_argument("--time_breakdown", action="store_true",
                   help="print a JSON wall-time breakdown (device vocode "
                        "sync / STOI / PESQ / artifact dump) at the end")
    p.add_argument("--bf16", action="store_true",
                   help="bf16 serving mode: conv/matmul compute in bfloat16 "
                        "(params and the Griffin-Lim vocoder stay fp32; "
                        "build_config picks this up via getattr)")
    return p.parse_args(argv)


def main(argv=None):
    from vcagan.runtime import enable_compilation_cache

    enable_compilation_cache()
    args = parse_args(argv)
    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    cfg = build_config(args)

    modules = VCAGANModules.create(cfg.model)
    state, _, _ = create_train_state(
        jax.random.PRNGKey(args.seed), modules, cfg.train, 1
    )
    if args.checkpoint is not None:
        ckpt = CheckpointManager(os.path.dirname(args.checkpoint) or ".")
        state = ckpt.restore(state, args.checkpoint)

    eval_fn = make_eval_step(modules, flip_tta=True)
    process = make_lrs_device_pipeline(
        cfg.audio, augment=False, host_crop=cfg.data.host_crop
    )
    pipe = MelPipeline(cfg.audio)

    try:
        source = LRSClipSource(cfg.data, "test")
        if len(source) == 0:
            raise FileNotFoundError
    except (FileNotFoundError, OSError):
        source = SyntheticLRSSource(num_clips=args.synthetic_clips)
    ds = LRSDataset(source, cfg.audio, cfg.data, mode="test", seed=0)

    import time as _time

    rng = jax.random.PRNGKey(args.seed)
    stois, estois, pesqs = [], [], []
    t_vocode = t_stoi = t_pesq = t_dump = 0.0
    t_wall0 = _time.perf_counter()
    out_base = os.path.join(args.out_dir, args.data_name)
    os.makedirs(out_base, exist_ok=True)

    from vcagan.data.prefetch import prefetch_iterator

    hop = cfg.audio.hop_length
    # overlap decode/collate with device compute + host metric scoring
    for i, raw in enumerate(
        prefetch_iterator(
            ds.epoch(
                args.batch_size,
                shuffle=False,
                drop_last=False,
                sort_by_length=not args.no_sort_by_length,
            ),
            depth=2,
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
        # Per-sample length fidelity (reference test_LRS.py:160-165 vocodes
        # gs[b,:,:,:mel_len[b]]): zero the padded spec frames so they add no
        # energy to the batched Griffin-Lim, then trim per sample below —
        # static shapes, no per-length recompile.
        mel_len = jnp.asarray(raw["mel_len"])
        spec = lrs_denormalize_spec(jnp.swapaxes(gs, 1, 2))
        frame_valid = jnp.arange(spec.shape[1])[None, :] < mel_len[:, None]
        spec = jnp.where(frame_valid[:, :, None], spec, 0.0)
        t0 = _time.perf_counter()
        wav_pred = np.asarray(pipe.inverse_spec(spec, k_gl))
        t_vocode += _time.perf_counter() - t0  # sync point: model + GL
        wav_gt = np.asarray(raw["wav"])[:, : wav_pred.shape[1]].copy()

        # zero both signals past the true length and hand stoi_batch the
        # per-sample lengths: silent-frame removal plus exclusive framing
        # at the true length then score exactly pystoi's valid region
        n_wav = np.minimum(
            np.asarray(raw["mel_len"]) * hop, wav_pred.shape[1]
        )
        sample_valid = np.arange(wav_pred.shape[1])[None, :] < n_wav[:, None]
        wav_pred_m = np.where(sample_valid, wav_pred, 0.0)
        wav_gt = np.where(sample_valid, wav_gt, 0.0)
        lens = jnp.asarray(n_wav)

        t0 = _time.perf_counter()
        s_b, e_b = stoi_estoi_batch(
            jnp.asarray(wav_gt), jnp.asarray(wav_pred_m), lengths=lens
        )
        stois.append(np.asarray(s_b)[:nv])
        estois.append(np.asarray(e_b)[:nv])
        t_stoi += _time.perf_counter() - t0
        t0 = _time.perf_counter()
        pesqs.append(
            np.asarray(pesq_batch(wav_gt, wav_pred_m, fs=16_000))[:nv]
        )
        t_pesq += _time.perf_counter() - t0

        t0 = _time.perf_counter()
        g3_np, gs_np = np.asarray(g3), np.asarray(gs)
        gids = np.asarray(raw["idx"])
        for b in range(nv):
            name = ds.source.name(int(gids[b]))
            rel = name.replace("/", "_")
            mel_dir = os.path.join(out_base, "mel")
            wav_dir = os.path.join(out_base, "wav")
            os.makedirs(mel_dir, exist_ok=True)
            os.makedirs(wav_dir, exist_ok=True)
            n_mel = int(raw["mel_len"][b])
            np.savez(
                os.path.join(mel_dir, f"{rel}.npz"),
                mel=g3_np[b : b + 1, :, :n_mel],
                spec=gs_np[b : b + 1, :, :n_mel],
            )
            # trimmed wav, like the reference's per-sample dump
            write_wav(
                os.path.join(wav_dir, f"{rel}.wav"), wav_pred[b, : int(n_wav[b])]
            )
        t_dump += _time.perf_counter() - t0

    if args.time_breakdown:
        import json as _json

        wall = _time.perf_counter() - t_wall0
        n_scored = int(sum(len(s) for s in stois))
        print(_json.dumps({
            "clips": n_scored,
            "wall_s": round(wall, 1),
            "clips_per_s": round(n_scored / max(wall, 1e-9), 2),
            "vocode_sync_s": round(t_vocode, 1),  # model fwd + GL + D2H
            "stoi_estoi_s": round(t_stoi, 1),
            "pesq_s": round(t_pesq, 1),
            "dump_s": round(t_dump, 1),
            "other_s": round(wall - t_vocode - t_stoi - t_pesq - t_dump, 1),
        }))

    stoi_m = float(np.nanmean(np.concatenate(stois))) if stois else 0.0
    estoi_m = float(np.nanmean(np.concatenate(estois))) if estois else 0.0
    pesq_m = float(np.nanmean(np.concatenate(pesqs))) if pesqs else 0.0
    print("STOI: ", stoi_m)
    print("ESTOI: ", estoi_m)
    print("PESQ: ", pesq_m)
    with open(os.path.join(out_base, "metric.txt"), "w") as f:
        f.write(f"STOI : {stoi_m}")
        f.write(f"ESTOI : {estoi_m}")
        f.write(f"PESQ : {pesq_m}")


if __name__ == "__main__":
    main()
