"""LRS2/LRS3 adversarial training CLI — argv-compatible with the reference
train_LRS.py (reference: train_LRS.py:27-53).

Differences from GRID baked into the config preset (reference deltas,
SURVEY.md §2.3): batch 16, 200 epochs, window 50, max 160 frames, plain
Adam, MultiStep [100, 150], sync D-loss weight 0.5, recon on normalized
mels, f_max 7600, per-epoch validation.
"""

from __future__ import annotations

import argparse

from vcagan.configs import lrs_config


def parse_args(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--data", default="Data_dir")
    p.add_argument("--data_name", type=str, default="LRS2", help="LRS2 | LRS3")
    p.add_argument("--checkpoint_dir", type=str, default="./data/checkpoints/LRS")
    p.add_argument("--checkpoint", type=str, default=None)
    p.add_argument("--batch_size", type=int, default=16)
    p.add_argument("--epochs", type=int, default=200)
    p.add_argument("--lr", type=float, default=0.0001)
    p.add_argument("--weight_decay", type=float, default=0.00001)
    p.add_argument("--workers", type=int, default=3)
    p.add_argument("--seed", type=int, default=1)
    p.add_argument("--eval_step", type=int, default=0, help="0 = per-epoch")
    p.add_argument("--start_epoch", type=int, default=0)
    p.add_argument("--augmentations", default=True)
    p.add_argument("--window_size", type=int, default=50)
    p.add_argument("--max_timesteps", type=int, default=160)
    p.add_argument("--temp", type=float, default=1.0)
    p.add_argument("--f_min", type=float, default=55.0)
    p.add_argument("--f_max", type=float, default=7600.0)
    p.add_argument("--dataparallel", default=False, action="store_true")
    p.add_argument("--gpu", type=str, default="0,1,2,3")
    # TPU-native extensions
    p.add_argument("--model_parallel", type=int, default=1)
    p.add_argument("--log_dir", type=str, default="./runs/lrs")
    p.add_argument("--max_steps", type=int, default=None)
    p.add_argument("--media_every", type=int, default=100)
    p.add_argument("--synthetic", action="store_true")
    p.add_argument("--platform", type=str, default=None,
                   help="force a jax platform (e.g. cpu); must be set before device use")
    p.add_argument("--bf16", action="store_true",
                   help="bfloat16 compute in conv/matmul-heavy modules "
                        "(params and losses stay fp32; ~25%% more clips/s)")
    return p.parse_args(argv)


def build_config(args):
    return lrs_config(
        args.data_name,
        **{
            "audio.f_min": args.f_min,
            "audio.f_max": args.f_max,
            "data.data_root": args.data,
            "data.dataset": args.data_name,
            "data.window_size": args.window_size,
            "data.max_v_timesteps": args.max_timesteps,
            "data.augmentations": bool(args.augmentations),
            "train.batch_size": args.batch_size,
            "train.epochs": args.epochs,
            "train.lr": args.lr,
            "train.weight_decay": args.weight_decay,
            "train.seed": args.seed,
            "train.eval_step": args.eval_step,
            "train.start_epoch": args.start_epoch,
            "train.workers": args.workers,
            "train.checkpoint_dir": args.checkpoint_dir,
            "model.sync_temp": args.temp,
            # getattr: callers that share this config builder (test_lrs)
            # don't define the train-only --bf16 flag
            "model.use_bfloat16": getattr(args, "bf16", False),
            "mesh.model_parallel": args.model_parallel,
        },
    )


def main(argv=None):
    from vcagan.runtime import enable_compilation_cache
    from vcagan.train.loop import Trainer

    enable_compilation_cache()
    args = parse_args(argv)
    if args.platform:
        import jax

        jax.config.update("jax_platforms", args.platform)
    cfg = build_config(args)
    trainer = Trainer(cfg, log_dir=args.log_dir)
    if args.checkpoint is not None:
        trainer.state = trainer.ckpt.restore(trainer.state, args.checkpoint)
    logs = trainer.validate(fast=True, max_batches=1)
    print(f"pre-train validate: l1={logs[0]:.4f} stoi={logs[1]:.4f}")
    trainer.fit(
        epochs=args.epochs,
        start_epoch=args.start_epoch,
        max_steps=args.max_steps,
        media_every=args.media_every,
    )
    print("Finishing training")


if __name__ == "__main__":
    main()
