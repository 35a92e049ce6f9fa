"""GRID adversarial training CLI — argv-compatible with the reference
train.py (reference: train.py:25-50).

    python -m vcagan.cli.train --grid <GRID_root> --subject overlap ...

Flags kept verbatim; torch-era flags (--dataparallel, --gpu, --workers) are
accepted and mapped to their TPU-native meanings (--dataparallel is implied:
the batch axis is always sharded over the device mesh).
"""

from __future__ import annotations

import argparse

from vcagan.configs import grid_config


def parse_args(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--grid", default="Data_dir")
    p.add_argument("--checkpoint_dir", type=str, default="./data/checkpoints/GRID")
    p.add_argument("--checkpoint", type=str, default=None)
    p.add_argument("--batch_size", type=int, default=88)
    p.add_argument("--epochs", type=int, default=1000)
    p.add_argument("--lr", type=float, default=0.0001)
    p.add_argument("--weight_decay", type=float, default=0.00001)
    p.add_argument("--workers", type=int, default=6)
    p.add_argument("--seed", type=int, default=1)
    p.add_argument(
        "--subject",
        type=str,
        default="overlap",
        help="overlap | unseen | s1 | s2 | s4 | s29 | four",
    )
    p.add_argument("--eval_step", type=int, default=720)
    p.add_argument("--start_epoch", type=int, default=0)
    p.add_argument("--augmentations", default=True)
    p.add_argument("--window_size", type=int, default=40)
    p.add_argument("--max_timesteps", type=int, default=75)
    p.add_argument("--temp", type=float, default=1.0)
    p.add_argument("--dataparallel", default=False, action="store_true")
    p.add_argument("--gpu", type=str, default="0,1,2,3")
    # TPU-native extensions
    p.add_argument("--model_parallel", type=int, default=1)
    p.add_argument("--log_dir", type=str, default="./runs/grid")
    p.add_argument("--max_steps", type=int, default=None)
    p.add_argument("--media_every", type=int, default=100)
    p.add_argument("--synthetic", action="store_true",
                   help="force synthetic fixtures (no corpus needed)")
    p.add_argument("--platform", type=str, default=None,
                   help="force a jax platform (e.g. cpu); must be set before device use")
    p.add_argument("--bf16", action="store_true",
                   help="bfloat16 compute in conv/matmul-heavy modules "
                        "(params and losses stay fp32; ~25%% more clips/s)")
    p.add_argument("--remat", type=str, default="none",
                   help="selective remat sites (none|r1|stem|vfront, comma-separable); "
                        "r1 + bf16 batch 96 is the single-chip record (190.3 clips/s)")
    p.add_argument("--d_phase", type=str, default="ref",
                   choices=("ref", "batched"),
                   help="D-phase program structure (ref|batched), math-identical; "
                        "batched = one 2B real+fake forward per scale + joint R1")
    p.add_argument("--collate_process", action="store_true",
                   help="decode+collate in a worker process with shared-memory "
                        "handoff (ProcessEpoch) — the DataLoader-workers "
                        "analogue for GIL-bound hosts")
    return p.parse_args(argv)


def build_config(args):
    return grid_config(
        **{
            "data.data_root": args.grid,
            "data.subject": args.subject,
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
            "model.use_bfloat16": args.bf16,
            "train.remat": args.remat,
            "train.d_phase": args.d_phase,
            "data.collate_process": args.collate_process,
            "mesh.model_parallel": args.model_parallel,
        }
    )


def main(argv=None):
    from vcagan.train.loop import Trainer
    from vcagan.runtime import enable_compilation_cache

    enable_compilation_cache()

    args = parse_args(argv)
    if args.platform:
        import jax

        jax.config.update("jax_platforms", args.platform)
    cfg = build_config(args)
    trainer = Trainer(cfg, log_dir=args.log_dir)
    if args.checkpoint is not None:
        trainer.state = trainer.ckpt.restore(trainer.state, args.checkpoint)
    # smoke-validate before training (reference train.py:121)
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
