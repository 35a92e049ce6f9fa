"""Adversarial stability soak: run the full GAN train step for thousands
of steps on the synthetic corpus and assert the equilibrium holds.

overfit_check.py proves short-horizon recon descent; nothing else
demonstrates the two-optimizer adversarial system (R1, sync leak, BN stats
under both phases) stays bounded over a long horizon.  This harness runs
the PRODUCTION Trainer loop (host loader -> device pipeline -> jitted
step) on the TPU, logs every step to <out>/metrics.jsonl, then audits the
trajectory:

- every metric finite at every step (NaN/Inf anywhere fails),
- loss envelopes bounded: the last-decile median of each loss is below
  BOUNDS, grad norms neither explode (> GRAD_MAX) nor die (~0 for the
  generator = mode collapse),
- recon descends: last-decile median < first-decile median,
- BN running stats stay finite and their drift is reported.

Exit code 0 = stable; 1 = violation (printed).  Summary JSON on stdout.

Usage:
  python tools/soak.py --steps 2000 --batch 16 --window 40 --out runs/soak_fp32
  python tools/soak.py --steps 2000 --batch 32 --bf16 --out runs/soak_bf16
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

BOUNDS = {
    # generous envelopes: any healthy run sits far inside; divergence or
    # collapse blows through them
    "dis_loss": 50.0,
    "gen_loss": 500.0,
    "g_loss": 100.0,
    "recon_loss": 10.0,
    "r1": 100.0,
}
GRAD_MAX = 1e4
G_GRAD_MIN = 1e-6  # generator gradient ~0 for the whole last decile = collapse


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=2000)
    p.add_argument("--batch", type=int, default=16)
    p.add_argument("--window", type=int, default=40)
    p.add_argument("--bf16", action="store_true")
    p.add_argument("--remat", type=str, default="none")
    p.add_argument("--compiler_opts", type=str, default="",
                   help="'none' = raw compiler defaults, '' = shipped default, or k=v list")
    p.add_argument("--out", type=str, default=None)
    args = p.parse_args()

    from vcagan.runtime import enable_compilation_cache

    enable_compilation_cache()

    import jax

    from vcagan.configs import grid_config
    from vcagan.train.loop import Trainer

    tag = f"{'bf16' if args.bf16 else 'fp32'}_b{args.batch}"
    out = args.out or f"./runs/soak_{tag}"
    os.makedirs(out, exist_ok=True)
    # fresh metrics file per soak
    metrics_path = os.path.join(out, "metrics.jsonl")
    if os.path.exists(metrics_path):
        os.remove(metrics_path)

    cfg = grid_config(
        **{
            "train.batch_size": args.batch,
            "train.eval_step": 10**9,  # no mid-soak validation
            "data.window_size": args.window,
            "model.use_bfloat16": args.bf16,
            "train.checkpoint_dir": os.path.join(out, "ckpt"),
        }
    )
    trainer = Trainer(cfg, log_dir=out, synthetic_fallback=True)
    overrides = {}
    if args.remat != "none":
        overrides["remat"] = args.remat
    if args.compiler_opts == "none":
        overrides["compiler_options"] = None
    elif args.compiler_opts:
        overrides["compiler_options"] = dict(
            kv.split("=", 1) for kv in args.compiler_opts.split(",")
        )
    if overrides:
        trainer.rebuild_train_step(**overrides)

    bn0 = _bn_summary(trainer.state.batch_stats)
    t0 = time.time()
    epochs = args.steps // trainer.steps_per_epoch + 1
    trainer.fit(epochs=epochs, max_steps=args.steps, log_every=1)
    wall = time.time() - t0
    bn1 = _bn_summary(trainer.state.batch_stats)

    # Save the soaked state: the full orbax checkpoint (resume-grade) plus
    # a compact fp16 npz of the serving-side weights, which is what the
    # trained-weights bf16-vs-fp32 quality pin loads
    # (tools/eval_bf16_quality.py / tests/test_bf16_and_lrs_train.py).
    from vcagan.io.serving_npz import save_serving_npz

    trainer.ckpt.save(trainer.state, epoch=epochs)
    save_serving_npz(
        trainer.state.g_params,
        trainer.state.batch_stats,
        os.path.join(out, "serving_fp16.npz"),
    )
    # committable int8 fixture for the fresh-checkout trained-weights pin
    # (copy to data/soak_serving_q8.npz and commit; see serving_npz.py)
    save_serving_npz(
        trainer.state.g_params,
        trainer.state.batch_stats,
        os.path.join(out, "serving_q8.npz"),
        quantize="q8",
    )

    # ---- audit the trajectory ----
    rows = [json.loads(l) for l in open(metrics_path)]
    rows = [r for r in rows if "train/gen_loss" in r]
    assert len(rows) >= args.steps * 0.95, f"only {len(rows)} step rows logged"

    failures = []
    series = {}
    for key in list(BOUNDS) + ["g_sync_loss", "d_sync_loss", "g_grad_norm", "d_grad_norm"]:
        v = np.asarray([r.get(f"train/{key}", np.nan) for r in rows], np.float64)
        series[key] = v
        if not np.isfinite(v).all():
            failures.append(f"{key}: {np.count_nonzero(~np.isfinite(v))} non-finite values")

    dec = max(len(rows) // 10, 1)
    for key, bound in BOUNDS.items():
        tail = np.median(series[key][-dec:])
        if not (tail < bound):
            failures.append(f"{key}: last-decile median {tail:.3f} >= bound {bound}")
    for key in ("g_grad_norm", "d_grad_norm"):
        if np.nanmax(series[key]) > GRAD_MAX:
            failures.append(f"{key}: max {np.nanmax(series[key]):.1f} > {GRAD_MAX}")
    if np.median(series["g_grad_norm"][-dec:]) < G_GRAD_MIN:
        failures.append("g_grad_norm collapsed to ~0 (mode collapse signature)")
    recon_head = np.median(series["recon_loss"][:dec])
    recon_tail = np.median(series["recon_loss"][-dec:])
    if not (recon_tail < recon_head):
        failures.append(
            f"recon did not descend: head {recon_head:.4f} -> tail {recon_tail:.4f}"
        )
    for name, (mean_abs, max_abs) in bn1.items():
        if not np.isfinite(max_abs):
            failures.append(f"BN stats non-finite in {name}")

    summary = {
        "tag": tag,
        "steps": len(rows),
        "wall_s": round(wall, 1),
        "steps_per_s": round(len(rows) / wall, 3),
        "recon_head_median": round(float(recon_head), 4),
        "recon_tail_median": round(float(recon_tail), 4),
        "tail_medians": {
            k: round(float(np.median(series[k][-dec:])), 4) for k in series
        },
        "grad_norm_max": {
            k: round(float(np.nanmax(series[k])), 2)
            for k in ("g_grad_norm", "d_grad_norm")
        },
        "bn_drift": {
            k: {"init": bn0[k], "final": bn1[k]} for k in bn1
        },
        "failures": failures,
    }
    print(json.dumps(summary))
    sys.exit(1 if failures else 0)


def _bn_summary(batch_stats):
    """(mean|x|, max|x|) of each module's BN running stats."""
    import jax

    out = {}
    for name, tree in batch_stats.items():
        leaves = jax.tree.leaves(tree)
        if not leaves:
            continue
        flat = np.concatenate([np.abs(np.asarray(l)).ravel() for l in leaves])
        out[name] = (round(float(flat.mean()), 4), round(float(flat.max()), 4))
    return out


if __name__ == "__main__":
    main()
