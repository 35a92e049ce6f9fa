"""Trained-weights bf16-vs-fp32 serving quality, on the composed path.

The untrained-net pin (tests/test_bf16_and_lrs_train.py) can only bound
STOI(fp32, bf16) at 0.85 because Griffin-Lim phase recovery is chaotic on
noise-like spectrograms.  This tool loads SOAKED weights (the fp16 serving
npz tools/soak.py saves, e.g. runs/soak_bf16_b32/serving_fp16.npz), runs
the full composed serving path — visual front -> generator -> postnet ->
fp32 Griffin-Lim — in both compute dtypes on the SAME weights, SAME
synthetic GRID val clips, SAME injected generator noise, and reports:

- mel corr + linear-spec rel-L2 between the two paths,
- per-clip STOI/ESTOI(wav_fp32, wav_bf16)  (dtype drift),
- STOI/ESTOI vs GROUND TRUTH for each dtype  (does bf16 cost any
  instrumental quality on the content the model actually produces?).

Reference bar being matched: the torch test path scores STOI/ESTOI/PESQ of
fp32 inference only (test.py:131-148); this pins that switching that path
to bf16 on TPU is quality-neutral.

Usage:
  python tools/eval_bf16_quality.py [--npz runs/soak_bf16_b32/serving_fp16.npz]
      [--batches 4] [--batch 8] [--window 40]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from vcagan.runtime import enable_compilation_cache

enable_compilation_cache()

import jax
import jax.numpy as jnp
import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--npz", default="runs/soak_bf16_b32/serving_fp16.npz")
    p.add_argument("--batches", type=int, default=4)
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--window", type=int, default=40)
    args = p.parse_args()

    from vcagan.configs import ModelConfig, grid_config
    from vcagan.data.device_pipeline import make_device_pipeline
    from vcagan.data.grid import make_grid_dataset
    from vcagan.dsp import MelPipeline
    from vcagan.eval.stoi_np import estoi_np, stoi_np
    from vcagan.io.serving_npz import load_serving_npz
    from vcagan.train import VCAGANModules

    cfg = grid_config(
        **{"train.batch_size": args.batch, "data.window_size": args.window}
    )
    ds = make_grid_dataset(
        cfg.data, cfg.audio, "val", synthetic_fallback=True, seed=0, workers=1
    )
    process_eval = make_device_pipeline(cfg.audio, cfg.data, augment=False)
    pipe = MelPipeline(cfg.audio)

    # template trees from init_all (jitted, CLAUDE.md), then the trained fill
    tmpl = VCAGANModules.create(ModelConfig())
    t_params, t_stats = tmpl.init_all(
        jax.random.PRNGKey(0), batch_size=2, video_frames=20, image_size=48
    )
    g_params, g_stats = load_serving_npz(args.npz, t_params, t_stats)

    def make_forward(bf16: bool):
        modules = VCAGANModules.create(ModelConfig(use_bfloat16=bf16))

        def forward(video, vid_len, noise, gl_key):
            phon, sent = modules.v_front.apply(
                {"params": g_params["v_front"], "batch_stats": g_stats["v_front"]},
                video, train=False,
            )
            _, _, g3 = modules.gen.apply(
                {"params": g_params["gen"], "batch_stats": g_stats["gen"]},
                sent, phon, vid_len, train=False, noise=noise,
            )
            gs = modules.post.apply(
                {"params": g_params["post"], "batch_stats": g_stats["post"]},
                g3, train=False,
            )
            spec = jnp.swapaxes(gs, 1, 2).astype(jnp.float32)
            wav = pipe.inverse_spec(spec, gl_key)
            return g3.astype(jnp.float32), spec, wav

        return jax.jit(forward)

    fwd = {False: make_forward(False), True: make_forward(True)}

    rows = []
    rng = np.random.default_rng(0)
    it = ds.epoch(args.batch, shuffle=False, drop_last=True)
    for i, raw in enumerate(it):
        if i >= args.batches:
            break
        key = jax.random.PRNGKey(100 + i)
        batch = process_eval(raw, key)
        b, w = batch.video.shape[0], batch.video.shape[1]
        noise = jnp.asarray(rng.standard_normal((b, 20, w, 128)), jnp.float32)
        out = {}
        for bf16 in (False, True):
            g3, spec, wav = fwd[bf16](batch.video, batch.vid_len, noise, key)
            out[bf16] = (np.asarray(g3), np.asarray(spec), np.asarray(wav))
        (g32, s32, w32), (g16, s16, w16) = out[False], out[True]
        wav_gt = np.asarray(raw["wav"])[:, : w32.shape[1]]
        for bidx in range(b):
            L = min(w32.shape[1], wav_gt.shape[1])
            rows.append(
                {
                    "mel_corr": float(
                        np.corrcoef(g32[bidx].ravel(), g16[bidx].ravel())[0, 1]
                    ),
                    "spec_rel_l2": float(
                        np.linalg.norm(s16[bidx] - s32[bidx])
                        / max(np.linalg.norm(s32[bidx]), 1e-9)
                    ),
                    "stoi_32_vs_16": stoi_np(w32[bidx][:L], w16[bidx][:L], 16_000),
                    "estoi_32_vs_16": estoi_np(w32[bidx][:L], w16[bidx][:L], 16_000),
                    "stoi_gt_fp32": stoi_np(wav_gt[bidx][:L], w32[bidx][:L], 16_000),
                    "stoi_gt_bf16": stoi_np(wav_gt[bidx][:L], w16[bidx][:L], 16_000),
                    "estoi_gt_fp32": estoi_np(wav_gt[bidx][:L], w32[bidx][:L], 16_000),
                    "estoi_gt_bf16": estoi_np(wav_gt[bidx][:L], w16[bidx][:L], 16_000),
                }
            )

    agg = {
        k: round(float(np.mean([r[k] for r in rows])), 4) for k in rows[0]
    }
    agg["n_clips"] = len(rows)
    agg["stoi_gt_delta_bf16_minus_fp32"] = round(
        agg["stoi_gt_bf16"] - agg["stoi_gt_fp32"], 5
    )
    agg["estoi_gt_delta_bf16_minus_fp32"] = round(
        agg["estoi_gt_bf16"] - agg["estoi_gt_fp32"], 5
    )
    agg["min_stoi_32_vs_16"] = round(
        float(np.min([r["stoi_32_vs_16"] for r in rows])), 4
    )
    print(json.dumps(agg))


if __name__ == "__main__":
    main()
