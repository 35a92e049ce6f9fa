"""Sweep flagship inference throughput over compute dtype x batch size.

bench.py's headline config is fp32 batch 32 (the round-1 sweet spot, set
before the space-to-depth stem rewrite moved the bottleneck mix).  The
time breakdown (tools/bench_inference_breakdown.py) now attributes ~55%
of the composed step to the per-frame ResNet visual front, which in fp32
runs multi-pass bf16 on the MXU — so bf16 compute and a fresh batch sweep
are both unmeasured against the current graph.  This tool measures the
SAME composed path bench.py times (visual front -> generator -> postnet ->
60-iter Griffin-Lim; Griffin-Lim's windowed-DFT matmuls stay fp32 —
CLAUDE.md: fp32 matmul == bf16 speed at the 640-pt transform, so keeping
them fp32 is free exactness) across a (dtype, batch) grid.

Timing protocol per CLAUDE.md: scalar-readback sync, several launches in
flight to amortize the ~25 ms tunnel RTT.  Beware host contention: on this
1-vCPU host a concurrent pytest run corrupts the timings (measured 3x
swings) — run the sweep alone.

Measured 2026-08-18 (v5e, 75 frames): fp32 b16/32/48/64 =
80.6/84.4/86.9/84.2k mel-frames/s; bf16 b32/48/64 = 95.6/98.8/95.3k with
BatchNorm still promoting to fp32 (b96 OOMed on a 9.2 GB fp32 stem-act
temp).  After threading the compute dtype through BatchNorm
(nn/common.py::batch_norm — activations stay bf16 through the norm):
bf16 b48/64/96 = 116.5/111.6/112.2k.  bf16 b48 is the serving record
and bench.py's headline config.

Usage: python tools/bench_infer_sweep.py [--batches 16,32,48,64] [--frames 75]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from vcagan.runtime import enable_compilation_cache

enable_compilation_cache()

import jax
import jax.numpy as jnp
import numpy as np


def build(bf16: bool, gl_bf16: bool = False):
    from vcagan.configs import AudioConfig, ModelConfig
    from vcagan.dsp import MelPipeline
    from vcagan.train import VCAGANModules

    modules = VCAGANModules.create(ModelConfig(use_bfloat16=bf16))
    params, batch_stats = modules.init_all(
        jax.random.PRNGKey(0), batch_size=2, video_frames=20, image_size=48
    )
    g_params = {k: params[k] for k in ("v_front", "gen", "post")}
    g_stats = {k: batch_stats[k] for k in ("v_front", "gen", "post")}
    pipe = MelPipeline(
        AudioConfig(), gl_dtype=jnp.bfloat16 if gl_bf16 else jnp.float32
    )

    def flagship(g_params, g_stats, video, vid_len, rng):
        phon, sent = modules.v_front.apply(
            {"params": g_params["v_front"], "batch_stats": g_stats["v_front"]},
            video,
            train=False,
        )
        _, _, g3 = modules.gen.apply(
            {"params": g_params["gen"], "batch_stats": g_stats["gen"]},
            sent,
            phon,
            vid_len,
            train=False,
            rngs={"noise": rng},
        )
        gs = modules.post.apply(
            {"params": g_params["post"], "batch_stats": g_stats["post"]},
            g3,
            train=False,
        )
        spec = jnp.swapaxes(gs, 1, 2).astype(jnp.float32)  # (B, T, 321)
        return pipe.inverse_spec(spec, rng)

    return jax.jit(flagship), g_params, g_stats


def measure(fn, g_params, g_stats, batch, frames, n_inflight=8):
    rng = np.random.default_rng(0)
    video = jnp.asarray(
        rng.standard_normal((batch, frames, 112, 112, 1)), jnp.float32
    )
    vid_len = jnp.full((batch,), frames, jnp.int32)
    for i in range(2):
        out = fn(g_params, g_stats, video, vid_len, jax.random.PRNGKey(i))
        _ = float(jnp.sum(jnp.abs(out)))
    t0 = time.perf_counter()
    sums = []
    for i in range(n_inflight):
        out = fn(g_params, g_stats, video, vid_len, jax.random.PRNGKey(i))
        sums.append(jnp.sum(jnp.abs(out)))
    _ = [float(s) for s in sums]
    elapsed = time.perf_counter() - t0
    return n_inflight * batch * 4 * frames / elapsed


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batches", default="16,32,48,64")
    p.add_argument("--frames", type=int, default=75)
    p.add_argument("--dtypes", default="fp32,bf16")
    p.add_argument(
        "--gl",
        default="fp32",
        choices=["fp32", "bf16"],
        help="Griffin-Lim matmul compute dtype (MelPipeline gl_dtype)",
    )
    args = p.parse_args()
    batches = [int(b) for b in args.batches.split(",")]

    for name in args.dtypes.split(","):
        bf16 = name == "bf16"
        fn, g_params, g_stats = build(bf16, gl_bf16=args.gl == "bf16")
        for b in batches:
            fps = measure(fn, g_params, g_stats, b, args.frames)
            print(
                f"{name}+gl_{args.gl}  b{b:<3d} x {args.frames}f: "
                f"{fps:10.1f} mel-frames/s",
                flush=True,
            )


if __name__ == "__main__":
    main()
