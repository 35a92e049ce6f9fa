"""Pallas masked attention vs the XLA einsum fallback, at production shapes.

The AVAttention core (vcagan/kernels/masked_attention.py) ships with
``use_pallas_attention=True``; this tool measures whether the kernel
actually beats the XLA einsum fallback it replaces, whole-graph on the
real chip, for both production modes:

  infer:  the composed serving path (visual front -> generator -> postnet
          -> 60-iter Griffin-Lim) at the bench.py config
  train:  the full adversarial train step (fwd + bwd through the kernel's
          custom VJP vs XLA's einsum AD) at a GRID train shape

Both variants run the SAME params; only ``Decoder.use_pallas_attention``
differs.  Timing: several launches in flight, scalar readback as the sync
point (block_until_ready is unreliable through the tunnel, CLAUDE.md).

Usage:
  python tools/bench_attention.py infer [--batch 48] [--frames 75] [--fp32]
  python tools/bench_attention.py train [--batch 64] [--window 40] [--fp32]
      [--remat r1]
"""

from __future__ import annotations

import argparse
import dataclasses
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from vcagan.runtime import enable_compilation_cache

enable_compilation_cache()

import jax
import jax.numpy as jnp
import numpy as np


def _swap_attention(modules, use_pallas: bool):
    return dataclasses.replace(
        modules, gen=modules.gen.clone(use_pallas_attention=use_pallas)
    )


def bench_infer(args) -> None:
    from vcagan.configs import AudioConfig, ModelConfig
    from vcagan.dsp import MelPipeline
    from vcagan.train import VCAGANModules

    bf16 = not args.fp32
    base = VCAGANModules.create(ModelConfig(use_bfloat16=bf16))
    params, stats = base.init_all(
        jax.random.PRNGKey(0), batch_size=2, video_frames=20, image_size=48
    )
    g_params = {k: params[k] for k in ("v_front", "gen", "post")}
    g_stats = {k: stats[k] for k in ("v_front", "gen", "post")}
    pipe = MelPipeline(AudioConfig())

    rng = np.random.default_rng(0)
    video = jnp.asarray(
        rng.standard_normal((args.batch, args.frames, 112, 112, 1)), jnp.float32
    )
    vid_len = jnp.full((args.batch,), args.frames, jnp.int32)
    key = jax.random.PRNGKey(1)
    mel_per_batch = args.batch * 4 * args.frames

    results = {}
    for use_pallas in (True, False):
        modules = _swap_attention(base, use_pallas)

        def flagship(g_params, g_stats, video, vid_len, rng):
            phon, sent = modules.v_front.apply(
                {"params": g_params["v_front"], "batch_stats": g_stats["v_front"]},
                video, train=False,
            )
            _, _, g3 = modules.gen.apply(
                {"params": g_params["gen"], "batch_stats": g_stats["gen"]},
                sent, phon, vid_len, train=False, rngs={"noise": rng},
            )
            gs = modules.post.apply(
                {"params": g_params["post"], "batch_stats": g_stats["post"]},
                g3, train=False,
            )
            spec = jnp.swapaxes(gs, 1, 2).astype(jnp.float32)
            return pipe.inverse_spec(spec, rng)

        fn = jax.jit(flagship)
        for _ in range(2):  # compile + warm
            _ = float(jnp.sum(jnp.abs(fn(g_params, g_stats, video, vid_len, key))))
        t0 = time.perf_counter()
        sums = [
            jnp.sum(jnp.abs(fn(g_params, g_stats, video, vid_len, key)))
            for _ in range(8)
        ]
        _ = [float(s) for s in sums]
        dt = (time.perf_counter() - t0) / 8
        name = "pallas" if use_pallas else "einsum"
        results[name] = mel_per_batch / dt
        print(
            f"infer b{args.batch}x{args.frames}f "
            f"{'bf16' if bf16 else 'fp32'} {name:6s}: {dt * 1e3:7.1f} ms  "
            f"{mel_per_batch / dt:9.0f} mel-frames/s"
        )
    print(f"pallas/einsum speedup: {results['pallas'] / results['einsum']:.3f}x")


def bench_train(args) -> None:
    from vcagan.train import make_train_step

    from _fixtures import train_fixture

    bf16 = not args.fp32
    base_modules, cfg, g_tx, d_tx, state, batch = train_fixture(
        args.batch, args.window, bf16
    )
    results = {}
    for use_pallas in (True, False):
        modules = _swap_attention(base_modules, use_pallas)
        step_fn = make_train_step(
            modules, g_tx, d_tx, cfg, donate=False, remat=args.remat
        )
        t0 = time.perf_counter()
        st, metrics = step_fn(state, batch, jax.random.PRNGKey(0))
        _ = float(metrics["gen_loss"])
        compile_s = time.perf_counter() - t0
        st, metrics = step_fn(st, batch, jax.random.PRNGKey(1))
        _ = float(metrics["gen_loss"])
        n = 8
        t0 = time.perf_counter()
        vals = []
        for i in range(n):
            st, metrics = step_fn(st, batch, jax.random.PRNGKey(i))
            vals.append(metrics["gen_loss"])
        _ = [float(v) for v in vals]
        dt = (time.perf_counter() - t0) / n
        name = "pallas" if use_pallas else "einsum"
        results[name] = args.batch / dt
        print(
            f"train b{args.batch}x{args.window}f "
            f"{'bf16' if bf16 else 'fp32'} remat={args.remat} {name:6s}: "
            f"{dt * 1e3:7.1f} ms  {args.batch / dt:6.1f} clips/s "
            f"(compile {compile_s:.0f}s)"
        )
        del st
    print(f"pallas/einsum speedup: {results['pallas'] / results['einsum']:.3f}x")


def main():
    p = argparse.ArgumentParser()
    p.add_argument("mode", choices=["infer", "train"])
    p.add_argument("--batch", type=int, default=None)
    p.add_argument("--frames", type=int, default=75)
    p.add_argument("--window", type=int, default=40)
    p.add_argument("--remat", type=str, default="r1")
    p.add_argument("--fp32", action="store_true")
    args = p.parse_args()
    if args.batch is None:
        args.batch = 48 if args.mode == "infer" else 64
    if args.mode == "infer":
        bench_infer(args)
    else:
        bench_train(args)


if __name__ == "__main__":
    main()
