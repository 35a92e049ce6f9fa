"""Measure eval-time BN folding + bf16 serving weights on the flagship path.

Variants, all at the bench.py composed path (visual front -> generator ->
postnet -> 60-iter Griffin-Lim, fp32 GL):

  base       unfolded modules, fp32 params, bf16 compute  (r3 headline)
  fold       fold_bn modules + fold_generator_side params, bf16 compute
  fold+w16   fold + params cast to bf16 (GRU 'sentence_encoder' subtree
             kept fp32 — the recurrence is pinned fp32, CLAUDE.md)
  fold+fused fold + the trunk's 5 stride-1 ResNet blocks each as ONE
             Pallas kernel (vcagan.kernels.fused_block)

Each timed whole-graph with 8 launches in flight and one scalar-readback
sync (block_until_ready is unreliable through the tunnel).  Also reports a
numeric delta of each variant's waveform vs base at fixed rng.

Usage: python tools/bench_fold.py [--batch 48] [--frames 75] [--fp32]
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


def _timed(fn, args, n_inflight=8, warmup=2):
    for _ in range(warmup):
        out = fn(*args)
        _ = float(jnp.sum(jnp.abs(out)))
    t0 = time.perf_counter()
    sums = []
    for _ in range(n_inflight):
        sums.append(jnp.sum(jnp.abs(fn(*args))))
    _ = [float(s) for s in sums]
    return (time.perf_counter() - t0) / n_inflight


def build(fold: bool, bf16: bool, fused: bool = False):
    from vcagan.configs import AudioConfig, ModelConfig
    from vcagan.dsp import MelPipeline
    from vcagan.nn import fold_generator_side
    from vcagan.train import VCAGANModules

    base = VCAGANModules.create(ModelConfig(use_bfloat16=bf16))
    params, stats = base.init_all(
        jax.random.PRNGKey(0), batch_size=2, video_frames=20, image_size=48
    )
    g_params = {k: params[k] for k in ("v_front", "gen", "post")}
    g_stats = {k: stats[k] for k in ("v_front", "gen", "post")}
    modules = (
        VCAGANModules.create(
            ModelConfig(use_bfloat16=bf16), fold_bn=True, fused_blocks=fused
        )
        if fold
        else base
    )
    if fold:
        g_params, g_stats = fold_generator_side(g_params, g_stats)
    pipe = MelPipeline(AudioConfig())

    def flagship(g_params, g_stats, video, vid_len, rng):
        vf_vars = {"params": g_params["v_front"]}
        if g_stats["v_front"]:
            vf_vars["batch_stats"] = g_stats["v_front"]
        phon, sent = modules.v_front.apply(vf_vars, video, train=False)
        _, _, g3 = modules.gen.apply(
            {"params": g_params["gen"], "batch_stats": g_stats["gen"]},
            sent, phon, vid_len, train=False, rngs={"noise": rng},
        )
        post_vars = {"params": g_params["post"]}
        if g_stats["post"]:
            post_vars["batch_stats"] = g_stats["post"]
        gs = modules.post.apply(post_vars, g3, train=False)
        spec = jnp.swapaxes(gs, 1, 2).astype(jnp.float32)
        return pipe.inverse_spec(spec, rng)

    return jax.jit(flagship), g_params, g_stats


def cast_weights_bf16(g_params):
    """bf16 parameter cast for serving, GRU subtree pinned fp32."""

    def walk(node, pinned):
        if isinstance(node, dict):
            return {
                k: walk(v, pinned or k == "sentence_encoder")
                for k, v in node.items()
            }
        if pinned or node.dtype != jnp.float32:
            return node
        return node.astype(jnp.bfloat16)

    return walk(g_params, False)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=48)
    p.add_argument("--frames", type=int, default=75)
    p.add_argument("--fp32", action="store_true")
    args = p.parse_args()
    bf16 = not args.fp32

    rng = np.random.default_rng(0)
    video = jnp.asarray(
        rng.standard_normal((args.batch, args.frames, 112, 112, 1)), jnp.float32
    )
    vid_len = jnp.full((args.batch,), args.frames, jnp.int32)
    key = jax.random.PRNGKey(1)
    mel_per_batch = args.batch * 4 * args.frames

    fn0, p0, s0 = build(fold=False, bf16=bf16)
    wav0 = np.asarray(fn0(p0, s0, video, vid_len, key))
    t0 = _timed(fn0, (p0, s0, video, vid_len, key))

    fn1, p1, s1 = build(fold=True, bf16=bf16)
    wav1 = np.asarray(fn1(p1, s1, video, vid_len, key))
    t1 = _timed(fn1, (p1, s1, video, vid_len, key))

    p2 = cast_weights_bf16(p1)
    wav2 = np.asarray(fn1(p2, s1, video, vid_len, key))
    t2 = _timed(fn1, (p2, s1, video, vid_len, key))

    fn3, p3, s3 = build(fold=True, bf16=bf16, fused=True)
    wav3 = np.asarray(fn3(p3, s3, video, vid_len, key))
    t3 = _timed(fn3, (p3, s3, video, vid_len, key))

    def rel(w):
        return float(np.linalg.norm(w - wav0) / (np.linalg.norm(wav0) + 1e-9))

    tag = "bf16" if bf16 else "fp32"
    for name, t, w in (
        ("base      ", t0, wav0),
        ("fold      ", t1, wav1),
        ("fold+w16  ", t2, wav2),
        ("fold+fused", t3, wav3),
    ):
        print(
            f"{tag} b{args.batch}x{args.frames}f {name}: {t * 1e3:7.1f} ms  "
            f"{mel_per_batch / t:9.0f} mel-frames/s  "
            f"wav rel-delta vs base {rel(w):.3e}"
        )


if __name__ == "__main__":
    main()
