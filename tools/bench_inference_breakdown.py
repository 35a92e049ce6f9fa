"""Decompose flagship inference time: model half vs Griffin-Lim half.

bench.py measures the composed path (visual front -> generator -> postnet
-> 60-iteration Griffin-Lim).  To aim the next optimization, this tool
times the two halves as SEPARATE jitted programs at the bench shape
(batch 32 x 75 frames), each with several launches in flight and a single
scalar-readback sync (per CLAUDE.md, block_until_ready is unreliable
through the tunnel).  The halves don't add up exactly to the composed
time (XLA fuses across the boundary in the composed program), but the
ratio says where the milliseconds are.

Measured 2026-08-18 (v5e, fp32, b32x75f): model half 96.3 ms — of which
the visual front alone is 62.1 ms (~55% of the composed step) and
generator+postnet ~34 ms; Griffin-Lim (60 iters) 32.4 ms.  The visual
front (per-frame ResNet18 over B*T=2400 frames) is where inference
optimization effort should aim next.

Usage: python tools/bench_inference_breakdown.py [--batch 32] [--frames 75]
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
    for i in range(n_inflight):
        sums.append(jnp.sum(jnp.abs(fn(*args))))
    _ = [float(s) for s in sums]
    return (time.perf_counter() - t0) / n_inflight


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=32)
    p.add_argument("--frames", type=int, default=75)
    args = p.parse_args()

    from vcagan.configs import AudioConfig
    from vcagan.dsp import MelPipeline
    from vcagan.train import VCAGANModules

    modules = VCAGANModules.create()
    params, batch_stats = modules.init_all(
        jax.random.PRNGKey(0), batch_size=2, video_frames=20, image_size=48
    )
    g_params = {k: params[k] for k in ("v_front", "gen", "post")}
    g_stats = {k: batch_stats[k] for k in ("v_front", "gen", "post")}
    pipe = MelPipeline(AudioConfig())

    B, F = args.batch, args.frames
    rng = np.random.default_rng(0)
    video = jnp.asarray(rng.standard_normal((B, F, 112, 112, 1)), jnp.float32)
    vid_len = jnp.full((B,), F, jnp.int32)
    key = jax.random.PRNGKey(1)

    @jax.jit
    def model_half(g_params, g_stats, video, vid_len, rng):
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
        return jnp.swapaxes(gs, 1, 2)  # (B, T, 321)

    @jax.jit
    def vf_only(g_params, g_stats, video):
        phon, sent = modules.v_front.apply(
            {"params": g_params["v_front"], "batch_stats": g_stats["v_front"]},
            video, train=False,
        )
        return jnp.sum(jnp.abs(phon)) + jnp.sum(jnp.abs(sent))

    @jax.jit
    def gl_half(spec, rng):
        return pipe.inverse_spec(spec, rng)

    spec = jnp.asarray(
        np.abs(rng.standard_normal((B, 4 * F, 321))).astype(np.float32)
    )

    t_model = _timed(model_half, (g_params, g_stats, video, vid_len, key))
    t_vf = _timed(vf_only, (g_params, g_stats, video))
    t_gl = _timed(gl_half, (spec, key))
    print(f"model half (v_front+gen+post): {t_model * 1e3:8.1f} ms")
    print(f"  of which visual front:       {t_vf * 1e3:8.1f} ms")
    print(f"griffin-lim half (60 iters):   {t_gl * 1e3:8.1f} ms")
    print(f"sum: {(t_model + t_gl) * 1e3:.1f} ms "
          f"(composed bench.py time ~ {B * 4 * F:d} mel-frames/batch)")


if __name__ == "__main__":
    main()
