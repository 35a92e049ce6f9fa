"""Benchmark: flagship inference throughput on one TPU chip.

Path measured (the BASELINE.json north-star config): batch of 75-frame GRID
clips -> visual front -> generator (3-scale mel, Pallas attention) ->
postnet -> 60-iteration Griffin-Lim vocoding -> waveform.  Reported as
mel-frames/sec/chip.

Baseline: the PyTorch reference running the same path on CPU
(tools/measure_torch_baseline.py, measured on this machine: batch=4,
75 frames, torch.stft-based Griffin-Lim — conservative in the reference's
favor): 151.9 mel-frames/sec.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

TORCH_CPU_BASELINE = 151.9  # mel-frames/sec; tools/measure_torch_baseline.py

BATCH = 48  # v5e throughput sweet spot for the bf16 serving config
# (tools/bench_infer_sweep.py, 2026-08-18: fp32 b16/32/48/64 = 80.6/84.4/
# 86.9/84.2k; bf16 b32/48/64 = 95.6/98.8/95.3k mel-frames/s, b96 OOMs in
# the fp32 stem activation).
BF16 = True  # bf16 serving mode: conv/matmul compute in bfloat16, params
# and the Griffin-Lim vocoder stay fp32 (quality pinned by
# tests/test_bf16_and_lrs_train.py::test_bf16_serving_composed_path_quality)
FRAMES = 75
MEL_FRAMES = 4 * FRAMES


def build():
    from vcagan.runtime import enable_compilation_cache

    enable_compilation_cache()
    from vcagan.configs import AudioConfig, ModelConfig
    from vcagan.dsp import MelPipeline
    from vcagan.train import VCAGANModules

    modules = VCAGANModules.create(ModelConfig(use_bfloat16=BF16))
    params, batch_stats = modules.init_all(
        jax.random.PRNGKey(0), batch_size=2, video_frames=20, image_size=48
    )
    g_params = {k: params[k] for k in ("v_front", "gen", "post")}
    g_stats = {k: batch_stats[k] for k in ("v_front", "gen", "post")}
    pipe = MelPipeline(AudioConfig())

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
        # raw postnet output, unclamped, like the reference test path
        # (test.py:143) and vcagan.cli.test; Griffin-Lim stays fp32 (the
        # 640-pt windowed-DFT matmuls cost the same in fp32 — CLAUDE.md)
        spec = jnp.swapaxes(gs, 1, 2).astype(jnp.float32)  # (B, T, 321)
        wav = pipe.inverse_spec(spec, rng)
        return wav

    return jax.jit(flagship), g_params, g_stats


def main():
    from vcagan.runtime import enable_compilation_cache

    enable_compilation_cache()
    fn, g_params, g_stats = build()
    rng = np.random.default_rng(0)
    video = jnp.asarray(
        rng.standard_normal((BATCH, FRAMES, 112, 112, 1)), jnp.float32
    )
    vid_len = jnp.full((BATCH,), FRAMES, jnp.int32)
    key = jax.random.PRNGKey(1)

    # Warmup / compile.  NOTE: a scalar readback (float(...)) is the sync
    # point — on tunneled TPU backends block_until_ready can return before
    # execution finishes, giving dispatch-only (bogus) timings.
    for i in range(2):
        out = fn(g_params, g_stats, video, vid_len, key)
        _ = float(jnp.sum(jnp.abs(out)))

    # Serving throughput: N batches in flight, one sync at the end, so the
    # host<->device round-trip amortizes like a real inference queue.
    n_inflight = 8
    t0 = time.perf_counter()
    sums = []
    for i in range(n_inflight):
        out = fn(g_params, g_stats, video, vid_len, jax.random.PRNGKey(i))
        sums.append(jnp.sum(jnp.abs(out)))  # stays on device
    _ = [float(s) for s in sums]  # single sync point
    elapsed = time.perf_counter() - t0
    mel_fps = n_inflight * BATCH * MEL_FRAMES / elapsed
    print(
        json.dumps(
            {
                "metric": "mel_frames_per_sec_per_chip",
                "value": round(mel_fps, 1),
                "unit": "mel-frames/s",
                "vs_baseline": round(mel_fps / TORCH_CPU_BASELINE, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
