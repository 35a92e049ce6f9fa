"""MFU / bandwidth accounting for the flagship inference path and the
train step, from XLA's own cost model.

Answers "what fraction of the chip do the headline numbers actually use?"
(the relative 558x-vs-torch-CPU figure says nothing about absolute
efficiency).  For each program:

- FLOPs and HBM bytes from ``jit(...).lower().compile().cost_analysis()``
  (XLA counts matmul flops as 2mnk regardless of precision),
- wall time with the scalar-readback sync protocol (CLAUDE.md: on the
  tunneled TPU, block_until_ready can return early; several launches in
  flight amortize the ~25 ms relay RTT),
- achieved TFLOP/s, HBM GB/s, and MFU against the v5e bf16 peak.

v5e peaks (public, jax-ml.github.io/scaling-book): 197 bf16 TFLOP/s,
819 GB/s HBM.  fp32 matmuls lower to multi-pass bf16 on the MXU, so fp32
programs cannot reach the bf16 peak — the MFU column is still computed
against 197 so numbers are comparable across dtypes; read fp32 rows with
that in mind.  The arithmetic-intensity column (flops/byte vs the ~240
flops/byte knee of the v5e) says whether a program is compute- or
bandwidth-bound.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

PEAK_BF16_FLOPS = 197e12  # v5e
PEAK_HBM_BPS = 819e9  # v5e


def _cost(compiled):
    c = compiled.cost_analysis()
    return float(c.get("flops", 0.0)), float(c.get("bytes accessed", 0.0))


def _report(name, flops, bytes_acc, seconds, batch_note):
    tflops = flops / seconds / 1e12
    gbps = bytes_acc / seconds / 1e9
    mfu = flops / seconds / PEAK_BF16_FLOPS
    hbm = bytes_acc / seconds / PEAK_HBM_BPS
    ai = flops / max(bytes_acc, 1.0)
    print(
        f"{name:28s} {seconds*1e3:8.1f} ms  {flops/1e9:9.2f} GF  "
        f"{tflops:7.2f} TF/s  MFU {mfu*100:5.2f}%  "
        f"HBM {gbps:6.1f} GB/s ({hbm*100:5.1f}%)  AI {ai:6.1f}  {batch_note}"
    )
    return dict(
        name=name, ms=seconds * 1e3, gflops=flops / 1e9, tflops=tflops,
        mfu=mfu, hbm_util=hbm, arithmetic_intensity=ai,
    )


def _time_fn(fn, args, n=8, readback=lambda out: out):
    # warmup x2 (first = compile)
    for _ in range(2):
        out = fn(*args)
        _ = float(readback(out))
    t0 = time.perf_counter()
    outs = [readback(fn(*args)) for _ in range(n)]
    _ = [float(o) for o in outs]
    return (time.perf_counter() - t0) / n


def flagship_inference(results):
    import bench

    fn, g_params, g_stats = bench.build()
    rng = np.random.default_rng(0)
    video = jnp.asarray(
        rng.standard_normal((bench.BATCH, bench.FRAMES, 112, 112, 1)), jnp.float32
    )
    vid_len = jnp.full((bench.BATCH,), bench.FRAMES, jnp.int32)
    key = jax.random.PRNGKey(1)

    compiled = fn.lower(g_params, g_stats, video, vid_len, key).compile()
    flops, bytes_acc = _cost(compiled)
    dt = _time_fn(
        fn, (g_params, g_stats, video, vid_len, key),
        readback=lambda w: jnp.sum(jnp.abs(w)),
    )
    # Griffin-Lim stays fp32 in bench.build() (MelPipeline default), so the
    # bf16 tag is qualified — the fp32 vocoder fraction matters when
    # interpreting MFU against the bf16 peak.
    dtype_tag = "bf16+glfp32" if getattr(bench, "BF16", False) else "fp32"
    results.append(
        _report(
            f"inference b{bench.BATCH}x{bench.FRAMES}f {dtype_tag}",
            flops, bytes_acc, dt,
            f"({bench.BATCH * bench.MEL_FRAMES / dt:.0f} mel-frames/s)",
        )
    )


def train_step(results, batch_size, window, bf16, remat="none"):
    from vcagan.train import make_train_step

    from _fixtures import train_fixture

    modules, cfg, g_tx, d_tx, state, batch = train_fixture(
        batch_size, window, bf16
    )
    # donate=False so the same state can be passed repeatedly for timing
    step_fn = make_train_step(modules, g_tx, d_tx, cfg, donate=False, remat=remat)

    compiled = step_fn.lower(state, batch, jax.random.PRNGKey(0)).compile()
    flops, bytes_acc = _cost(compiled)

    def fn(state, batch, key):
        _, metrics = step_fn(state, batch, key)
        return metrics["gen_loss"]

    dt = _time_fn(fn, (state, batch, jax.random.PRNGKey(0)))
    tag = ("bf16" if bf16 else "fp32") + (f"+{remat}" if remat != "none" else "")
    results.append(
        _report(
            f"train b{batch_size}x{window}f {tag}", flops, bytes_acc, dt,
            f"({batch_size / dt:.0f} clips/s)",
        )
    )


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--skip_train", action="store_true")
    p.add_argument("--skip_inference", action="store_true")
    args = p.parse_args()

    from vcagan.runtime import enable_compilation_cache

    enable_compilation_cache()
    print(f"backend: {jax.default_backend()}  (peaks assume v5e: "
          f"{PEAK_BF16_FLOPS/1e12:.0f} bf16 TF/s, {PEAK_HBM_BPS/1e9:.0f} GB/s)")

    results = []
    if not args.skip_inference:
        flagship_inference(results)
    if not args.skip_train:
        train_step(results, 16, 40, bf16=False)
        train_step(results, 32, 40, bf16=True)
        # the record config (round 5): b96 bf16 + R1 remat (+ the 64 MiB
        # scoped-vmem budget make_train_step now applies by default on TPU)
        train_step(results, 96, 40, bf16=True, remat="r1")

    import json

    print(json.dumps(results))


if __name__ == "__main__":
    main()
