"""Measure Griffin-Lim matmul dtype: fp32 vs bf16 at serving shapes.

Round 1 measured fp32 == bf16 at the 640-pt transform on a SMALL batch and
pinned the production vocoder to fp32 ("free exactness").  At serving batch
sizes the GL GEMMs are (B*T, 640) x (640, 321)-class with B*T ~ 14k rows —
MXU-compute-bound, where fp32 runs multi-pass and bf16 should win.  This
tool times griffin_lim_mxu ALONE (60 iters, the production count) at the
bench shape for both compute dtypes, with the scalar-readback sync protocol
(CLAUDE.md: block_until_ready is unreliable through the tunnel; run alone,
not under a concurrent pytest).

Usage: python tools/bench_gl_dtype.py [--batch 48] [--frames 300]
"""

from __future__ import annotations

import argparse
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from vcagan.runtime import enable_compilation_cache

enable_compilation_cache()

import jax
import jax.numpy as jnp
import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=48)
    p.add_argument("--frames", type=int, default=300, help="mel/linear frames")
    p.add_argument("--iters", type=int, default=60)
    p.add_argument("--inflight", type=int, default=8)
    args = p.parse_args()

    from vcagan.configs import AudioConfig
    from vcagan.dsp.griffin_lim import griffin_lim_mxu
    from vcagan.dsp.stft import STFTParams

    c = AudioConfig()
    params = STFTParams(c.n_fft, c.hop_length, c.win_length)
    rng = np.random.default_rng(0)
    mag = jnp.asarray(
        np.abs(rng.standard_normal((args.batch, args.frames, c.n_fft // 2 + 1))),
        jnp.float32,
    )
    key = jax.random.PRNGKey(0)

    for name, dtype in (("fp32", jnp.float32), ("bf16", jnp.bfloat16)):
        fn = jax.jit(
            functools.partial(
                griffin_lim_mxu,
                params=params,
                n_iters=args.iters,
                compute_dtype=dtype,
            )
        )
        for _ in range(2):
            _ = float(jnp.sum(jnp.abs(fn(mag, key))))
        t0 = time.perf_counter()
        sums = [jnp.sum(jnp.abs(fn(mag, key))) for _ in range(args.inflight)]
        _ = [float(s) for s in sums]
        dt = (time.perf_counter() - t0) / args.inflight
        print(
            f"GL {name}  b{args.batch} x {args.frames}f x {args.iters}it: "
            f"{dt*1e3:7.1f} ms  "
            f"({args.batch * args.frames / dt:10.0f} mel-frames/s)",
            flush=True,
        )


if __name__ == "__main__":
    main()
