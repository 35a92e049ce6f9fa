"""On-chip probe of the fused ResNet block kernel at trunk shapes.

Checks Mosaic lowering + numerics (vs the XLA oracle) and prints rough
whole-graph timings at each stride-1 block shape of the serving path
(b48 x 75f -> N = 3600 frame-images).  Not a headline bench — that's
tools/bench_fold.py fold+fused — this is the fast iterate-on-lowering
loop (CLAUDE.md: probe Pallas kernels on the real chip with batch > 1
and non-aligned shapes).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from vcagan.runtime import enable_compilation_cache

enable_compilation_cache()

import jax
import jax.numpy as jnp
import numpy as np

from vcagan.kernels.fused_block import (
    _fused_block_pallas,
    _tile_images,
    fused_block_xla,
)

SHAPES = [  # (N, H, W, C) for the trunk's stride-1 blocks at b48x75f
    (3600, 28, 28, 64),
    (3600, 14, 14, 128),
    (3600, 7, 7, 256),
    (3600, 4, 4, 512),
    (1234, 7, 7, 256),  # non-aligned N: exercises the pad path
]


def main():
    dtype = jnp.bfloat16 if "--fp32" not in sys.argv else jnp.float32
    for n, h, w, c in SHAPES:
        print(f"({n},{h},{w},{c}): building...", flush=True)
        r = np.random.default_rng(0)
        x = jnp.asarray(r.standard_normal((n, h, w, c)), dtype)
        w1 = jnp.asarray(r.standard_normal((3, 3, c, c)) * 0.05, jnp.float32)
        w2 = jnp.asarray(r.standard_normal((3, 3, c, c)) * 0.05, jnp.float32)
        b1, b2 = (jnp.asarray(r.standard_normal(c) * 0.1, jnp.float32) for _ in "ab")
        a1, a2 = (jnp.full((c,), 0.25, jnp.float32) for _ in "ab")
        args = (x, w1, b1, a1, w2, b2, a2)
        nb = _tile_images(n, h, c, dtype)

        try:
            t_c = time.perf_counter()
            out = _fused_block_pallas(*args, nb=nb)
            _ = float(jnp.sum(jnp.abs(out).astype(jnp.float32)))
            print(f"  pallas compile+run {time.perf_counter() - t_c:.1f}s",
                  flush=True)
        except Exception as e:
            print(f"({n},{h},{w},{c}) nb={nb}: LOWERING FAILED: {type(e).__name__}: "
                  f"{str(e)[:300]}")
            continue
        ref = fused_block_xla(*args)
        d = float(
            jnp.max(jnp.abs(out.astype(jnp.float32) - ref.astype(jnp.float32)))
        )

        f_p = jax.jit(lambda *a: _fused_block_pallas(*a, nb=nb))
        f_x = jax.jit(fused_block_xla)
        for name, f in (("pallas", f_p), ("xla", f_x)):
            _ = float(jnp.sum(jnp.abs(f(*args))))  # warm
            t0 = time.perf_counter()
            s = [jnp.sum(jnp.abs(f(*args))) for _ in range(8)]
            _ = [float(v) for v in s]
            dt = (time.perf_counter() - t0) / 8
            print(f"({n},{h},{w},{c}) nb={nb} {name}: {dt*1e3:7.2f} ms"
                  + (f"  max|delta|={d:.2e}" if name == "pallas" else ""))


if __name__ == "__main__":
    main()
