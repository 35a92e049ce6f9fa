"""Training-step throughput on the attached TPU chip.

Measures the full adversarial step (both phases, R1 second-order penalty,
both optimizer updates) at the GRID training shape: batch x 40-frame
112^2 windows, 160 mel frames.  Reports steps/sec and clips/sec with a few
steps in flight (scalar readback as the sync point — see CLAUDE.md).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

import argparse
_p = argparse.ArgumentParser()
_p.add_argument("--batch", type=int, default=16)
_p.add_argument("--window", type=int, default=40)
_p.add_argument("--bf16", action="store_true")
_p.add_argument("--remat", type=str, default="none",
                help="selective remat sites: none | vfront | stem | r1, comma-separable")
_p.add_argument("--d_phase", type=str, default="ref",
                help="D-phase structure: ref | batched (see make_train_step)")
_p.add_argument("--compiler_opts", type=str, default="",
                help="'none' = raw compiler defaults (no options), "
                     "'' = the shipped make_train_step defaults, or a "
                     "comma list of k=v PJRT compiler options, e.g. "
                     "xla_tpu_scoped_vmem_limit_kib=65536 (client-side "
                     "XLA_FLAGS cannot steer the server-side TPU compiler "
                     "behind the tunnel; compiler_options can)")
_args, _ = _p.parse_known_args()
BATCH = _args.batch
WINDOW = _args.window


def main():
    from vcagan.runtime import enable_compilation_cache

    enable_compilation_cache()

    from vcagan.train import make_train_step

    from _fixtures import train_fixture

    modules, cfg, g_tx, d_tx, state, batch = train_fixture(
        BATCH, WINDOW, _args.bf16
    )
    if _args.compiler_opts == "none":
        copts = None
    elif _args.compiler_opts:
        copts = dict(kv.split("=", 1) for kv in _args.compiler_opts.split(","))
    else:
        copts = "auto"
    step_fn = make_train_step(modules, g_tx, d_tx, cfg, donate=True,
                              remat=_args.remat, compiler_options=copts,
                              d_phase=_args.d_phase)

    # compile + warmup
    t0 = time.perf_counter()
    state, metrics = step_fn(state, batch, jax.random.PRNGKey(0))
    _ = float(metrics["gen_loss"])
    print(f"compile+first step: {time.perf_counter() - t0:.1f}s")
    state, metrics = step_fn(state, batch, jax.random.PRNGKey(1))
    _ = float(metrics["gen_loss"])

    n = 8
    t0 = time.perf_counter()
    vals = []
    for i in range(n):
        state, metrics = step_fn(state, batch, jax.random.PRNGKey(i))
        vals.append(metrics["gen_loss"])
    _ = [float(v) for v in vals]
    dt = (time.perf_counter() - t0) / n
    print(
        f"train step: {dt*1000:.1f} ms -> {1/dt:.2f} steps/s, "
        f"{BATCH/dt:.1f} clips/s (batch {BATCH} x {WINDOW} frames)"
    )


if __name__ == "__main__":
    main()
