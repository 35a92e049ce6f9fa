"""Measure tensor-parallel (model-axis) cost/benefit on a virtual CPU mesh.

Round-1's dryrun tail was full of "[SPMD] Involuntary full
rematerialization" warnings caused by sharding the GRU's fused (in, 3H)
projections across the per-gate split.  The model axis is now restricted
to the attention denses (vcagan/parallel/mesh.py); this tool records the
step-time comparison that justifies dp-only as the default layout.

Run:  JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=4 \
      python tools/bench_tp.py

4 virtual devices, not 8: XLA:CPU runs each virtual device's collectives
on host threads, and on a small host an 8-device in-process AllReduce
rendezvous can trip XLA's stuck-thread CHECK mid-step.  dp4 vs dp2xtp2
answers the same question (does the model axis pay for itself?) at half
the thread pressure.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax  # noqa: E402

if os.environ.get("JAX_PLATFORMS", "").startswith("cpu") or (
    "xla_force_host_platform_device_count" in os.environ.get("XLA_FLAGS", "")
):
    try:
        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_num_cpu_devices", 4)
    except Exception:
        pass

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402


def measure(model_parallel: int, steps: int = 5) -> float:
    from vcagan.runtime import enable_compilation_cache

    enable_compilation_cache()
    from vcagan.configs import TrainConfig
    from vcagan.parallel import make_mesh, shard_batch, shard_state
    from vcagan.train import Batch, VCAGANModules, create_train_state, make_train_step
    from vcagan.train.state import make_optimizer

    devices = jax.devices()[:4]
    mesh = make_mesh(model_parallel=model_parallel, devices=devices)

    modules = VCAGANModules.create()
    cfg = TrainConfig()
    mk = lambda: make_optimizer(  # noqa: E731
        cfg.lr, cfg.weight_decay, cfg.amsgrad, cfg.lr_milestones, cfg.lr_gamma, 10
    )
    state, _, _ = create_train_state(jax.random.PRNGKey(0), modules, cfg, 10)

    frames, image, b = 20, 48, 4
    rng = np.random.default_rng(0)
    batch = Batch(
        video=jnp.asarray(
            rng.standard_normal((b, frames, image, image, 1)), jnp.float32
        ),
        mel=jnp.asarray(
            np.clip(rng.standard_normal((b, 80, 4 * frames)), -1, 1), jnp.float32
        ),
        spec=jnp.asarray(
            np.abs(rng.standard_normal((b, 321, 4 * frames))), jnp.float32
        ),
        vid_len=jnp.full((b,), frames, jnp.int32),
        mel_len=jnp.full((b,), 4 * frames, jnp.int32),
    )
    with mesh:
        state = shard_state(state, mesh)
        sbatch = shard_batch(batch, mesh)
        step = make_train_step(modules, mk(), mk(), cfg, donate=False, mesh=mesh)
        state, m = step(state, sbatch, jax.random.PRNGKey(1))  # compile
        jax.block_until_ready(m)
        t0 = time.perf_counter()
        for i in range(steps):
            state, m = step(state, sbatch, jax.random.PRNGKey(2 + i))
        jax.block_until_ready(m)
    return (time.perf_counter() - t0) / steps


def main():
    t_dp = measure(1)
    t_tp = measure(2)
    print(
        json.dumps(
            {
                "metric": "train_step_seconds_cpu_mesh",
                "dp4": round(t_dp, 4),
                "dp2_tp2": round(t_tp, 4),
                "tp2_overhead_x": round(t_tp / t_dp, 3),
                "default": "dp-only (model axis reserved for larger model families)",
            }
        )
    )


if __name__ == "__main__":
    main()
