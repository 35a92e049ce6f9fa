"""(Re)generate the multi-chip dryrun golden + seeded compile cache.

Run this whenever the train step's lowered HLO changes (the dryrun gate
will tell you: it falls back to the slow live comparison and warns).

    JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        python tools/make_multichip_golden.py

Must run under the SAME environment the driver uses for the dryrun
(virtual-CPU devices via XLA_FLAGS) so the persistent-cache key of the
seeded executable matches the gate's compile.

Does the expensive work offline: one replicated CPU compile (the golden's
source of truth), one sharded CPU compile (validated against the golden
on the spot, then committed to ``data/dryrun_cache/`` so the driver-side
compile is a cache load).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_DEVICES = int(os.environ.get("VCAGAN_DRYRUN_DEVICES", "8"))


def main() -> None:
    import jax

    # sitecustomize pins the axon TPU backend at interpreter start; env
    # vars alone don't switch it (CLAUDE.md) — use config updates before
    # first device use, exactly like dryrun_multichip does.
    try:
        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_num_cpu_devices", N_DEVICES)
    except Exception:
        pass

    if len(jax.devices()) < N_DEVICES:
        raise SystemExit(
            f"need {N_DEVICES} devices (got {len(jax.devices())}); run with "
            "JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count="
            f"{N_DEVICES}"
        )

    from vcagan.runtime import enable_compilation_cache

    # A fresh cache dir (overridable) so the sharded executable is
    # guaranteed to be a NEW entry we can capture for data/dryrun_cache —
    # against a warm user cache the compile hits and nothing is seeded.
    enable_compilation_cache(
        os.environ.get("VCAGAN_JAX_CACHE", "/tmp/vcagan_golden_cache")
    )
    # Keep compile options cache-dir-independent (same setting as the
    # gate, __graft_entry__.dryrun_multichip) so the seeded executable
    # hits under ANY driver cache dir.
    try:
        jax.config.update("jax_persistent_cache_enable_xla_caches", "none")
    except Exception:
        pass
    cache_dir = jax.config.jax_compilation_cache_dir
    os.makedirs(cache_dir, exist_ok=True)

    from vcagan.parallel import dryrun, state_shardings

    problem = dryrun.build_problem(N_DEVICES)
    t0 = time.time()
    lowered, sh_state, sh_batch, mesh = dryrun.lower_sharded_step(problem)
    h = dryrun.canonical_hash(lowered)
    print(f"[golden] sharded step lowered+hashed in {time.time() - t0:.1f}s: {h}")

    t0 = time.time()
    ref_metrics, ref_stats = dryrun.run_replicated_reference(problem)
    print(f"[golden] replicated reference ran in {time.time() - t0:.1f}s")

    before = set(os.listdir(cache_dir)) if cache_dir else set()
    t0 = time.time()
    with mesh:
        compiled = lowered.compile()
        new_state, metrics = compiled(sh_state, sh_batch, problem["key"])
        jax.block_until_ready(metrics)
    print(f"[golden] sharded step compiled+ran in {time.time() - t0:.1f}s")

    golden = {
        "hash": h,
        "n_devices": N_DEVICES,
        "model_parallel": problem["model_parallel"],
        "lr": float(problem["cfg"].lr),
        "metrics": ref_metrics,
        "g_param_mean_abs": ref_stats,
    }
    md, sd = dryrun.compare_to_golden(
        {k: float(v) for k, v in metrics.items()},
        dryrun.g_param_leaf_stats(new_state.g_params),
        golden,
    )
    _ = state_shardings(new_state, mesh)
    print(f"[golden] equivalence verified: metric rel {md:.2e}, leaf stat {sd:.2e}")

    dryrun.save_golden(golden)
    print(f"[golden] wrote {dryrun.GOLDEN_PATH}")

    if cache_dir:
        import shutil

        os.makedirs(dryrun.SEED_CACHE_DIR, exist_ok=True)
        for name in os.listdir(dryrun.SEED_CACHE_DIR):
            os.remove(os.path.join(dryrun.SEED_CACHE_DIR, name))
        copied = []
        for name in sorted(set(os.listdir(cache_dir)) - before):
            if "train_step" in name:
                shutil.copyfile(
                    os.path.join(cache_dir, name),
                    os.path.join(dryrun.SEED_CACHE_DIR, name),
                )
                copied.append(name)
        print(f"[golden] seeded {dryrun.SEED_CACHE_DIR} with {copied}")


if __name__ == "__main__":
    main()
