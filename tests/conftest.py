"""Test configuration: force an 8-virtual-device CPU backend.

All tests run on CPU with 8 virtual XLA devices so data-parallel sharding is
exercised without TPU hardware (the idiomatic JAX analog of multi-node
testing without a cluster).

Note: the environment's sitecustomize imports jax at interpreter startup and
pins JAX_PLATFORMS, so env vars are too late here — the backend is switched
through jax.config before first device use instead.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"  # for any subprocesses tests spawn
# CANONICALIZE the persistent-cache key inputs (CLAUDE.md key traps): the
# literal XLA_FLAGS string is hashed into every cache key, and
# dryrun_multichip (which runs INSIDE the suite) scrubs the
# force-device-count flag from os.environ mid-run — if conftest set it,
# tests compiling after the dryrun would cache under different names than
# tests before it, making the committed data/test_cache order-dependent.
# The 8 virtual devices come from jax.config below instead; only
# JAX_PLATFORMS rides the env for subprocesses (which set their own
# device counts).
flags = " ".join(
    tok
    for tok in os.environ.get("XLA_FLAGS", "").split()
    if "xla_force_host_platform_device_count" not in tok
)
if flags:
    os.environ["XLA_FLAGS"] = flags
else:
    os.environ.pop("XLA_FLAGS", None)

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
jax.config.update("jax_default_matmul_precision", "highest")
# Second key trap: with the persistent cache on, jax embeds the CACHE DIR
# PATH itself into the key via the autotune side-cache option — and the
# dryrun flips this config globally mid-suite.  Pin it off up front so
# every compile in any order (and any solo test run) keys identically.
try:
    jax.config.update("jax_persistent_cache_enable_xla_caches", "none")
except Exception:
    pass

# Persistent compilation cache: repeated suite runs skip XLA compiles.
_CACHE_DIR = os.path.join(os.path.dirname(__file__), "..", ".jax_cache")
jax.config.update("jax_compilation_cache_dir", os.path.abspath(_CACHE_DIR))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

# Seed the cache from the committed data/test_cache/ so COLD checkouts skip
# the suite's multi-minute train-step compiles too (same trick as the
# multichip dryrun's data/dryrun_cache).  Keys are reproducible on the CI
# image: conftest pins XLA_FLAGS to a deterministic string (hashed into
# every key) and the cache-dir path (embedded in the key via the autotune
# side-cache option) is the fixed in-repo .jax_cache path.  Refresh after
# changing train-step trace order: python tools/refresh_test_cache.py
_SEED_DIR = os.path.join(os.path.dirname(__file__), "..", "data", "test_cache")
if os.path.isdir(_SEED_DIR):
    import shutil

    os.makedirs(_CACHE_DIR, exist_ok=True)
    for _name in os.listdir(_SEED_DIR):
        _src = os.path.join(_SEED_DIR, _name)
        _dst = os.path.join(_CACHE_DIR, _name)
        if os.path.isfile(_src) and not os.path.exists(_dst):
            shutil.copyfile(_src, _dst)
