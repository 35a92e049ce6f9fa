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
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
jax.config.update("jax_default_matmul_precision", "highest")

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
