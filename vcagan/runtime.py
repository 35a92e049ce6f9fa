"""Process-level runtime setup helpers."""

from __future__ import annotations

import os


def enable_compilation_cache(cache_dir: str | None = None) -> None:
    """Enable JAX's persistent compilation cache.

    XLA compiles of the full GAN step take minutes (especially via remote-
    compile TPU backends); the persistent cache makes every process after
    the first start in seconds.  Safe to call multiple times.
    """
    import jax

    cache_dir = cache_dir or os.environ.get(
        "VCAGAN_JAX_CACHE",
        os.path.join(os.path.expanduser("~"), ".cache", "vcagan_jax"),
    )
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
