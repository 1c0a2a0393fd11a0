"""Persistent XLA compilation cache.

SD1.5-sized programs take minutes to compile on first run; the cache
makes every subsequent process start (CLI runs, benchmarks, the driver's
entry checks) reuse compiled executables.
"""
from __future__ import annotations

import os


def enable_compilation_cache(path: str | None = None) -> None:
    import jax

    path = path or os.path.join(
        os.path.expanduser("~"), ".cache", "fresco_tpu_xla"
    )
    os.makedirs(path, exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:
        pass  # older jax without these flags
