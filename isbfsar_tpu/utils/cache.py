"""Shared persistent-compile-cache setup for service/bench entry points."""

from __future__ import annotations

import os

DEFAULT_CACHE_DIR = "/tmp/isbfsar_jax_cache"


def enable_compile_cache(cache_dir: str = "") -> None:
    """Enable the persistent XLA compile cache (idempotent).

    First compiles of the fused programs take minutes on remote-attached
    chips; every entry point that jits production-size programs should call
    this before first use so later runs start in seconds.
    """
    import jax

    jax.config.update(
        "jax_compilation_cache_dir",
        cache_dir or os.environ.get("JAX_COMPILATION_CACHE_DIR", DEFAULT_CACHE_DIR),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
