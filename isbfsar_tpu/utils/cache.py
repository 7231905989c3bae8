"""Shared persistent caches: XLA compile cache + trained-params cache.

Two caches with the same goal (pay a long one-time cost once per machine,
not once per run):

- :func:`enable_compile_cache` — persistent XLA executable cache.
- :func:`cached_params` — train-once parameter cache for synthetic-
  supervision fixtures (train/gazefocus.py, train/posestack.py): training a
  CI-budget net takes minutes; its trained params are a pure function of the
  trainer config, so serialize them keyed on that config and re-train only
  when the config (or a version tag bumped on trainer-code changes) moves.
"""

from __future__ import annotations

import hashlib
import os
from typing import Any, Callable

DEFAULT_CACHE_DIR = "/tmp/isbfsar_jax_cache"
DEFAULT_PARAMS_CACHE_DIR = "/tmp/isbfsar_params_cache"

# Read-only pretrained bundle shipped inside the package (the analog of the
# reference's downloadable weight files, README.md:31-38 — here the weights
# are synthetic-supervision fits, versioned by the same key discipline as
# the writable cache). `ISBFSAR_PRETRAINED_DIR` overrides for tests.
BUNDLED_PRETRAINED_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "assets", "pretrained",
)


def params_cache_digest(key: str, version: str) -> str:
    """The on-disk name for a (key, version) trained-params entry."""
    return hashlib.sha256(f"v{version}:{key}".encode()).hexdigest()[:24]


def pretrained_bundle_dir() -> str:
    """The SINGLE resolution point for the read-only pretrained bundle —
    both the cache lookup here and :mod:`isbfsar_tpu.pretrained`'s API use
    it, so an env override (`ISBFSAR_PRETRAINED_DIR`, used by tests) can
    never redirect one consumer and not the other."""
    return os.environ.get("ISBFSAR_PRETRAINED_DIR", BUNDLED_PRETRAINED_DIR)


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


def cached_params(key: str, builder: Callable[[], Any], version: str = "1",
                  cache_dir: str = "") -> Any:
    """Return ``builder()``'s params pytree, cached on disk keyed by ``key``.

    ``key`` must capture everything the trained result depends on (trainer
    config repr + budgets + seeds); bump ``version`` when trainer CODE
    changes invalidate old fits. Cache dir: ``ISBFSAR_PARAMS_CACHE`` env var
    or /tmp/isbfsar_params_cache. Corrupt/unreadable entries fall back to a
    fresh ``builder()`` run (and overwrite the entry).

    Lookup order: the read-only PRETRAINED BUNDLE shipped in the package
    (``assets/pretrained/`` — see :mod:`isbfsar_tpu.pretrained`), then the
    writable cache, then train + write. A bundle entry whose key/version no
    longer matches the caller's simply has a different digest and is
    ignored — stale shipped weights can never shadow a retrain.

    Restored trees are plain dicts of numpy arrays — the same shape the
    trainers return, so ``Model(params=...)`` consumers are unaffected.
    """
    import jax
    import numpy as np
    from flax import serialization

    cache_dir = cache_dir or os.environ.get(
        "ISBFSAR_PARAMS_CACHE", DEFAULT_PARAMS_CACHE_DIR
    )
    bundle_dir = pretrained_bundle_dir()
    digest = params_cache_digest(key, version)
    path = os.path.join(cache_dir, f"{digest}.msgpack")
    for candidate in (os.path.join(bundle_dir, f"{digest}.msgpack"), path):
        if os.path.exists(candidate):
            try:
                with open(candidate, "rb") as f:
                    return serialization.msgpack_restore(f.read())
            except Exception:
                pass  # corrupt entry: try the next tier / retrain

    params = jax.tree.map(np.asarray, builder())
    os.makedirs(cache_dir, exist_ok=True)
    tmp = f"{path}.tmp.{os.getpid()}"
    with open(tmp, "wb") as f:
        f.write(serialization.msgpack_serialize(params))
    os.replace(tmp, path)  # atomic: concurrent runs never see partial files
    return params
