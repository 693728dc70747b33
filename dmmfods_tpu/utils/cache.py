"""Persistent XLA compilation cache.

Full-model compiles cost minutes (especially on the single-core host that
compiles for the TPU over the tunnel); the persistent cache makes repeat
invocations of bench/CLI/entry near-instant. Safe to call multiple times.
"""

from __future__ import annotations

import os


def enable_persistent_cache(path: str | None = None) -> None:
    import jax

    path = path or os.environ.get("DMMFODS_JAX_CACHE", "/tmp/dmmfods_jax_cache")
    os.makedirs(path, exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:
        pass  # older jax without these flags
