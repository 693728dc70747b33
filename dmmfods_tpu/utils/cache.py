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


def jit_auto_out(fun, **jit_kwargs):
    """``jax.jit`` with compiler-chosen OUTPUT layouts (TPU).

    XLA's default heuristic assigns the jit boundary's output a "preferred"
    host-oriented layout and inserts a full-size retile copy at the root to
    honor it — measured 1.7 ms on the 1280x1920 b1 forward (a
    ``{2,1,3,0}`` root copy + reshape of the logits, BASELINE.md r4).
    ``Format(Layout.AUTO)`` lets the compiler keep the producer's layout;
    host fetches (``np.asarray``) work with any layout, so serving/bench
    forwards should always use this. Falls back to plain ``jit`` when the
    layout API is unavailable.
    """
    import jax

    try:
        from jax.experimental.layout import Format, Layout

        return jax.jit(fun, out_shardings=Format(Layout.AUTO), **jit_kwargs)
    except Exception:
        return jax.jit(fun, **jit_kwargs)
