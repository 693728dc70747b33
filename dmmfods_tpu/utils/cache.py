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
    """``jax.jit`` with compiler-chosen OUTPUT layouts — OPT-IN only.

    History: XLA's default boundary heuristic inserts a full-size root
    retile copy (measured 1.7 ms on the 1280x1920 b1 forward, BASELINE.md
    r4), which ``Format(Layout.AUTO)`` removed — so r4 wired AUTO into the
    serving/bench forwards by default. The r5 environment's device-server
    build REGRESSED that: any AUTO-layout executable HANGS at execution
    (reproduced on a trivial 512x512 matmul; the dispatch never completes
    and the session wedges), and a hang cannot be caught in-process. AUTO
    is therefore opt-in via ``DMMFODS_AUTO_OUT=1`` for environments where
    it works; the default is plain ``jit`` everywhere.
    """
    import jax

    if os.environ.get("DMMFODS_AUTO_OUT", "") != "1":
        return jax.jit(fun, **jit_kwargs)
    if jax.default_backend() != "tpu":
        return jax.jit(fun, **jit_kwargs)
    try:
        from jax.experimental.layout import Format, Layout

        return jax.jit(fun, out_shardings=Format(Layout.AUTO), **jit_kwargs)
    except Exception:
        return jax.jit(fun, **jit_kwargs)
