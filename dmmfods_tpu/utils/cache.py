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

    # AUTO layouts are a TPU-compiler feature; on other backends (and when
    # the layout API is missing) use plain jit outright rather than risking
    # a trace/compile-time rejection at first call.
    if jax.default_backend() != "tpu":
        return jax.jit(fun, **jit_kwargs)
    try:
        from jax.experimental.layout import Format, Layout

        auto = jax.jit(fun, out_shardings=Format(Layout.AUTO), **jit_kwargs)
    except Exception:
        return jax.jit(fun, **jit_kwargs)

    # The layout API can also fail at trace/compile time (backend rejects
    # Format(Layout.AUTO)); degrade to plain jit on the FIRST call instead
    # of surfacing an opaque layout error from serving/bench forwards. A
    # genuine error in `fun` re-raises from the plain-jit retry.
    state = {"fn": None}

    def wrapped(*a, **kw):
        if state["fn"] is not None:
            return state["fn"](*a, **kw)
        try:
            out = auto(*a, **kw)
            state["fn"] = auto
            return out
        except Exception:
            fallback = jax.jit(fun, **jit_kwargs)
            out = fallback(*a, **kw)  # real errors in fun re-raise here
            state["fn"] = fallback
            return out

    # preserve the jit surface bench/serving relies on (lower/compile pass
    # through to the AUTO-layout jit)
    wrapped.lower = auto.lower
    return wrapped
