"""Execution-completion forcing + sustained step timing that is valid on
tunneled device backends.

Why this exists: on the remote-tunnel TPU backend this framework is
benchmarked against (platform 'axon'), ``jax.block_until_ready`` does NOT
wait for device execution — a dispatched 70 ms matmul chain "blocks" in
0.0 ms (measured, see ``tools/micro_chain.py`` history). Timing loops
that dispatch N steps and block once therefore measure host dispatch
cost, not device time, whenever dispatch is cheaper than the step.

The valid method: force a SCALAR host fetch derived from the last output.
The device executes its queue in order, so the fetch completes only after
every queued step has run. The fetch costs one tunnel round trip
(~30-80 ms), measured separately and subtracted.

Calibration on the v5e chip: a dependency-chained 4096^3 bf16 matmul
reads 191 TF/s with this method (hardware peak ~197) and scales linearly
from 5 to 20 dispatches. ``jax.profiler`` device-event totals agree with
it on the full-model forward.
"""

from __future__ import annotations

import time
from typing import Any, Callable, Tuple

import numpy as np


def _reduce_to_scalar(out):
    import jax
    import jax.numpy as jnp

    leaves = [x for x in jax.tree_util.tree_leaves(out)
              if hasattr(x, "dtype")]
    acc = jnp.zeros((), jnp.float32)
    for leaf in leaves:
        if jnp.issubdtype(leaf.dtype, jnp.floating) or jnp.issubdtype(
                leaf.dtype, jnp.integer):
            # cheap completion anchor: one element is enough to order after
            # the producing execution; a full-tensor reduce would add its
            # own pass over HBM
            acc = acc + jnp.ravel(leaf)[0].astype(jnp.float32)
    return acc


_scalar_jit = None


def force_completion(out) -> float:
    """Block until every execution feeding ``out`` has finished on device.

    Returns the (meaningless) anchor scalar so callers can assert
    finiteness if they like. Unlike ``jax.block_until_ready`` this is
    valid on remote-tunnel backends: it round-trips one scalar through
    the host, which cannot happen before the device queue drains.
    """
    global _scalar_jit
    import jax

    if _scalar_jit is None:
        _scalar_jit = jax.jit(_reduce_to_scalar)
    return float(np.asarray(_scalar_jit(out)))


def fetch_overhead(out) -> float:
    """One-scalar round-trip cost for an already-complete output."""
    force_completion(out)
    t0 = time.perf_counter()
    force_completion(out)
    return time.perf_counter() - t0


def sustained_step_time(fn: Callable, args: Tuple[Any, ...], steps: int = 20,
                        warmup: int = 1) -> float:
    """Per-step device time of ``fn(*args)`` driven back-to-back.

    Dispatches ``steps`` executions without intermediate synchronization
    (the way a pipelined loop drives the chip), forces completion of the
    last, and subtracts the measured one-scalar fetch overhead.
    """
    out = fn(*args)
    for _ in range(max(warmup - 1, 0)):
        out = fn(*args)
    rt = fetch_overhead(out)
    t0 = time.perf_counter()
    for _ in range(steps):
        out = fn(*args)
    force_completion(out)
    return max(time.perf_counter() - t0 - rt, 1e-9) / steps


def synchronous_step_times(fn: Callable, args: Tuple[Any, ...],
                           steps: int = 10) -> list:
    """Per-call times with a forced completion each call (includes the
    tunnel round trip — reported for latency context, not throughput)."""
    out = fn(*args)
    force_completion(out)
    times = []
    for _ in range(steps):
        t0 = time.perf_counter()
        force_completion(fn(*args))
        times.append(time.perf_counter() - t0)
    return times
