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

    DIFFERENTIAL method: time a short run (N1 steps + one forced fetch)
    and a long run (N2 steps + one forced fetch) and divide the
    difference by N2 - N1 — the tunnel round trip appears exactly once in
    each and cancels. A subtract-one-measured-RTT scheme left +-2 ms of
    noise per step at small step times (the RTT varies 30-80 ms between
    samples); the differential reduces that by ~N2/sqrt(2).

    The long run is sized so the measured device time dominates the RTT
    noise (at least ~1 s of work or 4x ``steps``, whichever is larger).
    """
    out = fn(*args)
    for _ in range(max(warmup - 1, 0)):
        out = fn(*args)
    force_completion(out)

    def run(n):
        t0 = time.perf_counter()
        for _ in range(n):
            out = fn(*args)
        force_completion(out)
        return time.perf_counter() - t0

    n1 = max(steps // 4, 1)
    t1 = run(n1)
    rough = t1 / n1  # includes one RTT spread over n1 — an overestimate
    # size the long run: >= steps, and ~1 s of device work, capped at 400
    n2 = int(max(steps, min(1.0 / max(rough, 1e-5), 400)))
    if n2 <= n1:
        n2 = n1 + max(n1, 1)
    t2 = run(n2)
    return max(t2 - t1, 1e-9) / (n2 - n1)


def scanned_step_time(forward: Callable, args: Tuple[Any, ...],
                      steps: int = 400, perturb_index: int = -1) -> float:
    """Per-step device time with ``steps`` executions chained inside ONE
    dispatch (``lax.scan``), for workloads too fast for dispatch loops.

    On the tunneled backend each dispatch costs ~1-3 ms of host RPC, so a
    dispatch-per-step loop is HOST-bound below ~3 ms/step and measures
    nothing. Here the scan body's perturbed input depends on the carry
    (``x + c * 1e-30`` — numerically a no-op, but not foldable), so XLA
    cannot hoist the loop body; differential timing over two scan lengths
    cancels the single round trip.
    """
    import jax
    import jax.numpy as jnp
    from jax import lax

    args = tuple(args)
    if perturb_index < 0:
        perturb_index = next(
            i for i, a in enumerate(args) if hasattr(a, "dtype"))

    def make(n):
        def body(c, _):
            a = list(args)
            x = a[perturb_index]
            a[perturb_index] = (x + (c * 1e-30).astype(x.dtype)).astype(x.dtype)
            out = forward(*a)
            leaf = [l for l in jax.tree_util.tree_leaves(out)
                    if hasattr(l, "dtype")][0]
            # anchor on a FULL reduction: a single-element anchor lets XLA
            # narrow/DCE the rest of the output (measured: a b1 forward
            # "ran" in 0.131 ms — 120 TF/s at batch 1, impossible)
            return jnp.sum(leaf.astype(jnp.float32)), ()

        @jax.jit
        def many(c0):
            return lax.scan(body, c0, None, length=n)[0]

        return many

    n1 = max(steps // 4, 1)
    short, long_ = make(n1), make(steps)
    c0 = jnp.zeros((), jnp.float32)
    force_completion(short(c0))   # compile + warm
    force_completion(long_(c0))
    t0 = time.perf_counter()
    force_completion(short(c0))
    t1 = time.perf_counter() - t0
    t0 = time.perf_counter()
    force_completion(long_(c0))
    t2 = time.perf_counter() - t0
    return max(t2 - t1, 1e-9) / (steps - n1)


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
