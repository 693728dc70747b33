"""Trustworthy device timing on the tunneled (axon) backend.

``jax.block_until_ready`` is a NO-OP for remote executions on this
backend (measured: a 70 ms matmul chain "completes" in 0.0 ms), so naive
sustained loops measure nothing for small probes. The valid method:
dispatch N times, then force a SCALAR host fetch derived from the last
output — the device executes its queue serially, so the fetch completes
only after all N executions. Subtract the one-scalar round trip
(~30-80 ms on this tunnel), measured separately.

Calibration: a chained 4096^3 bf16 matmul reads 191 TF/s with this
method (v5e peak ~197) and scales linearly in N.
"""

from __future__ import annotations

import time

import numpy as np


def _scalar(out):
    import jax.numpy as jnp

    leaves = out if isinstance(out, (tuple, list)) else (out,)
    return sum(jnp.sum(o.astype(jnp.float32)) for o in leaves)


def device_time(fn, args, steps=20):
    """Median-free sustained per-step device time of ``fn(*args)``.

    Returns (seconds_per_step, last_scalar_value).
    """
    import jax

    scalar = jax.jit(_scalar)
    out = fn(*args)
    v = float(np.asarray(scalar(out)))  # warm + force first completion
    t0 = time.perf_counter()
    v = float(np.asarray(scalar(out)))
    rt = time.perf_counter() - t0       # scalar round-trip overhead
    t0 = time.perf_counter()
    for _ in range(steps):
        out = fn(*args)
    v = float(np.asarray(scalar(out)))
    t = time.perf_counter() - t0 - rt
    return max(t, 1e-9) / steps, v
