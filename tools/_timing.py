"""Trustworthy device timing on the tunneled (axon) backend — tools shim.

``jax.block_until_ready`` is a NO-OP for remote executions on this
backend; see ``dmmfods_tpu/utils/timing.py`` (the canonical
implementation, differential forced-completion method). This module just
re-exports it for the standalone tools.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from dmmfods_tpu.utils.timing import (  # noqa: F401,E402
    fetch_overhead,
    force_completion,
    sustained_step_time,
)


def device_time(fn, args, steps=20):
    """(seconds_per_step, anchor_scalar) — kept for tool compatibility."""
    t = sustained_step_time(fn, args, steps)
    return t, 0.0
