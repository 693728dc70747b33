"""Observability: TensorBoard-compatible scalar logging + step profiling.

Reproduces the reference's logging taxonomy
(``dmmfods/agents/Dense_U_Net_lidar_Agent.py:268-288,361-381,400-426``):
per-iteration scalar groups ``Training|Validation / Loss|Accuracy|IoU`` with
``Vehicle/Pedestrian/Cyclist/Overall`` series, plus an hparams dump.

Two backends: torch's ``SummaryWriter`` when importable (drop-in TensorBoard
files), else a JSONL fallback with the same logical schema. Writes are
buffered so per-iteration logging never forces a device sync inside the hot
loop — metric arrays are drained lazily in bulk (the reference's per-iter
``add_scalars`` on CUDA tensors synced every step).

Also: ``StepTimer`` — ``block_until_ready``-bracketed step timing and a
``jax.profiler`` trace context, the rebuild's answer to SURVEY.md §5.1
(absent in the reference).
"""

from __future__ import annotations

import contextlib
import json
import time
from pathlib import Path

import numpy as np

CLASS_NAMES = ("Vehicle", "Pedestrian", "Cyclist")


class SummaryWriter:
    """Buffered scalar writer with torch-TensorBoard or JSONL backend."""

    def __init__(self, log_dir, backend="auto"):
        self.log_dir = Path(log_dir)
        self.log_dir.mkdir(exist_ok=True, parents=True)
        self._tb = None
        if backend in ("auto", "tensorboard"):
            try:
                from torch.utils.tensorboard import SummaryWriter as TBWriter

                self._tb = TBWriter(log_dir=str(self.log_dir))
            except Exception:
                if backend == "tensorboard":
                    raise
        self._jsonl = open(self.log_dir / "scalars.jsonl", "a")
        self._pending = []

    def add_class_scalars(self, tag, per_class_array, step):
        """Queue one Vehicle/Pedestrian/Cyclist/Overall scalar group.

        ``per_class_array`` may be a device array — it is NOT converted here
        (no sync); conversion happens in :meth:`flush`.
        """
        self._pending.append((tag, per_class_array, step))

    def add_scalar(self, tag, value, step):
        self._pending.append((tag, value, step))

    def flush(self):
        if self._jsonl.closed:
            self._pending.clear()
            return
        for tag, value, step in self._pending:
            arr = np.asarray(value)
            if arr.ndim == 0:
                scalars = {"value": float(arr)}
            else:
                scalars = {name: float(v) for name, v in zip(CLASS_NAMES, arr)}
                scalars["Overall"] = float(arr.mean())
            if self._tb is not None:
                if arr.ndim == 0:
                    self._tb.add_scalar(tag, scalars["value"], step)
                else:
                    self._tb.add_scalars(tag, scalars, step)
            self._jsonl.write(json.dumps({"tag": tag, "step": step, **scalars}) + "\n")
        self._pending.clear()
        self._jsonl.flush()
        if self._tb is not None:
            self._tb.flush()

    def add_hparams(self, hparams):
        if self._tb is not None:
            try:
                self._tb.add_hparams({k: v for k, v in hparams.items()
                                      if isinstance(v, (int, float, str, bool))}, {})
            except Exception:
                pass
        self._jsonl.write(json.dumps({"hparams": hparams}) + "\n")
        self._jsonl.flush()

    def close(self):
        """Idempotent (the agent's train() and finalize() may both close,
        as the reference's do)."""
        if self._jsonl.closed:
            return
        self.flush()
        self._jsonl.close()
        if self._tb is not None:
            self._tb.close()


class StepTimer:
    """Wall-clock step timing with async-dispatch awareness."""

    def __init__(self):
        self.times = []
        self._t0 = None
        self.last_loss = float("nan")  # anchor scalar of the last stop()

    def start(self):
        self._t0 = time.perf_counter()

    def stop(self, result=None):
        """Force completion of ``result`` (if given) then record elapsed
        seconds. Uses a scalar host fetch, not ``block_until_ready`` — the
        latter is a no-op for remote executions on tunneled backends (see
        utils/timing.py)."""
        if result is not None:
            from .timing import force_completion

            self.last_loss = force_completion(result)
        self.times.append(time.perf_counter() - self._t0)

    @property
    def mean(self):
        return float(np.mean(self.times)) if self.times else float("nan")

    def percentile(self, p):
        return float(np.percentile(self.times, p)) if self.times else float("nan")


@contextlib.contextmanager
def profile_trace(log_dir, enabled=True):
    """``jax.profiler`` trace context (view in TensorBoard / Perfetto)."""
    if not enabled:
        yield
        return
    import jax

    jax.profiler.start_trace(str(log_dir))
    try:
        yield
    finally:
        jax.profiler.stop_trace()
