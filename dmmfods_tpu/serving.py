"""Batched inference engine for production serving.

The reference has no serving story (inference happens inside the Colab
validate loop). This engine is the TPU-native deployment path:

* one compiled program per (batch-bucket, resolution) — requests are padded
  up to the nearest bucket so nothing ever recompiles at serve time;
* a pipelined worker thread keeps a transfer in flight while the previous
  batch computes (the tunnel/PCIe transfer and TPU compute overlap);
* inference variables are served with folded BatchNorm (see
  ``ops/normalization.py``) in the configured compute dtype (bf16 on TPU);
* outputs are heat-map logits; ``decode=True`` applies the sigmoid on device
  before transfer (saves a host pass).

Usage::

    engine = InferenceEngine(bundle)               # a ModelBundle
    engine.start()
    future = engine.submit(rgb_frames, lidar_frames)
    heatmaps = future.result()
    engine.stop()

Synchronous batch scoring: ``engine.run(rgb, lidar)``.
"""

from __future__ import annotations

import queue
import threading
from concurrent.futures import Future
from typing import Optional, Sequence

import numpy as np

import jax
import jax.numpy as jnp


DEFAULT_BUCKETS = (1, 8, 32, 128, 256)


class InferenceEngine:
    def __init__(self, bundle, *, buckets: Sequence[int] = DEFAULT_BUCKETS,
                 decode: bool = True, height: Optional[int] = None,
                 width: Optional[int] = None, mesh=None):
        """``mesh``: a ``jax.sharding.Mesh`` to serve ON — variables
        replicate across it, every request batch shards over its ``data``
        axis (and image rows over ``spatial`` when present), so one engine
        drives a whole slice. Buckets must be divisible by the ``data``
        axis size. ``mesh=None`` (default) is the single-device path."""
        self._module = bundle.module
        self._variables = bundle.variables
        self._spec = bundle.spec
        self._buckets = tuple(sorted(buckets))
        self._decode = decode
        if height is None or width is None:
            # config.dataset.images.size is (C, W, H) per the reference
            _, width, height = bundle.config.dataset.images.size
        self._hw = (height, width)
        self._single_stream = self._spec.stream_2_in_channels == 0
        self._dtype = self._spec.dtype
        self._mesh = mesh
        self._batch_sharding = None
        if mesh is not None:
            from .parallel import mesh as mesh_lib

            data_size = mesh.shape.get("data", 1)
            bad = [b for b in self._buckets if b % data_size]
            if bad:
                raise ValueError(
                    f"buckets {bad} are not divisible by the mesh's data "
                    f"axis ({data_size}); pick bucket sizes that split "
                    "evenly across data-parallel devices"
                )
            self._batch_sharding = mesh_lib.batch_sharding(mesh)

        self._build_forward()
        self._queue: queue.Queue = queue.Queue()
        self._thread: Optional[threading.Thread] = None
        self._running = False

    def _build_forward(self):
        self._forward = self._make_forward(self._variables)

    def _make_forward(self, variables):
        # variables are CLOSED OVER, not passed: a jit-captured pytree is
        # baked into the executable, so per-request dispatch ships only the
        # two input arrays — measured on the dev tunnel, passing the
        # ~600-leaf variables tree as an argument costs tens of ms of
        # handle serialization per request
        decode_flag = self._decode
        mesh, batch_sh, dtype = self._mesh, self._batch_sharding, self._dtype

        if mesh is not None:
            # replicate weights across the slice once; requests arrive
            # data-sharded (see _to_device) and XLA runs the bucket SPMD
            from .parallel import mesh as mesh_lib

            variables = jax.device_put(variables, mesh_lib.replicated(mesh))

        def forward(rgb, lidar):
            if mesh is not None:
                rgb = jax.lax.with_sharding_constraint(
                    rgb.astype(dtype), batch_sh)
                lidar = jax.lax.with_sharding_constraint(
                    lidar.astype(dtype), batch_sh)
            logits = self._module.apply(
                variables, rgb, None if self._single_stream else lidar, False
            )
            return jax.nn.sigmoid(logits.astype(jnp.float32)) if decode_flag else logits

        if mesh is not None:
            return jax.jit(forward)
        from .utils.cache import jit_auto_out

        return jit_auto_out(forward)

    def update_variables(self, variables, *, rewarm=True):
        """Swap in new model weights (e.g. a freshly trained checkpoint)
        without tearing the engine down. Compiles fresh executables (the
        weights are baked into them — see :meth:`_make_forward`); with
        ``rewarm`` the configured buckets are compiled on a LOCAL forward
        first and the swap becomes visible only after every bucket warms —
        concurrent worker-thread requests keep serving the old weights (and
        never hit a compile) until then, and a failed rewarm leaves the
        engine untouched."""
        new_forward = self._make_forward(variables)
        if rewarm:
            self.warmup(forward=new_forward)
        # atomic swap (a single attribute store under the GIL): the worker
        # thread sees either the fully-warmed new forward or the old one
        self._forward, self._variables = new_forward, variables

    # -- lifecycle ---------------------------------------------------------

    def warmup(self, buckets: Optional[Sequence[int]] = None, *, forward=None):
        """Compile every bucket ahead of serving (optionally on a not-yet-
        installed ``forward`` — see :meth:`update_variables`)."""
        h, w = self._hw
        fwd = self._forward if forward is None else forward
        for b in buckets or self._buckets:
            rgb = self._to_device(
                np.zeros((b, h, w, self._spec.stream_1_in_channels),
                         np.float32), b)
            lidar = self._to_device(
                np.zeros((b, h, w, max(self._spec.stream_2_in_channels, 1)),
                         np.float32), b)
            # force real execution, not just dispatch: block_until_ready is
            # a no-op for remote executions on tunneled backends (see
            # utils/timing.py) and warm-before-swap must mean "has run"
            from .utils.timing import force_completion

            force_completion(fwd(rgb, lidar))

    def start(self):
        self._running = True
        self._thread = threading.Thread(target=self._worker, daemon=True)
        self._thread.start()

    def stop(self):
        self._running = False
        self._queue.put(None)
        if self._thread is not None:
            self._thread.join()
            self._thread = None

    # -- scoring -----------------------------------------------------------

    def _bucket_for(self, n: int) -> int:
        for b in self._buckets:
            if n <= b:
                return b
        return self._buckets[-1]

    def _pad(self, arr, bucket):
        n = arr.shape[0]
        if n == bucket:
            return arr
        pad = np.zeros((bucket - n,) + arr.shape[1:], arr.dtype)
        return np.concatenate([arr, pad], axis=0)

    def _to_device(self, arr, bucket):
        """Pad and transfer; dtype conversion happens on device.

        NOTE(perf): converting to bf16 on the host first (numpy/ml_dtypes
        software cast) was measured SLOWER end-to-end on a 1-core host
        (8.8 s vs 5.4 s per b256 request over the dev tunnel) — the cast
        costs more host CPU than the halved transfer saves. On a production
        TPU-VM (PCIe + many cores) feeding uint8/bf16 from the data source
        directly is the right fix; the engine accepts any input dtype.

        Mesh mode: the padded batch is placed data-sharded across the slice
        (each device receives only its rows); the dtype cast happens
        in-graph instead.
        """
        if self._batch_sharding is not None:
            return jax.device_put(self._pad(arr, bucket), self._batch_sharding)
        return jnp.asarray(self._pad(arr, bucket), self._dtype)

    def run(self, rgb, lidar=None):
        """Synchronous scoring of one request (any batch size <= max bucket;
        larger requests are chunked)."""
        rgb = np.asarray(rgb, np.float32)
        if lidar is None:
            lidar = np.zeros(rgb.shape[:3] + (max(self._spec.stream_2_in_channels, 1),),
                             np.float32)
        lidar = np.asarray(lidar, np.float32)
        outs = []
        max_bucket = self._buckets[-1]
        for start in range(0, rgb.shape[0], max_bucket):
            r = rgb[start:start + max_bucket]
            l = lidar[start:start + max_bucket]
            n = r.shape[0]
            bucket = self._bucket_for(n)
            out = self._forward(
                self._to_device(r, bucket), self._to_device(l, bucket)
            )
            outs.append(np.asarray(out, np.float32)[:n])
        return np.concatenate(outs, axis=0)

    def submit(self, rgb, lidar=None) -> Future:
        """Asynchronous scoring; returns a ``Future`` of the heat maps.
        The worker thread keeps the device pipeline full across requests
        and coalesces compatible queued requests into one device batch.
        Requests may be enqueued before :meth:`start`; they are served once
        the worker runs."""
        future: Future = Future()
        self._queue.put((np.asarray(rgb, np.float32),
                         None if lidar is None else np.asarray(lidar, np.float32),
                         future))
        return future

    def _fill_lidar(self, rgb, lidar):
        if lidar is None:
            return np.zeros(
                rgb.shape[:3] + (max(self._spec.stream_2_in_channels, 1),),
                np.float32,
            )
        return lidar

    def _collect_group(self, first):
        """Coalesce queued requests into one device batch: starting from
        ``first``, drain compatible waiting requests (same frame shape)
        until the largest bucket is full. A b1-heavy load then rides the
        large-bucket throughput (~5x device fps at b8 vs b1, BASELINE.md
        serving table) instead of paying one dispatch per request."""
        group = [first]  # [(rgb, lidar, future)]
        total = first[0].shape[0]
        max_bucket = self._buckets[-1]
        saw_stop = False
        while total < max_bucket:
            try:
                item = self._queue.get_nowait()
            except queue.Empty:
                break
            if item is None:
                saw_stop = True
                break
            if item[0].shape[1:] != first[0].shape[1:]:
                # incompatible resolution: flush the group, requeue this one
                self._queue.put(item)
                break
            group.append(item)
            total += item[0].shape[0]
        return group, total, saw_stop

    def _worker(self):
        pending = []  # (device_out, [(start, n, future)...]): in flight
        while self._running or pending:
            try:
                item = self._queue.get(timeout=0.05)
            except queue.Empty:
                item = False  # nothing new; drain pending below
            if item is None:
                self._running = False
                item = False
            if item:
                group, total, saw_stop = self._collect_group(item)
                if saw_stop:
                    self._running = False
                bucket = self._bucket_for(total)
                # dispatch is async: this enqueues transfer + compute and
                # returns immediately, overlapping with the fetch below.
                # A bad request (wrong rank/shape) must fail ITS futures,
                # not kill the worker thread and hang every queued client.
                try:
                    if len(group) == 1:
                        rgb, lidar, future = group[0]
                        lidar = self._fill_lidar(rgb, lidar)
                        slices = [(0, rgb.shape[0], future)]
                    else:
                        rgb = np.concatenate([g[0] for g in group], axis=0)
                        lidar = np.concatenate(
                            [self._fill_lidar(g[0], g[1]) for g in group], axis=0
                        )
                        slices, start = [], 0
                        for g in group:
                            n = g[0].shape[0]
                            slices.append((start, n, g[2]))
                            start += n
                    out = self._forward(
                        self._to_device(rgb, bucket),
                        self._to_device(lidar, bucket),
                    )
                except Exception as exc:
                    for g in group:
                        g[2].set_exception(exc)
                else:
                    pending.append((out, slices))
            # keep at most one batch in flight beyond the current fetch
            while pending and (len(pending) > 1 or not self._running or item is False):
                out, slices = pending.pop(0)
                try:
                    # host-side slice: a device-side out[:n] is one more
                    # dispatch round trip per request on a tunneled chip
                    host = np.asarray(out, np.float32)
                    for start, n, future in slices:
                        future.set_result(host[start:start + n])
                except Exception as exc:  # pragma: no cover
                    for _, _, future in slices:
                        if not future.done():
                            future.set_exception(exc)
                if self._queue.qsize() > 0:
                    break  # go dispatch more work first
