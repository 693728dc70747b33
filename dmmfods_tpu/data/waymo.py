"""Waymo dataset + host input pipeline.

Keeps the storage-layout and crawling semantics of the reference
(``dmmfods/datasets/WaymoData.py``): two storage modes — pre-batched
``(32, 7, 128, 192)`` tensors (channels 0-2 RGB / 3 LiDAR / 4-6 heat maps,
reference WaymoData.py:99-101) or one-file-per-sample directories — with a
json file-list cache (WaymoData.py:31-45) and a loader exposing
``train_loader`` / ``valid_loader`` / ``train_iterations`` /
``valid_iterations`` (WaymoData.py:160-213).

TPU-native replacements for the torch DataLoader machinery:
  * samples come back as channel-LAST float32 numpy arrays ready for
    ``jax.device_put`` (one transpose on the host, zero on device);
  * a background-thread prefetcher (``PrefetchLoader``) overlaps host file
    IO + decode with device compute — the moral successor of
    ``num_workers=4, pin_memory=True`` (helper.py:136-143);
  * both torch-serialized legacy files and ``.npy``/``.npz`` native files
    load transparently.
"""

from __future__ import annotations

import json
import queue
import threading
from os import listdir
from os.path import isdir, isfile, join
from pathlib import Path

import numpy as np

from ..config import load_json_file, save_json_file


def _load_array(path):
    """Load one stored tensor: torch-pickled legacy file or numpy native."""
    if path.endswith(".npy"):
        return np.load(path)
    if path.endswith(".npz"):
        with np.load(path) as z:
            return z[z.files[0]]
    # legacy torch.save files (no extension in the reference layout)
    import torch

    return torch.load(path, map_location="cpu", weights_only=False).numpy()


def _to_nhwc(arr):
    """Any stored sample/batch layout -> channel-last float32.

    Legacy torch files are channel-first ((C, H, W) / (N, C, H, W)); our
    converter writes channel-last. Channels are 1/3/7; spatial dims are
    always larger, so the layout is detected from the shape.
    """
    a = np.asarray(arr, np.float32)
    channels = (1, 3, 7)
    if a.ndim == 4:
        if a.shape[-1] in channels and a.shape[1] not in channels:
            return a  # already (N, H, W, C)
        return np.transpose(a, (0, 2, 3, 1))
    if a.shape[-1] in channels and a.shape[0] not in channels:
        return a  # already (H, W, C)
    return np.transpose(a, (1, 2, 0))


def load_dense_batch_file(path):
    """One serialized dense batch file -> NHWC ``(image, lidar, ht_map)``.

    Shared by :meth:`WaymoDataset.get_batch` and the parity runner
    (``utils/parity.py``): handles legacy torch ``(N, 7, H, W)`` files
    (channel slicing per reference WaymoData.py:99-101) and native
    channel-last ``(N, H, W, 7)`` files from our converter."""
    if path.endswith(".npy"):
        from . import native_io

        if native_io.available():
            # GIL-free C++ decode: single-pass layout + channel split
            return native_io.load_batch(path)
    batch = np.asarray(_load_array(path), np.float32)
    if batch.shape[-1] == 7:  # native channel-last
        nhwc = batch
    else:  # legacy (N, 7, H, W)
        nhwc = np.transpose(batch, (0, 2, 3, 1))
    return nhwc[..., :3], nhwc[..., 3:4], nhwc[..., 4:]


class WaymoDataset:
    """File-list-backed dataset (reference ``WaymoDataset`` semantics)."""

    def __init__(self, mode, config):
        self.root = config.dir.data.root
        self.data_is_batched = config.dataset.batch_size > 1
        self.mode = mode

        # raw-record handling (north-star device/host preprocessing): batch
        # files holding (RGB, ragged points, boxes) instead of dense tensors.
        # `tpu.splat` picks where the LiDAR splat runs: "host" (default) in
        # the C++ runtime inside prefetch threads, "device" in-graph.
        tpu = config.get("tpu", {})
        self.splat = tpu.get("splat", "host")
        self.max_points = int(tpu.get("max_points", 32768))
        self.splat_threads = int(tpu.get("splat_threads", 2))
        _, full_w, full_h = config.dataset.images["original.size"]
        self.full_h, self.full_w = int(full_h), int(full_w)

        json_file_path = join(
            config.dir.data.file_lists, mode + "_" + config.dataset.file_list_name
        )

        if isfile(json_file_path):
            self.files = load_json_file(json_file_path)
        else:
            if self.data_is_batched:
                if config.loader.batch_size is not None:
                    raise ValueError(
                        "config.loader.batch_size needs to be None if loading batched dataset"
                    )
                self.files = []
                for subdir in sorted(listdir(join(self.root, mode))):
                    entries = sorted(listdir(join(self.root, mode, subdir)))
                    if "labels" in entries:
                        entries.remove("labels")
                    self.files += [join(mode, subdir, b) for b in entries]
            else:
                self.files = {dt: [] for dt in config.dataset.datatypes}
                buckets = sorted(
                    wb for wb in listdir(self.root) if wb.startswith("training_0")
                )
                for bucket in buckets:
                    for tf_dir in sorted(listdir(join(self.root, bucket))):
                        for datatype in config.dataset.datatypes:
                            rel = join(bucket, tf_dir, mode, datatype)
                            full = join(self.root, rel)
                            if isdir(full):
                                self.files[datatype] += [
                                    join(rel, f) for f in sorted(listdir(full))
                                ]
                self._check_data_integrity()

            Path(config.dir.data.file_lists).mkdir(exist_ok=True, parents=True)
            save_json_file(json_file_path, self.files)

    # -- access ------------------------------------------------------------

    def get_batch(self, idx):
        """One serialized batch file -> NHWC (image, lidar, ht_map).

        Handles both layouts: legacy torch ``(N, 7, H, W)`` files
        (channel slicing per reference WaymoData.py:99-101) and native
        channel-last ``(N, H, W, 7)`` files from our converter.
        """
        path = join(self.root, self.files[idx])
        if path.endswith(".npz"):
            with np.load(path) as z:
                if "points" in z.files:  # raw record (converter raw layout)
                    return self._raw_record_to_batch(z)
        return load_dense_batch_file(path)

    def _raw_record_to_batch(self, z):
        """One raw-record file -> the training batch tuple.

        ``splat == 'host'``: run the LiDAR splat now, in this prefetch
        thread (C++ runtime, GIL-free; ``data/host_preprocess.py``) and
        yield ``(image, lidar, boxes)`` for ``trainer.make_train_step_ht``.
        ``splat == 'device'``: yield padded point buffers
        ``(image, points, num_valid, boxes)`` for ``make_train_step_raw``.
        Heat maps are rasterized in-graph either way.
        """
        images = np.asarray(z["images"], np.float32)
        points = np.asarray(z["points"], np.float32)
        offsets = np.asarray(z["offsets"], np.int64)
        boxes = np.asarray(z["boxes"], np.int32)
        if self.splat == "host":
            from . import host_preprocess

            lidar = host_preprocess.splat_pooled_batch(
                points, offsets, self.full_h, self.full_w, self.splat_threads
            )
            return images, lidar, boxes
        b = len(offsets) - 1
        padded = np.zeros((b, self.max_points, 3), np.float32)
        num_valid = np.minimum(np.diff(offsets), self.max_points).astype(np.int32)
        for i in range(b):
            padded[i, :num_valid[i]] = points[offsets[i]:offsets[i] + num_valid[i]]
        return images, padded, num_valid, boxes

    def get_single_sample(self, idx):
        image = _to_nhwc(_load_array(join(self.root, self.files["images"][idx])))
        lidar = _to_nhwc(_load_array(join(self.root, self.files["lidar"][idx])))
        ht_map = _to_nhwc(_load_array(join(self.root, self.files["heat_maps"][idx])))
        return image, lidar, ht_map

    def __getitem__(self, idx):
        if self.data_is_batched:
            return self.get_batch(idx)
        return self.get_single_sample(idx)

    def __len__(self):
        if self.data_is_batched:
            return len(self.files)
        return len(self.files["images"])

    def _check_data_integrity(self):
        """Index-by-index filename suffix check (reference WaymoData.py:151-158)."""
        for i in range(len(self)):
            suffix = self.files["images"][i][-11:]
            assert self.files["lidar"][i].endswith(suffix), (
                f"{i} {self.files['lidar'][i]} {self.files['images'][i]}"
            )
            assert self.files["heat_maps"][i].endswith(suffix), (
                f"{i} {self.files['heat_maps'][i]} {self.files['images'][i]}"
            )


class PrefetchLoader:
    """Background-thread prefetching iterator over a dataset.

    Replaces torch ``DataLoader(num_workers=4, pin_memory=True)``: IO +
    decode + NHWC transpose run on loader threads while the device computes.
    For batched storage each item IS a batch; for single-sample storage items
    are stacked into ``batch_size`` groups (drop_last per config).
    """

    def __init__(self, dataset, batch_size=None, *, shuffle=False, depth=2,
                 drop_last=False, seed=0, native_prefetch=False):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.depth = depth
        self.drop_last = drop_last
        self.native_prefetch = native_prefetch
        self._rng = np.random.default_rng(seed)

    def _native_paths(self):
        """``(paths, mode)`` for the C++ read-ahead prefetcher, or None when
        it does not apply. Two native modes: ``'dense'`` (batched ``.npy``
        7-channel files) and ``'raw'`` (batched ``.npz`` raw records with
        host splat — decode AND splat run in the C++ reader threads)."""
        if not (self.native_prefetch and self.dataset.data_is_batched):
            return None
        files = getattr(self.dataset, "files", None)  # synthetic sets none
        if not files:
            return None
        if all(f.endswith(".npy") for f in files):
            mode = "dense"
        elif (all(f.endswith(".npz") for f in files)
              and getattr(self.dataset, "splat", None) == "host"):
            mode = "raw"
        else:
            return None
        from . import native_io

        if not native_io.available():
            return None
        from os.path import join as _join

        return [_join(self.dataset.root, f) for f in files], mode

    def __len__(self):
        n = len(self.dataset)
        if self.dataset.data_is_batched or self.batch_size in (None, 1):
            return n
        if self.drop_last:
            return n // self.batch_size
        return (n + self.batch_size - 1) // self.batch_size

    def _index_groups(self):
        idx = np.arange(len(self.dataset))
        if self.shuffle:
            # datasets whose items alias larger on-disk units (e.g. the
            # detection adapter's 32-sample files) expose `shuffle_order` to
            # keep the shuffled order unit-major — random but cache-friendly
            order = getattr(self.dataset, "shuffle_order", None)
            if order is not None:
                idx = np.asarray(order(self._rng))
            else:
                self._rng.shuffle(idx)
        if self.dataset.data_is_batched or self.batch_size in (None, 1):
            return [[i] for i in idx]
        groups = [
            idx[i:i + self.batch_size] for i in range(0, len(idx), self.batch_size)
        ]
        if self.drop_last and groups and len(groups[-1]) < self.batch_size:
            groups.pop()
        return groups

    def __iter__(self):
        groups = self._index_groups()

        native = self._native_paths()
        if native is not None:
            # C++ read-ahead path: decode threads + bounded queue live in the
            # native runtime (native/dmmfods_io.cpp); this epoch's (possibly
            # shuffled) file order is passed through. Raw records also get
            # their LiDAR splat inside the reader threads.
            from .native_io import NativePrefetcher, NativeRawPrefetcher

            native_paths, native_mode = native
            ordered = [native_paths[g[0]] for g in groups]
            if native_mode == "raw":
                prefetcher = NativeRawPrefetcher(
                    ordered, (self.dataset.full_h, self.dataset.full_w),
                    depth=self.depth,
                    num_threads=self.dataset.splat_threads,
                )
            else:
                prefetcher = NativePrefetcher(ordered, depth=self.depth)
            try:
                yield from prefetcher
            finally:
                prefetcher.close()
            return

        q: queue.Queue = queue.Queue(maxsize=self.depth)

        def worker():
            try:
                for group in groups:
                    items = [self.dataset[int(i)] for i in group]
                    if len(items) == 1 and self.dataset.data_is_batched:
                        q.put(items[0])
                    elif len(items) == 1:
                        q.put(tuple(a[None] for a in items[0]))
                    else:
                        q.put(tuple(np.stack(parts) for parts in zip(*items)))
                q.put(None)
            except BaseException as exc:  # surface loader errors to consumer
                q.put(exc)

        t = threading.Thread(target=worker, daemon=True)
        t.start()
        while True:
            item = q.get()
            if item is None:
                return
            if isinstance(item, BaseException):
                raise item
            yield item


class WaymoDataset_Loader:
    """Train/val/test loader bundle (reference WaymoData.py:160-213 surface)."""

    def __init__(self, config):
        self.mode = config.loader.mode
        tpu = config.get("tpu", {})
        depth = tpu.get("prefetch_depth", 2)
        native = bool(tpu.get("native_prefetch", True))

        if self.mode == "train":
            train_set = WaymoDataset("train", config)
            valid_set = WaymoDataset("val", config)
            self.train_loader = PrefetchLoader(
                train_set, config.loader.batch_size, shuffle=True, depth=depth,
                drop_last=config.loader.drop_last, seed=config.agent.seed,
                native_prefetch=native,
            )
            self.valid_loader = PrefetchLoader(
                valid_set, config.loader.batch_size, depth=depth,
                drop_last=config.loader.drop_last, native_prefetch=native,
            )
            self.train_iterations = len(self.train_loader)
            self.valid_iterations = len(self.valid_loader)
        elif self.mode == "test":
            test_set = WaymoDataset("test", config)
            self.valid_loader = PrefetchLoader(
                test_set, config.loader.batch_size, depth=depth,
                drop_last=config.loader.drop_last, native_prefetch=native,
            )
            self.valid_iterations = len(self.valid_loader)
        else:
            raise ValueError("Please choose a one of the following modes: train, val, test")
