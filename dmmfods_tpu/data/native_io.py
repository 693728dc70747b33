"""ctypes binding for the native IO runtime (``native/dmmfods_io.cpp``).

Provides GIL-free batch-file decode (layout transform + channel split) and a
C++ threaded read-ahead prefetcher. Falls back gracefully: callers should
check :func:`available` and use the pure-Python path otherwise. The library
is built on demand with ``make -C native`` (g++ only, no extra deps).
"""

from __future__ import annotations

import ctypes
import subprocess
from pathlib import Path

import numpy as np

_LIB = None
_REPO_ROOT = Path(__file__).resolve().parents[2]
_SO_PATH = _REPO_ROOT / "native" / "libdmmfods_io.so"


def _load():
    global _LIB
    if _LIB is not None:
        return _LIB
    if not _SO_PATH.exists():
        try:
            subprocess.run(
                ["make", "-C", str(_SO_PATH.parent)],
                check=True, capture_output=True, timeout=120,
            )
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(str(_SO_PATH))
    except OSError:
        return None

    lib.dmm_npy_shape.restype = ctypes.c_int
    lib.dmm_npy_shape.argtypes = [ctypes.c_char_p, ctypes.POINTER(ctypes.c_int64)]
    lib.dmm_load_batch_f32.restype = ctypes.c_int
    lib.dmm_load_batch_f32.argtypes = [ctypes.c_char_p] + [
        ctypes.POINTER(ctypes.c_float)
    ] * 3 + [ctypes.POINTER(ctypes.c_int64)] * 3
    lib.dmm_nchw_to_nhwc_f32.restype = None
    lib.dmm_nchw_to_nhwc_f32.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
        ctypes.c_int64, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
    ]
    lib.dmm_prefetcher_create.restype = ctypes.c_void_p
    lib.dmm_prefetcher_create.argtypes = [
        ctypes.POINTER(ctypes.c_char_p), ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
    ]
    lib.dmm_prefetcher_peek.restype = ctypes.c_int
    lib.dmm_prefetcher_peek.argtypes = [ctypes.c_void_p] + [
        ctypes.POINTER(ctypes.c_int64)
    ] * 3
    lib.dmm_prefetcher_next.restype = ctypes.c_int
    lib.dmm_prefetcher_next.argtypes = [ctypes.c_void_p] + [
        ctypes.POINTER(ctypes.c_float)
    ] * 3 + [ctypes.POINTER(ctypes.c_int64)] * 3
    lib.dmm_prefetcher_destroy.restype = None
    lib.dmm_prefetcher_destroy.argtypes = [ctypes.c_void_p]
    lib.dmm_prefetcher_create_raw.restype = ctypes.c_void_p
    lib.dmm_prefetcher_create_raw.argtypes = [
        ctypes.POINTER(ctypes.c_char_p), ctypes.c_int64, ctypes.c_int64,
        ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
    ]
    lib.dmm_prefetcher_peek_raw.restype = ctypes.c_int
    lib.dmm_prefetcher_peek_raw.argtypes = [ctypes.c_void_p] + [
        ctypes.POINTER(ctypes.c_int64)
    ] * 4
    lib.dmm_prefetcher_next_raw.restype = ctypes.c_int
    lib.dmm_prefetcher_next_raw.argtypes = [
        ctypes.c_void_p,
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_int32),
    ] + [ctypes.POINTER(ctypes.c_int64)] * 4
    lib.dmm_splat_pooled_f32.restype = ctypes.c_int
    lib.dmm_splat_pooled_f32.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.c_int64, ctypes.c_int64,
        ctypes.c_int64, ctypes.POINTER(ctypes.c_float),
    ]
    lib.dmm_splat_pooled_batch_f32.restype = ctypes.c_int
    lib.dmm_splat_pooled_batch_f32.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_int64),
        ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
        ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
    ]
    _LIB = lib
    return lib


def available() -> bool:
    return _load() is not None


def npy_shape(path) -> tuple:
    lib = _load()
    shape = (ctypes.c_int64 * 8)()
    ndim = lib.dmm_npy_shape(str(path).encode(), shape)
    if ndim < 0:
        raise IOError(f"cannot parse npy header: {path}")
    return tuple(shape[i] for i in range(ndim))


def nchw_to_nhwc(src: np.ndarray) -> np.ndarray:
    """Native (N, C, H, W) float32 -> (N, H, W, C)."""
    lib = _load()
    src = np.ascontiguousarray(src, np.float32)
    n, c, h, w = src.shape
    dst = np.empty((n, h, w, c), np.float32)
    lib.dmm_nchw_to_nhwc_f32(
        src.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        dst.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        n, c, h, w,
    )
    return dst


def load_batch(path):
    """Decode one serialized batch .npy into (image, lidar, ht_map) NHWC."""
    lib = _load()
    shape = npy_shape(path)
    if len(shape) != 4:
        raise IOError(f"expected 4-D batch file, got {shape}")
    if shape[3] == 7:
        n, h, w = shape[0], shape[1], shape[2]
    elif shape[1] == 7:
        n, h, w = shape[0], shape[2], shape[3]
    else:
        raise IOError(f"no 7-channel axis in {shape}")
    img = np.empty((n, h, w, 3), np.float32)
    lidar = np.empty((n, h, w, 1), np.float32)
    ht = np.empty((n, h, w, 3), np.float32)
    dims = (ctypes.c_int64(), ctypes.c_int64(), ctypes.c_int64())
    status = lib.dmm_load_batch_f32(
        str(path).encode(),
        img.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        lidar.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        ht.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        *[ctypes.byref(d) for d in dims],
    )
    if status != 0:
        raise IOError(f"native batch decode failed ({status}): {path}")
    return img, lidar, ht


def splat_pooled(points, height=1280, width=1920):
    """One sample's LiDAR points ``(n, 3)`` -> pooled model input
    ``(height//10, width//10, 1)`` via the C++ splat (GIL released)."""
    lib = _load()
    pts = np.ascontiguousarray(points, np.float32)
    out = np.empty((height // 10, width // 10), np.float32)
    status = lib.dmm_splat_pooled_f32(
        pts.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), len(pts),
        height, width, out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
    )
    if status != 0:
        raise ValueError(f"native splat failed ({status})")
    return out[:, :, None]


def splat_pooled_batch(points_concat, offsets, height=1280, width=1920,
                       num_threads=2):
    """Ragged batch splat: sample i owns ``points_concat[offsets[i]:offsets[i+1]]``.
    Returns ``(batch, height//10, width//10, 1)`` float32. One C call for the
    whole batch — the GIL is released across every sample."""
    lib = _load()
    pts = np.ascontiguousarray(points_concat, np.float32)
    offs = np.ascontiguousarray(offsets, np.int64)
    batch = len(offs) - 1
    out = np.empty((batch, height // 10, width // 10), np.float32)
    status = lib.dmm_splat_pooled_batch_f32(
        pts.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        offs.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        batch, height, width,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), num_threads,
    )
    if status != 0:
        raise ValueError(f"native batch splat failed ({status})")
    return out[:, :, :, None]


class NativeRawPrefetcher:
    """Iterator over RAW-record ``.npz`` files decoded by the C++ thread
    pool, with the LiDAR splat executed inside the reader threads — the
    default (``tpu.splat='host'``) training path's read-ahead. Yields
    ``(image, lidar, boxes)`` ready for ``trainer.make_train_step_ht``."""

    def __init__(self, paths, full_hw, depth=4, num_threads=2):
        lib = _load()
        if lib is None:
            raise RuntimeError("native IO library unavailable")
        self._lib = lib
        self._paths = [str(p) for p in paths]
        arr = (ctypes.c_char_p * len(self._paths))(
            *[p.encode() for p in self._paths]
        )
        self._keepalive = arr
        self._handle = lib.dmm_prefetcher_create_raw(
            arr, len(self._paths), depth, num_threads,
            int(full_hw[0]), int(full_hw[1]),
        )

    def __iter__(self):
        count = 0
        while count < len(self._paths):
            pn, ph, pw, pm = (ctypes.c_int64() for _ in range(4))
            pstatus = self._lib.dmm_prefetcher_peek_raw(
                self._handle, *(ctypes.byref(d) for d in (pn, ph, pw, pm))
            )
            if pstatus == -1:
                return
            if pstatus != 0:
                n = h = w = mb = 0
            else:
                n, h, w, mb = pn.value, ph.value, pw.value, pm.value
            img = np.empty((n, h, w, 3), np.float32)
            lidar = np.empty((n, h, w, 1), np.float32)
            boxes = np.empty((n, mb, 5), np.int32)
            dims = tuple(ctypes.c_int64() for _ in range(4))
            status = self._lib.dmm_prefetcher_next_raw(
                self._handle,
                img.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
                lidar.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
                boxes.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
                *(ctypes.byref(d) for d in dims),
            )
            if status == -1:
                return
            if status != 0:
                raise IOError(f"native raw prefetch decode failed ({status})")
            count += 1
            yield img, lidar, boxes

    def close(self):
        if self._handle:
            self._lib.dmm_prefetcher_destroy(self._handle)
            self._handle = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass


class NativePrefetcher:
    """Iterator over batch files decoded by the C++ thread pool."""

    def __init__(self, paths, depth=4, num_threads=2):
        lib = _load()
        if lib is None:
            raise RuntimeError("native IO library unavailable")
        self._lib = lib
        self._paths = [str(p) for p in paths]
        arr = (ctypes.c_char_p * len(self._paths))(
            *[p.encode() for p in self._paths]
        )
        self._keepalive = arr
        self._handle = lib.dmm_prefetcher_create(arr, len(self._paths), depth, num_threads)

    def __iter__(self):
        count = 0
        while count < len(self._paths):
            # peek the next ready batch's actual dims so buffer sizes always
            # match what the C++ side will memcpy (files may differ, e.g. a
            # short final pack)
            pn, ph, pw = ctypes.c_int64(), ctypes.c_int64(), ctypes.c_int64()
            pstatus = self._lib.dmm_prefetcher_peek(
                self._handle, ctypes.byref(pn), ctypes.byref(ph), ctypes.byref(pw)
            )
            if pstatus == -1:
                return
            if pstatus != 0:
                # decode error: pop it via next with no-op buffers to surface
                # the status and keep the stream draining
                n, h, w = 0, 0, 0
            else:
                n, h, w = pn.value, ph.value, pw.value
            img = np.empty((n, h, w, 3), np.float32)
            lidar = np.empty((n, h, w, 1), np.float32)
            ht = np.empty((n, h, w, 3), np.float32)
            dims = (ctypes.c_int64(), ctypes.c_int64(), ctypes.c_int64())
            status = self._lib.dmm_prefetcher_next(
                self._handle,
                img.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
                lidar.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
                ht.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
                *[ctypes.byref(d) for d in dims],
            )
            if status == -1:
                return
            if status != 0:
                raise IOError(f"native prefetch decode failed ({status})")
            count += 1
            yield img, lidar, ht

    def close(self):
        if self._handle:
            self._lib.dmm_prefetcher_destroy(self._handle)
            self._handle = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass
