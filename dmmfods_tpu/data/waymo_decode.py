"""Vendored minimal Waymo Frame decode — no ``waymo_open_dataset`` needed.

The reference's ETL core is two library calls
(``frame_utils.parse_range_image_and_camera_projection`` +
``convert_range_image_to_point_cloud``, reference
``dmmfods/utils/Dense_U_Net_lidar_helper.py:610-617``). That package does not
install everywhere (it pins old TF builds), so this module provides a
dependency-free fallback implementing the same published math:

* :func:`parse_frame` — bytes -> Frame via the vendored wire-compatible
  proto subset (``waymo_minimal.proto``);
* :func:`decode_point_cloud` — per-laser zlib-compressed range images ->
  vehicle-frame cartesian points + camera projections, the spherical
  conversion from the published range-image spec: row inclinations from the
  calibration (bottom-to-top, so rows are flipped), column azimuths spanning
  ``[pi, -pi)`` corrected by the sensor extrinsic yaw, then the 4x4
  extrinsic into the vehicle frame.

Known simplification (documented, fallback-only): the TOP lidar's rolling-
shutter per-column pose correction (``range_image_pose_compressed``) is not
applied — points are decoded in the frame-pose vehicle frame. The converter
consumes only camera-projection pixel coordinates (stored explicitly in the
proto, unaffected) and point-range norms, where the correction is a
sub-percent effect. When ``waymo_open_dataset`` IS installed the converter
prefers it (``data/converter.py``).
"""

from __future__ import annotations

import zlib

import numpy as np


def parse_frame(data_bytes):
    """Serialized tfrecord payload -> vendored ``Frame`` proto."""
    from . import waymo_minimal_pb2 as pb

    frame = pb.Frame()
    frame.ParseFromString(bytes(data_bytes))
    return frame


def _decompress_matrix(compressed, proto_cls):
    m = proto_cls()
    m.ParseFromString(zlib.decompress(compressed))
    dims = list(m.shape.dims)
    return np.array(m.data).reshape(dims)


def decompress_range_image(ri):
    """``RangeImage`` -> float32 ``(rows, cols, 4)`` (channel 0 = range)."""
    from . import waymo_minimal_pb2 as pb

    return _decompress_matrix(ri.range_image_compressed, pb.MatrixFloat)


def decompress_camera_projection(ri):
    """``RangeImage`` -> int32 ``(rows, cols, 6)``."""
    from . import waymo_minimal_pb2 as pb

    return _decompress_matrix(ri.camera_projection_compressed, pb.MatrixInt32)


def beam_inclinations(calib, rows):
    """Per-row beam inclinations, TOP ROW FIRST (the range image is stored
    top-of-scene first while calibrations list beams bottom-to-top)."""
    if len(calib.beam_inclinations):
        incl = np.asarray(calib.beam_inclinations, np.float64)
    else:
        incl = np.linspace(calib.beam_inclination_min,
                           calib.beam_inclination_max, rows)
    return incl[::-1]


def column_azimuths(cols, extrinsic):
    """Column azimuth angles: ``[pi, -pi)`` across the width at pixel
    centers, shifted by the sensor's extrinsic yaw."""
    az_correction = np.arctan2(extrinsic[1, 0], extrinsic[0, 0])
    ratios = (cols - np.arange(cols, dtype=np.float64) - 0.5) / cols
    return (ratios * 2.0 - 1.0) * np.pi - az_correction


def range_image_to_points(range_image, calib):
    """One laser's ``(rows, cols, 4)`` range image -> masked vehicle-frame
    points ``(N, 3)`` + the ``(rows, cols)`` validity mask (range > 0)."""
    rows, cols = range_image.shape[:2]
    extrinsic = (
        np.asarray(calib.extrinsic.transform, np.float64).reshape(4, 4)
        if len(calib.extrinsic.transform) == 16 else np.eye(4)
    )
    incl = beam_inclinations(calib, rows)[:, None]          # (rows, 1)
    az = column_azimuths(cols, extrinsic)[None, :]          # (1, cols)
    r = np.asarray(range_image[..., 0], np.float64)
    x = r * np.cos(incl) * np.cos(az)
    y = r * np.cos(incl) * np.sin(az)
    z = r * np.sin(incl)
    sensor = np.stack([x, y, z, np.ones_like(r)], axis=-1)  # (rows, cols, 4)
    vehicle = sensor @ extrinsic.T
    mask = r > 0
    return vehicle[mask][:, :3].astype(np.float32), mask


def decode_point_cloud(frame):
    """Frame -> ``(points, cp_points)`` per-laser lists, the
    ``frame_utils.convert_range_image_to_point_cloud`` return-1 contract
    (each entry: points ``(N, 3)`` f32, projections ``(N, 6)`` i32)."""
    calibs = {c.name: c for c in frame.context.laser_calibrations}
    points, cp_points = [], []
    for laser in frame.lasers:
        ri = laser.ri_return1
        if not ri.range_image_compressed:
            continue
        range_image = decompress_range_image(ri)
        pts, mask = range_image_to_points(range_image, calibs[laser.name])
        points.append(pts)
        if ri.camera_projection_compressed:
            cp = decompress_camera_projection(ri)
            cp_points.append(cp[mask].astype(np.int32))
        else:
            cp_points.append(np.zeros((len(pts), 6), np.int32))
    return points, cp_points
