"""The converter's REAL decode path, executed (VERDICT r2 #4).

``waymo_open_dataset`` is not installable here, so these tests exercise the
production fallbacks end-to-end on real-SCHEMA data: a Frame proto built
with the vendored wire-compatible subset (``data/waymo_minimal.proto``),
carrying an actual JPEG (decoded by ``_decode_jpeg`` / TensorFlow) and
zlib-compressed range images + camera projections (decoded by
``data/waymo_decode.py``), written into a real ``.tfrecord`` and walked by
``waymo_to_arrays_offline`` with NO injected decoder stubs.
"""

import zlib
from pathlib import Path

import numpy as np
import pytest

tf = pytest.importorskip("tensorflow")

from dmmfods_tpu.data import waymo_decode
from dmmfods_tpu.data import waymo_minimal_pb2 as pb


def _compress_matrix_float(arr):
    m = pb.MatrixFloat()
    m.data.extend(np.asarray(arr, np.float32).reshape(-1).tolist())
    m.shape.dims.extend(arr.shape)
    return zlib.compress(m.SerializeToString())


def _compress_matrix_int32(arr):
    m = pb.MatrixInt32()
    m.data.extend(np.asarray(arr, np.int32).reshape(-1).tolist())
    m.shape.dims.extend(arr.shape)
    return zlib.compress(m.SerializeToString())


def _make_frame(rng, img_h=1280, img_w=1920, rows=8, cols=32):
    frame = pb.Frame()

    # FRONT camera JPEG
    img = rng.integers(0, 255, (img_h, img_w, 3), np.uint8)
    cam = frame.images.add()
    cam.name = 1  # FRONT
    cam.image = tf.image.encode_jpeg(tf.constant(img)).numpy()

    # TOP laser calibration: yaw-rotated, translated extrinsic + beams
    yaw = 0.3
    extrinsic = np.eye(4)
    extrinsic[:2, :2] = [[np.cos(yaw), -np.sin(yaw)], [np.sin(yaw), np.cos(yaw)]]
    extrinsic[:3, 3] = [1.5, 0.2, 2.0]
    calib = frame.context.laser_calibrations.add()
    calib.name = 1  # TOP
    calib.beam_inclinations.extend(np.linspace(-0.3, 0.2, rows).tolist())
    calib.extrinsic.transform.extend(extrinsic.reshape(-1).tolist())

    # range image: a handful of returns at known ranges
    ri = np.zeros((rows, cols, 4), np.float32)
    hits = [(1, 4, 12.0), (3, 20, 40.0), (6, 31, 75.5), (7, 0, 3.0)]
    for r, c, d in hits:
        ri[r, c, 0] = d
    cp = np.zeros((rows, cols, 6), np.int32)
    # project the first three hits into the FRONT image (name, x, y)
    cp[1, 4] = [1, 200, 400, 0, 0, 0]
    cp[3, 20] = [1, 1500, 900, 0, 0, 0]
    cp[6, 31] = [1, 30, 1275, 0, 0, 0]
    # the last hit projects to a different camera -> must be filtered out
    cp[7, 0] = [3, 10, 10, 0, 0, 0]

    laser = frame.lasers.add()
    laser.name = 1
    laser.ri_return1.range_image_compressed = _compress_matrix_float(ri)
    laser.ri_return1.camera_projection_compressed = _compress_matrix_int32(cp)

    # FRONT-camera labels (type/x/y + waymo length<->width swap downstream)
    cl = frame.camera_labels.add()
    cl.name = 1
    lbl = cl.labels.add()
    lbl.type = 1
    lbl.box.center_x = 400.0
    lbl.box.center_y = 300.0
    lbl.box.length = 200.0  # image-x extent
    lbl.box.width = 100.0   # image-y extent
    return frame, extrinsic, calib, ri, hits


def test_vendored_decoder_self_consistency():
    """decode_point_cloud recovers exactly the vehicle-frame points implied
    by the published spherical mapping for every nonzero range cell."""
    rng = np.random.default_rng(0)
    frame, extrinsic, calib, ri, hits = _make_frame(rng, img_h=40, img_w=60)
    points, cp_points = waymo_decode.decode_point_cloud(frame)
    assert len(points) == 1 and len(cp_points) == 1
    assert points[0].shape == (len(hits), 3)
    assert cp_points[0].shape == (len(hits), 6)

    rows, cols = ri.shape[:2]
    incl_all = np.linspace(-0.3, 0.2, rows)[::-1]
    az_corr = np.arctan2(extrinsic[1, 0], extrinsic[0, 0])
    expected = []
    for r, c, d in hits:
        incl = incl_all[r]
        az = ((cols - c - 0.5) / cols * 2.0 - 1.0) * np.pi - az_corr
        sensor = np.array([
            d * np.cos(incl) * np.cos(az),
            d * np.cos(incl) * np.sin(az),
            d * np.sin(incl), 1.0,
        ])
        expected.append((extrinsic @ sensor)[:3])
    # decode order is row-major over the mask, same as `hits` ordering
    np.testing.assert_allclose(points[0], np.array(expected), atol=1e-4)


def test_real_schema_walk_end_to_end(tmp_path):
    """Full converter walk on a real .tfrecord of real-schema Frames with
    the PRODUCTION decoders (vendored proto parse, TF JPEG decode, vendored
    range-image decode) — no stubs anywhere."""
    from dmmfods_tpu.data.converter import (
        extract_lidar_array_from_point_cloud, waymo_to_arrays_offline,
    )

    rng = np.random.default_rng(1)
    frame, _, _, _, hits = _make_frame(rng)
    tf_dir = tmp_path / "tf_0"
    tf_dir.mkdir()
    with tf.io.TFRecordWriter(str(tf_dir / "segment-0.tfrecord")) as w:
        w.write(frame.SerializeToString())

    waymo_to_arrays_offline(str(tmp_path), 0, store="both")

    img_files = sorted((tf_dir / "images").glob("*.npz"))
    assert len(img_files) == 1
    with np.load(img_files[0]) as z:
        img = z[z.files[0]]
    assert img.shape == (128, 192, 3)
    assert img.max() > 1.0  # real decoded pixels, 0..255 domain

    with np.load(next((tf_dir / "lidar").glob("*.npz"))) as z:
        lidar = z[z.files[0]]
    assert lidar.shape == (128, 192, 1)
    # three FRONT-projected returns -> at least their splat cells are hot
    assert (lidar > 0).sum() >= 3

    with np.load(next((tf_dir / "points").glob("*.npz"))) as z:
        pts = z[z.files[0]]
    # raw store keeps the FRONT-projected (x, y, range) rows only
    assert pts.shape == (3, 3)
    ranges = sorted(pts[:, 2].tolist())
    # ranges are vehicle-frame norms: close to sensor ranges but shifted by
    # the extrinsic translation
    assert ranges[0] > 5 and ranges[-1] > 60

    with np.load(next((tf_dir / "heat_maps").glob("*.npz"))) as z:
        heat = z[z.files[0]]
    assert heat.shape == (128, 192, 3)
    assert heat[:, :, 0].sum() > 0  # the vehicle label rasterized

    # the label round-tripped with the waymo length/width swap
    import pickle

    with open(next((tf_dir / "labels").glob("labels_*")), "rb") as fh:
        label_dict = pickle.load(fh)
    lbl = label_dict["0"]
    assert lbl["type"] == 1
    assert lbl["x"] == 300 and lbl["y"] == 250  # center - extent/2
    assert lbl["width"] == 200 and lbl["height"] == 100

    # sanity of the cp filter: only FRONT projections survive
    points, cps = waymo_decode.decode_point_cloud(frame)
    arr = extract_lidar_array_from_point_cloud(points, cps)
    assert arr.shape == (3, 3)
    assert set(map(tuple, arr[:, :2].astype(int))) == {
        (200, 400), (1500, 900), (30, 1275)
    }
