"""Integration test for the offline converter's tfrecord walk
(reference ``dmmfods/utils/Dense_U_Net_lidar_helper.py:540-651``).

``waymo_open_dataset`` is not installed here, so the proto decoders are
injected as stubs (the walk's seams exist for exactly this:
``frame_parser`` / ``point_cloud_fn`` / ``decode_image_fn``); TensorFlow IS
installed, so ``tf.data.TFRecordDataset`` and the directory walk execute for
real, writing the actual on-disk layout end-to-end into serialized batches.
"""

import pickle
from pathlib import Path

import numpy as np
import pytest

tf = pytest.importorskip("tensorflow")

from dmmfods_tpu.config import get_config
from dmmfods_tpu.data.converter import (
    save_data_in_batch,
    save_raw_data_in_batch,
    waymo_to_arrays_offline,
)
from dmmfods_tpu.data.waymo import WaymoDataset


class _Box:
    def __init__(self, cx, cy, length, width):
        self.center_x, self.center_y = cx, cy
        self.length, self.width = length, width


class _Label:
    def __init__(self, ltype, box):
        self.type, self.box = ltype, box


class _CameraLabels:
    def __init__(self, name, labels):
        self.name, self.labels = name, labels


class _Image:
    def __init__(self, name, payload):
        self.name, self.image = name, payload


class _Frame:
    def __init__(self, seed):
        # FRONT (name=1) plus a side camera that must be skipped
        self.images = [_Image(1, seed.to_bytes(4, "little")),
                       _Image(2, b"side-camera-ignored")]
        self.camera_labels = [
            _CameraLabels(1, [
                _Label(1, _Box(400 + 10 * seed, 300, 200, 100)),
                _Label(2, _Box(900, 500, 60, 160)),
            ]),
            _CameraLabels(2, [_Label(1, _Box(0, 0, 10, 10))]),
        ]


def _frame_parser(data_bytes):
    return _Frame(int.from_bytes(data_bytes[:4], "little"))


def _decode_image(payload):
    seed = int.from_bytes(payload, "little")
    rng = np.random.default_rng(seed)
    return rng.integers(0, 255, (1280, 1920, 3)).astype(np.uint8)


def _point_cloud(frame):
    seed = int.from_bytes(frame.images[0].image, "little")
    rng = np.random.default_rng(1000 + seed)
    n = 500
    pts = rng.uniform(0, 50, (n, 3)).astype(np.float32)
    cp = np.zeros((n, 3), np.int64)
    cp[: n // 2, 0] = 1  # half the points project into the FRONT camera
    cp[:, 1] = rng.integers(0, 1920, n)
    cp[:, 2] = rng.integers(0, 1280, n)
    return [pts], [cp]


def test_tfrecord_walk_to_batches(tmp_path):
    cfg = get_config(str(tmp_path))
    cfg.dataset.batch_size = 2
    root = Path(cfg.dir.data.root)
    tf_dir = root / "bucket0" / "tf_0"
    tf_dir.mkdir(parents=True)

    # three records in one real tfrecord file
    with tf.io.TFRecordWriter(str(tf_dir / "segment.tfrecord")) as w:
        for seed in range(3):
            w.write(seed.to_bytes(4, "little"))

    waymo_to_arrays_offline(
        str(root / "bucket0"), idx_dataset_batch=0, store="both",
        frame_parser=_frame_parser, point_cloud_fn=_point_cloud,
        decode_image_fn=_decode_image,
    )

    # one file per FRONT frame in every subdir, reference filename scheme
    assert sorted(p.name for p in (tf_dir / "images").iterdir()) == [
        f"img_0_0_{i}_0.npz" for i in range(3)
    ]
    for sub, prefix in (("lidar", "lidar_"), ("heat_maps", "heat_map_"),
                        ("points", "points_"), ("labels", "labels_")):
        assert len(list((tf_dir / sub).iterdir())) == 3, sub

    # stored shapes + labels schema (incl. the Waymo length/width swap)
    with np.load(tf_dir / "images" / "img_0_0_1_0.npz") as z:
        assert z[z.files[0]].shape == (128, 192, 3)
    with np.load(tf_dir / "lidar" / "lidar_img_0_0_1_0.npz") as z:
        assert z[z.files[0]].shape == (128, 192, 1)
    with np.load(tf_dir / "heat_maps" / "heat_map_img_0_0_1_0.npz") as z:
        heat = z[z.files[0]]
        assert heat.shape == (128, 192, 3)
        assert heat.max() == 1.0  # the vehicle box rasterized
    with open(tf_dir / "labels" / "labels_img_0_0_1_0", "rb") as fh:
        labels = pickle.load(fh)
    assert labels["0"]["width"] == 200 and labels["0"]["height"] == 100

    # dense + raw serialization both produce loadable batches
    n_dense = save_data_in_batch(cfg, "bucket0", "train")
    assert n_dense == 1
    ds = WaymoDataset("train", cfg)
    img, lidar, ht = ds[0]
    assert img.shape == (2, 128, 192, 3) and ht.shape == (2, 128, 192, 3)

    n_raw = save_raw_data_in_batch(cfg, "bucket0", "val")
    assert n_raw == 1
    val = WaymoDataset("val", cfg)
    img_r, lidar_r, boxes_r = val[0]
    assert img_r.shape == (2, 128, 192, 3)
    assert lidar_r.shape == (2, 128, 192, 1)
    assert boxes_r.shape[0] == 2 and boxes_r.shape[2] == 5
    assert (boxes_r[:, :, 0] > 0).any()
