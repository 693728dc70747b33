"""Offline Waymo tfrecord -> array converter + batch serializer.

Rebuild of the reference ETL (``dmmfods/utils/Dense_U_Net_lidar_helper.py:403-728``):

* ``waymo_to_arrays_offline`` — walks ``tf_*`` dirs of ``.tfrecord`` files,
  keeps FRONT-camera frames only (helper.py:597-601), and per frame emits
    - RGB: jpeg decode -> 10x avg-pool -> ``(128, 192, 3)`` float32
      (helper.py:604-607),
    - LiDAR: range image -> point cloud -> camera projection (waymo-od
      library, helper.py:610-617) -> splat/bin/pool via the *vectorized
      device pipeline* in :mod:`dmmfods_tpu.ops.preprocess` — the reference's
      per-point Python loop (helper.py:503-513) replaced by scatter ops,
    - labels: bbox dicts ``{type, x, y, width, height}`` with the Waymo
      length/width swap (helper.py:633-639),
    - heat maps: rasterize + 10x max-pool (helper.py:643-646).
  Output is ``.npz`` per sample (torch-free); layout mirrors the reference
  (``images/ lidar/ labels/ heat_maps/`` subdirs, same filename scheme) so
  the dataset crawler works unchanged.

* ``save_data_in_batch`` — shuffles samples and packs
  ``(batch, 7, 128, 192)``-equivalent NHWC batches ``(batch, 128, 192, 7)``
  into one ``.npy`` per file with pickled label dicts, 99-file subdirs
  (helper.py:653-728).

TensorFlow + ``waymo_open_dataset`` are imported lazily: everything except
the tfrecord/proto parsing also works without them (and is unit-tested via
the synthetic path).
"""

from __future__ import annotations

import json
import os
import pickle
from os import listdir
from os.path import isdir, isfile, join
from pathlib import Path

import numpy as np

from ..ops import preprocess as pp


def _require_waymo():
    try:
        import tensorflow as tf  # noqa: F401
    except ImportError as exc:  # pragma: no cover
        raise ImportError(
            "waymo tfrecord conversion needs `tensorflow` installed; the "
            "rest of the framework (training on converted/synthetic data) "
            "does not."
        ) from exc
    # waymo_open_dataset itself is OPTIONAL: without it the vendored
    # wire-compatible proto subset + range-image decode take over
    # (data/waymo_decode.py)


def _have_waymo_od() -> bool:
    try:
        from waymo_open_dataset import dataset_pb2  # noqa: F401
        from waymo_open_dataset.utils import frame_utils  # noqa: F401
        return True
    except ImportError:
        return False


def extract_lidar_array_from_point_cloud(points, cp_points, camera_name=1):
    """3-D points + camera projections -> ``(N, 3)`` [x, y, range] for one
    camera (reference helper.py:517-537), numpy instead of TF ops."""
    points_all = np.concatenate(points, axis=0)
    cp_all = np.concatenate(cp_points, axis=0).astype(np.int64)
    ranges = np.linalg.norm(points_all, axis=-1, keepdims=True)
    mask = cp_all[..., 0] == camera_name  # FRONT camera == 1
    xy = cp_all[mask][:, 1:3].astype(np.float32)
    return np.concatenate([xy, ranges[mask].astype(np.float32)], axis=-1)


def labels_to_box_array(label_dict, max_boxes=64):
    """Reference label dicts -> padded int32 ``(max_boxes, 5)`` buffer for the
    vectorized rasterizer."""
    boxes = np.zeros((max_boxes, 5), np.int32)
    for i, elem in enumerate(label_dict.values()):
        if i >= max_boxes:
            break
        boxes[i] = [elem["type"], elem["x"], elem["y"], elem["width"], elem["height"]]
    return boxes


def frame_labels_to_dict(frame, image_name):
    """Camera labels of one frame -> the reference label-dict schema
    (helper.py:625-640), including the Waymo length/width swap."""
    label_dict = {}
    for camera_labels in frame.camera_labels:
        if camera_labels.name != image_name:
            continue
        for idx_label, label in enumerate(camera_labels.labels):
            label_dict[str(idx_label)] = {
                "type": label.type,
                "x": int(label.box.center_x - 0.5 * label.box.length),
                "y": int(label.box.center_y - 0.5 * label.box.width),
                "height": int(label.box.width),
                "width": int(label.box.length),
            }
    return label_dict


def convert_sample(np_img_hwc, lidar_array, label_dict, *,
                   height=1280, width=1920, max_points=200_000, splat_mode="last"):
    """One frame's raw pieces -> stored arrays (image, lidar, heat_map).

    All math runs through the jit-able device pipeline; shapes are padded
    static. Returns float32 NHWC-style arrays
    ``(128, 192, 3) / (128, 192, 1) / (128, 192, 3)`` for the default res.
    """
    img = pp.downsize_image(np.asarray(np_img_hwc, np.float32))

    pts = np.zeros((max_points, 3), np.float32)
    n = min(len(lidar_array), max_points)
    pts[:n] = lidar_array[:n]
    lidar = pp.lidar_points_to_model_input(pts, n, height, width, mode=splat_mode)

    boxes = labels_to_box_array(label_dict)
    heat = pp.rasterize_heatmaps_pooled(boxes, height, width, 10)
    return np.asarray(img), np.asarray(lidar), np.asarray(heat)


def convert_sample_raw(np_img_hwc, lidar_array, label_dict, *, max_boxes=64):
    """One frame's raw pieces -> raw-record arrays (image, points, boxes).

    The north-star storage format: instead of densifying LiDAR + heat maps
    offline (reference helper.py:604-646), keep the projected points and
    label boxes sparse; the splat runs in the host runtime's prefetch
    threads and the heat maps are rasterized in-graph on device
    (``trainer.make_train_step_ht``).
    """
    img = pp.downsize_image(np.asarray(np_img_hwc, np.float32))
    points = np.ascontiguousarray(lidar_array, np.float32)
    boxes = labels_to_box_array(label_dict, max_boxes)
    return np.asarray(img), points, boxes


def _waymo_frame_parser(data_bytes):
    """Serialized tfrecord payload -> ``Frame`` proto (helper.py:593-594).
    Uses the waymo-od proto when installed, else the vendored
    wire-compatible subset (``data/waymo_minimal.proto``)."""
    if _have_waymo_od():
        from waymo_open_dataset import dataset_pb2 as open_dataset

        frame = open_dataset.Frame()
        frame.ParseFromString(bytearray(data_bytes))
        return frame
    from . import waymo_decode

    return waymo_decode.parse_frame(data_bytes)


def _waymo_point_cloud_fn(frame):
    """Frame -> (points, cp_points) lists (helper.py:610-617) — the
    compute-heavy range-image decode. waymo-od library when installed, else
    the vendored decoder (same published math; see ``data/waymo_decode.py``
    for the one documented TOP-pose simplification)."""
    if _have_waymo_od() and "waymo_minimal" not in type(frame).__module__:
        from waymo_open_dataset.utils import frame_utils

        (range_images, camera_projections, _, range_image_top_pose
         ) = frame_utils.parse_range_image_and_camera_projection(frame)
        return frame_utils.convert_range_image_to_point_cloud(
            frame, range_images, camera_projections, range_image_top_pose
        )
    from . import waymo_decode

    return waymo_decode.decode_point_cloud(frame)


def _decode_jpeg(image_bytes):
    import tensorflow as tf

    return tf.image.decode_jpeg(image_bytes).numpy()


def convert_frame(frame, tf_data_path, stem, *, store="dense",
                  point_cloud_fn=None, decode_image_fn=None):
    """Convert one FRONT-camera frame and write its stored files.

    ``store``: ``"dense"`` writes the reference-equivalent layout
    (images/lidar/heat_maps/labels, helper.py:604-646); ``"raw"`` writes
    images/points/labels for the device/host-preprocessed training path;
    ``"both"`` writes both. Returns the number of camera images written.
    """
    point_cloud_fn = point_cloud_fn or _waymo_point_cloud_fn
    decode_image_fn = decode_image_fn or _decode_jpeg
    written = 0
    for image in frame.images:
        if image.name != 1:  # FRONT only (helper.py:600)
            continue
        np_img = decode_image_fn(image.image)
        points, cp_points = point_cloud_fn(frame)
        lidar_array = extract_lidar_array_from_point_cloud(points, cp_points)
        label_dict = frame_labels_to_dict(frame, image.name)

        if store in ("dense", "both"):
            img, lidar, heat = convert_sample(np_img, lidar_array, label_dict)
            np.savez_compressed(join(tf_data_path, "images", stem + ".npz"), img)
            np.savez_compressed(join(tf_data_path, "lidar", "lidar_" + stem + ".npz"), lidar)
            np.savez_compressed(
                join(tf_data_path, "heat_maps", "heat_map_" + stem + ".npz"), heat
            )
        if store in ("raw", "both"):
            img, pts, _ = convert_sample_raw(np_img, lidar_array, label_dict)
            if store == "raw":
                np.savez_compressed(join(tf_data_path, "images", stem + ".npz"), img)
            np.savez_compressed(join(tf_data_path, "points", "points_" + stem + ".npz"), pts)
        with open(join(tf_data_path, "labels", "labels_" + stem), "wb") as fh:
            pickle.dump(label_dict, fh, protocol=pickle.HIGHEST_PROTOCOL)
        written += 1
    return written


def waymo_to_arrays_offline(data_root="", idx_dataset_batch=-1, *,
                            config=None, small_dataset_for_testing=False,
                            store="dense", frame_parser=None,
                            point_cloud_fn=None, decode_image_fn=None):
    """The reference's ``waymo_to_pytorch_offline`` (helper.py:540-651) with
    ``.npz`` outputs and vectorized math. Walks ``data_root/tf_*/*.tfrecord``.

    The proto/pixel decoders are injectable (``frame_parser`` /
    ``point_cloud_fn`` / ``decode_image_fn``) so the walk itself is testable
    with stub frames when ``waymo_open_dataset`` is not installed; the
    defaults use the waymo-od library.
    """
    if frame_parser is None:
        _require_waymo()
        frame_parser = _waymo_frame_parser
    import tensorflow as tf

    if not data_root:
        from ..config import get_config

        config = config or get_config()
        data_root = config.dir.data.root

    subdirs = ("labels", "images", "lidar", "heat_maps") if store == "dense" else (
        ("labels", "images", "points") if store == "raw"
        else ("labels", "images", "lidar", "heat_maps", "points"))
    tf_dirs = [tfd for tfd in os.listdir(data_root) if tfd.startswith("tf_")]
    for idx_tf_dir, tf_dir in enumerate(tf_dirs):
        tf_data_path = os.path.join(data_root, tf_dir)
        for file in os.listdir(tf_data_path):
            if not file.endswith(".tfrecord"):
                continue
            for sub in subdirs:
                Path(tf_data_path, sub).mkdir(exist_ok=True)

            dataset = tf.data.TFRecordDataset(
                os.path.join(tf_data_path, file), compression_type=""
            )
            idx_data = -1
            for idx_data, data in enumerate(dataset):
                frame = frame_parser(data.numpy())
                stem = f"img_{idx_dataset_batch}_{idx_tf_dir}_{idx_data}_0"
                convert_frame(
                    frame, tf_data_path, stem, store=store,
                    point_cloud_fn=point_cloud_fn,
                    decode_image_fn=decode_image_fn,
                )
                if small_dataset_for_testing and idx_data == 9:
                    return 1
            print(idx_data + 1, " IMAGES PROCESSED")


def save_data_in_batch(config, buckets, mode, *, rng=None):
    """Shuffle converted samples and pack serialized batches
    (reference helper.py:653-728). Batches are stored channel-last
    ``(batch, 128, 192, 7)`` float32 ``.npy`` (channels: 3 RGB, 1 LiDAR,
    3 heat map) with pickled label dicts, in 99-file subdirs."""
    final_dirs = ["train", "val", "test"]
    if mode not in final_dirs:
        raise ValueError("mode must be one of train, val, test. You gave " + mode)
    if isinstance(buckets, str):
        buckets = [buckets]

    files = []
    for bucket in buckets:
        tf_dirs = [t for t in listdir(join(config.dir.data.root, bucket)) if t.startswith("tf_")]
        for tf_dir in tf_dirs:
            rel = join(bucket, tf_dir, "images")
            full = join(config.dir.data.root, rel)
            if isdir(full):
                files += [join(rel, f) for f in sorted(listdir(full))]

    rng = rng or np.random.default_rng(0)
    indices = np.arange(len(files))
    rng.shuffle(indices)

    bs = config.dataset.batch_size
    _, w, h = config.dataset.images.size  # (C, W, H) reference convention
    vec = np.empty((bs, h, w, 7), np.float32)

    mode_path = join(config.dir.data.root, mode)
    Path(mode_path).mkdir(exist_ok=True)

    def load(path):
        from .waymo import _load_array, _to_nhwc

        return _to_nhwc(_load_array(path))

    num_batches = len(indices) // bs
    for i in range(num_batches):
        if i % 99 == 0:
            save_dir_batch = join(mode_path, "subset" + str(i // 99))
            save_dir_labels = join(save_dir_batch, "labels")
            Path(save_dir_batch).mkdir(exist_ok=True)
            Path(save_dir_labels).mkdir(exist_ok=True)

        batch_dict = {}
        for j in range(bs):
            idx = indices[i * bs + j]
            path, image = files[idx].split("images/img_")
            root = config.dir.data.root
            vec[j, :, :, :3] = load(join(root, files[idx]))
            vec[j, :, :, 3:4] = load(join(root, path, "lidar", "lidar_img_" + image))
            vec[j, :, :, 4:] = load(join(root, path, "heat_maps", "heat_map_img_" + image))
            stem = image.replace(".npz", "").replace(".npy", "")
            with open(join(root, path, "labels", "labels_img_" + stem), "rb") as fh:
                batch_dict[j] = pickle.load(fh)

        np.save(join(save_dir_batch, f"{i % 99}.npy"), vec)
        with open(join(save_dir_labels, str(i % 99)), "wb") as fh:
            pickle.dump(batch_dict, fh, protocol=pickle.HIGHEST_PROTOCOL)
    return num_batches


def save_raw_data_in_batch(config, buckets, mode, *, rng=None, max_boxes=64):
    """Raw-record twin of :func:`save_data_in_batch`: shuffle converted
    samples and pack batches of (RGB, ragged LiDAR points, label boxes) into
    one *uncompressed* ``.npz`` per file (fast to load in prefetch threads),
    99-file subdirs, same ``mode/subsetK/{i}.npz`` layout so the dataset
    crawler works unchanged.

    Keys per file: ``images (B, h, w, 3) f32``, ``points (sum_n, 3) f32``,
    ``offsets (B+1,) i64`` (sample i owns ``points[offsets[i]:offsets[i+1]]``),
    ``boxes (B, max_boxes, 5) i32``.
    """
    final_dirs = ["train", "val", "test"]
    if mode not in final_dirs:
        raise ValueError("mode must be one of train, val, test. You gave " + mode)
    if isinstance(buckets, str):
        buckets = [buckets]

    files = []
    for bucket in buckets:
        tf_dirs = [t for t in listdir(join(config.dir.data.root, bucket)) if t.startswith("tf_")]
        for tf_dir in tf_dirs:
            rel = join(bucket, tf_dir, "images")
            full = join(config.dir.data.root, rel)
            if isdir(full):
                files += [join(rel, f) for f in sorted(listdir(full))]

    rng = rng or np.random.default_rng(0)
    indices = np.arange(len(files))
    rng.shuffle(indices)

    bs = config.dataset.batch_size
    _, w, h = config.dataset.images.size  # (C, W, H) reference convention
    mode_path = join(config.dir.data.root, mode)
    Path(mode_path).mkdir(exist_ok=True)

    def load(path):
        from .waymo import _load_array, _to_nhwc

        return _to_nhwc(_load_array(path))

    root = config.dir.data.root
    num_batches = len(indices) // bs
    save_dir_batch = mode_path
    for i in range(num_batches):
        if i % 99 == 0:
            save_dir_batch = join(mode_path, "subset" + str(i // 99))
            Path(save_dir_batch).mkdir(exist_ok=True)

        images = np.empty((bs, h, w, 3), np.float32)
        boxes = np.zeros((bs, max_boxes, 5), np.int32)
        point_chunks = []
        offsets = np.zeros(bs + 1, np.int64)
        for j in range(bs):
            idx = indices[i * bs + j]
            path, image = files[idx].split("images/img_")
            images[j] = load(join(root, files[idx]))
            stem = image.replace(".npz", "").replace(".npy", "")
            pts_base = join(root, path, "points", "points_img_" + stem)
            pts_path = pts_base + (".npz" if isfile(pts_base + ".npz") else ".npy")
            loaded = np.load(pts_path)
            if isinstance(loaded, np.lib.npyio.NpzFile):
                with loaded:
                    loaded = loaded[loaded.files[0]]
            pts = np.asarray(loaded, np.float32).reshape(-1, 3)
            point_chunks.append(pts)
            offsets[j + 1] = offsets[j] + len(pts)
            with open(join(root, path, "labels", "labels_img_" + stem), "rb") as fh:
                boxes[j] = labels_to_box_array(pickle.load(fh), max_boxes)

        points = (np.concatenate(point_chunks, axis=0) if point_chunks
                  else np.zeros((0, 3), np.float32))
        np.savez(
            join(save_dir_batch, f"{i % 99}.npz"),
            images=images, points=points, offsets=offsets, boxes=boxes,
        )
    return num_batches
