"""Tests for the data layer: dataset crawling + file-list caching, prefetch
loader, serialized-batch round trips, native C++ IO, the detection adapter,
and the converter's non-waymo math."""

import json
import pickle
from pathlib import Path

import numpy as np
import pytest

from dmmfods_tpu.config import get_config
from dmmfods_tpu.data.waymo import PrefetchLoader, WaymoDataset, WaymoDataset_Loader


def _make_batched_layout(root, mode="train", files_per_subset=3, n=4, h=16, w=24,
                         rng=None, fmt="npy"):
    """Write a reference-layout batched dataset: mode/subsetK/{0..}.npy + labels."""
    rng = rng or np.random.default_rng(0)
    subset = Path(root) / mode / "subset0"
    (subset / "labels").mkdir(parents=True, exist_ok=True)
    arrays = []
    for i in range(files_per_subset):
        a = rng.random((n, h, w, 7)).astype(np.float32)
        arrays.append(a)
        np.save(subset / f"{i}.npy", a)
        labels = {
            j: {"0": {"type": 1, "x": 10, "y": 10, "width": 40, "height": 30}}
            for j in range(n)
        }
        with open(subset / "labels" / str(i), "wb") as fh:
            pickle.dump(labels, fh)
    return arrays


@pytest.fixture()
def batched_config(tmp_path):
    cfg = get_config(str(tmp_path))
    Path(cfg.dir.data.root).mkdir(parents=True, exist_ok=True)
    return cfg


def test_dataset_crawl_and_file_list_cache(batched_config):
    cfg = batched_config
    arrays = _make_batched_layout(cfg.dir.data.root, "train")
    ds = WaymoDataset("train", cfg)
    assert len(ds) == 3
    img, lidar, ht = ds[0]
    assert img.shape == (4, 16, 24, 3)
    assert lidar.shape == (4, 16, 24, 1)
    assert ht.shape == (4, 16, 24, 3)
    # file list was cached as json (reference WaymoData.py:31-45)
    cache = Path(cfg.dir.data.file_lists) / ("train_" + cfg.dataset.file_list_name)
    assert cache.exists()
    cached = json.loads(cache.read_text())
    assert len(cached) == 3
    # second construction loads from cache
    ds2 = WaymoDataset("train", cfg)
    assert ds2.files == ds.files


def test_batched_loader_requires_none_batch_size(batched_config):
    cfg = batched_config
    _make_batched_layout(cfg.dir.data.root, "train")
    cfg.loader.batch_size = 8
    with pytest.raises(ValueError):
        WaymoDataset("train", cfg)


def test_prefetch_loader_batched(batched_config):
    cfg = batched_config
    arrays = _make_batched_layout(cfg.dir.data.root, "train")
    _make_batched_layout(cfg.dir.data.root, "val", files_per_subset=2)
    loader = WaymoDataset_Loader(cfg)
    assert loader.train_iterations == 3
    assert loader.valid_iterations == 2
    batches = list(loader.train_loader)
    assert len(batches) == 3
    total = np.stack(sorted([float(b[0].sum()) for b in batches]))
    ref = np.stack(sorted([float(a[..., :3].sum()) for a in arrays]))
    np.testing.assert_allclose(total, ref, rtol=1e-5)


def test_prefetch_loader_single_sample_batching(tmp_path):
    from dmmfods_tpu.data.synthetic import SyntheticDataset

    class SingleDs:
        data_is_batched = False

        def __init__(self):
            self._items = [
                (np.full((8, 8, 3), i, np.float32),
                 np.full((8, 8, 1), i, np.float32),
                 np.full((8, 8, 3), i, np.float32))
                for i in range(5)
            ]

        def __len__(self):
            return 5

        def __getitem__(self, i):
            return self._items[i]

    loader = PrefetchLoader(SingleDs(), batch_size=2)
    batches = list(loader)
    assert [b[0].shape[0] for b in batches] == [2, 2, 1]
    loader_drop = PrefetchLoader(SingleDs(), batch_size=2, drop_last=True)
    assert [b[0].shape[0] for b in loader_drop] == [2, 2]


def test_native_io_roundtrip(tmp_path):
    native_io = pytest.importorskip("dmmfods_tpu.data.native_io")
    if not native_io.available():
        pytest.skip("native lib not built")
    rng = np.random.default_rng(1)
    a = rng.random((2, 8, 12, 7)).astype(np.float32)
    p = tmp_path / "b.npy"
    np.save(p, a)
    img, lidar, ht = native_io.load_batch(p)
    np.testing.assert_array_equal(img, a[..., :3])
    np.testing.assert_array_equal(lidar, a[..., 3:4])
    np.testing.assert_array_equal(ht, a[..., 4:])
    # legacy NCHW file
    b = rng.random((2, 7, 8, 12)).astype(np.float32)
    p2 = tmp_path / "b2.npy"
    np.save(p2, b)
    img2, _, ht2 = native_io.load_batch(p2)
    ref = np.transpose(b, (0, 2, 3, 1))
    np.testing.assert_array_equal(img2, ref[..., :3])
    np.testing.assert_array_equal(ht2, ref[..., 4:])
    # threaded prefetcher yields every file exactly once
    pf = native_io.NativePrefetcher([p, p2, p], depth=2, num_threads=2)
    assert len(list(pf)) == 3
    pf.close()


def test_native_prefetcher_mixed_sizes(tmp_path):
    """Buffers are sized from each batch's own header (a short final pack or
    a larger later file must not read into a first-file-sized buffer)."""
    native_io = pytest.importorskip("dmmfods_tpu.data.native_io")
    if not native_io.available():
        pytest.skip("native lib not built")
    rng = np.random.default_rng(7)
    files, refs = [], {}
    for i, n in enumerate([2, 5, 1]):  # larger file AFTER a smaller one
        a = rng.random((n, 8, 12, 7)).astype(np.float32)
        p = tmp_path / f"m{i}.npy"
        np.save(p, a)
        files.append(p)
        refs[n] = a
    got = {img.shape[0]: (img, lidar, ht)
           for img, lidar, ht in native_io.NativePrefetcher(files, depth=3, num_threads=2)}
    assert sorted(got) == [1, 2, 5]
    for n, (img, lidar, ht) in got.items():
        np.testing.assert_array_equal(img, refs[n][..., :3])
        np.testing.assert_array_equal(lidar, refs[n][..., 3:4])
        np.testing.assert_array_equal(ht, refs[n][..., 4:])


def test_detection_adapter(batched_config):
    cfg = batched_config
    _make_batched_layout(cfg.dir.data.root, "train", n=4)
    _make_batched_layout(cfg.dir.data.root, "val", files_per_subset=1, n=4)
    from dmmfods_tpu.data.detection import DetectionWaymoDataset

    cfg.dataset.batch_size = 32  # keep batched-storage flag on
    ds = DetectionWaymoDataset("train", cfg, minibatch_size=2)
    img, lidar, ht, targets = ds[0]
    assert img.shape[0] == 2 and img.max() <= 1.0  # /255 normalization
    assert len(targets) == 2
    t = targets[0]
    assert t.boxes.shape[1] == 4
    # boxes were rescaled /10 (reference FasterRCNNData.py:68)
    np.testing.assert_allclose(t.boxes[0], [1.0, 1.0, 5.0, 4.0])
    assert t.masks.shape[1:] == (16, 24)


def test_instance_mask_evaluation_consumes_detection_adapter(batched_config):
    """The detection adapter's instance-mask targets now have a consumer:
    evaluate_instance_masks scores a detector per instance. A perfect
    detector (echoes the GT masks) gets IoU == recall == 1; an empty
    detector gets 0 where instances exist."""
    cfg = batched_config
    _make_batched_layout(cfg.dir.data.root, "train", n=4)
    from dmmfods_tpu.agents.detection_baseline import (
        DetectionBaselineAgent, evaluate_instance_masks,
    )
    from dmmfods_tpu.data.detection import DetectionWaymoDataset

    cfg.dataset.batch_size = 32
    ds = DetectionWaymoDataset("train", cfg, minibatch_size=2)
    img, lidar, ht, targets = ds[0]

    perfect = [
        {"masks": t.masks, "labels": t.labels, "scores": np.ones(len(t.labels))}
        for t in targets
    ]
    r = evaluate_instance_masks(perfect, targets)
    assert (r["recall_per_class"][r["num_instances_per_class"] > 0] == 1).all()
    assert (r["mask_iou_per_class"][r["num_instances_per_class"] > 0] == 1).all()

    empty = [
        {"masks": np.zeros((0, 16, 24)), "labels": np.zeros((0,), np.int64)}
        for _ in targets
    ]
    r0 = evaluate_instance_masks(empty, targets)
    has = r0["num_instances_per_class"] > 0
    # planted masks are non-empty, so an empty detector scores 0 there
    assert (r0["mask_iou_per_class"][has] < 1).all()

    # agent-level wiring over the loader
    class EchoDetector:
        def __init__(self):
            self.targets = None

        def __call__(self, image, lidar):
            return self.echo

    det = EchoDetector()
    agent = DetectionBaselineAgent(cfg, det)

    class OneBatch:
        def __iter__(self):
            det.echo = perfect
            yield img, lidar, ht, targets

    result = agent.validate_instances(OneBatch())
    assert (result["recall_per_class"][result["num_instances_per_class"] > 0] == 1).all()


def test_mask_to_heatmap_bridge():
    from dmmfods_tpu.agents.detection_baseline import instance_masks_to_heatmaps

    masks = np.zeros((3, 8, 8), np.float32)
    masks[0, :4, :4] = 0.9   # class 0
    masks[1, 2:6, 2:6] = 0.6  # class 0 (overlapping)
    masks[2, 5:, 5:] = 0.8   # class 2
    labels = np.array([0, 0, 2])
    hm = np.asarray(instance_masks_to_heatmaps(masks, labels, 3))
    assert hm.shape == (8, 8, 3)
    assert hm[3, 3, 0] == pytest.approx(0.9)  # max over overlapping instances
    assert hm[5, 5, 2] == pytest.approx(0.8)
    assert hm[:, :, 1].max() == 0.0
    # score filtering drops low-confidence instances
    hm2 = np.asarray(
        instance_masks_to_heatmaps(masks, labels, 3, scores=np.array([0.9, 0.1, 0.9]),
                                   score_threshold=0.5)
    )
    assert hm2[4, 4, 0] == 0.0  # the 0.6 mask was dropped


def test_converter_sample_math():
    """convert_sample end-to-end without waymo deps."""
    from dmmfods_tpu.data.converter import convert_sample, labels_to_box_array

    rng = np.random.default_rng(2)
    img_full = rng.integers(0, 255, (1280, 1920, 3)).astype(np.float32)
    pts = np.stack([
        rng.uniform(0, 1920, 1000), rng.uniform(0, 1280, 1000),
        rng.uniform(1, 70, 1000)
    ], axis=1).astype(np.float32)
    labels = {"0": {"type": 1, "x": 100, "y": 200, "width": 300, "height": 150}}
    img, lidar, heat = convert_sample(img_full, pts, labels, max_points=2048)
    assert img.shape == (128, 192, 3)
    assert lidar.shape == (128, 192, 1)
    assert heat.shape == (128, 192, 3)
    # the vehicle box covers pooled region ~ [20:35, 10:40] in channel 0
    assert heat[:, :, 0].max() == 1.0
    assert heat[25, 20, 0] == 1.0
    boxes = labels_to_box_array(labels)
    assert boxes[0].tolist() == [1, 100, 200, 300, 150]


def test_batch_serializer_round_trip(tmp_path):
    """converter.save_data_in_batch output loads through WaymoDataset."""
    import pickle

    from dmmfods_tpu.data.converter import save_data_in_batch

    cfg = get_config(str(tmp_path))
    root = Path(cfg.dir.data.root)
    rng = np.random.default_rng(0)
    # per-sample converted layout: bucket/tf_x/{images,lidar,heat_maps,labels}
    h, w = 16, 24
    cfg.dataset.images.size = (3, w, h)
    cfg.dataset.batch_size = 4
    tfdir = root / "bucket0" / "tf_0"
    for sub in ("images", "lidar", "heat_maps", "labels"):
        (tfdir / sub).mkdir(parents=True, exist_ok=True)
    for i in range(8):
        stem = f"img_0_0_{i}_0"
        np.save(tfdir / "images" / (stem + ".npy"),
                rng.random((h, w, 3)).astype(np.float32))
        np.save(tfdir / "lidar" / ("lidar_" + stem + ".npy"),
                rng.random((h, w, 1)).astype(np.float32))
        np.save(tfdir / "heat_maps" / ("heat_map_" + stem + ".npy"),
                rng.random((h, w, 3)).astype(np.float32))
        with open(tfdir / "labels" / ("labels_" + stem), "wb") as fh:
            pickle.dump({"0": {"type": 1, "x": 1, "y": 2, "width": 30, "height": 40}}, fh)

    n = save_data_in_batch(cfg, "bucket0", "train")
    assert n == 2  # 8 samples / batch 4

    ds = WaymoDataset("train", cfg)
    assert len(ds) == 2
    img, lidar, ht = ds[0]
    assert img.shape == (4, h, w, 3)
    assert lidar.shape == (4, h, w, 1)
    assert ht.shape == (4, h, w, 3)


def test_host_splat_parity_native_and_numpy():
    """C++ + numpy host splats match the jax direct-to-pooled pipeline
    (ops/preprocess.py::lidar_points_to_model_input_pooled) exactly —
    including out-of-frame points, footprint edge clamps, and empty samples."""
    from dmmfods_tpu.data import host_preprocess, native_io
    from dmmfods_tpu.ops import preprocess as pp

    h, w = 160, 120
    rng = np.random.default_rng(7)
    counts = [500, 0, 37]
    pts = []
    for n in counts:
        p = np.stack([
            rng.uniform(-15, w + 15, n),     # x incl. out-of-frame
            rng.uniform(-15, h + 15, n),
            rng.uniform(0.5, 90, n),         # distances incl. >75 clip
        ], axis=-1).astype(np.float32)
        pts.append(p)
    concat = np.concatenate(pts, axis=0)
    offsets = np.cumsum([0] + counts)

    expected = []
    for p in pts:
        pad = np.zeros((600, 3), np.float32)
        pad[:len(p)] = p
        expected.append(np.asarray(
            pp.lidar_points_to_model_input_pooled(pad, len(p), h, w)))
    expected = np.stack(expected)

    got_np = host_preprocess._splat_pooled_batch_numpy(concat, offsets, h, w)
    np.testing.assert_allclose(got_np, expected, atol=1e-5)

    if native_io.available():
        got_c = native_io.splat_pooled_batch(concat, offsets, h, w, num_threads=2)
        np.testing.assert_array_equal(got_c, got_np)
        one = native_io.splat_pooled(pts[0], h, w)
        np.testing.assert_array_equal(one, got_c[0])


def test_raw_batch_serializer_round_trip(tmp_path):
    """converter.save_raw_data_in_batch output loads through WaymoDataset in
    both splat modes; the host-splat lidar equals the jax pooled pipeline."""
    import copy
    import pickle

    from dmmfods_tpu.data.converter import save_raw_data_in_batch
    from dmmfods_tpu.ops import preprocess as pp

    cfg = get_config(str(tmp_path))
    root = Path(cfg.dir.data.root)
    rng = np.random.default_rng(3)
    h, w = 16, 24
    full_h, full_w = h * 10, w * 10
    cfg.dataset.images.size = (3, w, h)
    cfg.dataset.images["original.size"] = (3, full_w, full_h)
    cfg.dataset.batch_size = 4
    tfdir = root / "bucket0" / "tf_0"
    for sub in ("images", "points", "labels"):
        (tfdir / sub).mkdir(parents=True, exist_ok=True)
    for i in range(8):
        stem = f"img_0_0_{i}_0"
        np.save(tfdir / "images" / (stem + ".npy"),
                rng.random((h, w, 3)).astype(np.float32))
        n = int(rng.integers(10, 200))
        pts = np.stack([
            rng.uniform(0, full_w, n), rng.uniform(0, full_h, n),
            rng.uniform(0.5, 80, n),
        ], axis=-1).astype(np.float32)
        np.savez(tfdir / "points" / ("points_" + stem + ".npz"), pts)
        with open(tfdir / "labels" / ("labels_" + stem), "wb") as fh:
            pickle.dump({"0": {"type": 1, "x": 8, "y": 12, "width": 30, "height": 40}}, fh)

    n_batches = save_raw_data_in_batch(cfg, "bucket0", "train")
    assert n_batches == 2

    # host-splat mode (default): batch is (image, lidar, boxes)
    ds = WaymoDataset("train", cfg)
    assert len(ds) == 2
    img, lidar, boxes = ds[0]
    assert img.shape == (4, h, w, 3)
    assert lidar.shape == (4, h, w, 1)
    assert boxes.shape == (4, 64, 5)
    assert boxes.dtype == np.int32
    assert (boxes[:, 0, 0] == 1).all()

    # lidar matches the jax pooled pipeline for the stored points
    with np.load(root / ds.files[0]) as z:
        pts_c, offs = z["points"], z["offsets"]
    pad = np.zeros((256, 3), np.float32)
    nv = offs[1] - offs[0]
    pad[:nv] = pts_c[offs[0]:offs[1]]
    expected = np.asarray(
        pp.lidar_points_to_model_input_pooled(pad, nv, full_h, full_w))
    np.testing.assert_allclose(lidar[0], expected, atol=1e-5)

    # device-splat mode: batch is (image, points, num_valid, boxes)
    cfg2 = copy.deepcopy(cfg)
    cfg2.tpu.splat = "device"
    cfg2.tpu.max_points = 256
    ds2 = WaymoDataset("train", cfg2)
    img2, points, num_valid, boxes2 = ds2[0]
    assert points.shape == (4, 256, 3)
    assert num_valid.shape == (4,)
    assert (num_valid > 0).all()
    np.testing.assert_array_equal(img2, img)
    np.testing.assert_array_equal(boxes2, boxes)
    np.testing.assert_array_equal(points[0, :num_valid[0]], pts_c[offs[0]:offs[1]])


def test_native_raw_prefetcher_matches_python_path(tmp_path):
    """The C++ raw-record read-ahead (decode + in-thread splat,
    native/dmmfods_io.cpp) yields byte-identical batches to the Python
    WaymoDataset raw path, and PrefetchLoader auto-selects it."""
    import pickle

    from dmmfods_tpu.data import native_io
    from dmmfods_tpu.data.converter import save_raw_data_in_batch

    if not native_io.available():
        pytest.skip("native IO library unavailable")

    cfg = get_config(str(tmp_path))
    root = Path(cfg.dir.data.root)
    rng = np.random.default_rng(11)
    h, w = 16, 24
    full_h, full_w = h * 10, w * 10
    cfg.dataset.images.size = (3, w, h)
    cfg.dataset.images["original.size"] = (3, full_w, full_h)
    cfg.dataset.batch_size = 2
    tfdir = root / "bucket0" / "tf_0"
    for sub in ("images", "points", "labels"):
        (tfdir / sub).mkdir(parents=True, exist_ok=True)
    for i in range(6):
        stem = f"img_0_0_{i}_0"
        np.save(tfdir / "images" / (stem + ".npy"),
                rng.random((h, w, 3)).astype(np.float32))
        n = int(rng.integers(0, 150))  # includes an empty-ish sample range
        pts = np.stack([
            rng.uniform(-10, full_w + 10, n), rng.uniform(-10, full_h + 10, n),
            rng.uniform(0.5, 90, n),
        ], axis=-1).astype(np.float32)
        np.savez(tfdir / "points" / ("points_" + stem + ".npz"), pts)
        with open(tfdir / "labels" / ("labels_" + stem), "wb") as fh:
            pickle.dump({"0": {"type": 4, "x": 8, "y": 12, "width": 30,
                               "height": 40}}, fh)
    assert save_raw_data_in_batch(cfg, "bucket0", "train") == 3

    ds = WaymoDataset("train", cfg)
    py_batches = [ds[i] for i in range(len(ds))]

    paths = [root / f for f in ds.files]
    pf = native_io.NativeRawPrefetcher(paths, (full_h, full_w), depth=2)
    native_batches = list(pf)
    pf.close()
    assert len(native_batches) == len(py_batches)
    for (pi, pl, pb), (ni, nl, nb) in zip(py_batches, native_batches):
        np.testing.assert_array_equal(ni, pi)
        np.testing.assert_array_equal(nl, pl)
        np.testing.assert_array_equal(nb, pb)

    # the loader auto-selects the raw native path for .npz + host splat
    loader = PrefetchLoader(ds, native_prefetch=True)
    assert loader._native_paths() is not None
    assert loader._native_paths()[1] == "raw"
    got = list(iter(loader))
    assert len(got) == len(py_batches)
    np.testing.assert_array_equal(got[0][1], py_batches[0][1])


def test_native_prefetcher_preserves_order_under_thread_races(tmp_path):
    """Reader threads finish out of submission order (sizes vary 100x); the
    prefetcher must still deliver batches in paths[] order — training
    determinism depends on it. Regression for the completion-order bug."""
    from dmmfods_tpu.data import native_io

    if not native_io.available():
        pytest.skip("native IO library unavailable")

    rng = np.random.default_rng(3)
    paths = []
    markers = []
    for i in range(24):
        # alternate tiny and large planes so a small file submitted later
        # reliably finishes before a big one submitted earlier
        h, w = (8, 8) if i % 2 else (128, 192)
        a = rng.random((2, h, w, 7)).astype(np.float32)
        a[0, 0, 0, 0] = float(i)  # order marker in the image channel
        p = tmp_path / f"{i}.npy"
        np.save(p, a)
        paths.append(p)
        markers.append(float(i))

    pf = native_io.NativePrefetcher(paths, depth=3, num_threads=4)
    got = [float(img[0, 0, 0, 0]) for img, _, _ in pf]
    pf.close()
    assert got == markers


def test_detection_train_loader_shuffles_file_major(batched_config):
    """VERDICT r3 #8: the detection TRAIN loader must reshuffle every epoch
    (the reference only shuffles once at serialization, helper.py:687), and
    the shuffled order must stay file-major so the one-file minibatch cache
    never thrashes."""
    cfg = batched_config
    _make_batched_layout(cfg.dir.data.root, "train", n=4)
    _make_batched_layout(cfg.dir.data.root, "val", files_per_subset=1, n=4)
    from dmmfods_tpu.data.detection import (
        DetectionWaymoDataset, DetectionWaymoLoader,
    )

    cfg.dataset.batch_size = 32
    cfg.loader.mode = "train"
    loader = DetectionWaymoLoader(cfg, minibatch_size=2)
    assert loader.train_loader.shuffle
    assert not loader.valid_loader.shuffle

    ds = DetectionWaymoDataset("train", cfg, minibatch_size=2)
    per_file = ds.minibatches_per_file()
    assert per_file == 2  # 4-sample fixture files / minibatch 2
    assert len(ds) == len(ds.files) * per_file

    rng = np.random.default_rng(3)
    order1 = ds.shuffle_order(rng)
    order2 = ds.shuffle_order(rng)
    assert sorted(order1.tolist()) == list(range(len(ds)))
    assert order1.tolist() != order2.tolist()  # reshuffled across epochs
    # file-major: indices of the same file are contiguous in the order
    files_seen = [int(i) // per_file for i in order1]
    boundaries = [f for i, f in enumerate(files_seen)
                  if i == 0 or files_seen[i - 1] != f]
    assert len(boundaries) == len(ds.files)  # each file visited exactly once

    # the PrefetchLoader actually uses the file-major order
    from dmmfods_tpu.data.waymo import PrefetchLoader

    pl = PrefetchLoader(ds, shuffle=True, seed=7)
    groups = pl._index_groups()
    flat = [g[0] for g in groups]
    files_seen = [i // per_file for i in flat]
    boundaries = [f for i, f in enumerate(files_seen)
                  if i == 0 or files_seen[i - 1] != f]
    assert len(boundaries) == len(ds.files)


def test_instance_ap_accumulator_known_values():
    """mAP@0.5 over scored instances: hand-built case with one TP above one
    FP in score order -> AP = precision at the TP = 1.0 for class 0 when the
    TP outranks the FP, and 0.5 when the FP outranks it."""
    from dmmfods_tpu.agents.detection_baseline import (
        DetectionTargets, InstanceAPAccumulator,
    )

    h, w = 8, 8
    gt_mask = np.zeros((h, w), np.float32)
    gt_mask[:4, :4] = 1.0
    far_mask = np.zeros((h, w), np.float32)
    far_mask[6:, 6:] = 1.0
    target = DetectionTargets(
        boxes=np.zeros((1, 4), np.float32),
        labels=np.array([0]),
        masks=gt_mask[None],
    )

    # TP scored above FP: precision at the (first-ranked) TP is 1/1
    acc = InstanceAPAccumulator(num_classes=3)
    acc.update(
        [{"masks": np.stack([gt_mask, far_mask]),
          "labels": np.array([0, 0]),
          "scores": np.array([0.9, 0.8])}],
        [target],
    )
    ap = acc.result()
    assert ap[0] == 1.0 and ap[1] == 0.0 and ap[2] == 0.0

    # FP scored above TP: the TP sits at rank 2 -> precision 1/2
    acc2 = InstanceAPAccumulator(num_classes=3)
    acc2.update(
        [{"masks": np.stack([far_mask, gt_mask]),
          "labels": np.array([0, 0]),
          "scores": np.array([0.9, 0.8])}],
        [target],
    )
    assert acc2.result()[0] == 0.5

    # a second GT instance never found halves the recall ceiling: AP = 0.5
    acc3 = InstanceAPAccumulator(num_classes=3)
    two_gt = DetectionTargets(
        boxes=np.zeros((2, 4), np.float32),
        labels=np.array([0, 0]),
        masks=np.stack([gt_mask, far_mask]),
    )
    acc3.update(
        [{"masks": gt_mask[None], "labels": np.array([0]),
          "scores": np.array([0.9])}],
        [two_gt],
    )
    assert acc3.result()[0] == 0.5

    # duplicate detection of one GT: second match is a FP (greedy claim)
    acc4 = InstanceAPAccumulator(num_classes=3)
    acc4.update(
        [{"masks": np.stack([gt_mask, gt_mask]),
          "labels": np.array([0, 0]),
          "scores": np.array([0.9, 0.8])}],
        [target],
    )
    assert acc4.result()[0] == 1.0  # AP counts precision at TPs only
    assert acc4.is_tp[0] == [True, False]
