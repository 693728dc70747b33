"""Parity tests for the device-side preprocessing math against independent
numpy/torch oracles implementing the reference formulas (SURVEY.md §2 rows
9/11: helper.py:233-305 rasterizer, helper.py:446-515 lidar path)."""

import numpy as np
import pytest
import torch

from dmmfods_tpu.ops import preprocess as pp


# ---------------------------------------------------------------------------
# oracles (straight from the documented formulas)
# ---------------------------------------------------------------------------


def oracle_pedestrian_box(h, w):
    """Pedestrian silhouette prior (helper.py:233-252)."""
    box = np.ones((h, w))
    hf, wf = h // 5, w // 4
    box[0:hf, :wf] = 0.3
    box[0:hf, wf * 3:] = 0.3
    box[hf * 3:, :wf] = 0.5
    box[hf * 3:, wf * 3:] = 0.5
    box[hf * 3:, wf:wf * 3] = 0.75
    return box


def oracle_heatmaps(boxes, height, width):
    """Sequential-overwrite rasterizer (helper.py:276-305), channel-first."""
    maps = np.zeros((3, height, width))
    for btype, x, y, w, h in boxes:
        if btype not in (1, 2, 4):
            continue
        ch = {1: 0, 2: 1, 4: 2}[btype]
        fill = oracle_pedestrian_box(h, w) if btype == 2 else np.ones((h, w))
        ys, ye = max(y, 0), min(y + h, height)
        xs, xe = max(x, 0), min(x + w, width)
        maps[ch, ys:ye, xs:xe] = fill[ys - y:ye - y, xs - x:xe - x]
    return maps


def oracle_lidar_splat(points, height, width, k=5):
    """Sequential-overwrite 5x5 splat (helper.py:493-515), incl. the
    last-row/col clamp quirk."""
    shift = (k - 1) // 2
    img = np.full((height, width), -1.0, np.float32)
    for x, y, d in points:
        min_y = max(int(y - shift), 0)
        max_y = min(int(y + shift + 1), height - 1)
        min_x = max(int(x - shift), 0)
        max_x = min(int(x + shift + 1), width - 1)
        img[min_y:max_y, min_x:max_x] = d
    return img


def oracle_pool_lidar(img):
    """Bin + (20,10)/s10 maxpool + replicate pad + clamp (helper.py:446-491),
    using torch ops as the pooling oracle."""
    x = torch.tensor(img, dtype=torch.float32).clone()
    x[x > 75.0] = 75.0
    x[x == -1.0] = 76.0
    close = x <= 25.0
    x[close] = x[close] * -6.2 + 255.0
    far = (x > 25.0) & (x <= 76.0)
    x[far] = x[far] * -2.0 + 150.0
    x = torch.nn.MaxPool2d((20, 10), stride=(10, 10))(x.unsqueeze(0))
    x = torch.nn.functional.pad(x.unsqueeze(0), pad=(0, 0, 0, 1), mode="replicate").squeeze(0)
    x[x < 0] = 0.0
    return x.squeeze(0).numpy()


# ---------------------------------------------------------------------------
# tests
# ---------------------------------------------------------------------------

H, W = 160, 240  # small full-res stand-in, divisible by pool sizes


def test_rasterizer_matches_oracle():
    rng = np.random.default_rng(0)
    boxes = []
    for _ in range(12):
        btype = int(rng.choice([0, 1, 2, 4]))  # 0 = padding row
        w = int(rng.integers(4, 60))
        h = int(rng.integers(5, 50))
        x = int(rng.integers(0, W - w))
        y = int(rng.integers(0, H - h))
        boxes.append([btype, x, y, w, h])
    boxes = np.array(boxes, np.int32)

    ours = np.asarray(pp.rasterize_heatmaps(boxes, H, W))  # (H, W, 3)
    ref = oracle_heatmaps(boxes, H, W)  # (3, H, W)
    np.testing.assert_allclose(ours.transpose(2, 0, 1), ref, atol=1e-6)


def test_rasterizer_overwrite_semantics():
    # two overlapping pedestrians: the later box's 0.3 corner must overwrite
    # the earlier box's 1.0 interior (sequential overwrite, helper.py:303)
    boxes = np.array([[2, 10, 10, 40, 50], [2, 30, 30, 40, 50]], np.int32)
    ours = np.asarray(pp.rasterize_heatmaps(boxes, H, W)).transpose(2, 0, 1)
    ref = oracle_heatmaps(boxes, H, W)
    np.testing.assert_allclose(ours, ref, atol=1e-6)
    # and the overlap region indeed holds the SECOND box's values (its 0.3
    # head corner overwrote the first box's 1.0 interior)
    assert ours[1, 30, 30] == pytest.approx(0.3)


def test_rasterizer_pooled_shape():
    boxes = np.array([[1, 100, 100, 300, 200]], np.int32)
    pooled = np.asarray(pp.rasterize_heatmaps_pooled(boxes, 1280, 1920, 10))
    assert pooled.shape == (128, 192, 3)
    full = oracle_heatmaps(boxes, 1280, 1920)
    ref_pool = torch.nn.MaxPool2d(10, 10)(torch.tensor(full)).numpy()
    np.testing.assert_allclose(pooled.transpose(2, 0, 1), ref_pool, atol=1e-6)


def test_lidar_splat_last_wins_matches_oracle():
    rng = np.random.default_rng(1)
    n = 200
    pts = np.stack(
        [
            rng.uniform(0, W, n),            # x (fractional, exercises trunc)
            rng.uniform(0, H, n),            # y
            rng.uniform(0.5, 80.0, n),       # distance
        ],
        axis=1,
    ).astype(np.float32)
    ours = np.asarray(pp.lidar_points_to_range_image(pts, n, H, W, mode="last"))
    ref = oracle_lidar_splat(pts, H, W)
    np.testing.assert_allclose(ours, ref, atol=1e-6)


def test_lidar_splat_padding_rows_ignored():
    pts = np.zeros((10, 3), np.float32)
    pts[0] = [50, 50, 10.0]
    # rows 1..9 are padding (num_valid=1) and must not write
    pts[1] = [80, 80, 5.0]
    ours = np.asarray(pp.lidar_points_to_range_image(pts, 1, H, W, mode="last"))
    assert ours[50, 50] == 10.0
    assert ours[80, 80] == -1.0


def test_lidar_splat_nearest_mode():
    pts = np.array([[50, 50, 30.0], [50, 50, 10.0], [50, 50, 20.0]], np.float32)
    ours = np.asarray(pp.lidar_points_to_range_image(pts, 3, H, W, mode="nearest"))
    assert ours[50, 50] == 10.0  # closest wins
    last = np.asarray(pp.lidar_points_to_range_image(pts, 3, H, W, mode="last"))
    assert last[50, 50] == 20.0  # last wins


def test_lidar_binning_and_pool():
    rng = np.random.default_rng(2)
    img = rng.uniform(-1, 80, (1280, 1920)).astype(np.float32)
    img[rng.random((1280, 1920)) < 0.6] = -1.0  # sparse empties
    ours = np.asarray(pp.pool_lidar_image(img)).squeeze(-1)
    ref = oracle_pool_lidar(img)
    assert ours.shape == (128, 192)
    np.testing.assert_allclose(ours, ref, atol=1e-4)


def test_pooled_fast_path_matches_nearest_pipeline():
    """The direct-to-pooled LiDAR fast path must equal
    pool(bin(splat(mode='nearest'))) exactly, including edge clamps."""
    rng = np.random.default_rng(7)
    n = 3000
    pts = np.stack([
        rng.uniform(-3, 1923, n),          # includes out-of-bounds points
        rng.uniform(-3, 1283, n),
        rng.uniform(0.5, 80.0, n),
    ], axis=1).astype(np.float32)
    num_valid = 2500  # padding tail must be ignored
    ref = np.asarray(pp.pool_lidar_image(
        pp.lidar_points_to_range_image(pts, num_valid, 1280, 1920, mode="nearest")
    ))
    fast = np.asarray(pp.lidar_points_to_model_input_pooled(pts, num_valid, 1280, 1920))
    np.testing.assert_allclose(fast, ref, atol=1e-4)
    # and via the dispatching wrapper
    fast2 = np.asarray(pp.lidar_points_to_model_input(
        pts, num_valid, 1280, 1920, mode="nearest_pooled"
    ))
    np.testing.assert_allclose(fast2, ref, atol=1e-4)


def test_bin_lidar_range_formulas():
    x = np.array([0.0, 25.0, 75.0, 76.5, -1.0, 50.0], np.float32)
    out = np.asarray(pp.bin_lidar_range(x))
    np.testing.assert_allclose(
        out,
        [255.0, 25 * -6.2 + 255, 0.0, 0.0, 76 * -2.0 + 150, 50.0 * -2 + 150],
        atol=1e-4,
    )


def test_downsize_image():
    rng = np.random.default_rng(3)
    img = rng.random((1280, 1920, 3)).astype(np.float32)
    ours = np.asarray(pp.downsize_image(img))
    assert ours.shape == (128, 192, 3)
    ref = torch.nn.AvgPool2d(10, 10)(torch.tensor(img.transpose(2, 0, 1))).numpy()
    np.testing.assert_allclose(ours.transpose(2, 0, 1), ref, atol=1e-5)
