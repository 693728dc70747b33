"""Tests for the in-graph (device-side) preprocessing path: the direct
low-res rasterizer vs the exact pooled reference path, and the fused
raw-input train step."""

import numpy as np
import pytest

from dmmfods_tpu.ops import preprocess as pp


H_FULL, W_FULL = 320, 480  # 10x the 32x48 output grid


def _nonoverlapping_boxes():
    return np.array(
        [
            [1, 10, 10, 80, 60],     # vehicle
            [2, 200, 40, 45, 95],    # pedestrian
            [4, 320, 150, 60, 70],   # cyclist
            [0, 0, 0, 0, 0],         # padding
            [2, 120, 200, 37, 83],   # pedestrian (odd sizes)
        ],
        np.int32,
    )


def test_direct_rasterizer_matches_pooled_exact():
    boxes = _nonoverlapping_boxes()
    exact = np.asarray(pp.rasterize_heatmaps_pooled(boxes, H_FULL, W_FULL, 10))
    direct = np.asarray(pp.rasterize_heatmaps_direct(boxes, H_FULL // 10, W_FULL // 10, 10))
    np.testing.assert_allclose(direct, exact, atol=1e-6)


def test_direct_rasterizer_random_nonoverlap():
    rng = np.random.default_rng(0)
    # place boxes on a coarse grid so they never overlap
    boxes = []
    for gy in range(3):
        for gx in range(4):
            btype = int(rng.choice([1, 2, 4]))
            w = int(rng.integers(10, 90))
            h = int(rng.integers(10, 80))
            boxes.append([btype, gx * 120 + 5, gy * 100 + 5, w, h])
    boxes = np.array(boxes, np.int32)
    exact = np.asarray(pp.rasterize_heatmaps_pooled(boxes, H_FULL, W_FULL, 10))
    direct = np.asarray(pp.rasterize_heatmaps_direct(boxes, 32, 48, 10))
    np.testing.assert_allclose(direct, exact, atol=1e-6)


def test_raw_train_step_runs_and_learns():
    import jax

    from dmmfods_tpu import trainer as trainer_lib
    from dmmfods_tpu.config import get_config
    from dmmfods_tpu.models.dense_unet_lidar import densenet121_u_lidar

    cfg = get_config("/tmp/raw_step_host")
    cfg.tpu.compute_dtype = "float32"
    cfg.model.growth_rate = 8
    cfg.model.block_config = (2, 2, 2, 2)
    cfg.model.num_init_features = 16

    h, w = 32, 64
    bundle = densenet121_u_lidar(config=cfg, init_hw=(h, w))
    tx = trainer_lib.make_optimizer(cfg)
    state = trainer_lib.create_train_state(bundle, tx)
    step = trainer_lib.make_train_step_raw(
        bundle.module, tx, cfg, donate=False,
        full_height=h * 10, full_width=w * 10,
    )

    rng = np.random.default_rng(1)
    b, n_pts, n_boxes = 2, 512, 8
    image = rng.normal(0.5, 0.2, (b, h, w, 3)).astype(np.float32)
    points = np.zeros((b, n_pts, 3), np.float32)
    points[:, :, 0] = rng.uniform(0, w * 10, (b, n_pts))
    points[:, :, 1] = rng.uniform(0, h * 10, (b, n_pts))
    points[:, :, 2] = rng.uniform(1, 70, (b, n_pts))
    num_valid = np.full((b,), n_pts, np.int32)
    boxes = np.stack([_nonoverlapping_boxes()[:n_boxes] for _ in range(b)])
    boxes = np.pad(boxes, ((0, 0), (0, n_boxes - boxes.shape[1]), (0, 0)))

    losses = []
    for _ in range(4):
        state, m = step(state, image, points, num_valid, boxes)
        losses.append(float(m["loss"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]
