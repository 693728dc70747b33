"""Detection baseline model tests: target generation, loss, decode, a few
training steps, and the mask->heat-map bridge integration."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import optax

from dmmfods_tpu.models.detector import (
    CenterNetDetector,
    centernet_loss,
    decode_detections,
    make_center_targets,
)


def _tiny_detector():
    return CenterNetDetector(growth_rate=8, block_config=(2, 2, 2, 2),
                             num_init_features=16, head_features=32)


def test_targets_shapes_and_centers():
    boxes = np.array([
        [1, 40, 40, 80, 40],   # vehicle centered at (80, 60) -> /4 = (20, 15)
        [2, 8, 8, 16, 16],     # pedestrian center (16, 16) -> (4, 4)
        [0, 0, 0, 0, 0],       # padding
    ], np.int32)
    t = make_center_targets(boxes, 32, 48, stride=4)
    assert t["heatmap"].shape == (32, 48, 3)
    # the vehicle center pixel carries a 1.0 gaussian peak and its size
    assert float(t["heatmap"][15, 20, 0]) == pytest.approx(1.0, abs=1e-5)
    np.testing.assert_allclose(np.asarray(t["size"][15, 20]), [80.0, 40.0])
    assert float(t["mask"][15, 20, 0]) == 1.0
    assert float(t["mask"].sum()) == 2.0  # padding contributed nothing
    # pedestrian peak on its own channel
    assert float(t["heatmap"][4, 4, 1]) == pytest.approx(1.0, abs=1e-5)
    assert float(t["heatmap"][:, :, 2].max()) == 0.0


def test_loss_prefers_correct_prediction():
    boxes = np.array([[1, 40, 40, 80, 40]], np.int32)
    t = make_center_targets(boxes, 32, 48)
    t = {k: v[None] for k, v in t.items()}
    logit_scale = 8.0
    good = {
        "heatmap": (np.asarray(t["heatmap"][0]) * 2 - 1)[None] * logit_scale,
        "size": np.asarray(t["size"]),
        "offset": np.asarray(t["offset"]),
    }
    bad = {
        "heatmap": -good["heatmap"],
        "size": np.zeros_like(good["size"]),
        "offset": np.zeros_like(good["offset"]),
    }
    lg, _ = centernet_loss({k: jnp.asarray(v) for k, v in good.items()}, t)
    lb, _ = centernet_loss({k: jnp.asarray(v) for k, v in bad.items()}, t)
    assert float(lg) < float(lb)


def test_decode_recovers_planted_object():
    h, w, c = 32, 48, 3
    heat = np.full((1, h, w, c), -10.0, np.float32)
    heat[0, 15, 20, 0] = 10.0  # strong vehicle peak
    size = np.zeros((1, h, w, 2), np.float32)
    size[0, 15, 20] = [80.0, 40.0]
    offset = np.zeros((1, h, w, 2), np.float32)
    out = decode_detections(
        {"heatmap": heat, "size": size, "offset": offset},
        top_k=4, mask_height=128, mask_width=192,
    )
    assert int(out["labels"][0, 0]) == 0
    assert float(out["scores"][0, 0]) > 0.99
    np.testing.assert_allclose(
        np.asarray(out["boxes"][0, 0]), [80 - 40, 60 - 20, 80 + 40, 60 + 20], atol=1e-3
    )
    # mask is the box rectangle at eval resolution
    mask = np.asarray(out["masks"][0, 0])
    assert mask[60, 80] > 0.99 and mask[10, 10] == 0.0
    # sub-threshold peaks are zeroed
    assert float(out["scores"][0, 1]) == 0.0


def test_detector_trains():
    det = _tiny_detector()
    rng = np.random.default_rng(0)
    rgb = jnp.asarray(rng.normal(0.5, 0.2, (2, 64, 96, 3)), jnp.float32)
    lidar = jnp.asarray(rng.normal(size=(2, 64, 96, 1)), jnp.float32)
    boxes = np.zeros((2, 8, 5), np.int32)
    boxes[:, 0] = [1, 20, 20, 40, 24]
    boxes[:, 1] = [2, 60, 30, 12, 24]
    targets = jax.vmap(lambda b: make_center_targets(b, 16, 24))(jnp.asarray(boxes))

    variables = det.init(jax.random.PRNGKey(0), rgb, lidar, False)
    tx = optax.adam(1e-3)
    opt_state = tx.init(variables["params"])

    @jax.jit
    def step(params, batch_stats, opt_state):
        def loss_fn(p):
            out, mut = det.apply({"params": p, "batch_stats": batch_stats},
                                 rgb, lidar, True, mutable=["batch_stats"])
            loss, parts = centernet_loss(out, targets)
            return loss, (parts, mut["batch_stats"])

        (loss, (parts, stats)), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), stats, opt_state, loss

    params, stats = variables["params"], variables["batch_stats"]
    losses = []
    for _ in range(5):
        params, stats, opt_state, loss = step(params, stats, opt_state)
        losses.append(float(loss))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]


def test_bridge_integration():
    """decode -> instance_masks_to_heatmaps -> heat-map metrics end to end."""
    from dmmfods_tpu.agents.detection_baseline import instance_masks_to_heatmaps

    h, w = 32, 48
    heat = np.full((1, h, w, 3), -10.0, np.float32)
    heat[0, 15, 20, 0] = 10.0
    size = np.zeros((1, h, w, 2), np.float32)
    size[0, 15, 20] = [80.0, 40.0]
    out = decode_detections(
        {"heatmap": heat, "size": size, "offset": np.zeros((1, h, w, 2), np.float32)},
        top_k=4, mask_height=128, mask_width=192,
    )
    hm = np.asarray(instance_masks_to_heatmaps(
        out["masks"][0], out["labels"][0], 3, scores=out["scores"][0],
        score_threshold=0.5,
    ))
    assert hm.shape == (128, 192, 3)
    assert hm[60, 80, 0] > 0.99
    assert hm[:, :, 1].max() == 0.0


def test_make_detection_train_step():
    import optax

    from dmmfods_tpu.models.detector import make_detection_train_step

    det = _tiny_detector()
    rng = np.random.default_rng(1)
    rgb = jnp.asarray(rng.normal(0.5, 0.2, (2, 64, 96, 3)), jnp.float32)
    lidar = jnp.asarray(rng.normal(size=(2, 64, 96, 1)), jnp.float32)
    boxes = np.zeros((2, 4, 5), np.int32)
    boxes[:, 0] = [1, 20, 20, 40, 24]
    variables = det.init(jax.random.PRNGKey(0), rgb, lidar, False)
    tx = optax.adam(1e-3)
    step = make_detection_train_step(det, tx, out_height=16, out_width=24, donate=False)
    params, stats = variables["params"], variables["batch_stats"]
    opt_state = tx.init(params)
    losses = []
    for _ in range(4):
        params, stats, opt_state, loss, parts = step(
            params, stats, opt_state, rgb, lidar, jnp.asarray(boxes)
        )
        losses.append(float(loss))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]
    assert set(parts) == {"heat_loss", "size_loss", "offset_loss"}
