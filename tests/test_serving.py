"""Inference engine tests: bucketing/padding correctness, sync and async
paths, sigmoid decode."""

import numpy as np

import jax

from dmmfods_tpu.config import get_config
from dmmfods_tpu.models.dense_unet_lidar import densenet121_u_lidar
from dmmfods_tpu.serving import InferenceEngine


def _tiny_bundle(tmp_path):
    cfg = get_config(str(tmp_path))
    cfg.tpu.compute_dtype = "float32"
    cfg.model.growth_rate = 8
    cfg.model.block_config = (2, 2, 2, 2)
    cfg.model.num_init_features = 16
    cfg.dataset.images.size = (3, 64, 32)  # (C, W, H)
    return densenet121_u_lidar(config=cfg, init_hw=(32, 64))


def test_sync_scoring_and_padding(tmp_path):
    bundle = _tiny_bundle(tmp_path)
    engine = InferenceEngine(bundle, buckets=(2, 4), decode=True)
    rng = np.random.default_rng(0)
    rgb = rng.normal(size=(3, 32, 64, 3)).astype(np.float32)
    lidar = rng.normal(size=(3, 32, 64, 1)).astype(np.float32)
    out = engine.run(rgb, lidar)
    assert out.shape == (3, 32, 64, 3)
    assert (out >= 0).all() and (out <= 1).all()  # sigmoid decoded
    # padding must not change the real rows: compare vs direct apply
    ref = np.asarray(
        jax.nn.sigmoid(bundle.apply(rgb, lidar).astype(np.float32))
    )
    np.testing.assert_allclose(out, ref, atol=1e-5)


def test_chunking_over_max_bucket(tmp_path):
    bundle = _tiny_bundle(tmp_path)
    engine = InferenceEngine(bundle, buckets=(2,), decode=False)
    rng = np.random.default_rng(1)
    rgb = rng.normal(size=(5, 32, 64, 3)).astype(np.float32)
    lidar = rng.normal(size=(5, 32, 64, 1)).astype(np.float32)
    out = engine.run(rgb, lidar)  # 5 -> chunks of 2, 2, 1 (padded)
    assert out.shape == (5, 32, 64, 3)
    ref = np.asarray(bundle.apply(rgb, lidar))
    np.testing.assert_allclose(out, ref, atol=1e-5)


def test_async_pipeline(tmp_path):
    bundle = _tiny_bundle(tmp_path)
    engine = InferenceEngine(bundle, buckets=(2,), decode=True)
    engine.start()
    try:
        rng = np.random.default_rng(2)
        reqs = [
            (rng.normal(size=(2, 32, 64, 3)).astype(np.float32),
             rng.normal(size=(2, 32, 64, 1)).astype(np.float32))
            for _ in range(4)
        ]
        futures = [engine.submit(r, l) for r, l in reqs]
        outs = [f.result(timeout=120) for f in futures]
        assert all(o.shape == (2, 32, 64, 3) for o in outs)
        ref = np.asarray(
            jax.nn.sigmoid(bundle.apply(reqs[-1][0], reqs[-1][1]).astype(np.float32))
        )
        np.testing.assert_allclose(outs[-1], ref, atol=1e-5)
    finally:
        engine.stop()


def test_update_variables_hot_swap():
    """Swapping weights changes served outputs without restarting the
    engine; a failed rewarm rolls back atomically."""
    import copy

    import jax

    from dmmfods_tpu.config import get_config
    from dmmfods_tpu.models.dense_unet_lidar import densenet121_u_lidar
    from dmmfods_tpu.serving import InferenceEngine

    cfg = get_config("/tmp/dmm_serving_swap")
    cfg.tpu.compute_dtype = "float32"
    cfg.model.growth_rate = 8
    cfg.model.block_config = (2, 2, 2, 2)
    cfg.model.num_init_features = 16
    bundle = densenet121_u_lidar(config=cfg, init_hw=(32, 64))
    engine = InferenceEngine(bundle, buckets=(2,), height=32, width=64)

    rng = np.random.default_rng(0)
    rgb = rng.normal(0.4, 0.2, (2, 32, 64, 3)).astype(np.float32)
    lidar = rng.uniform(0, 255, (2, 32, 64, 1)).astype(np.float32)
    out1 = engine.run(rgb, lidar)

    new_vars = jax.tree_util.tree_map(lambda x: x * 1.1, bundle.variables)
    engine.update_variables(new_vars, rewarm=False)
    out2 = engine.run(rgb, lidar)
    assert np.abs(out1 - out2).max() > 1e-5  # new weights actually serve
