"""DetectionAgent lifecycle tests: the full reference-baseline-agent surface
(construction / run / train / validate / checkpoint / resume / TB taxonomy,
reference FasterRCNNAgent.py:96-425) for the TPU-native CenterNet baseline,
driven end-to-end on synthetic raw-record batches."""

import logging

import numpy as np
import pytest

import jax

from dmmfods_tpu.agents.detection_baseline import DetectionAgent
from dmmfods_tpu.config import get_config
from dmmfods_tpu.data.synthetic import SyntheticRawDataset
from dmmfods_tpu.data.waymo import PrefetchLoader


def _tiny_cfg(tmp_path, max_epoch=1):
    cfg = get_config(str(tmp_path))
    cfg.tpu.compute_dtype = "float32"
    cfg.model.growth_rate = 8
    cfg.model.block_config = (2, 2, 2, 2)
    cfg.model.num_init_features = 16
    cfg.agent.max_epoch = max_epoch
    cfg.dataset.images.size = (3, 64, 32)
    cfg.dataset.images["original.size"] = (3, 640, 320)
    cfg.tpu.mesh.data = 2  # synthetic batch of 2 must divide the data axis
    return cfg


class _Loader:
    def __init__(self, num_batches=2, seed=0):
        ds = SyntheticRawDataset(num_batches=num_batches, batch_size=2,
                                 h=32, w=64, seed=seed, splat="host",
                                 max_points=256)
        self.train_loader = PrefetchLoader(ds)
        self.valid_loader = PrefetchLoader(ds)
        self.train_iterations = len(ds)
        self.valid_iterations = len(ds)


def test_detection_agent_end_to_end_and_resume(tmp_path):
    logging.basicConfig(level=logging.INFO)
    cfg = _tiny_cfg(tmp_path, max_epoch=2)

    agent = DetectionAgent(cfg, torchvision_init=False, data_loader=_Loader())
    agent.run()
    assert agent.current_epoch == 1
    assert agent.current_train_iteration == 4  # 2 epochs x 2 batches
    assert agent.current_val_iteration == 4
    agent.finalize()

    # per-epoch checkpoint written; a fresh agent resumes every counter and
    # the exact params (reference resume semantics, agent:124-163)
    agent2 = DetectionAgent(cfg, torchvision_init=False, data_loader=_Loader())
    agent2.load_checkpoint()
    assert agent2.current_train_iteration == 4
    assert agent2.current_epoch == 1
    p_old = jax.tree_util.tree_leaves(agent.params)[0]
    p_new = jax.tree_util.tree_leaves(agent2.params)[0]
    np.testing.assert_array_equal(np.asarray(p_old), np.asarray(p_new))
    agent2.finalize()

    # validation emitted the reference tag taxonomy + AP
    scalars = (tmp_path / "DMMFODS" / "dmmfods_tpu").rglob("scalars.jsonl")
    text = "".join(p.read_text() for p in scalars)
    for tag in ("Training/Loss/heat_loss", "Validation/IoU", "Validation/AP"):
        assert tag in text


def test_detection_agent_dp_matches_single_device(tmp_path):
    """`cli train --agent detector` honors tpu.mesh: a data=4 mesh produces
    the same train-step loss as the single-device run (mirror of the main
    agent's test_multichip_dp_tp_sharding)."""
    if len(jax.devices()) < 4:
        pytest.skip("needs 4 virtual devices")
    cfg = _tiny_cfg(tmp_path)
    cfg.tpu.mesh.data = 4

    class Loader(_Loader):
        def __init__(self):
            ds = SyntheticRawDataset(num_batches=1, batch_size=4, h=32, w=64,
                                     seed=7, splat="host", max_points=256)
            self.train_loader = PrefetchLoader(ds)
            self.valid_loader = PrefetchLoader(ds)
            self.train_iterations = len(ds)
            self.valid_iterations = len(ds)

    agent_dp = DetectionAgent(cfg, torchvision_init=False, data_loader=Loader())
    assert agent_dp.mesh is not None and agent_dp.mesh.shape["data"] == 4
    batch = next(iter(Loader().train_loader))
    sharded = agent_dp._put(batch)
    # the batch really lands sharded over the data axis
    assert len(sharded[0].sharding.device_set) == 4
    (_, _, _, loss_dp, _) = agent_dp.train_step(
        agent_dp.params, agent_dp.batch_stats, agent_dp.opt_state, *sharded)

    cfg_s = _tiny_cfg(tmp_path)
    agent_s = DetectionAgent(cfg_s, torchvision_init=False,
                             data_loader=Loader(), use_mesh=False)
    (_, _, _, loss_s, _) = agent_s.train_step(
        agent_s.params, agent_s.batch_stats, agent_s.opt_state, *batch)

    np.testing.assert_allclose(float(np.asarray(loss_dp)),
                               float(np.asarray(loss_s)), rtol=1e-4)
    agent_dp.finalize()
    agent_s.finalize()


def test_detection_agent_learns_planted_objects(tmp_path):
    """Training on one fixed synthetic batch drives the decode->bridge AP up
    (the detector memorizes the planted boxes)."""
    cfg = _tiny_cfg(tmp_path, max_epoch=1)
    cfg.optimizer.learning_rate = 3e-3

    loader = _Loader(num_batches=1, seed=3)
    agent = DetectionAgent(cfg, torchvision_init=False, data_loader=loader)

    m0 = agent.eval_step(agent.params, agent.batch_stats,
                         *next(iter(loader.valid_loader)))
    ap_init = float(np.mean(np.asarray(m0["ap_per_class"])))

    image, lidar, boxes = next(iter(loader.train_loader))
    first_loss = last_loss = None
    for _ in range(80):
        (agent.params, agent.batch_stats, agent.opt_state, loss, _parts
         ) = agent.train_step(agent.params, agent.batch_stats,
                              agent.opt_state, image, lidar, boxes)
        loss = float(np.asarray(loss))
        if first_loss is None:
            first_loss = loss
        last_loss = loss

    assert np.isfinite(last_loss)
    assert last_loss < first_loss

    m1 = agent.eval_step(agent.params, agent.batch_stats,
                         *next(iter(loader.valid_loader)))
    ap_final = float(np.mean(np.asarray(m1["ap_per_class"])))
    assert ap_final > ap_init or ap_final > 0.3, (ap_init, ap_final)
    agent.finalize()
