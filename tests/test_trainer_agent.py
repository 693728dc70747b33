"""End-to-end training tests: jitted train/eval steps, the Agent loop,
checkpoint/resume, and multi-device (dp + tp) sharding on the 8-device CPU
mesh (SURVEY.md §4's "fake backend" strategy)."""

import logging

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from dmmfods_tpu import trainer as trainer_lib
from dmmfods_tpu.data.synthetic import SyntheticDataset, make_batch
from dmmfods_tpu.models.dense_unet_lidar import densenet121_u_lidar
from dmmfods_tpu.parallel import mesh as mesh_lib


def _tiny_bundle(cfg, h=32, w=64):
    cfg.model.growth_rate = 8
    cfg.model.block_config = (2, 2, 2, 2)
    cfg.model.num_init_features = 16
    return densenet121_u_lidar(config=cfg, init_hw=(h, w))


@pytest.fixture(scope="module")
def tiny_setup(tmp_path_factory):
    from dmmfods_tpu.config import get_config

    cfg = get_config(str(tmp_path_factory.mktemp("host_tr")))
    cfg.tpu.compute_dtype = "float32"
    bundle = _tiny_bundle(cfg)
    tx = trainer_lib.make_optimizer(cfg)
    state = trainer_lib.create_train_state(bundle, tx)
    return cfg, bundle, tx, state


def test_train_step_reduces_loss(tiny_setup):
    cfg, bundle, tx, state = tiny_setup
    train_step = trainer_lib.make_train_step(bundle.module, tx, cfg, donate=False)
    img, lidar, ht = make_batch(batch_size=2, h=32, w=64, seed=0)
    losses = []
    for _ in range(6):
        state, m = train_step(state, img, lidar, ht)
        losses.append(float(m["loss"]))
    assert losses[-1] < losses[0]
    assert np.isfinite(losses).all()
    # metric shapes per the reference taxonomy
    for key in ("loss_per_class", "iou_per_class", "iou_nans", "acc_per_class"):
        assert np.asarray(m[key]).shape == (3,)


def test_eval_step_is_pure(tiny_setup):
    cfg, bundle, tx, state = tiny_setup
    eval_step = trainer_lib.make_eval_step(bundle.module, cfg)
    img, lidar, ht = make_batch(batch_size=2, h=32, w=64, seed=1)
    m1 = eval_step(state, img, lidar, ht)
    m2 = eval_step(state, img, lidar, ht)
    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]), rtol=1e-6)


def test_steplr_learning_rate_injection(tiny_setup):
    cfg, bundle, tx, state = tiny_setup
    new_opt = trainer_lib.set_learning_rate(state.opt_state, 1e-4)
    assert float(new_opt.hyperparams["learning_rate"]) == pytest.approx(1e-4)


def test_agent_end_to_end(tmp_path):
    """Full Agent loop on synthetic data: 2 epochs train+validate, checkpoint,
    resume — the reference workflow (agent:165-211) minus Colab."""
    from dmmfods_tpu.agents.dense_unet_agent import Dense_U_Net_lidar_Agent
    from dmmfods_tpu.config import get_config
    from dmmfods_tpu.data.waymo import PrefetchLoader

    logging.basicConfig(level=logging.INFO)
    cfg = get_config(str(tmp_path))
    cfg.tpu.compute_dtype = "float32"
    cfg.model.growth_rate = 8
    cfg.model.block_config = (2, 2, 2, 2)
    cfg.model.num_init_features = 16
    cfg.agent.max_epoch = 2
    cfg.dataset.images.size = (3, 64, 32)  # (C, W, H) per reference convention
    cfg.tpu.mesh.data = 2  # synthetic batch of 2 must divide the data axis

    class Loader:
        def __init__(self):
            ds = SyntheticDataset(num_batches=2, batch_size=2, h=32, w=64)
            self.train_loader = PrefetchLoader(ds)
            self.valid_loader = PrefetchLoader(ds)
            self.train_iterations = len(ds)
            self.valid_iterations = len(ds)

    agent = Dense_U_Net_lidar_Agent(cfg, torchvision_init=False, data_loader=Loader())
    agent.run()
    assert agent.current_epoch == 1
    assert agent.current_train_iteration == 4  # 2 epochs x 2 batches
    assert agent.best_val_iou >= 0.0

    # checkpoint written every epoch; a new agent resumes counters from it.
    # (the *best* checkpoint is only written when val IoU improves, which
    # random data can't guarantee — resume from the epoch checkpoint)
    agent2 = Dense_U_Net_lidar_Agent(cfg, torchvision_init=False, data_loader=Loader())
    agent2.load_checkpoint(filename="checkpoint")
    assert agent2.current_train_iteration == 4
    assert agent2.current_epoch == 1
    p_old = jax.tree_util.tree_leaves(agent.state.params)[0]
    p_new = jax.tree_util.tree_leaves(agent2.state.params)[0]
    np.testing.assert_array_equal(np.asarray(p_old), np.asarray(p_new))
    agent.finalize()
    agent2.finalize()

    # scalar logs were written with the reference tag taxonomy
    scalars = (tmp_path / "DMMFODS" / "dmmfods_tpu").rglob("scalars.jsonl")
    text = "".join(p.read_text() for p in scalars)
    for tag in ("Training/Loss", "Training/IoU", "Validation/Accuracy"):
        assert tag in text


def test_spatial_sharding_forward_matches(tiny_setup):
    """SP analogue (SURVEY §5.7): H-axis sharded forward == replicated."""
    cfg, bundle, tx, state = tiny_setup
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    mesh = mesh_lib.make_mesh(data=2, spatial=2, model=1)  # small: compile cost
    sh = mesh_lib.spatial_sharding(mesh)
    img, lidar, ht = make_batch(batch_size=2, h=32, w=64, seed=5)
    variables = {"params": state.params, "batch_stats": state.batch_stats}

    def fwd(v, a, b):
        a = jax.lax.with_sharding_constraint(a, sh)
        b = jax.lax.with_sharding_constraint(b, sh)
        return bundle.module.apply(v, a, b, False)

    img_s = jax.device_put(img, sh)
    lidar_s = jax.device_put(lidar, sh)
    out_sharded = jax.jit(fwd)(variables, img_s, lidar_s)
    out_ref = bundle.module.apply(variables, img, lidar, False)
    np.testing.assert_allclose(
        np.asarray(out_sharded), np.asarray(out_ref), atol=1e-4
    )


def test_multichip_dp_tp_sharding(tiny_setup):
    """Full train step over a (4, 2) data x model mesh on 8 CPU devices:
    batch sharded over 'data', wide conv kernels sharded over 'model'."""
    cfg, bundle, tx, _ = tiny_setup
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    mesh = mesh_lib.make_mesh(data=4, model=2)
    state = trainer_lib.create_train_state(bundle, tx)
    shardings = mesh_lib.make_param_shardings(state.params, mesh, threshold=32)
    # at least one kernel actually got channel-sharded
    specs = jax.tree_util.tree_leaves(
        jax.tree_util.tree_map(lambda s: s.spec, shardings,
                               is_leaf=lambda x: hasattr(x, "spec"))
    )
    assert any("model" in str(s) for s in specs)

    state = state.replace(
        params=jax.device_put(state.params, shardings),
        batch_stats=jax.device_put(state.batch_stats, mesh_lib.replicated(mesh)),
        opt_state=jax.device_put(state.opt_state, mesh_lib.replicated(mesh)),
    )
    train_step = trainer_lib.make_train_step(bundle.module, tx, cfg, mesh=mesh, donate=False)
    img, lidar, ht = make_batch(batch_size=8, h=32, w=64, seed=2)
    img, lidar, ht = mesh_lib.shard_batch((img, lidar, ht), mesh)
    state2, m = train_step(state, img, lidar, ht)
    assert np.isfinite(float(m["loss"]))

    # dp+tp result matches single-device result
    state_single = trainer_lib.create_train_state(bundle, tx)
    step_single = trainer_lib.make_train_step(bundle.module, tx, cfg, donate=False)
    img2, lidar2, ht2 = make_batch(batch_size=8, h=32, w=64, seed=2)
    _, m_single = step_single(state_single, img2, lidar2, ht2)
    np.testing.assert_allclose(float(m["loss"]), float(m_single["loss"]), rtol=1e-4)


def test_agent_tensor_parallel_engages(tmp_path):
    """VERDICT r4 #4: configuring ``tpu.mesh.model > 1`` through the AGENT
    must actually shard the params (not silently replicate), and the
    TP-sharded training trajectory must match a replicated-mesh agent's."""
    import copy

    from dmmfods_tpu.agents.dense_unet_agent import Dense_U_Net_lidar_Agent
    from dmmfods_tpu.config import get_config
    from dmmfods_tpu.data.waymo import PrefetchLoader

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")

    base = get_config(str(tmp_path))
    base.tpu.compute_dtype = "float32"
    base.model.growth_rate = 8
    base.model.block_config = (2, 2, 2, 2)
    base.model.num_init_features = 16
    base.agent.max_epoch = 1
    base.dataset.images.size = (3, 64, 32)
    base.tpu.tp_shard_threshold = 32  # tiny model: widest kernels are 32-64

    def loader():
        class Loader:
            def __init__(self):
                ds = SyntheticDataset(num_batches=2, batch_size=4, h=32, w=64)
                self.train_loader = PrefetchLoader(ds)
                self.valid_loader = PrefetchLoader(ds)
                self.train_iterations = len(ds)
                self.valid_iterations = len(ds)

        return Loader()

    cfg_tp = copy.deepcopy(base)
    cfg_tp.tpu.mesh.data = 4
    cfg_tp.tpu.mesh.model = 2
    agent_tp = Dense_U_Net_lidar_Agent(cfg_tp, torchvision_init=False,
                                       data_loader=loader())
    # the state the agent will train with is genuinely model-sharded
    specs = [
        x.sharding.spec
        for x in jax.tree_util.tree_leaves(agent_tp.state.params)
        if hasattr(x, "sharding")
    ]
    assert any("model" in str(s) for s in specs), specs

    cfg_rep = copy.deepcopy(base)
    cfg_rep.tpu.mesh.data = 4
    cfg_rep.tpu.mesh.model = 1
    agent_rep = Dense_U_Net_lidar_Agent(cfg_rep, torchvision_init=False,
                                        data_loader=loader())

    # one epoch of training through each agent's own wiring. The oracle is
    # the per-iteration LOSS SERIES, not final params: Adam normalizes by
    # sqrt(v), so TP's different reduction order shifts params by O(lr)
    # per step regardless of gradient correctness — while iteration 2's
    # loss (computed on post-update-1 params over ~25k pixels) tracks the
    # trajectory tightly.
    agent_tp.train_one_epoch()
    agent_rep.train_one_epoch()

    def loss_series(agent):
        import json

        path = (Path(agent.config.dir.current_run.summary) / "scalars.jsonl")
        rows = [json.loads(l) for l in path.read_text().splitlines()]
        return {r["step"]: r["Overall"] for r in rows
                if r.get("tag") == "Training/Loss"}

    from pathlib import Path

    s_tp, s_rep = loss_series(agent_tp), loss_series(agent_rep)
    assert set(s_tp) == set(s_rep) == {0, 1}
    for step in s_tp:
        np.testing.assert_allclose(s_tp[step], s_rep[step], rtol=2e-3,
                                   err_msg=f"iteration {step}")
    agent_tp.finalize()
    agent_rep.finalize()


def test_focal_loss_training(tiny_setup):
    """config.loss.type='focal' wires the focal objective into the step."""
    cfg, bundle, tx, _ = tiny_setup
    import copy

    cfg2 = copy.deepcopy(cfg)
    cfg2.loss.type = "focal"
    state = trainer_lib.create_train_state(bundle, tx)
    step = trainer_lib.make_train_step(bundle.module, tx, cfg2, donate=False)
    img, lidar, ht = make_batch(batch_size=2, h=32, w=64, seed=9)
    losses = []
    for _ in range(4):
        state, m = step(state, img, lidar, ht)
        losses.append(float(m["loss"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]
    # focal loss != bce loss for the same inputs
    step_bce = trainer_lib.make_train_step(bundle.module, tx, cfg, donate=False)
    state_b = trainer_lib.create_train_state(bundle, tx)
    _, mb = step_bce(state_b, img, lidar, ht)
    state_f = trainer_lib.create_train_state(bundle, tx)
    _, mf = step(state_f, img, lidar, ht)
    assert abs(float(mb["loss"]) - float(mf["loss"])) > 1.0


def test_train_step_ht_matches_dense(tiny_setup):
    """Host-splat raw step (in-graph heat-map rasterization) produces the
    exact same loss as the dense step fed the pre-rasterized maps."""
    from dmmfods_tpu.data.synthetic import make_raw_batch
    from dmmfods_tpu.ops import preprocess as pp

    cfg, bundle, tx, _ = tiny_setup
    img, lidar, boxes = make_raw_batch(batch_size=2, h=32, w=64, seed=11)
    ht = np.stack([
        np.asarray(pp.rasterize_heatmaps_direct(b, 32, 64, 10)) for b in boxes
    ])

    state_a = trainer_lib.create_train_state(bundle, tx)
    step_ht = trainer_lib.make_train_step_ht(
        bundle.module, tx, cfg, donate=False, full_height=320, full_width=640)
    _, m_ht = step_ht(state_a, img, lidar, boxes)

    state_b = trainer_lib.create_train_state(bundle, tx)
    step_dense = trainer_lib.make_train_step(bundle.module, tx, cfg, donate=False)
    _, m_dense = step_dense(state_b, img, lidar, ht)

    np.testing.assert_allclose(float(m_ht["loss"]), float(m_dense["loss"]), rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray(m_ht["iou_per_class"]), np.asarray(m_dense["iou_per_class"]),
        rtol=1e-6)


@pytest.mark.parametrize("splat", ["host", "device"])
def test_agent_raw_mode(tmp_path, splat):
    """Agent e2e on raw records for both tpu.splat settings: the loader
    yields raw tuples, the matching step trains to a finite loss, and
    validation reports the reference metric taxonomy."""
    import copy

    from dmmfods_tpu.agents.dense_unet_agent import Dense_U_Net_lidar_Agent
    from dmmfods_tpu.config import get_config
    from dmmfods_tpu.data.synthetic import SyntheticRawDataset
    from dmmfods_tpu.data.waymo import PrefetchLoader

    base = get_config(str(tmp_path))
    base.tpu.compute_dtype = "float32"
    base.model.growth_rate = 8
    base.model.block_config = (2, 2, 2, 2)
    base.model.num_init_features = 16
    base.agent.max_epoch = 1
    base.dataset.images.size = (3, 64, 32)
    base.dataset.images["original.size"] = (3, 640, 320)
    base.tpu.mesh.data = 2
    base.tpu.device_preprocess = True
    base.tpu.max_points = 512

    cfg = copy.deepcopy(base)
    cfg.tpu.splat = splat

    class Loader:
        def __init__(self):
            ds = SyntheticRawDataset(num_batches=2, batch_size=2, h=32,
                                     w=64, splat=splat, max_points=512)
            self.train_loader = PrefetchLoader(ds)
            self.valid_loader = PrefetchLoader(ds)
            self.train_iterations = len(ds)
            self.valid_iterations = len(ds)

    agent = Dense_U_Net_lidar_Agent(cfg, torchvision_init=False,
                                    data_loader=Loader())
    agent.run()
    assert agent.current_train_iteration == 2
    assert agent.current_val_iteration == 2
    agent.finalize()


def test_hparams_record_reflects_config(tmp_path):
    """A focal+amsgrad run's hyperparams.json / TB hparams must name the
    ACTUAL objective and optimizer, not hard-coded bce/adam strings."""
    import json

    from dmmfods_tpu.agents.dense_unet_agent import Dense_U_Net_lidar_Agent
    from dmmfods_tpu.config import get_config
    from dmmfods_tpu.data.waymo import PrefetchLoader

    cfg = get_config(str(tmp_path))
    cfg.tpu.compute_dtype = "float32"
    cfg.model.growth_rate = 8
    cfg.model.block_config = (2, 2, 2, 2)
    cfg.model.num_init_features = 16
    cfg.agent.max_epoch = 1
    cfg.dataset.images.size = (3, 64, 32)
    cfg.tpu.mesh.data = 2
    cfg.loss.type = "focal"
    cfg.optimizer.amsgrad = True

    class Loader:
        def __init__(self):
            ds = SyntheticDataset(num_batches=1, batch_size=2, h=32, w=64)
            self.train_loader = PrefetchLoader(ds)
            self.valid_loader = PrefetchLoader(ds)
            self.train_iterations = len(ds)
            self.valid_iterations = len(ds)

    agent = Dense_U_Net_lidar_Agent(cfg, torchvision_init=False, data_loader=Loader())
    agent.run()
    agent.finalize()
    with open(f"{cfg.dir.current_run.summary}/hyperparams.json") as f:
        hp = json.load(f)
    assert "focal" in cfg.loss.func
    assert "amsgrad" in cfg.optimizer.func
    assert hp["loss"]["type"] == "focal"
    assert "focal" in hp["loss"]["func"]
    assert hp["optimizer"]["amsgrad"] is True
    assert "amsgrad" in hp["optimizer"]["func"]
