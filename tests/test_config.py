"""Config system tests: reference default values (helper.py:84-211), json
round-trip, EDict behavior."""

import os

from dmmfods_tpu import EDict, create_config, get_config, load_config, save_config, set_current_run


def test_edict_basic():
    d = EDict({"a": 1, "b": {"c": 2}})
    assert d.a == 1
    assert d.b.c == 2
    d.b.d = {"e": 5}
    assert d.b.d.e == 5
    assert d["b"]["d"]["e"] == 5
    assert isinstance(d.to_dict()["b"], dict) and not isinstance(d.to_dict()["b"], EDict)


def test_default_values_match_reference():
    cfg = get_config("/tmp/nonexistent_host_dir")
    # model defaults (reference helper.py:111-123)
    assert cfg.model.growth_rate == 32
    assert tuple(cfg.model.block_config) == (6, 12, 24, 16)
    assert cfg.model.num_init_features == 64
    assert cfg.model.stream_1_in_channels == 3
    assert cfg.model.stream_2_in_channels == 1
    assert cfg.model.concat_before_block_num == 2
    assert cfg.model.num_layers_before_blocks == 4
    assert cfg.model.bn_size == 4
    assert cfg.model.num_classes == 3
    # optimizer defaults (helper.py:146-159)
    assert cfg.optimizer.learning_rate == 1e-3
    assert cfg.optimizer.beta1 == 0.9
    assert cfg.optimizer.beta2 == 0.999
    assert cfg.optimizer.eps == 1e-8
    assert cfg.optimizer.lr_scheduler.want is False
    # dataset defaults (helper.py:162-175)
    assert cfg.dataset.batch_size == 32
    assert cfg.dataset.label["1"] == "TYPE_VEHICLE"
    assert cfg.dataset.label["2"] == "TYPE_PEDESTRIAN"
    assert cfg.dataset.label["4"] == "TYPE_CYCLIST"
    assert tuple(cfg.dataset.images.size) == (3, 192, 128)
    # agent defaults (helper.py:178-191)
    assert cfg.agent.seed == 123
    assert cfg.agent.max_epoch == 100
    assert cfg.agent.iou_threshold == 0.7
    assert cfg.agent.checkpoint.best_val_iou == "best_val_iou"
    # loss defaults (helper.py:125-133)
    assert cfg.loss.alpha == 1 and cfg.loss.gamma == 2 and cfg.loss.logits is True


def test_config_round_trip(tmp_path):
    cfg = get_config(str(tmp_path))
    save_config(cfg)
    loaded = load_config(cfg.dir.configs, "config.json")
    assert loaded is not None
    assert loaded["model"]["growth_rate"] == 32
    # get_config prefers the saved file
    cfg2 = get_config(str(tmp_path))
    assert cfg2.model.growth_rate == 32
    assert isinstance(cfg2, EDict)


def test_set_current_run(tmp_path):
    cfg = get_config(str(tmp_path))
    cfg = set_current_run(cfg, "my_run")
    assert cfg.dir.current_run.summary.endswith(os.path.join("my_run", "summary"))
    assert cfg.dir.current_run.checkpoints.endswith(os.path.join("my_run", "checkpoints"))
