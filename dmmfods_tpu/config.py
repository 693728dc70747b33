"""Config system for the TPU-native DMMFODS framework.

Reproduces the public config surface of the reference
(``dmmfods/utils/Dense_U_Net_lidar_helper.py:60-228``): ``create_config`` /
``load_config`` / ``save_config`` / ``get_config`` / ``set_current_run`` built
on an attribute-dict, with the exact same default value tree (model, loss,
loader, optimizer, dataset, agent, dir sections). Values cited per-section
below. New, TPU-specific knobs live in the added ``tpu`` section so the
reference keys stay untouched.
"""

from __future__ import annotations

import json
import os
from datetime import datetime
from os.path import isfile, join
from pathlib import Path

from .utils.edict import EDict as edict

# ---------------------------------------------------------------------------
# json helpers (reference helper.py:24-54)
# ---------------------------------------------------------------------------


def load_json_file(filepath):
    """Load a json file; raise ``FileNotFoundError`` if absent."""
    if isfile(filepath):
        with open(filepath, "r") as jf:
            return json.load(jf)
    raise FileNotFoundError(filepath)


def save_json_file(filepath, save_file, indent=None):
    """Save ``save_file`` as json. ``indent=4`` gives a human-readable file."""
    if isinstance(save_file, edict):
        save_file = save_file.to_dict()
    with open(filepath, "w") as jf:
        json.dump(save_file, jf, indent=indent)
    return 1


# ---------------------------------------------------------------------------
# Config functions (reference helper.py:60-228)
# ---------------------------------------------------------------------------


def load_config(loading_dir, file_name):
    """Load config from ``loading_dir/file_name`` if it exists, else ``None``."""
    json_file = join(loading_dir, file_name)
    if isfile(json_file):
        return load_json_file(json_file)
    return None


def save_config(config, file_name="config.json"):
    """Save config as indented json under ``config.dir.configs``."""
    Path(config.dir.configs).mkdir(exist_ok=True, parents=True)
    save_json_file(os.path.join(config.dir.configs, file_name), config, indent=4)


def create_config(host_dir=""):
    """Build the default config tree.

    Defaults are value-for-value those of the reference ``create_config``
    (helper.py:84-211); the added ``tpu`` section configures the JAX runtime.
    """
    if not host_dir:
        host_dir = os.path.join(os.path.expanduser("~"), "dmmfods_runs")

    config = {"dir": {"hosting": host_dir}}

    # script names kept for config-compat (reference helper.py:102-108)
    config["scripts"] = {
        "model": "dense_unet_lidar.py",
        "utils": "config.py",
        "agent": "dense_unet_agent.py",
        "dataset": "waymo.py",
        "setup": "cli",
    }

    # model params (reference helper.py:111-123)
    config["model"] = {
        "growth_rate": 32,
        "block_config": (6, 12, 24, 16),
        "num_init_features": 64,
        "stream_1_in_channels": 3,  # rgb if rgb+lidar | rgb if rgb only | lidar if lidar only
        "stream_2_in_channels": 1,  # lidar if rgb+lidar | 0 if single stream
        "concat_before_block_num": 2,
        "num_layers_before_blocks": 4,
        "bn_size": 4,
        "drop_rate": 0,
        "num_classes": 3,
        "memory_efficient": False,
    }

    # loss params (reference helper.py:125-133; `type` is a new knob wiring
    # the focal variants the reference ships but never connects)
    config["loss"] = {
        "type": "bce",  # bce | focal | class_wise_focal
        "alpha": 1,
        "gamma": 2,
        "logits": True,
        "reduce": False,
        "skip_v_every_n_its": False,
        "skip_p_every_n_its": False,
        "skip_b_every_n_its": False,
    }

    # loader params (reference helper.py:136-143)
    config["loader"] = {
        "mode": "train",
        "batch_size": None,
        "pin_memory": True,
        "num_workers": 4,
        "async_loading": True,
        "drop_last": False,
    }

    # optimizer params (reference helper.py:146-159)
    config["optimizer"] = {
        "type": "Adam",
        "learning_rate": 1e-3,
        "beta1": 0.9,
        "beta2": 0.999,
        "eps": 1e-08,
        "amsgrad": False,
        "weight_decay": 0,
        "lr_scheduler": {"want": False, "every_n_epochs": 30, "gamma": 0.1},
    }

    # waymo dataset info (reference helper.py:162-175)
    config["dataset"] = {
        "batch_size": 32,
        "label": {"1": "TYPE_VEHICLE", "2": "TYPE_PEDESTRIAN", "4": "TYPE_CYCLIST"},
        "images": {"original.size": (3, 1920, 1280), "size": (3, 192, 128)},
        "datatypes": ["images", "lidar", "labels", "heat_maps"],
        "file_list_name": "file_list.json",
    }

    # agent params (reference helper.py:178-191)
    config["agent"] = {
        "seed": 123,
        "max_epoch": 100,
        "iou_threshold": 0.7,
        "checkpoint": {
            "epoch": "epoch",
            "train_iteration": "train_iteration",
            "val_iteration": "val_iteration",
            "best_val_iou": "best_val_iou",
            "state_dict": "state_dict",
            "optimizer": "optimizer",
        },
        "best_checkpoint_name": "best_checkpoint",
    }

    # --- TPU-native additions (not in the reference) ---------------------
    config["tpu"] = {
        "compute_dtype": "bfloat16",  # matmul/conv dtype on TPU; f32 for parity tests
        "param_dtype": "float32",
        # inference fast paths (both exact; see ops/fused.py): phase-space
        # head + fused mid-fusion concat. Measured v5e b256: 7253 vs
        # 6294 fps without
        "use_fused_kernels": True,
        # per-dense-block lowering: XLA in-place-updates the early blocks'
        # concats by itself but leaves block3/4's as full concatenates
        # (4.3 ms/step at b256) — 'buffer' writes only the new channels
        "dense_block_impl": "concat,concat,buffer,buffer",
        "mesh": {
            "data": -1,    # -1: all remaining devices on the data axis
            "spatial": 1,  # image-H sharding (sequence-parallel analogue)
            "model": 1,    # tensor-parallel axis (output-channel sharding)
        },
        "shard_channel_threshold": 256,  # min out-channels for TP sharding
        "remat": False,                  # jax.checkpoint the encoder blocks
        "prefetch_depth": 2,             # host->device pipeline depth
        "donate": True,
        # raw-record training (north-star device-side preprocessing):
        # train from (RGB, LiDAR points, boxes) records; heat maps are
        # rasterized in-graph, the splat runs per `splat`
        "device_preprocess": False,
        "splat": "host",        # host: C++ runtime in prefetch threads
                                # device: in-graph scatter (make_train_step_raw)
        "max_points": 32768,    # padded point-buffer size for splat="device"
        "splat_threads": 2,     # host-splat worker threads per batch
        "native_prefetch": True,  # C++ read-ahead for dense .npy batch files
    }

    # subdirs (reference helper.py:194-209); rooted at host_dir
    config["dir"]["root"] = join(config["dir"]["hosting"], "DMMFODS", "dmmfods_tpu")
    for subdir in ["agents", "graphs", "utils", "datasets", "configs", "experiments"]:
        config["dir"][subdir] = join(config["dir"]["root"], subdir)
    config["dir"]["graphs"] = {"models": join(config["dir"]["graphs"], "models")}

    config["dir"]["data"] = {
        "root": join(config["dir"]["hosting"], "data"),
        "file_lists": join(config["dir"]["root"], "data"),
    }

    current_run = datetime.now().strftime("%Y-%m-%d-%H-%M")
    config["dir"]["current_run"] = {
        "summary": join(config["dir"]["experiments"], current_run, "summary"),
        "checkpoints": join(config["dir"]["experiments"], current_run, "checkpoints"),
    }

    return config


def get_config(host_dir="", file_name="config.json"):
    """Load config from json file or create the default (helper.py:213-223)."""
    config = load_config(join(host_dir, "DMMFODS", "dmmfods_tpu", "configs"), file_name)
    if config is None:
        config = create_config(host_dir)
    return edict(config)


def set_current_run(config, current_run):
    """Point the run dirs at a named run (reference helper.py:225-228)."""
    exp = config.dir.experiments
    config.dir.current_run.summary = join(exp, current_run, "summary")
    config.dir.current_run.checkpoints = join(exp, current_run, "checkpoints")
    return config
