"""Quickstart: the full DMMFODS-TPU workflow, programmatically.

Runs end-to-end on synthetic Waymo-like data (no dataset download needed):
build config -> model -> train a few epochs -> validate -> checkpoint ->
serve. Mirrors what `python -m dmmfods_tpu.cli train / eval / assess` do
against a real converted dataset (see docs/WORKFLOW.md).

Run:  python examples/quickstart.py [workdir]
"""

import os
import sys

# allow running straight from a repo checkout (`python examples/quickstart.py`)
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import dmmfods_tpu
from dmmfods_tpu.agents.dense_unet_agent import Dense_U_Net_lidar_Agent
from dmmfods_tpu.data.synthetic import SyntheticDataset
from dmmfods_tpu.data.waymo import PrefetchLoader
from dmmfods_tpu.serving import InferenceEngine


def main(workdir="/tmp/dmmfods_quickstart"):
    config = dmmfods_tpu.get_config(workdir)
    # small setup so the demo runs anywhere; drop these four lines on a TPU
    # to train the full DenseNet-121 (note: the densenet121_u_lidar
    # constructor pins growth/block_config/num_init_features itself)
    config.tpu.compute_dtype = "float32"
    config.agent.max_epoch = 2
    config.dataset.images.size = (3, 96, 64)  # (C, W, H)
    config.tpu.mesh.data = 1

    dataset = SyntheticDataset(num_batches=3, batch_size=2, h=64, w=96)

    class Loader:
        train_loader = PrefetchLoader(dataset)
        valid_loader = PrefetchLoader(dataset)
        train_iterations = len(dataset)
        valid_iterations = len(dataset)

    agent = Dense_U_Net_lidar_Agent(config, torchvision_init=False, data_loader=Loader())
    agent.run()          # train max_epoch epochs, validate, checkpoint each epoch
    agent.finalize()
    print(f"trained {agent.current_train_iteration} steps; "
          f"best val IoU {agent.best_val_iou:.4f}")

    # serve the trained model
    engine = InferenceEngine(agent.model, buckets=(2,), height=64, width=96)
    image, lidar, _ = dataset[0]
    engine._variables = {"params": agent.state.params,
                         "batch_stats": agent.state.batch_stats}
    heatmaps = engine.run(image, lidar)
    print("served heat maps:", heatmaps.shape,
          "probability range", round(float(heatmaps.min()), 3),
          round(float(heatmaps.max()), 3))


if __name__ == "__main__":
    main(*sys.argv[1:2])
