"""dmmfods_tpu — TPU-native multi-modal heat-map object detection framework.

A ground-up JAX/XLA/Pallas re-design of DMMFODS ("Deep Multi-Modal Fusion
Architecture for Heat Map-Based Object Detection using Segmentation"):
RGB + LiDAR -> per-pixel class heat maps on the Waymo Open Dataset, with a
DenseNet/U-Net dual-stream model (no/early/mid fusion), device-side Waymo
preprocessing, jit-compiled data-parallel training over TPU meshes, and
Pallas kernels for the fusion hot path.

Public surface mirrors the reference (config tree, model constructors,
Agent API, losses, metrics) while being idiomatic JAX underneath.
"""

from .config import (
    create_config,
    get_config,
    load_config,
    save_config,
    set_current_run,
)
from .utils.edict import EDict

__version__ = "0.1.0"

__all__ = [
    "create_config",
    "get_config",
    "load_config",
    "save_config",
    "set_current_run",
    "EDict",
]
