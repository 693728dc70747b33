"""Detection-flavored Waymo dataset adapter.

Counterpart of the reference ``dmmfods/datasets/FasterRCNNData.py``: re-slices
each serialized 32-sample batch into detection minibatches and attaches
torchvision-style targets (boxes / labels / instance masks) built from the
pickled label dicts (FasterRCNNData.py:8-113). Differences from the plain
loader, preserved from the reference:

* images and LiDAR are normalized to [0, 1] (/255, FasterRCNNData.py:17-18);
* ``config.dataset.batch_size`` here is the *minibatch* size cut out of each
  serialized file (the reference reuses the same config key);
* labels ride along with every minibatch.
"""

from __future__ import annotations

import pickle
from os.path import join

import numpy as np

from .waymo import WaymoDataset, PrefetchLoader
from ..agents.detection_baseline import format_detection_targets


def _load_labels_for(root, rel_batch_path):
    head, _, name = rel_batch_path.rpartition("/")
    name = name.replace(".npy", "")
    with open(join(root, head, "labels", name), "rb") as fh:
        return pickle.load(fh)


class DetectionWaymoDataset(WaymoDataset):
    """Yields ``(image, lidar, ht_map, targets)`` detection minibatches."""

    def __init__(self, mode, config, minibatch_size=None):
        super().__init__(mode, config)
        if not self.data_is_batched:
            raise ValueError("detection adapter expects batched storage")
        self.minibatch_size = minibatch_size or config.dataset.batch_size
        self._file_batch = None  # (image, lidar, ht, labels) of current file
        self._file_idx = -1
        self._samples_per_file = None

    def minibatches_per_file(self):
        # serialized batch (32 in the reference layout, probed from the
        # actual file) -> samples / minibatch_size slices
        if self._samples_per_file is None:
            self._samples_per_file = super().get_batch(0)[0].shape[0]
        return self._samples_per_file // self.minibatch_size

    def shuffle_order(self, rng):
        """Epoch shuffle that stays FILE-major: permute files, then slots
        within each file — random training order without thrashing the
        one-file batch cache (a flat index shuffle would reload a 32-sample
        file for nearly every minibatch)."""
        per_file = self.minibatches_per_file()
        out = []
        for f in rng.permutation(len(self.files)):
            for s in rng.permutation(per_file):
                out.append(int(f) * per_file + int(s))
        return np.asarray(out)

    def __len__(self):
        return len(self.files) * self.minibatches_per_file()

    def __getitem__(self, idx):
        per_file = self.minibatches_per_file()
        file_idx, slot = divmod(idx, per_file)
        if file_idx != self._file_idx:
            image, lidar, ht = super().get_batch(file_idx)
            labels = _load_labels_for(self.root, self.files[file_idx])
            self._file_batch = (image, lidar, ht, labels)
            self._file_idx = file_idx
        image, lidar, ht, labels = self._file_batch
        sl = slice(slot * self.minibatch_size, (slot + 1) * self.minibatch_size)
        img_mb = image[sl] / 255.0
        lid_mb = lidar[sl] / 255.0
        ht_mb = ht[sl]
        label_mb = [labels[k] for k in range(sl.start, sl.stop)]
        targets = format_detection_targets(label_mb, ht_mb)
        return img_mb, lid_mb, ht_mb, targets


class DetectionWaymoLoader:
    """Loader bundle matching the reference FasterRCNN loader surface
    (FasterRCNNData.py:116-169)."""

    def __init__(self, config, minibatch_size=None):
        self.mode = config.loader.mode
        if self.mode == "train":
            train_set = DetectionWaymoDataset("train", config, minibatch_size)
            valid_set = DetectionWaymoDataset("val", config, minibatch_size)
            # epoch-reshuffled training order (file-major, see
            # DetectionWaymoDataset.shuffle_order). The reference only
            # shuffles once at serialization time (helper.py:687), so its
            # detection training sees a fixed order every epoch — fixed here.
            self.train_loader = PrefetchLoader(
                train_set, shuffle=True,
                seed=config.agent.get("seed", 0),
            )
            self.valid_loader = PrefetchLoader(valid_set)
            self.train_iterations = len(train_set)
            self.valid_iterations = len(valid_set)
        elif self.mode == "test":
            test_set = DetectionWaymoDataset("test", config, minibatch_size)
            self.valid_loader = PrefetchLoader(test_set)
            self.valid_iterations = len(test_set)
        else:
            raise ValueError("Please choose a one of the following modes: train, val, test")
