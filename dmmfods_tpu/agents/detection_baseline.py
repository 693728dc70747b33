"""Detection-baseline bridge: instance detections <-> heat-map metrics.

The reference ships a second agent (``dmmfods/agents/FasterRCNNAgent.py``)
that wraps torchvision Mask-R-CNN as a comparison baseline and evaluates it
with the *same heat-map metric suite* by collapsing predicted instance masks
into class heat maps (FasterRCNNAgent.py:375-380). A CUDA-bound torchvision
model has no TPU equivalent, so this module provides the TPU-native pieces
(SURVEY.md §7.2 step 8):

* :func:`instance_masks_to_heatmaps` — the mask -> heat-map bridge,
* :class:`DetectionTargets` formatting — serialized label dicts ->
  detection-style targets (boxes / labels / per-instance masks cropped from
  heat maps), the reference ``Cache.format_bbs`` semantics
  (FasterRCNNData.py:34-84) incl. boxes / 10 rescale to 128x192 and the
  [0, 1] image normalization (FasterRCNNData.py:17-18),
* :class:`DetectionBaselineAgent` — evaluates ANY detection callable
  (``(images, lidar) -> list[{'masks', 'labels', 'scores'}]``) against the
  heat-map ground truth with the reference's validate loop taxonomy
  (FasterRCNNAgent.py:324-425).
"""

from __future__ import annotations

import logging
from dataclasses import dataclass
from typing import Any, Callable, Dict, List, Sequence

import numpy as np

import jax.numpy as jnp

from .. import losses, metrics


def instance_masks_to_heatmaps(masks, labels, num_classes=3, scores=None,
                               score_threshold=0.0):
    """Collapse instance masks into per-class heat maps.

    Args:
      masks: ``(N, H, W)`` float mask probabilities for N instances.
      labels: ``(N,)`` int class indices in [0, num_classes).
      scores: optional ``(N,)`` confidences; instances below
        ``score_threshold`` are dropped.
    Returns ``(H, W, num_classes)``: per class, the pixel-wise max over that
    class's instance masks (reference FasterRCNNAgent.py:375-380).
    """
    masks = jnp.asarray(masks)
    labels = jnp.asarray(labels)
    n, h, w = masks.shape
    keep = jnp.ones((n,), bool) if scores is None else jnp.asarray(scores) >= score_threshold
    onehot = (labels[:, None] == jnp.arange(num_classes)[None, :]) & keep[:, None]
    # (N, H, W, 1) * (N, 1, 1, C) -> max over instances
    contrib = masks[:, :, :, None] * onehot[:, None, None, :]
    return jnp.max(contrib, axis=0) if n else jnp.zeros((h, w, num_classes))


@dataclass
class DetectionTargets:
    """Per-sample detection targets in the torchvision-style schema."""

    boxes: np.ndarray   # (N, 4) [x1, y1, x2, y2] at model resolution
    labels: np.ndarray  # (N,) class idx 0/1/2
    masks: np.ndarray   # (N, H, W) instance masks cropped from heat maps


def format_detection_targets(label_dicts: Sequence[dict], ht_maps: np.ndarray,
                             scale: float = 10.0) -> List[DetectionTargets]:
    """Serialized label dicts + heat maps -> per-sample detection targets.

    Mirrors reference ``Cache.format_bbs`` (FasterRCNNData.py:34-84): boxes
    are divided by ``scale`` (full-res labels -> 128x192 storage), the class
    remap is {1,2,4} -> {0,1,2}, and each instance mask is the sample's class
    heat map zeroed outside the instance's box.
    """
    out = []
    h, w = ht_maps.shape[1:3]
    remap = {1: 0, 2: 1, 4: 2}
    for j, sample in enumerate(label_dicts):
        n = len(sample)
        boxes = np.zeros((n, 4), np.float32)
        labels = np.zeros((n,), np.int64)
        masks = np.zeros((n, h, w), np.float32)
        for i, bb in enumerate(sample.values()):
            x1, y1 = bb["x"] / scale, bb["y"] / scale
            x2, y2 = x1 + bb["width"] / scale, y1 + bb["height"] / scale
            boxes[i] = [x1, y1, x2, y2]
            cls = remap.get(bb["type"], 0)
            labels[i] = cls
            mask = np.array(ht_maps[j, :, :, cls])
            mask[:, : int(x1)] = 0
            mask[:, int(x2):] = 0
            mask[: int(y1), :] = 0
            mask[int(y2):, :] = 0
            masks[i] = mask
        out.append(DetectionTargets(boxes=boxes, labels=labels, masks=masks))
    return out


class DetectionBaselineAgent:
    """Heat-map evaluation harness for an arbitrary detection model.

    ``detector(images, lidar) -> list`` of per-sample dicts with ``masks``
    ``(N, H, W)``, ``labels`` ``(N,)`` and optional ``scores``. ``validate``
    runs the reference baseline-agent eval loop: bridge detections to heat
    maps, then BCE / IoU / NaN-count / accuracy per class
    (FasterRCNNAgent.py:369-425).
    """

    def __init__(self, config, detector: Callable, *, use_lidar=True):
        self.config = config
        self.detector = detector
        self.use_lidar = use_lidar
        self.logger = logging.getLogger("DetectionBaselineAgent")

    def validate(self, loader) -> Dict[str, Any]:
        num_classes = self.config.model.num_classes
        thr = self.config.agent.iou_threshold
        all_iou, all_nans, all_acc, all_loss = [], [], [], []
        for image, lidar, ht_map in loader:
            preds = self.detector(image, lidar if self.use_lidar else None)
            pred_maps = jnp.stack(
                [
                    instance_masks_to_heatmaps(
                        p["masks"], p["labels"], num_classes, p.get("scores")
                    )
                    for p in preds
                ]
            )
            ht = jnp.asarray(ht_map)
            # bridge outputs are probabilities; reference feeds them to the
            # same logit-domain loss/metrics unchanged — preserved
            elementwise = losses.bce_with_logits(pred_maps, ht)
            iou_inst = metrics.compute_iou_batch(ht, pred_maps, thr)
            iou, nans = metrics.aggregate_iou(iou_inst)
            acc = metrics.compute_accuracy(ht, pred_maps, thr)
            all_loss.append(np.asarray(losses.per_class_loss(elementwise)))
            all_iou.append(np.asarray(iou))
            all_nans.append(np.asarray(nans))
            all_acc.append(np.asarray(acc))

        result = {
            "loss_per_class": np.mean(all_loss, axis=0),
            "iou_per_class": np.mean(all_iou, axis=0),
            "iou_nans": np.sum(all_nans, axis=0),
            "acc_per_class": np.mean(all_acc, axis=0),
        }
        self.logger.info(
            "Baseline validation | Average Loss: %s | Average IoU: %s | "
            "NaNs: %s | Average Accuracy: %s",
            result["loss_per_class"].tolist(), result["iou_per_class"].tolist(),
            result["iou_nans"].tolist(), result["acc_per_class"].tolist(),
        )
        return result
