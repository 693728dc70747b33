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
  (FasterRCNNAgent.py:324-425),
* :class:`DetectionAgent` — the full agent lifecycle for the TPU-native
  CenterNet baseline (``models/detector.py``): construction / run / train /
  validate / checkpoint / resume / TensorBoard taxonomy — the reference
  baseline agent's surface (FasterRCNNAgent.py:96-425). Exported under the
  reference's (deliberately reused) class name too.
"""

from __future__ import annotations

import logging
import os
from dataclasses import dataclass
from datetime import datetime
from pathlib import Path
from typing import Any, Callable, Dict, List, Sequence

import numpy as np

import jax
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

    def validate_instances(self, detection_loader) -> Dict[str, Any]:
        """Instance-level evaluation over a ``DetectionWaymoLoader``
        (``data/detection.py``): per-class mask IoU + recall of the
        detector's instances against the torchvision-style targets."""
        num_classes = self.config.model.num_classes
        totals = None
        ap_acc = InstanceAPAccumulator(num_classes)
        for image, lidar, ht_map, targets in detection_loader:
            preds = self.detector(image, lidar if self.use_lidar else None)
            preds = [
                {k: np.asarray(v) for k, v in p.items()} for p in preds
            ]
            ap_acc.update(preds, targets)
            r = evaluate_instance_masks(preds, targets, num_classes)
            if totals is None:
                totals = {k: np.zeros_like(np.asarray(v, np.float64))
                          for k, v in r.items()}
            n = r["num_instances_per_class"]
            totals["mask_iou_per_class"] += r["mask_iou_per_class"] * np.maximum(n, 1)
            totals["recall_per_class"] += r["recall_per_class"] * np.maximum(n, 1)
            totals["num_instances_per_class"] += n
        if totals is None:
            return {}
        denom = np.maximum(totals["num_instances_per_class"], 1)
        result = {
            "mask_iou_per_class": totals["mask_iou_per_class"] / denom,
            "recall_per_class": totals["recall_per_class"] / denom,
            "num_instances_per_class": totals["num_instances_per_class"],
            "map50_per_class": ap_acc.result(),
        }
        self.logger.info(
            "Instance validation | mask IoU: %s | recall: %s | instances: %s"
            " | mAP@0.5: %s",
            result["mask_iou_per_class"].tolist(),
            result["recall_per_class"].tolist(),
            result["num_instances_per_class"].tolist(),
            result["map50_per_class"].tolist(),
        )
        return result


def evaluate_instance_masks(preds, targets, num_classes=3, *,
                            mask_threshold=0.5, match_iou=0.5):
    """Instance-level mask-IoU scoring of detections against the
    torchvision-style targets from ``data/detection.py`` (the
    ``DetectionWaymoDataset`` consumer): every GT instance is matched to the
    best same-class predicted mask; reports per-class mean matched IoU and
    recall at ``match_iou``. A finer baseline comparison than collapsing to
    class heat maps (rectangular-mask errors show up here).

    Args:
      preds: per-sample list of dicts with ``masks (N, H, W)`` (probabilities),
        ``labels (N,)`` and optional ``scores``.
      targets: per-sample list of :class:`DetectionTargets`.
    Returns dict with ``mask_iou_per_class``, ``recall_per_class`` (C,) and
    ``num_instances_per_class``.
    """
    iou_sum = np.zeros(num_classes)
    matched = np.zeros(num_classes)
    count = np.zeros(num_classes)
    for p, t in zip(preds, targets):
        pred_masks = np.asarray(p["masks"]) >= mask_threshold
        pred_labels = np.asarray(p["labels"])
        for i in range(len(t.labels)):
            cls = int(t.labels[i])
            count[cls] += 1
            gt = t.masks[i] >= mask_threshold
            if gt.sum() == 0:
                matched[cls] += 1  # empty GT mask: trivially covered
                iou_sum[cls] += 1.0
                continue
            same = pred_masks[pred_labels == cls]
            best = 0.0
            for pm in same:
                union = np.logical_or(pm, gt).sum()
                if union:
                    best = max(best, np.logical_and(pm, gt).sum() / union)
            iou_sum[cls] += best
            if best >= match_iou:
                matched[cls] += 1
    denom = np.maximum(count, 1)
    return {
        "mask_iou_per_class": iou_sum / denom,
        "recall_per_class": matched / denom,
        "num_instances_per_class": count,
    }


class InstanceAPAccumulator:
    """Dataset-level instance mAP@``match_iou`` over scored mask detections —
    the standard comparison metric for Faster/Mask-R-CNN-style baselines
    (the reference's torchvision baseline would be scored this way).

    Greedy COCO-style matching per sample and class: predictions sorted by
    descending score each claim the unmatched GT with the highest mask IoU
    (a claim needs IoU >= ``match_iou``); TP/FP decisions plus scores stream
    into per-class lists, and :meth:`result` finishes the exact PR-curve
    area (precision-at-each-TP / num GT)."""

    def __init__(self, num_classes=3, *, match_iou=0.5, mask_threshold=0.5):
        self.num_classes = num_classes
        self.match_iou = match_iou
        self.mask_threshold = mask_threshold
        self.scores = [[] for _ in range(num_classes)]
        self.is_tp = [[] for _ in range(num_classes)]
        self.num_gt = np.zeros(num_classes, np.int64)

    def update(self, preds, targets):
        """``preds``/``targets`` as in :func:`evaluate_instance_masks`;
        ``preds[i]['scores']`` defaults to all-ones when absent."""
        for p, t in zip(preds, targets):
            pred_masks = np.asarray(p["masks"]) >= self.mask_threshold
            pred_labels = np.asarray(p["labels"])
            scores = np.asarray(
                p.get("scores", np.ones(len(pred_labels), np.float32))
            )
            gt_masks = np.asarray(t.masks) >= self.mask_threshold
            gt_labels = np.asarray(t.labels)
            for cls in range(self.num_classes):
                self.num_gt[cls] += int((gt_labels == cls).sum())
                gt_idx = np.flatnonzero(gt_labels == cls)
                taken = np.zeros(len(gt_idx), bool)
                sel = np.flatnonzero(pred_labels == cls)
                for pi in sel[np.argsort(-scores[sel])]:
                    pm = pred_masks[pi]
                    best_iou, best_j = 0.0, -1
                    for j, gi in enumerate(gt_idx):
                        if taken[j]:
                            continue
                        gm = gt_masks[gi]
                        union = np.logical_or(pm, gm).sum()
                        iou = (np.logical_and(pm, gm).sum() / union
                               if union else 0.0)
                        if iou > best_iou:
                            best_iou, best_j = iou, j
                    tp = best_iou >= self.match_iou
                    if tp:
                        taken[best_j] = True
                    self.scores[cls].append(float(scores[pi]))
                    self.is_tp[cls].append(bool(tp))

    def result(self):
        """Per-class AP (C,): area under the exact stepwise PR curve."""
        ap = np.zeros(self.num_classes, np.float32)
        for cls in range(self.num_classes):
            if self.num_gt[cls] == 0:
                continue
            if not self.scores[cls]:
                ap[cls] = 0.0
                continue
            order = np.argsort(-np.asarray(self.scores[cls]))
            tp = np.asarray(self.is_tp[cls], np.float64)[order]
            tp_cum = np.cumsum(tp)
            precision = tp_cum / np.arange(1, len(tp) + 1)
            ap[cls] = float(np.sum(precision * tp) / self.num_gt[cls])
        return ap


class DetectionAgent:
    """Full lifecycle for the TPU-native CenterNet detection baseline.

    Mirrors the reference baseline agent's surface
    (``dmmfods/agents/FasterRCNNAgent.py``: ``__init__`` builds model /
    optimizer / loaders / writers (:25-94), ``run``/``train`` epoch loop
    with per-epoch checkpoint + best-IoU tracking (:96-252),
    ``train_one_epoch`` (:254-322), ``validate`` bridging detections into
    the heat-map metric suite (:324-425)) — with the TPU internals: one
    jitted train step (in-graph center-target generation + fwd/bwd/Adam,
    ``models/detector.py::make_detection_train_step``) and one jitted eval
    step (forward -> decode -> mask bridge -> heat-map metrics vs the
    in-graph-rasterized GT).

    Data: consumes the raw-record batch tuples ``(image, lidar, boxes)``
    (the ``tpu.splat='host'`` loader format) — padded box buffers are
    exactly what both target generation and GT rasterization need.
    """

    def __init__(self, config=None, torchvision_init=True, *, data_loader=None,
                 detector=None, use_mesh=True):
        import optax

        from ..config import get_config
        from ..models.detector import (
            CenterNetDetector, make_detection_train_step,
        )
        from ..parallel import mesh as mesh_lib
        from ..utils.summary import StepTimer, SummaryWriter

        self.logger = logging.getLogger("DetectionAgent")
        self.config = config if config is not None else get_config()
        cfg = self.config
        m = cfg.model

        self.detector = detector or CenterNetDetector(
            num_classes=m.num_classes,
            growth_rate=m.growth_rate,
            block_config=tuple(m.block_config),
            num_init_features=m.num_init_features,
            bn_size=m.bn_size,
            use_lidar=m.stream_2_in_channels > 0,
            dtype=jnp.dtype(cfg.tpu.get("compute_dtype", "float32")),
        )

        # data loader (reference agent:86-88)
        if data_loader is not None:
            self.data_loader = data_loader
        else:
            from ..data.waymo import WaymoDataset_Loader

            self.data_loader = WaymoDataset_Loader(cfg)

        _, w, h = cfg.dataset.images.size  # (C, W, H) reference convention
        self.hw = (int(h), int(w))
        _, full_w, full_h = cfg.dataset.images["original.size"]
        self.full_hw = (int(full_h), int(full_w))
        # the pooled rasterizer (eval GT) assumes one isotropic pool factor;
        # a mismatched aspect config would silently mis-scale box x/width
        assert self.full_hw[1] // self.hw[1] == self.full_hw[0] // self.hw[0], (
            f"anisotropic resize not supported: width scale "
            f"{self.full_hw[1] // self.hw[1]} != height scale "
            f"{self.full_hw[0] // self.hw[0]}"
        )
        self.scale = self.full_hw[0] // self.hw[0]

        # init params on host CPU (same rationale as the main model ctor;
        # LOCAL devices only — jax.devices() lists other hosts' first under
        # multi-process)
        rgb0 = jnp.zeros((1, h, w, 3), jnp.float32)
        lidar0 = jnp.zeros((1, h, w, 1), jnp.float32) if m.stream_2_in_channels else None
        try:
            cpu0 = jax.local_devices(backend="cpu")[0]
        except RuntimeError:
            cpu0 = jax.local_devices()[0]
        with jax.default_device(cpu0):
            variables = self.detector.init(
                jax.random.PRNGKey(cfg.agent.seed), rgb0, lidar0, False
            )
        if jax.local_devices()[0].platform != "cpu":
            variables = jax.device_put(variables, jax.local_devices()[0])
        self.params = variables["params"]
        self.batch_stats = variables.get("batch_stats", {})

        opt = cfg.optimizer
        self.tx = optax.adam(opt.learning_rate, b1=opt.beta1, b2=opt.beta2,
                             eps=opt.eps)
        self.opt_state = self.tx.init(self.params)

        # the baseline rides the same dp machinery as the main agent
        # (tpu.mesh honored; reference baseline is single-GPU like the main
        # reference agent, FasterRCNNAgent.py:90-94): params replicated,
        # batches sharded over the data axis in _put()
        self.mesh = mesh_lib.make_mesh(cfg) if use_mesh else None
        self._mesh_lib = mesh_lib
        if self.mesh is not None:
            replicated = mesh_lib.replicated(self.mesh)
            self.params = jax.device_put(self.params, replicated)
            self.batch_stats = jax.device_put(self.batch_stats, replicated)
            self.opt_state = jax.device_put(self.opt_state, replicated)

        # raw-record boxes are in FULL-resolution label coordinates
        # (the rasterizer's contract); center targets want model-input
        # pixels — rescale in-graph before target generation
        base_step = make_detection_train_step(
            self.detector, self.tx,
            out_height=h // 4, out_width=w // 4, stride=4, donate=False,
        )
        box_scale = float(self.full_hw[0] // int(h))

        # data-parallel only for the detector (no spatial/model axes: the
        # in-graph center-target generation and top-k decode are per-sample)
        self._data_sharding = None
        if self.mesh is not None and "data" in self.mesh.shape:
            self._data_sharding = jax.sharding.NamedSharding(
                self.mesh, jax.sharding.PartitionSpec("data"))
        data_sharding = self._data_sharding

        def train_step(params, batch_stats, opt_state, image, lidar, boxes):
            if data_sharding is not None:
                image = jax.lax.with_sharding_constraint(image, data_sharding)
                lidar = jax.lax.with_sharding_constraint(lidar, data_sharding)
                boxes = jax.lax.with_sharding_constraint(boxes, data_sharding)
            b = boxes.astype(jnp.float32)
            scaled = jnp.concatenate([b[..., :1], b[..., 1:] / box_scale], axis=-1)
            return base_step(params, batch_stats, opt_state, image, lidar, scaled)

        donate = (0, 1, 2) if cfg.tpu.get("donate", True) else ()
        self.train_step = jax.jit(train_step, donate_argnums=donate)
        self.eval_step = self._make_eval_step()

        # counters (reference agent:100-104)
        self.current_epoch = 0
        self.current_train_iteration = 0
        self.current_val_iteration = 0
        self.best_val_iou = 0.0

        if not torchvision_init:
            self.load_checkpoint()

        Path(cfg.dir.current_run.summary).mkdir(exist_ok=True, parents=True)
        self.train_summary_writer = SummaryWriter(cfg.dir.current_run.summary)
        self.val_summary_writer = SummaryWriter(cfg.dir.current_run.summary)
        self.step_timer = StepTimer()

    # -- jitted eval: forward -> decode -> bridge -> heat-map metrics ------

    def _make_eval_step(self):
        from ..models.detector import decode_detections
        from ..ops import preprocess as pp

        h, w = self.hw
        num_classes = self.config.model.num_classes
        thr = self.config.agent.iou_threshold
        detector = self.detector
        pool = self.scale

        @jax.jit
        def step(params, batch_stats, image, lidar, boxes):
            out = detector.apply(
                {"params": params, "batch_stats": batch_stats},
                image, lidar, False,
            )
            det = decode_detections(out, mask_height=h, mask_width=w)
            # full-res label boxes -> model-resolution detection space
            pred_maps = jax.vmap(
                lambda m, l, s: instance_masks_to_heatmaps(m, l, num_classes, s)
            )(det["masks"], det["labels"], det["scores"])
            ht = jax.vmap(
                lambda b: pp.rasterize_heatmaps_direct(b, h, w, pool)
            )(boxes)
            elementwise = losses.bce_with_logits(pred_maps, ht)
            iou_inst = metrics.compute_iou_batch(ht, pred_maps, thr)
            iou, nans = metrics.aggregate_iou(iou_inst)
            return {
                "loss_per_class": losses.per_class_loss(elementwise),
                "iou_per_class": iou,
                "iou_nans": nans,
                "acc_per_class": metrics.compute_accuracy(ht, pred_maps, thr),
                "ap_per_class": metrics.heatmap_average_precision(ht, pred_maps),
            }

        return step

    # -- checkpointing (reference agent:106-183) ---------------------------

    def save_checkpoint(self, filename="detector_checkpoint", is_best=False):
        from ..utils import checkpoint as ckpt_lib

        return ckpt_lib.save_checkpoint(
            self.config,
            params=self.params,
            batch_stats=self.batch_stats,
            opt_state=self.opt_state,
            epoch=self.current_epoch,
            train_iteration=self.current_train_iteration,
            val_iteration=self.current_val_iteration,
            best_val_iou=self.best_val_iou,
            filename=filename,
            is_best=is_best,
        )

    def load_checkpoint(self, filename="detector_checkpoint"):
        from ..utils import checkpoint as ckpt_lib

        template = {
            "params": self.params,
            "batch_stats": self.batch_stats,
            "opt_state": self.opt_state,
        }
        restored = ckpt_lib.load_checkpoint(
            self.config, template=template, filename=filename
        )
        if restored is None:
            self.logger.info("**First time to train**")
            return
        keys = self.config.agent.checkpoint
        self.current_epoch = int(restored[keys.epoch])
        self.current_train_iteration = int(restored[keys.train_iteration])
        self.current_val_iteration = int(restored[keys.val_iteration])
        self.best_val_iou = float(restored[keys.best_val_iou])
        self.params = restored[keys.state_dict]["params"]
        self.batch_stats = restored[keys.state_dict]["batch_stats"]
        self.opt_state = restored[keys.optimizer]
        if self.mesh is not None:
            # orbax restores to default placement; steps expect
            # mesh-replicated state (same as the main agent's resume path)
            replicated = self._mesh_lib.replicated(self.mesh)
            self.params = jax.device_put(self.params, replicated)
            self.batch_stats = jax.device_put(self.batch_stats, replicated)
            self.opt_state = jax.device_put(self.opt_state, replicated)

    def _put(self, batch):
        if self._data_sharding is None:
            return batch
        return tuple(jax.device_put(x, self._data_sharding) for x in batch)

    # -- run / train / validate (reference agent:185-425) ------------------

    def run(self):
        print("starting " + self.config.loader.mode + " at " + str(datetime.now()))
        try:
            if self.config.loader.mode == "test":
                self.validate()
            else:
                self.train()
        except KeyboardInterrupt:
            self.logger.info("You have entered CTRL+C.. Wait to finalize")

    def train(self):
        for epoch in range(self.current_epoch, self.config.agent.max_epoch):
            self.current_epoch = epoch
            self.train_one_epoch()
            avg_iou = self.validate()
            val_iou = float(np.mean(avg_iou))
            is_best = val_iou > self.best_val_iou
            if is_best:
                self.best_val_iou = val_iou
            self.save_checkpoint(is_best=is_best)
        self.train_summary_writer.close()
        self.val_summary_writer.close()

    def train_one_epoch(self):
        parts_hist = []
        for batch in self.data_loader.train_loader:
            image, lidar, boxes = self._put(batch)
            self.step_timer.start()
            (self.params, self.batch_stats, self.opt_state, loss, parts
             ) = self.train_step(
                self.params, self.batch_stats, self.opt_state,
                image, lidar, boxes,
            )
            self.step_timer.stop(loss)
            parts_hist.append({k: np.asarray(v) for k, v in parts.items()})
            for k, v in parts.items():
                self.train_summary_writer.add_scalar(
                    f"Training/Loss/{k}", float(np.asarray(v)),
                    self.current_train_iteration,
                )
            self.current_train_iteration += 1
        self.train_summary_writer.flush()
        means = {
            k: float(np.mean([p[k] for p in parts_hist]))
            for k in parts_hist[0]
        } if parts_hist else {}
        self.logger.info(
            "Detector training at Epoch-%d | %s | mean step %.4fs",
            self.current_epoch, means, self.step_timer.mean,
        )

    def validate(self):
        epoch_metrics = []
        for batch in self.data_loader.valid_loader:
            image, lidar, boxes = self._put(batch)
            m = self.eval_step(self.params, self.batch_stats, image, lidar, boxes)
            epoch_metrics.append(m)
            self.val_summary_writer.add_class_scalars(
                "Validation/Loss", m["loss_per_class"], self.current_val_iteration
            )
            self.val_summary_writer.add_class_scalars(
                "Validation/IoU", m["iou_per_class"], self.current_val_iteration
            )
            self.val_summary_writer.add_class_scalars(
                "Validation/Accuracy", m["acc_per_class"], self.current_val_iteration
            )
            self.val_summary_writer.add_class_scalars(
                "Validation/AP", m["ap_per_class"], self.current_val_iteration
            )
            self.current_val_iteration += 1
        self.val_summary_writer.flush()
        if not epoch_metrics:
            return np.zeros(self.config.model.num_classes)
        iou = np.mean([np.asarray(m["iou_per_class"]) for m in epoch_metrics], axis=0)
        ap = np.mean([np.asarray(m["ap_per_class"]) for m in epoch_metrics], axis=0)
        nans = np.sum([np.asarray(m["iou_nans"]) for m in epoch_metrics], axis=0)
        self.logger.info(
            "Detector validation at Epoch-%d | Average IoU: %s | AP: %s | NaNs: %s",
            self.current_epoch, iou.tolist(), ap.tolist(), nans.tolist(),
        )
        return iou

    def finalize(self):
        self.logger.info("Please wait while finalizing the operation.. Thank you")
        self.train_summary_writer.close()
        self.val_summary_writer.close()
        print("ending " + self.config.loader.mode + " at " + str(datetime.now()))


# The reference's baseline agent file intentionally reuses the main agent's
# class name (FasterRCNNAgent.py:25) — keep that surface available here.
Dense_U_Net_lidar_Agent = DetectionAgent
