"""Heat-map detection metrics, jit/vmap-vectorized.

Re-implements the reference metric semantics
(``dmmfods/utils/Dense_U_Net_lidar_helper.py:311-401``) without the per-sample
Python loop (helper.py:362): whole-image per-class IoU with 0/0 -> NaN, batch
aggregation with NaN-ignoring means + NaN counts, and class-wise pixel
accuracy. All functions take channel-LAST arrays: ``(H, W, C)`` or
``(B, H, W, C)``.

Parity quirk preserved on purpose: the reference agent thresholds *raw
logits* at ``iou_threshold`` (0.7) — no sigmoid — when computing IoU/accuracy
(``Dense_U_Net_lidar_Agent.py:252,259``). ``compute_iou_batch`` /
``compute_accuracy`` reproduce that when handed logits; use
``sigmoid=True`` for the probability-domain variant the benchmark also
reports.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def compute_iou_per_class(ground_truth_map, estimated_heat_map, threshold=0.7, *, sigmoid=False):
    """Whole-image per-class IoU for one sample, ``(H, W, C)`` -> ``(C,)``.

    Both maps are thresholded at ``threshold``; intersection = AND, union = OR
    (reference helper.py:311-343). ``union == 0`` yields NaN deliberately —
    "no object of this class anywhere" carries no IoU information.
    """
    if sigmoid:
        estimated_heat_map = jax.nn.sigmoid(estimated_heat_map)
    est = estimated_heat_map >= threshold
    gt = ground_truth_map >= threshold
    intersection = jnp.sum(est & gt, axis=(0, 1)).astype(jnp.float32)
    union = jnp.sum(est | gt, axis=(0, 1)).astype(jnp.float32)
    return intersection / union  # 0/0 -> NaN, as in the reference


def compute_iou_batch(ground_truth_map_batch, estimated_heat_map_batch, threshold=0.7, *, sigmoid=False):
    """Per-sample per-class IoU, ``(B, H, W, C)`` -> ``(B, C)`` (may hold NaN).

    Vectorized equivalent of reference ``compute_IoU_whole_img_batch``
    (helper.py:345-367), whose per-sample loop becomes a vmap.
    """
    return jax.vmap(compute_iou_per_class, in_axes=(0, 0, None))(
        ground_truth_map_batch,
        jax.nn.sigmoid(estimated_heat_map_batch) if sigmoid else estimated_heat_map_batch,
        threshold,
    )


def aggregate_iou(iou_per_instance_per_class):
    """NaN-ignoring per-class mean + NaN counts, as the agent aggregates
    (reference ``Dense_U_Net_lidar_Agent.py:252-256``): nanmean over the batch,
    any all-NaN class becomes 0, and NaNs are counted separately.

    Returns ``(iou_per_class (C,), nan_count_per_class (C,))``.
    """
    x = iou_per_instance_per_class
    isnan = jnp.isnan(x)
    valid = jnp.where(isnan, 0.0, x)
    count = jnp.sum(~isnan, axis=0)
    mean = jnp.sum(valid, axis=0) / jnp.maximum(count, 1)
    mean = jnp.where(count == 0, 0.0, mean)
    return mean, jnp.sum(isnan, axis=0).astype(jnp.float32)


def compute_accuracy(ground_truth, prediction, threshold=0.7, *, sigmoid=False):
    """Class-wise pixel accuracy (TP+TN)/all (reference helper.py:369-401).

    Accepts ``(H, W, C)`` or ``(B, H, W, C)``; both maps are thresholded.
    Returns ``(C,)``.
    """
    if sigmoid:
        prediction = jax.nn.sigmoid(prediction)
    if ground_truth.ndim == 3:
        axes = (0, 1)
    elif ground_truth.ndim == 4:
        axes = (0, 1, 2)
    else:
        raise ValueError(
            "Number of dimensions must be either 3 or 4, you gave " + str(ground_truth.ndim)
        )
    num_classes = ground_truth.shape[-1]
    bin_pred = prediction >= threshold
    bin_gt = ground_truth >= threshold
    per_class_elems = ground_truth.size / num_classes
    return jnp.sum(bin_pred == bin_gt, axis=axes) / per_class_elems


def heatmap_average_precision(ground_truth, logits, thresholds=None):
    """Pixel-wise per-class average precision over score thresholds.

    Benchmark-grade metric (not in the reference, which only has thresholded
    IoU/accuracy): sweeps sigmoid-probability thresholds, computes
    precision/recall per class against binarized GT (>= 0.7 as the reference
    threshold), and integrates via the trapezoid rule on the PR curve.

    Args:
      ground_truth: ``(B, H, W, C)`` heat maps in [0, 1].
      logits: ``(B, H, W, C)`` raw model outputs.
    Returns ``(C,)`` AP per class.
    """
    if thresholds is None:
        thresholds = jnp.linspace(0.05, 0.95, 19)
    probs = jax.nn.sigmoid(logits)
    gt = ground_truth >= 0.7

    def pr_at(t):
        pred = probs >= t
        tp = jnp.sum(pred & gt, axis=(0, 1, 2)).astype(jnp.float32)
        fp = jnp.sum(pred & ~gt, axis=(0, 1, 2)).astype(jnp.float32)
        fn = jnp.sum(~pred & gt, axis=(0, 1, 2)).astype(jnp.float32)
        precision = tp / jnp.maximum(tp + fp, 1.0)
        recall = tp / jnp.maximum(tp + fn, 1.0)
        return precision, recall

    precisions, recalls = jax.vmap(pr_at)(thresholds)  # (T, C)
    # sort by recall ascending per class, anchor the curve at recall 0 with
    # the precision of the lowest-recall point, and trapezoid-integrate
    order = jnp.argsort(recalls, axis=0)
    rec = jnp.take_along_axis(recalls, order, axis=0)
    prec = jnp.take_along_axis(precisions, order, axis=0)
    rec = jnp.concatenate([jnp.zeros_like(rec[:1]), rec], axis=0)
    prec = jnp.concatenate([prec[:1], prec], axis=0)
    return jnp.sum(
        (rec[1:] - rec[:-1]) * 0.5 * (prec[1:] + prec[:-1]), axis=0
    )
