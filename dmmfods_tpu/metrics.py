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


def heatmap_average_precision(ground_truth, logits, gt_threshold=0.7):
    """Exact pixel-wise per-class average precision (no threshold grid).

    Benchmark-grade metric (not in the reference, which only has thresholded
    IoU/accuracy). **Pinned definition** (recorded in BASELINE.md so parity
    numbers are reproducible): every pixel is a scored candidate (the raw
    logit — sigmoid is monotone, so sorting logits sorts probabilities); GT
    positives are pixels whose heat-map value is >= ``gt_threshold`` (0.7,
    the reference IoU threshold); pixels sorted by descending score give the
    exact stepwise PR curve, and

        AP = (1/P) * sum over positives of precision-at-that-positive

    — the interpolation-free area under the PR curve
    (sklearn ``average_precision_score`` semantics). A class with zero GT
    positives scores 0. Every prediction participates; no grid choice can
    move the number.

    Args:
      ground_truth: ``(B, H, W, C)`` heat maps in [0, 1].
      logits: ``(B, H, W, C)`` raw model outputs.
    Returns ``(C,)`` AP per class, float32.
    """
    num_classes = ground_truth.shape[-1]
    gt = (ground_truth >= gt_threshold).reshape(-1, num_classes).T  # (C, N)
    scores = logits.astype(jnp.float32).reshape(-1, num_classes).T  # (C, N)
    n = scores.shape[-1]

    def ap_one(s, g):
        # descending-score order; sort_key trick keeps one sort per class
        g_sorted = jnp.take(g, jnp.argsort(-s)).astype(jnp.float32)
        tp = jnp.cumsum(g_sorted)
        precision = tp / jnp.arange(1, n + 1, dtype=jnp.float32)
        positives = tp[-1]
        return jnp.where(
            positives > 0,
            jnp.sum(precision * g_sorted) / jnp.maximum(positives, 1.0),
            0.0,
        )

    return jax.vmap(ap_one)(scores, gt)


# ---------------------------------------------------------------------------
# dataset-level (pooled) AP: bounded-memory streaming across batches
# ---------------------------------------------------------------------------
#
# A mean of per-batch APs is NOT the AP of the whole val set — AP is a global
# sort over every scored pixel. Holding every pixel of an epoch is unbounded,
# so the epoch metric streams fixed-size per-class score histograms instead:
# each batch contributes (positives, totals) counts over NUM_AP_BINS uniform
# sigmoid-probability bins (a jit-compiled device reduction), the host sums
# them (integer addition — exact, order-independent), and the final AP is the
# standard tie-aware PR-curve area over the binned thresholds:
#
#     AP = (1/P) * sum over bins b (descending score) of
#              pos_b * TP_cum(b) / N_cum(b)
#
# which equals sklearn's `average_precision_score` computed on quantized
# scores, and equals `heatmap_average_precision` on the concatenated pixels
# EXACTLY whenever no two pixels share a bin (pinned by
# `test_metrics_losses.py::test_streaming_ap_equals_pooled_exact`); otherwise
# the difference is bounded by the bin width (2**-15 in probability).

NUM_AP_BINS = 1 << 15


def binned_ap_counts(ground_truth, logits, gt_threshold=0.7, num_bins=NUM_AP_BINS):
    """Per-batch streaming-AP contribution: ``(B, H, W, C) x2 ->
    (2, C, num_bins) int32`` — ``[0]`` positives per score bin, ``[1]`` all
    pixels per score bin. Bin index = ``floor(sigmoid(logit) * num_bins)``
    (clipped), so bin ``num_bins - 1`` holds the highest scores."""
    num_classes = ground_truth.shape[-1]
    gt = (ground_truth >= gt_threshold).reshape(-1, num_classes).T  # (C, N)
    probs = jax.nn.sigmoid(logits.astype(jnp.float32)).reshape(-1, num_classes).T
    bins = jnp.clip((probs * num_bins).astype(jnp.int32), 0, num_bins - 1)
    # one flat segment-sum over C*num_bins segments covers all classes
    class_offset = (jnp.arange(num_classes, dtype=jnp.int32) * num_bins)[:, None]
    flat_ids = (bins + class_offset).reshape(-1)
    tot = jax.ops.segment_sum(
        jnp.ones_like(flat_ids), flat_ids, num_segments=num_classes * num_bins
    )
    pos = jax.ops.segment_sum(
        gt.reshape(-1).astype(jnp.int32), flat_ids,
        num_segments=num_classes * num_bins,
    )
    return jnp.stack([pos, tot]).reshape(2, num_classes, num_bins)


def ap_from_binned_counts(counts):
    """Finish a streamed AP: summed ``(2, C, num_bins)`` counts -> ``(C,)``
    AP. Pure numpy (runs on the host once per epoch)."""
    import numpy as np

    pos = np.asarray(counts[0], np.float64)
    tot = np.asarray(counts[1], np.float64)
    # descending score = descending bin index
    pos_desc = pos[:, ::-1]
    tp_cum = np.cumsum(pos_desc, axis=1)
    n_cum = np.cumsum(tot[:, ::-1], axis=1)
    precision = tp_cum / np.maximum(n_cum, 1.0)
    positives = tp_cum[:, -1]
    ap = np.sum(pos_desc * precision, axis=1) / np.maximum(positives, 1.0)
    return np.where(positives > 0, ap, 0.0).astype(np.float32)


class StreamingAP:
    """Epoch-level pooled heat-map AP accumulator (host side).

    Feed each batch's ``binned_ap_counts`` output to :meth:`update`; call
    :meth:`result` for the per-class AP over every pixel seen. Memory is a
    fixed ``(2, C, num_bins)`` int64 array regardless of epoch size."""

    def __init__(self, num_classes=3, num_bins=NUM_AP_BINS):
        import numpy as np

        self.counts = np.zeros((2, num_classes, num_bins), np.int64)

    def update(self, batch_counts):
        import numpy as np

        self.counts += np.asarray(batch_counts, np.int64)

    def result(self):
        return ap_from_binned_counts(self.counts)
