"""Metric and loss parity tests against torch oracles (reference semantics:
helper.py:311-401 metrics, agent:247-264 BCE training objective,
FocalLoss.py:9-91)."""

import numpy as np
import torch

from dmmfods_tpu import losses, metrics


def _rand_maps(seed, b=4, h=16, w=24, c=3, empty_class=True):
    rng = np.random.default_rng(seed)
    gt = (rng.random((b, h, w, c)) > 0.7).astype(np.float32)
    pred = rng.normal(0, 2, (b, h, w, c)).astype(np.float32)
    if empty_class:
        gt[:, :, :, 1] = 0.0  # no pedestrians anywhere -> NaN IoU candidates
        pred[:, :, :, 1] = -5.0
    return gt, pred


def torch_iou(gt, pred, thr):
    """Oracle: per-sample per-class thresholded IoU (helper.py:311-367)."""
    gt_t = torch.tensor(gt).permute(0, 3, 1, 2)
    pr_t = torch.tensor(pred).permute(0, 3, 1, 2)
    est = pr_t >= thr
    g = gt_t >= thr
    inter = (est & g).sum(dim=(2, 3)).float()
    union = (est | g).sum(dim=(2, 3)).float()
    return (inter / union).numpy()


def test_iou_matches_torch_incl_nan():
    gt, pred = _rand_maps(0)
    ours = np.asarray(metrics.compute_iou_batch(gt, pred, 0.7))
    ref = torch_iou(gt, pred, 0.7)
    assert np.isnan(ref[:, 1]).all()  # the empty class yields NaN (0/0)
    np.testing.assert_allclose(ours, ref, atol=1e-6, equal_nan=True)


def test_iou_aggregation_matches_agent():
    gt, pred = _rand_maps(1)
    per_inst = np.asarray(metrics.compute_iou_batch(gt, pred, 0.7))
    mean, nans = metrics.aggregate_iou(per_inst)
    # agent:253-256: nanmean per class, residual NaN -> 0, count NaNs
    ref_mean = np.nanmean(per_inst, axis=0)
    ref_mean = np.nan_to_num(ref_mean, nan=0.0)
    np.testing.assert_allclose(np.asarray(mean), ref_mean, atol=1e-6)
    np.testing.assert_allclose(np.asarray(nans), np.isnan(per_inst).sum(0), atol=0)


def test_accuracy_matches_torch():
    gt, pred = _rand_maps(2)
    ours = np.asarray(metrics.compute_accuracy(gt, pred, 0.7))
    gt_t = torch.tensor(gt).permute(0, 3, 1, 2)
    pr_t = torch.tensor(pred).permute(0, 3, 1, 2)
    ref = (
        ((pr_t >= 0.7) == (gt_t >= 0.7)).sum(dim=(0, 2, 3)).float()
        / (gt_t.numel() / gt_t.shape[1])
    ).numpy()
    np.testing.assert_allclose(ours, ref, atol=1e-6)
    # 3-D single-sample path
    ours3 = np.asarray(metrics.compute_accuracy(gt[0], pred[0], 0.7))
    assert ours3.shape == (3,)


def test_bce_matches_torch():
    gt, pred = _rand_maps(3, empty_class=False)
    ours = np.asarray(losses.bce_with_logits(pred, gt))
    ref = torch.nn.BCEWithLogitsLoss(reduction="none")(
        torch.tensor(pred), torch.tensor(gt)
    ).numpy()
    np.testing.assert_allclose(ours, ref, atol=1e-5)
    # sum reduction == the agent's backward(ones) objective (agent:247-264)
    np.testing.assert_allclose(
        float(losses.bce_with_logits_sum(pred, gt)), ref.sum(), rtol=1e-5
    )


def test_per_class_loss_axis():
    gt, pred = _rand_maps(4, empty_class=False)
    elt = losses.bce_with_logits(pred, gt)
    ours = np.asarray(losses.per_class_loss(elt))
    ref = np.asarray(elt).sum(axis=(0, 1, 2))
    np.testing.assert_allclose(ours, ref, rtol=1e-6)
    assert ours.shape == (3,)


def test_focal_matches_torch_formula():
    gt, pred = _rand_maps(5, empty_class=False)
    ours = np.asarray(losses.focal_loss(pred, gt, alpha=1.0, gamma=2.0, reduce=False))
    bce = torch.nn.functional.binary_cross_entropy_with_logits(
        torch.tensor(pred), torch.tensor(gt), reduction="none"
    )
    pt = torch.exp(-bce)
    ref = (1.0 * (1 - pt) ** 2 * bce).numpy()
    np.testing.assert_allclose(ours, ref, atol=1e-5)


def test_class_wise_focal():
    gt, pred = _rand_maps(6, empty_class=False)
    alpha = (0.5, 1.0, 2.0)
    gamma = (1.0, 2.0, 3.0)
    ours = np.asarray(losses.class_wise_focal_loss(pred, gt, alpha, gamma, reduce=False))
    bce = torch.nn.functional.binary_cross_entropy_with_logits(
        torch.tensor(pred), torch.tensor(gt), reduction="none"
    )
    pt = torch.exp(-bce)
    ref = np.empty_like(np.asarray(bce))
    for i, (a, g) in enumerate(zip(alpha, gamma)):
        ref[..., i] = (a * (1 - pt[..., i]) ** g * bce[..., i]).numpy()
    np.testing.assert_allclose(ours, ref, atol=1e-5)


def test_heatmap_ap_sane():
    gt, _ = _rand_maps(7, empty_class=False)
    perfect = np.where(gt > 0.5, 20.0, -20.0).astype(np.float32)
    ap = np.asarray(metrics.heatmap_average_precision(gt, perfect))
    assert ap.shape == (3,)
    assert (ap > 0.95).all()
    terrible = -perfect
    ap_bad = np.asarray(metrics.heatmap_average_precision(gt, terrible))
    assert (ap_bad < ap).all()


def test_boxes_to_point_heatmaps():
    from dmmfods_tpu.ops.preprocess import boxes_to_point_heatmaps

    bbs = np.array([[0, 5, 7], [2, 100, 200]], np.int32)  # [class, x, y]
    hm = np.asarray(boxes_to_point_heatmaps(bbs, (256, 256, 3)))
    assert hm.shape == (256, 256, 3)
    assert hm[7, 5, 0] == 1.0
    assert hm[200, 100, 2] == 1.0
    assert hm.sum() == 2.0
    # out-of-bounds points are dropped, not wrapped
    oob = np.array([[1, 9999, 9999]], np.int32)
    hm2 = np.asarray(boxes_to_point_heatmaps(oob, (64, 64, 3)))
    assert hm2.sum() == 0.0


def test_ap_empty_ground_truth():
    # a class with no GT anywhere: precision 0 at every threshold -> AP ~ 0
    gt = np.zeros((2, 8, 8, 3), np.float32)
    gt[:, :4, :4, 0] = 1.0  # only class 0 has objects
    logits = np.where(gt > 0.5, 10.0, -10.0).astype(np.float32)
    logits[..., 1] = 10.0  # class 1 predicts everywhere despite empty GT
    ap = np.asarray(metrics.heatmap_average_precision(gt, logits))
    assert ap[0] > 0.95
    assert ap[1] < 0.05


# ---------------------------------------------------------------------------
# dataset-level streaming (pooled) AP
# ---------------------------------------------------------------------------


def test_streaming_ap_equals_pooled_exact():
    """When every pixel's score lands in its own histogram bin, the streamed
    binned AP over per-batch updates EQUALS `heatmap_average_precision` over
    the concatenated pixels — proving the merge + PR-curve finish are exact
    (the only relaxation is score quantization, absent here by construction)."""
    rng = np.random.default_rng(7)
    num_bins = metrics.NUM_AP_BINS
    b, h, w, c = 2, 8, 12, 3
    n_pixels_total = 3 * b * h * w  # 3 batches
    # distinct bins per class; map each to a logit whose sigmoid falls
    # strictly inside that bin
    cls_bins = np.stack([
        rng.choice(num_bins, size=n_pixels_total, replace=False) for _ in range(c)
    ])  # (c, N) distinct within each class
    probs = (cls_bins + 0.5) / num_bins
    logits_all = np.log(probs / (1 - probs)).astype(np.float32)  # logit()
    gt_all = (rng.random((c, n_pixels_total)) > 0.8).astype(np.float32)

    # split into 3 batches
    stream = metrics.StreamingAP(num_classes=c, num_bins=num_bins)
    per_batch = n_pixels_total // 3
    gts, logits = [], []
    for i in range(3):
        sl = slice(i * per_batch, (i + 1) * per_batch)
        g = gt_all[:, sl].T.reshape(b, h, w, c)
        lo = logits_all[:, sl].T.reshape(b, h, w, c)
        gts.append(g)
        logits.append(lo)
        stream.update(np.asarray(metrics.binned_ap_counts(g, lo)))

    pooled_gt = np.concatenate([g.reshape(-1, c) for g in gts]).reshape(1, -1, 1, c)
    pooled_logits = np.concatenate([l.reshape(-1, c) for l in logits]).reshape(1, -1, 1, c)
    exact = np.asarray(metrics.heatmap_average_precision(pooled_gt, pooled_logits))
    got = stream.result()
    np.testing.assert_allclose(got, exact, rtol=1e-5, atol=1e-6)


def test_streaming_ap_close_on_random_logits():
    """On arbitrary (unquantized) scores the binned AP differs from the exact
    pooled AP only by quantization — bounded well below 1e-3 at 2^15 bins."""
    rng = np.random.default_rng(13)
    c = 3
    stream = metrics.StreamingAP(num_classes=c)
    gts, logits = [], []
    for i in range(4):
        gt = (rng.random((2, 16, 24, c)) > 0.85).astype(np.float32)
        lo = rng.normal(0, 2, (2, 16, 24, c)).astype(np.float32)
        gts.append(gt)
        logits.append(lo)
        stream.update(np.asarray(metrics.binned_ap_counts(gt, lo)))
    pooled_gt = np.stack(gts).reshape(1, -1, 1, c)
    pooled_logits = np.stack(logits).reshape(1, -1, 1, c)
    exact = np.asarray(metrics.heatmap_average_precision(pooled_gt, pooled_logits))
    got = stream.result()
    np.testing.assert_allclose(got, exact, atol=1e-3)
    # and the order of batches must not matter (integer-count merge)
    stream2 = metrics.StreamingAP(num_classes=c)
    for gt, lo in zip(reversed(gts), reversed(logits)):
        stream2.update(np.asarray(metrics.binned_ap_counts(gt, lo)))
    np.testing.assert_array_equal(stream2.counts, stream.counts)


def test_streaming_ap_empty_class_zero():
    gt = np.zeros((1, 4, 4, 3), np.float32)
    lo = np.full((1, 4, 4, 3), 3.0, np.float32)
    s = metrics.StreamingAP()
    s.update(np.asarray(metrics.binned_ap_counts(gt, lo)))
    assert (s.result() == 0.0).all()
