"""TPU-native detection baseline: an anchor-free center-point detector.

The reference's comparison baseline wraps torchvision Mask-R-CNN
(``dmmfods/agents/FasterRCNNAgent.py:54-83``) — CUDA-bound, with no TPU
equivalent. This module provides the TPU-native counterpart: a
CenterNet-style detector (objects as center points + size regression;
Zhou et al., arXiv:1904.07850 — all static shapes, no NMS loops, no dynamic
boxes) built on the same DenseNet encoder family, evaluated through the same
mask -> heat-map bridge so its numbers are comparable with the segmentation
model's (reference FasterRCNNAgent.py:375-380 semantics via
``agents/detection_baseline.py``).

Pieces:
  * :class:`CenterNetDetector` — DenseNet trunk (optionally early-fused
    RGB+LiDAR like the reference baseline's 4-channel first conv,
    FasterRCNNAgent.py:73-83) -> 3 upsample stages to stride 4 -> heads:
    per-class center heat map, box size (w, h), center offset;
  * :func:`make_center_targets` — vectorized Gaussian center splat + size /
    offset targets from padded box buffers (fixed shapes, scan over boxes);
  * :func:`centernet_loss` — penalty-reduced focal (heat map) + masked L1
    (size, offset);
  * :func:`decode_detections` — top-k peak extraction with a 3x3 max-pool
    NMS, emitting fixed-size ``(boxes, labels, scores, masks)`` compatible
    with ``instance_masks_to_heatmaps``.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn
from jax import lax

from .dense_unet_lidar import (
    _CONV_INIT,
    DenseBlock,
    EncoderStem,
    Transition,
    TorchBatchNorm,
    _maxpool_3x3_s2_p1,
)


class CenterNetDetector(nn.Module):
    """Anchor-free detector. ``__call__(rgb, lidar=None, train=False)`` with
    NHWC inputs returns a dict of stride-4 outputs:
    ``heatmap (B, H/4, W/4, C)`` logits, ``size (B, H/4, W/4, 2)`` (w, h in
    input pixels), ``offset (B, H/4, W/4, 2)``."""

    num_classes: int = 3
    growth_rate: int = 32
    block_config: Tuple[int, ...] = (6, 12, 24, 16)
    num_init_features: int = 64
    bn_size: int = 4
    use_lidar: bool = True
    head_features: int = 128
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, rgb, lidar=None, train: bool = False):
        dt = self.dtype
        x = rgb.astype(dt)
        if self.use_lidar and lidar is not None:
            x = jnp.concatenate([x, lidar.astype(dt)], axis=-1)

        # DenseNet trunk (stride 32)
        x = EncoderStem(self.num_init_features, dt, name="stem")(x, train)
        x = _maxpool_3x3_s2_p1(x)
        num_features = self.num_init_features
        for i, num_layers in enumerate(self.block_config):
            x = DenseBlock(
                num_layers=num_layers, growth_rate=self.growth_rate,
                bn_size=self.bn_size, drop_rate=0.0, dtype=dt,
                name=f"denseblock{i + 1}",
            )(x, train)
            num_features += num_layers * self.growth_rate
            if i != len(self.block_config) - 1:
                x = Transition(num_features // 2, dt, name=f"transition{i + 1}")(x, train)
                num_features //= 2

        # neck: 3 x (1x1 reduce + nearest 2x) back to stride 4
        for i, feats in enumerate((256, 128, self.head_features)):
            x = TorchBatchNorm(use_running_average=not train, name=f"up{i}_norm", dtype=dt)(x)
            x = nn.relu(x)
            x = nn.Conv(feats, (3, 3), padding=((1, 1), (1, 1)), use_bias=False,
                        kernel_init=_CONV_INIT, name=f"up{i}_conv", dtype=dt)(x)
            x = jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)

        def head(name, out_ch, bias_init=0.0):
            y = nn.Conv(self.head_features, (3, 3), padding=((1, 1), (1, 1)),
                        kernel_init=_CONV_INIT, name=f"{name}_conv", dtype=dt)(x)
            y = nn.relu(y)
            return nn.Conv(
                out_ch, (1, 1), name=f"{name}_out", dtype=dt,
                bias_init=nn.initializers.constant(bias_init),
            )(y)

        return {
            # -2.19 biases initial sigmoid to ~0.1 (CenterNet focal-loss trick)
            "heatmap": head("heatmap", self.num_classes, bias_init=-2.19),
            "size": head("size", 2),
            "offset": head("offset", 2),
        }


# ---------------------------------------------------------------------------
# targets
# ---------------------------------------------------------------------------


def make_center_targets(boxes, out_height, out_width, *, stride=4, num_classes=3,
                        min_sigma=0.8):
    """Padded box buffer -> CenterNet targets at stride ``stride``.

    Args:
      boxes: int32 ``(N, 5)`` ``[type, x, y, w, h]`` (input-pixel coords,
        type 0 padding — same buffer as the heat-map rasterizer).
    Returns dict:
      heatmap ``(H, W, C)`` Gaussian center splats (max-combined),
      size ``(H, W, 2)`` (w, h) at center pixels, offset ``(H, W, 2)``,
      mask ``(H, W, 1)`` 1.0 at center pixels (regression loss mask).
    """
    boxes = jnp.asarray(boxes, jnp.float32)
    rows = lax.broadcasted_iota(jnp.float32, (out_height, out_width), 0)
    cols = lax.broadcasted_iota(jnp.float32, (out_height, out_width), 1)

    def one_box(carry, box):
        heat, size, offset, mask = carry
        btype = box[0].astype(jnp.int32)
        valid = (btype == 1) | (btype == 2) | (btype == 4)
        channel = jnp.where(btype == 1, 0, jnp.where(btype == 2, 1, 2))

        cx = (box[1] + box[3] / 2.0) / stride
        cy = (box[2] + box[4] / 2.0) / stride
        w4 = box[3] / stride
        h4 = box[4] / stride
        ci = jnp.clip(jnp.floor(cy).astype(jnp.int32), 0, out_height - 1)
        cj = jnp.clip(jnp.floor(cx).astype(jnp.int32), 0, out_width - 1)
        # CenterNet radius heuristic ~ 1/6 of the smaller side
        sigma = jnp.maximum(jnp.minimum(w4, h4) / 6.0, min_sigma)
        # the gaussian is drawn around the QUANTIZED center so its peak is
        # exactly 1.0 there (the focal loss's positive set; fractional
        # centers would otherwise never produce a positive pixel) — the
        # offset head regresses the fraction, standard CenterNet
        gauss = jnp.exp(
            -((rows - ci.astype(jnp.float32)) ** 2
              + (cols - cj.astype(jnp.float32)) ** 2) / (2.0 * sigma ** 2)
        )
        gauss = jnp.where(valid, gauss, 0.0)
        onehot = (
            lax.broadcasted_iota(jnp.int32, (num_classes,), 0) == channel
        ) & valid
        heat = jnp.maximum(heat, gauss[:, :, None] * onehot[None, None, :])
        at_center = (
            (rows == ci.astype(jnp.float32)) & (cols == cj.astype(jnp.float32)) & valid
        )
        size = jnp.where(at_center[:, :, None],
                         jnp.stack([box[3], box[4]])[None, None, :], size)
        offset = jnp.where(
            at_center[:, :, None],
            jnp.stack([cx - cj.astype(jnp.float32), cy - ci.astype(jnp.float32)])[None, None, :],
            offset,
        )
        mask = jnp.where(at_center[:, :, None], 1.0, mask)
        return (heat, size, offset, mask), None

    init = (
        jnp.zeros((out_height, out_width, num_classes), jnp.float32),
        jnp.zeros((out_height, out_width, 2), jnp.float32),
        jnp.zeros((out_height, out_width, 2), jnp.float32),
        jnp.zeros((out_height, out_width, 1), jnp.float32),
    )
    (heat, size, offset, mask), _ = lax.scan(one_box, init, boxes)
    return {"heatmap": heat, "size": size, "offset": offset, "mask": mask}


make_center_targets_batch = jax.vmap(
    make_center_targets, in_axes=(0, None, None)
)


# ---------------------------------------------------------------------------
# loss
# ---------------------------------------------------------------------------


def centernet_loss(outputs, targets, *, alpha=2.0, beta=4.0,
                   size_weight=0.1, offset_weight=1.0):
    """Penalty-reduced pixel-wise focal (heat map) + masked L1 (size/offset)."""
    probs = jnp.clip(jax.nn.sigmoid(outputs["heatmap"].astype(jnp.float32)), 1e-6, 1 - 1e-6)
    gt = targets["heatmap"]
    pos = gt >= 0.999
    num_pos = jnp.maximum(jnp.sum(pos), 1.0)
    pos_loss = -jnp.where(pos, ((1 - probs) ** alpha) * jnp.log(probs), 0.0)
    neg_loss = -jnp.where(
        ~pos, ((1 - gt) ** beta) * (probs ** alpha) * jnp.log(1 - probs), 0.0
    )
    heat_loss = (jnp.sum(pos_loss) + jnp.sum(neg_loss)) / num_pos

    mask = targets["mask"]
    size_loss = jnp.sum(jnp.abs(outputs["size"].astype(jnp.float32) - targets["size"]) * mask) / num_pos
    off_loss = jnp.sum(jnp.abs(outputs["offset"].astype(jnp.float32) - targets["offset"]) * mask) / num_pos
    total = heat_loss + size_weight * size_loss + offset_weight * off_loss
    return total, {"heat_loss": heat_loss, "size_loss": size_loss, "offset_loss": off_loss}


def make_detection_train_step(detector: CenterNetDetector, tx, *,
                              out_height, out_width, stride=4, donate=True):
    """Jitted detector train step:
    ``(params, batch_stats, opt_state, rgb, lidar, boxes) ->
    (params, batch_stats, opt_state, loss, parts)``
    with target generation fused in-graph (padded box buffers in)."""
    import optax

    def step(params, batch_stats, opt_state, rgb, lidar, boxes):
        targets = jax.vmap(
            lambda b: make_center_targets(b, out_height, out_width, stride=stride)
        )(boxes)

        def loss_fn(p):
            out, mutated = detector.apply(
                {"params": p, "batch_stats": batch_stats}, rgb, lidar, True,
                mutable=["batch_stats"],
            )
            loss, parts = centernet_loss(out, targets)
            return loss, (parts, mutated["batch_stats"])

        (loss, (parts, new_stats)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(params)
        updates, new_opt_state = tx.update(grads, opt_state, params)
        new_params = optax.apply_updates(params, updates)
        return new_params, new_stats, new_opt_state, loss, parts

    return jax.jit(step, donate_argnums=(0, 1, 2) if donate else ())


# ---------------------------------------------------------------------------
# decode
# ---------------------------------------------------------------------------


def decode_detections(outputs, *, stride=4, top_k=32, score_threshold=0.1,
                      mask_height=128, mask_width=192):
    """Model outputs -> fixed-size instance predictions per sample.

    3x3 max-pool peak NMS + top-k (all static shapes). Returns a dict of
    ``boxes (B, K, 4)`` [x1, y1, x2, y2] in input pixels, ``labels (B, K)``,
    ``scores (B, K)`` and rectangular ``masks (B, K, mask_h, mask_w)`` ready
    for the mask -> heat-map bridge.
    """
    heat = jax.nn.sigmoid(outputs["heatmap"].astype(jnp.float32))
    b, h, w, c = heat.shape
    peaks = lax.reduce_window(
        heat, -jnp.inf, lax.max, (1, 3, 3, 1), (1, 1, 1, 1),
        ((0, 0), (1, 1), (1, 1), (0, 0)),
    )
    heat = jnp.where(heat == peaks, heat, 0.0)

    flat = heat.reshape(b, h * w * c)
    scores, idx = lax.top_k(flat, top_k)
    cls = idx % c
    pix = idx // c
    py = (pix // w).astype(jnp.float32)
    px = (pix % w).astype(jnp.float32)

    def gather_hw(maps, pix_idx):
        flat_maps = maps.reshape(b, h * w, maps.shape[-1])
        return jnp.take_along_axis(flat_maps, pix_idx[:, :, None], axis=1)

    sizes = gather_hw(outputs["size"].astype(jnp.float32), pix)     # (B, K, 2)
    offs = gather_hw(outputs["offset"].astype(jnp.float32), pix)    # (B, K, 2)

    cx = (px + offs[..., 0]) * stride
    cy = (py + offs[..., 1]) * stride
    bw = jnp.maximum(sizes[..., 0], 1.0)
    bh = jnp.maximum(sizes[..., 1], 1.0)
    boxes = jnp.stack([cx - bw / 2, cy - bh / 2, cx + bw / 2, cy + bh / 2], axis=-1)
    scores = jnp.where(scores >= score_threshold, scores, 0.0)

    # rectangular instance masks at the evaluation resolution
    ratio_y = mask_height / (h * stride)
    ratio_x = mask_width / (w * stride)
    my = lax.broadcasted_iota(jnp.float32, (mask_height, mask_width), 0)
    mx = lax.broadcasted_iota(jnp.float32, (mask_height, mask_width), 1)
    x1 = boxes[..., 0] * ratio_x
    y1 = boxes[..., 1] * ratio_y
    x2 = boxes[..., 2] * ratio_x
    y2 = boxes[..., 3] * ratio_y
    inside = (
        (my[None, None] >= y1[..., None, None]) & (my[None, None] < y2[..., None, None])
        & (mx[None, None] >= x1[..., None, None]) & (mx[None, None] < x2[..., None, None])
    )
    masks = inside.astype(jnp.float32) * scores[..., None, None]
    return {"boxes": boxes, "labels": cls, "scores": scores, "masks": masks}
