"""Pixel-wise heat-map losses.

The reference agent trains with ``torch.nn.BCEWithLogitsLoss(reduction='none')``
followed by ``backward(ones_like(loss))`` — i.e. a *sum*-reduced sigmoid BCE
(``dmmfods/agents/Dense_U_Net_lidar_Agent.py:54,247-264``). The focal-loss
variants mirror ``dmmfods/graphs/losses/FocalLoss.py`` (pixel-wise focal and a
class-wise-parameterized version); the reference never wires them into its
agent but exposes them publicly and carries their hyperparams in
``config.loss`` (helper.py:125-133), so they are first-class here too.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def bce_with_logits(logits, targets):
    """Numerically-stable element-wise sigmoid binary cross entropy.

    Identical math to ``torch.nn.BCEWithLogitsLoss(reduction='none')``:
    ``max(x, 0) - x*t + log(1 + exp(-|x|))``.
    """
    neg_abs = -jnp.abs(logits)
    return jnp.maximum(logits, 0.0) - logits * targets + jnp.log1p(jnp.exp(neg_abs))


def bce_with_logits_sum(logits, targets):
    """Sum-reduced BCE — the training objective of the reference agent
    (backward with an all-ones cotangent == sum reduction; agent:247-264)."""
    return jnp.sum(bce_with_logits(logits, targets))


def per_class_loss(elementwise_loss):
    """Per-class loss sums for logging, reducing batch and spatial dims.

    Channel-last equivalent of the agent's ``sum(loss, dim=(0, 2, 3))``
    (agent:248) on NCHW tensors. ``(B, H, W, C)`` -> ``(C,)``.
    """
    return jnp.sum(elementwise_loss, axis=(0, 1, 2))


def focal_loss(logits, targets, alpha=1.0, gamma=2.0, *, from_logits=True, reduce=True):
    """Pixel-wise focal loss (Lin et al., arXiv:1708.02002).

    Matches reference ``FocalLoss`` (FocalLoss.py:9-50): down-weights easy
    examples via ``alpha * (1 - pt)**gamma * BCE`` where ``pt = exp(-BCE)``.
    """
    if from_logits:
        bce = bce_with_logits(logits, targets)
    else:
        probs = jnp.clip(logits, 1e-7, 1.0 - 1e-7)
        bce = -(targets * jnp.log(probs) + (1.0 - targets) * jnp.log(1.0 - probs))
    pt = jnp.exp(-bce)
    loss = alpha * (1.0 - pt) ** gamma * bce
    return jnp.mean(loss) if reduce else loss


def class_wise_focal_loss(
    logits, targets, alpha=(1.0, 1.0, 1.0), gamma=(2.0, 2.0, 2.0), *, from_logits=True, reduce=False
):
    """Focal loss with per-class alpha/gamma (reference ``ClassWiseFocalLoss``
    FocalLoss.py:52-91). Channel-last: class axis is the last axis."""
    alpha = jnp.asarray(alpha, jnp.float32)
    gamma = jnp.asarray(gamma, jnp.float32)
    if from_logits:
        bce = bce_with_logits(logits, targets)
    else:
        probs = jnp.clip(logits, 1e-7, 1.0 - 1e-7)
        bce = -(targets * jnp.log(probs) + (1.0 - targets) * jnp.log(1.0 - probs))
    pt = jnp.exp(-bce)
    loss = alpha * (1.0 - pt) ** gamma * bce  # broadcast over trailing class axis
    return jnp.mean(loss) if reduce else loss


def make_elementwise_loss_fn(config):
    """Elementwise form of the configured training loss ``(B,H,W,C)->(B,H,W,C)``.

    The scalar objective is always the sum of this; the per-class logging
    breakdown (agent:248) is its ``(0,1,2)``-axis sum — so training curves
    reflect the actual optimized objective for every ``config.loss.type``."""
    loss_type = config.loss.get("type", "bce")
    if loss_type == "bce":
        return bce_with_logits
    if loss_type == "focal":
        alpha, gamma = config.loss.alpha, config.loss.gamma
        return lambda logits, targets: focal_loss(
            logits, targets, alpha, gamma, from_logits=config.loss.logits, reduce=False
        )
    if loss_type == "class_wise_focal":
        alpha, gamma = config.loss.alpha, config.loss.gamma
        return lambda logits, targets: class_wise_focal_loss(
            logits, targets, alpha, gamma, from_logits=config.loss.logits, reduce=False
        )
    raise ValueError(f"unknown loss type {loss_type!r}")


def make_loss_fn(config):
    """Build the configured training loss. ``config.loss`` carries the focal
    hyperparams (helper.py:125-133); the reference agent itself always uses
    sum-reduced BCE, which remains the default here."""
    loss_type = config.loss.get("type", "bce")
    if loss_type == "bce":
        return bce_with_logits_sum
    if loss_type == "focal":
        alpha, gamma = config.loss.alpha, config.loss.gamma

        def _focal(logits, targets):
            return jnp.sum(
                focal_loss(logits, targets, alpha, gamma, from_logits=config.loss.logits, reduce=False)
            )

        return _focal
    if loss_type == "class_wise_focal":
        alpha, gamma = config.loss.alpha, config.loss.gamma

        def _cw_focal(logits, targets):
            return jnp.sum(
                class_wise_focal_loss(
                    logits, targets, alpha, gamma, from_logits=config.loss.logits, reduce=False
                )
            )

        return _cw_focal
    raise ValueError(f"unknown loss type {loss_type!r}")
