"""BatchNorm with exact torch semantics.

``flax.linen.BatchNorm`` updates its running variance with the *biased*
batch variance; ``torch.nn.BatchNorm2d`` normalizes with the biased variance
but tracks the running EMA with the *unbiased* (Bessel-corrected) one. The
north star requires bit-matching heat-map outputs against torch-trained
checkpoints, so this module reproduces torch exactly:

  train:  y = (x - mean_b) / sqrt(var_biased + eps) * scale + bias
          running_mean <- m * running_mean + (1 - m) * mean_b
          running_var  <- m * running_var  + (1 - m) * var_unbiased
  eval:   y = (x - running_mean) / sqrt(running_var + eps) * scale + bias

with ``m = 0.9`` (torch ``momentum=0.1`` in its 1-m convention) and
``eps = 1e-5``. Channel axis is the last axis (NHWC).
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from flax import linen as nn
from jax import lax


class TorchBatchNorm(nn.Module):
    use_running_average: bool
    momentum: float = 0.9
    epsilon: float = 1e-5
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, *, stats_override=None, virtual_n=None,
                 return_fold=False):
        """Normalize ``x`` (usual path), or — for fused callers that compute
        batch statistics themselves at a cheaper resolution —
        ``stats_override=(mean_b, var_biased)`` with ``virtual_n`` (the
        sample count torch would have seen) updates the running stats
        exactly as the plain path and, with ``return_fold``, hands back the
        folded per-channel ``(gamma, beta)`` instead of applying them
        (``x`` may then be None)."""
        features = x.shape[-1] if x is not None else stats_override[0].shape[-1]
        scale = self.param("scale", nn.initializers.ones, (features,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (features,), jnp.float32)

        initializing = self.is_mutable_collection("params")
        ra_mean = self.variable(
            "batch_stats", "mean", lambda: jnp.zeros((features,), jnp.float32)
        )
        ra_var = self.variable(
            "batch_stats", "var", lambda: jnp.ones((features,), jnp.float32)
        )

        if self.use_running_average:
            if return_fold:
                gamma = lax.rsqrt(ra_var.value + self.epsilon) * scale
                return gamma, bias - ra_mean.value * gamma
            # inference fast path: fold running stats into a per-channel
            # (gamma, beta) in f32, then apply in the compute dtype — keeps
            # the elementwise pass in bf16 (half the HBM traffic) while the
            # per-channel constants stay full precision.
            gamma = lax.rsqrt(ra_var.value + self.epsilon) * scale
            beta = bias - ra_mean.value * gamma
            return (x * gamma.astype(self.dtype) + beta.astype(self.dtype)).astype(self.dtype)
        else:
            if stats_override is not None:
                assert virtual_n is not None, (
                    "stats_override requires virtual_n (the sample count the "
                    "plain path would have reduced over) for the unbiased EMA"
                )
                mean, var = stats_override
                n = virtual_n
            else:
                reduce_axes = tuple(range(x.ndim - 1))
                n = x.size // features
                xf = x.astype(jnp.float32)
                mean = jnp.mean(xf, axis=reduce_axes)
                # E[x^2]-E[x]^2 can go slightly negative under cancellation
                # (large mean, tiny variance); clamp before rsqrt/EMA like
                # flax.
                var = jnp.maximum(
                    jnp.mean(jnp.square(xf), axis=reduce_axes) - jnp.square(mean),
                    0.0,
                )
            if not initializing:
                unbiased = var * (n / max(n - 1, 1))
                ra_mean.value = self.momentum * ra_mean.value + (1.0 - self.momentum) * mean
                ra_var.value = self.momentum * ra_var.value + (1.0 - self.momentum) * unbiased

        # stats stay f32; the big elementwise pass runs in the compute dtype
        # (folded per-channel gamma/beta — halves train-time activation
        # traffic at bf16)
        gamma = lax.rsqrt(var + self.epsilon) * scale
        beta = bias - mean * gamma
        if return_fold:
            return gamma, beta
        return (x * gamma.astype(self.dtype) + beta.astype(self.dtype)).astype(self.dtype)
