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

from functools import partial
from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn
from jax import lax

# MEASURED NEGATIVE RESULT (kept tested, default OFF — see BASELINE.md r3):
# routing every train-mode BN through bn_train_apply's analytic backward
# REGRESSED the b128 raw-record train step 78.8 -> 90.2 ms on v5e. The
# hand-written backward is two fused passes in isolation, but the
# custom-VJP boundary blocks XLA from fusing BN's backward into the
# surrounding convolution transpose fusions (profiled: +5.5 ms data
# formatting, +1.6 ms copy, +0.9 ms async gaps, and per-block conv fusions
# slightly slower) — XLA's autodiff BN backward was already well fused.
# Flip to True to A/B; tests/test_model.py pins the custom path's numerics
# either way.
USE_CUSTOM_VJP = False


def _bn_train_compute(x, scale, bias, eps):
    """The train-mode forward expression (shared by both the autodiff and
    the custom-VJP paths — the primal is bit-identical)."""
    features = x.shape[-1]
    reduce_axes = tuple(range(x.ndim - 1))
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=reduce_axes)
    # E[x^2]-E[x]^2 can go slightly negative under cancellation (large
    # mean, tiny variance); clamp before rsqrt/EMA like flax.
    z = jnp.mean(jnp.square(xf), axis=reduce_axes) - jnp.square(mean)
    var = jnp.maximum(z, 0.0)
    gamma = lax.rsqrt(var + eps) * scale
    beta = bias - mean * gamma
    dt = x.dtype
    y = (x * gamma.astype(dt) + beta.astype(dt)).astype(dt)
    del features
    return y, mean, var, z


@partial(jax.custom_vjp, nondiff_argnums=(3,))
def bn_train_apply(x, scale, bias, eps):
    """Train-mode BN (batch stats + folded elementwise apply) with a
    hand-written backward.

    Why: under plain autodiff the backward of this expression dominates the
    train step's non-MXU time (profiled b128, TPU v5e: 10.2 ms of
    ``add_any`` cotangent accumulation + 2.4 ms of f32 ``convert`` across
    the model's ~120 BNs — ``x`` is consumed twice, once f32-converted for
    the statistics and once in the compute-dtype normalize, so XLA
    materializes and adds two full-size cotangents per BN). The analytic
    backward below is two fused passes: one multi-output reduction
    (``sum dy``, ``sum dy*x``, f32 accumulation) and one elementwise pass
    producing ``dx`` directly.

    Returns ``(y, mean_b, var_biased)`` — stats are f32 for the caller's
    EMA update; gradients flow through all three outputs (the EMA outputs'
    cotangents are zero under ``value_and_grad(has_aux=True)`` but the
    formula stays correct for any cotangent).
    """
    y, mean, var, _ = _bn_train_compute(x, scale, bias, eps)
    return y, mean, var


def _bn_train_fwd(x, scale, bias, eps):
    y, mean, var, z = _bn_train_compute(x, scale, bias, eps)
    return (y, mean, var), (x, scale, mean, var, z)


def _bn_train_bwd(eps, res, cots):
    dy, dmean_out, dvar_out = cots
    x, scale, mean, var, z = res
    reduce_axes = tuple(range(x.ndim - 1))
    n = x.size // x.shape[-1]
    inv = lax.rsqrt(var + eps)
    g = inv * scale

    # elementwise math in the promoted dtype (f32 for bf16/f32 inputs, f64
    # under x64 tests); the per-channel stat chain stays f32 like the primal
    ct = jnp.promote_types(x.dtype, jnp.float32)
    dyc = dy.astype(ct)
    xc = x.astype(ct)
    sum_dy = jnp.sum(dyc, axis=reduce_axes).astype(jnp.float32)
    sum_dyx = jnp.sum(dyc * xc, axis=reduce_axes).astype(jnp.float32)

    # y = x*gamma + beta;  beta = bias - mean*gamma;  gamma = inv*scale
    dbeta = sum_dy
    dgamma = sum_dyx - mean * sum_dy
    dbias = dbeta
    dscale = dgamma * inv
    dvar = dgamma * scale * (-0.5) * inv / (var + eps) + dvar_out
    dz = jnp.where(z >= 0, dvar, 0.0)  # var = max(z, 0)
    # z = ms - mean^2;  ms = sum(x^2)/n;  mean = sum(x)/n
    dmean = -g * dbeta + dmean_out - 2.0 * mean * dz
    stats_term = (dmean + 2.0 * x.astype(jnp.float32) * dz) * (1.0 / n)
    dx = (dyc * g.astype(ct) + stats_term.astype(ct)).astype(x.dtype)
    return dx, dscale, dbias


bn_train_apply.defvjp(_bn_train_fwd, _bn_train_bwd)


class TorchBatchNorm(nn.Module):
    use_running_average: bool
    momentum: float = 0.9
    epsilon: float = 1e-5
    dtype: Any = jnp.float32
    # Per-instance opt-in to the analytic custom-VJP backward (the GLOBAL
    # flip above is a measured negative, but callers whose BN sits on a
    # concat fan-out — where XLA's autodiff emits two full-size cotangent
    # accumulations — can enable it selectively; see DecoderStage).
    custom_vjp: bool = False

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
                n = x.size // features
                if (USE_CUSTOM_VJP or self.custom_vjp) and not return_fold:
                    # stats + folded apply in one custom-VJP op (analytic
                    # backward — see bn_train_apply); primal bit-identical
                    # to the expression below
                    y, mean, var = bn_train_apply(x, scale, bias, self.epsilon)
                    # bn_train_apply computes in x.dtype; align with the
                    # plain path below, which casts to the module dtype
                    # (no-op at current call sites — ADVICE r3)
                    y = y.astype(self.dtype)
                    if not initializing:
                        unbiased = var * (n / max(n - 1, 1))
                        ra_mean.value = (self.momentum * ra_mean.value
                                         + (1.0 - self.momentum) * mean)
                        ra_var.value = (self.momentum * ra_var.value
                                        + (1.0 - self.momentum) * unbiased)
                    return y
                _, mean, var, _ = _bn_train_compute(x, scale, bias, self.epsilon)
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
