"""Custom-VJP dense block for TRAINING — minimal-residual lowering.

Why this exists (BASELINE.md round-2 training table): the dense block's
autodiff is the train-step bottleneck. Under plain autodiff of the concat
lowering, the fwd segment must materialize every layer's normalized prefix
activations as residuals for the bwd segment — O(L^2) channels of HBM
writes per block per step on top of the concat traffic itself. The 'buffer'
lowering is worse under autodiff (the slab updates' backward pads/zeroes a
full-size buffer per layer).

This lowering makes the residual exactly ONE tensor — the block's final
feature buffer, which *is* every layer's input prefix by construction
(reference torchvision `_DenseBlock` semantics: layer i reads channels
``[0, c0 + i*growth)`` of the final concat). The backward walks the layers
in reverse, re-deriving each layer's internals from the buffer via
``jax.vjp`` of the single-layer apply (one extra forward recompute — the
classic remat trade: ~+33% block FLOPs for an O(L^2) -> O(L) residual
traffic cut), and accumulates the prefix cotangent in place.

Numerics are EXACTLY the flax path's (same BatchNorm train semantics as
``ops/normalization.py::TorchBatchNorm`` incl. f32 stats + compute-dtype
elementwise, same conv lowering): pinned by gradient-parity tests in
``tests/test_model.py``. Batch-stat EMA updates are returned as aux so the
module writes the same running stats the plain path would.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax


def _batch_stats(xf32):
    """TorchBatchNorm train-mode batch statistics (f32, biased var)."""
    reduce_axes = tuple(range(xf32.ndim - 1))
    mean = jnp.mean(xf32, axis=reduce_axes)
    var = jnp.maximum(
        jnp.mean(jnp.square(xf32), axis=reduce_axes) - jnp.square(mean), 0.0
    )
    return mean, var


def _bn_train(x, scale, bias, eps, dt):
    """Exact ``TorchBatchNorm(use_running_average=False)`` forward: f32
    stats, folded per-channel gamma/beta applied in the compute dtype.
    Returns ``(y, (mean, var))``."""
    mean, var = _batch_stats(x.astype(jnp.float32))
    gamma = lax.rsqrt(var + eps) * scale
    beta = bias - mean * gamma
    y = (x * gamma.astype(dt) + beta.astype(dt)).astype(dt)
    return y, (mean, var)


def _conv(x, kernel, dt, padding):
    """Exact ``flax.linen.Conv(use_bias=False, dtype=dt)`` lowering."""
    return lax.conv_general_dilated(
        x.astype(dt), kernel.astype(dt), (1, 1), padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


def _layer_apply(prefix, p, eps, dt):
    """One dense layer (BN-ReLU-Conv1x1-BN-ReLU-Conv3x3) with train-mode
    batch stats computed from ``prefix`` — the gradient w.r.t. the stats
    flows through ``jax.vjp`` of this function in the backward.

    Returns ``(new_features, (mean1, var1, mean2, var2))``.
    """
    y, st1 = _bn_train(prefix, p["norm1"]["scale"], p["norm1"]["bias"], eps, dt)
    y = jnp.maximum(y, 0)
    y = _conv(y, p["conv1"]["kernel"], dt, ((0, 0), (0, 0)))
    y, st2 = _bn_train(y, p["norm2"]["scale"], p["norm2"]["bias"], eps, dt)
    y = jnp.maximum(y, 0)
    y = _conv(y, p["conv2"]["kernel"], dt, ((1, 1), (1, 1)))
    return y, st1 + st2


def _fwd_impl(x, params, eps):
    # plain concat lowering: with the custom backward the forward's autodiff
    # residuals no longer exist, so the (XLA-friendly) concat chain is the
    # right primal. (A buffer/DUS primal + DUS-accumulating backward was
    # measured 155.9 ms/step vs concat-autodiff's 82 at b128 — XLA does not
    # alias the full-size DUS carries.)
    num_layers = len(params)
    dt = x.dtype
    feats = x
    stats = []
    for i in range(num_layers):
        new, st = _layer_apply(feats, params[f"denselayer{i + 1}"], eps, dt)
        stats.append(st)
        feats = jnp.concatenate([feats, new], axis=-1)
    return feats, stats


@partial(jax.custom_vjp, nondiff_argnums=(2,))
def dense_block_train(x, params, eps=1e-5):
    """Whole-block training forward with the custom backward described in
    the module docstring.

    Args:
      x: ``(B, H, W, c0)`` block input in the compute dtype.
      params: ``{denselayer{i}: {norm1: {scale, bias}, conv1: {kernel},
        norm2: {scale, bias}, conv2: {kernel}}}`` — the flax DenseBlock
        param subtree, read via ``self.variables`` so gradients flow.
    Returns:
      ``(buf, stats)``: the ``(B, H, W, c0 + L*growth)`` feature buffer and
      the per-layer ``(mean1, var1, mean2, var2)`` batch statistics (f32)
      for the caller's running-stat EMA updates (identical values to what
      the plain path's BN modules would have computed).
    """
    return _fwd_impl(x, params, eps)


def _fwd(x, params, eps):
    out = _fwd_impl(x, params, eps)
    # the buffer IS the full residual: every layer's input prefix is a
    # static slice of it; params ride along for the backward recompute
    return out, (out[0], params)


def _bwd(eps, residuals, cotangents):
    buf, params = residuals
    g_out, _ = cotangents  # stats feed non-differentiated EMA updates only
    num_layers = len(params)
    growth = params["denselayer1"]["conv2"]["kernel"].shape[-1]
    c0 = buf.shape[-1] - num_layers * growth
    dt = buf.dtype

    def layer_out(prefix, p):
        return _layer_apply(prefix, p, eps, dt)[0]

    # shrinking cotangent: at layer i the live gradient is exactly the
    # first (c0 + i*growth) channels — slice + add, never a full-size
    # buffer carry
    g = g_out
    g_params = {}
    for i in reversed(range(num_layers)):
        width = c0 + i * growth
        prefix = lax.slice_in_dim(buf, 0, width, axis=3)
        g_new = lax.slice_in_dim(g, width, width + growth, axis=3)
        _, vjp_fn = jax.vjp(layer_out, prefix, params[f"denselayer{i + 1}"])
        g_prefix, g_p = vjp_fn(g_new)
        g_params[f"denselayer{i + 1}"] = g_p
        g = lax.slice_in_dim(g, 0, width, axis=3) + g_prefix
    return g, g_params


dense_block_train.defvjp(_fwd, _bwd)


def ema_updates(old_stats, stats, n, momentum=0.9):
    """Running-stat EMA updates matching ``TorchBatchNorm``: unbiased var
    (Bessel ``n/(n-1)``), ``m*old + (1-m)*batch``.

    Args:
      old_stats: the block's ``batch_stats`` subtree
        ``{denselayer{i}: {norm1: {mean, var}, norm2: {mean, var}}}``.
      stats: per-layer ``(mean1, var1, mean2, var2)`` from
        :func:`dense_block_train`.
      n: reduction sample count (``B*H*W``).
    Returns a new subtree with the same structure.
    """
    bessel = n / max(n - 1, 1)
    new = {}
    for i, (mean1, var1, mean2, var2) in enumerate(stats):
        name = f"denselayer{i + 1}"
        old = old_stats[name]
        new[name] = {
            "norm1": {
                "mean": momentum * old["norm1"]["mean"] + (1 - momentum) * mean1,
                "var": momentum * old["norm1"]["var"] + (1 - momentum) * var1 * bessel,
            },
            "norm2": {
                "mean": momentum * old["norm2"]["mean"] + (1 - momentum) * mean2,
                "var": momentum * old["norm2"]["var"] + (1 - momentum) * var2 * bessel,
            },
        }
    return new
