"""Fused concat+BN+ReLU+1x1-conv — the mid-fusion hot op.

The reference mid-fusion block materializes ``cat(rgb_features,
lidar_features)`` in memory and then runs BN-ReLU-Conv1x1 over it
(``dmmfods/graphs/models/Dense_U_Net_lidar.py:185-192,242-245``). On TPU the
concat is pure HBM traffic: a 1x1 conv over a channel concat is exactly

    ReLU(BN(cat(a, b))) @ W  ==  ReLU(BN_a(a)) @ W[:Ca]  +  ReLU(BN_b(b)) @ W[Ca:]

so the concat buffer never needs to exist. This module provides that fusion:

* :func:`concat_bn_relu_conv1x1` — inference-time fused op with folded BN
  stats. Dispatches to a Pallas TPU kernel when available, else a jnp
  formulation XLA fuses well.
* The Pallas kernel keeps both input tiles in VMEM, applies the folded
  BN+ReLU on the VPU and feeds the MXU with two back-to-back matmuls
  accumulating into the same VMEM tile.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

try:  # pallas is TPU-only at runtime; import lazily-tolerant
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    _HAS_PALLAS = True
except Exception:  # pragma: no cover
    _HAS_PALLAS = False


def _fold_bn(scale, bias, mean, var, eps):
    """Fold BN running stats into a per-channel (gamma, beta):
    ``BN(x) = x * gamma + beta`` with ``gamma = scale/sqrt(var+eps)``."""
    gamma = scale * jax.lax.rsqrt(var + eps)
    beta = bias - mean * gamma
    return gamma, beta


def concat_bn_relu_conv1x1(a, b, *, scale, bias, mean, var, kernel, eps=1e-5,
                           use_pallas=None):
    """``ReLU(BN(cat(a, b), folded stats)) @ W`` without materializing the concat.

    Args:
      a: ``(B, H, W, Ca)`` main-stream features.
      b: ``(B, H, W, Cb)`` second-stream features.
      scale/bias/mean/var: BN params over ``Ca + Cb`` channels.
      kernel: ``(1, 1, Ca + Cb, Cout)`` 1x1 conv kernel (HWIO).
    Returns ``(B, H, W, Cout)``.
    """
    ca = a.shape[-1]
    gamma, beta = _fold_bn(scale, bias, mean, var, eps)
    w = kernel.reshape(kernel.shape[-2], kernel.shape[-1])  # (Ca+Cb, Cout)

    if use_pallas is None:
        rows = a.shape[0] * a.shape[1] * a.shape[2]
        # Mosaic compile errors surface at execution (after the try below),
        # so gate eligibility statically: TPU present, row count tileable,
        # and channel dims lane-aligned.
        use_pallas = (
            _HAS_PALLAS
            and any(d.platform == "tpu" for d in jax.devices())
            and rows % 128 == 0
            and a.shape[-1] % 128 == 0
            and b.shape[-1] % 128 == 0
            and w.shape[-1] % 128 == 0
        )
    if use_pallas:
        try:
            return _pallas_fused(a, b, gamma, beta, w, ca)
        except Exception:  # pragma: no cover - fall back if kernel unsupported
            pass

    dt = a.dtype
    an = jnp.maximum(a * gamma[:ca] + beta[:ca], 0.0).astype(dt)
    bn = jnp.maximum(b * gamma[ca:] + beta[ca:], 0.0).astype(dt)
    out = jnp.einsum("bhwc,co->bhwo", an, w[:ca].astype(dt)) + jnp.einsum(
        "bhwc,co->bhwo", bn, w[ca:].astype(dt)
    )
    return out


# ---------------------------------------------------------------------------
# Pallas TPU kernel
# ---------------------------------------------------------------------------


def _fused_kernel(a_ref, b_ref, ga_ref, ba_ref, gb_ref, bb_ref, wa_ref, wb_ref, out_ref):
    """Per-tile: fold-BN+ReLU on the VPU, two MXU matmuls accumulated in VMEM.

    Block layout: rows = flattened B*H*W pixels, cols = channels. The kernel
    reads an (R, Ca) and an (R, Cb) tile, normalizes each with its per-channel
    gamma/beta, and computes ``relu(an) @ Wa + relu(bn) @ Wb`` into (R, Cout).
    """
    an = jnp.maximum(a_ref[:] * ga_ref[:] + ba_ref[:], 0.0)
    bn = jnp.maximum(b_ref[:] * gb_ref[:] + bb_ref[:], 0.0)
    acc = jnp.dot(an, wa_ref[:], preferred_element_type=jnp.float32)
    acc += jnp.dot(bn, wb_ref[:], preferred_element_type=jnp.float32)
    out_ref[:] = acc.astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("ca",))
def _pallas_fused(a, b, gamma, beta, w, ca):
    batch, h, width, _ = a.shape
    cb = b.shape[-1]
    cout = w.shape[-1]
    rows = batch * h * width

    a2 = a.reshape(rows, ca)
    b2 = b.reshape(rows, cb)

    row_tile = 512
    if rows % row_tile != 0:
        row_tile = 256 if rows % 256 == 0 else (128 if rows % 128 == 0 else rows)
    grid = (rows // row_tile,)

    dt = a.dtype
    out = pl.pallas_call(
        _fused_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((row_tile, ca), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((row_tile, cb), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ca), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ca), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, cb), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, cb), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((ca, cout), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((cb, cout), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((row_tile, cout), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((rows, cout), dt),
        cost_estimate=pl.CostEstimate(
            flops=2 * rows * (ca + cb) * cout,
            bytes_accessed=(rows * (ca + cb) + (ca + cb) * cout + rows * cout) * a.dtype.itemsize,
            transcendentals=0,
        ),
    )(
        a2,
        b2,
        gamma[:ca].reshape(1, ca).astype(dt),
        beta[:ca].reshape(1, ca).astype(dt),
        gamma[ca:].reshape(1, cb).astype(dt),
        beta[ca:].reshape(1, cb).astype(dt),
        w[:ca].astype(dt),
        w[ca:].astype(dt),
    )
    return out.reshape(batch, h, width, cout)
