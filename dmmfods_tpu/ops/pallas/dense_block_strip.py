"""Pallas TPU kernel: a full dense block as a row-strip pipeline (batch 1).

Companion to :mod:`dense_block` (whole-image VMEM kernel, small planes) and
:mod:`phase_head` (the head's strip kernel). Targets the regime neither
covers: LARGE planes at batch 1 — the full-resolution (1280x1920) encoder
blocks, where the whole plane + growing concat cannot be VMEM-resident
(block1: 320x480x256 = 39 MB buffer alone) and XLA's b1 rows-as-batch
lowering still leaves ~14.8 ms on blocks 1/2 for ~1.7 ms of MXU math
(BASELINE.md r3: the remaining full-res attribution).

Design — one grid step produces ``RS`` rows of the block's final concat
feature buffer from a halo'd strip of the input, entirely in VMEM:

  * the input rides in THREE times with prev/this/next-strip index maps
    (the phase-head halo trick); a strip assembles ``RS + 2L`` source rows
    by leading-dim concat of block slices — L halo rows per side because
    each of the L layers' 3x3 convs shrinks row validity by one,
  * halo rows are RECOMPUTED per strip (cheap: ``(RS+2L)/RS`` compute
    overhead, and the garbage beyond each layer's shrinking validity
    window is zeroed by multiplicative row masks — the masks double as
    the conv's zero padding at the image border),
  * each layer runs as two well-shaped matmuls: the 1x1 as
    ``(R, width) @ (width, K)``, and the 3x3 OUTPUT-MAJOR like the phase
    head's refine1: ``(R, K) @ (K, 9*growth)`` gives every position's
    contribution to all 9 taps at once (128-deep contraction, 288 output
    lanes — vs 9 matmuls into 32 lanes), followed by 9 shifted slice-adds,
  * the concat is a VALUE (lane-dim concatenate per layer) — no
    lane-offset masked stores; Mosaic keeps it in VMEM.

HBM traffic per block: read ``x`` once (plus the halo refetch), write the
final buffer once — vs the XLA lowering's O(L^2) concat round trips.

Inference-only, batch 1. Exactness is pinned against the flax DenseBlock
in ``tests/test_fused.py`` (interpret mode = same code path on CPU).

Reference parity: computes torchvision ``_DenseBlock`` semantics exactly
(reference Dense_U_Net_lidar.py uses torchvision's densenet blocks via
model:72-100); BN is pre-folded from batch_stats (inference).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _shift2d_read(x, sy, sx, dt):
    """``y[r, w] = x[r + sy, w + sx]`` with zero fill (leading dim = rows,
    middle dim = W, last dim = channels)."""
    rws, w, c = x.shape
    out = x
    if sy == 1:
        out = jnp.concatenate([out[1:], jnp.zeros((1, w, c), dt)], axis=0)
    elif sy == -1:
        out = jnp.concatenate([jnp.zeros((1, w, c), dt), out[:-1]], axis=0)
    if sx == 1:
        out = jnp.concatenate([out[:, 1:], jnp.zeros((rws, 1, c), dt)], axis=1)
    elif sx == -1:
        out = jnp.concatenate([jnp.zeros((rws, 1, c), dt), out[:, :-1]], axis=1)
    return out


def _strip_kernel(xm1, x0, xp1, g1_ref, b1_ref, w1_ref, g2_ref, b2_ref,
                  w3s_ref, out_ref, *, rs, num_layers, c0, growth, h, w, dt):
    L = num_layers
    rws = rs + 2 * L
    j0 = pl.program_id(0) * rs

    # source rows l = 0..rws-1 <-> global rows j0 - L + l, assembled from
    # the three halo'd fetches (prev/this/next strip; clamped index maps
    # mean the edge programs re-fetch their own block — those rows are
    # zeroed by the validity masks below, which is exactly conv padding)
    feats = jnp.concatenate(
        [xm1[rs - L:, :, :], x0[...], xp1[:L, :, :]], axis=0)

    # global row index of each strip row, for the validity masks
    gidx = j0 - L + jax.lax.broadcasted_iota(jnp.int32, (rws, 1, 1), 0)

    for l in range(L):
        width = c0 + l * growth
        g1 = g1_ref[l, :].astype(jnp.float32)[:width]
        b1 = b1_ref[l, :].astype(jnp.float32)[:width]
        act = jnp.maximum(feats.astype(jnp.float32) * g1 + b1, 0.0)
        # rows valid for THIS layer's read: computed correctly so far
        # (shrinking halo window) AND inside the image — everything else
        # must read as zero, matching SAME-pad conv semantics at the border
        lo = j0 - (L - l)
        hi = j0 + rs + (L - l)
        mask = ((gidx >= jnp.maximum(lo, 0)) & (gidx < jnp.minimum(hi, h)))
        act = (act * mask.astype(jnp.float32)).astype(dt)

        y1 = jax.lax.dot_general(
            act.reshape(rws * w, width), w1_ref[l, :width, :],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )                                                      # (R, K)
        g2 = g2_ref[l, :].astype(jnp.float32)
        b2 = b2_ref[l, :].astype(jnp.float32)
        y2 = jnp.maximum(y1 * g2 + b2, 0.0).astype(dt)

        # 3x3 conv, output-major: contributions of every position to all
        # nine (ty, tx) taps in one matmul, then shifted slice-adds
        contrib = jax.lax.dot_general(
            y2, w3s_ref[l],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(dt).reshape(rws, w, 9 * growth)
        acc = jnp.zeros((rws, w, growth), jnp.float32)
        for ty in range(3):
            for tx in range(3):
                t = ty * 3 + tx
                sl = contrib[:, :, t * growth:(t + 1) * growth]
                # out[r, w] += in[r + ty - 1, w + tx - 1] @ w3[ty, tx]
                acc = acc + _shift2d_read(sl, ty - 1, tx - 1, dt).astype(
                    jnp.float32)
        feats = jnp.concatenate([feats, acc.astype(dt)], axis=-1)

    out_ref[...] = feats[L:L + rs]


def pick_rs(h, num_layers, w, c0, growth, k, dtype_bytes=2,
            vmem_budget=72 * 1024 * 1024):
    """Largest strip height RS dividing ``h`` with RS >= L and the working
    set in budget. None when no RS works (caller falls back to XLA)."""
    c_max = c0 + num_layers * growth
    for rs in (64, 48, 40, 32, 24, 20, 16, 8):
        if h % rs != 0 or rs < num_layers:
            continue
        rws = rs + 2 * num_layers
        r = rws * w
        buf = r * c_max * dtype_bytes            # final concat value
        act = r * c_max * 4                      # widest f32 BN pass
        y1 = r * k * 4
        contrib = r * 9 * growth * (dtype_bytes + 4)
        io = (3 * rs * w * c0 + 2 * rs * w * c_max) * dtype_bytes
        weights = num_layers * (c_max * k + 9 * k * growth) * dtype_bytes
        if buf + act + y1 + contrib + io + weights <= vmem_budget:
            return rs
    return None


def eligible(batch, h, w, c0, growth, num_layers, bn_size, dtype_bytes=2):
    """Static check for the strip kernel's regime."""
    return (
        batch == 1
        and c0 % 8 == 0 and growth % 8 == 0 and w % 8 == 0
        and pick_rs(h, num_layers, w, c0, growth, bn_size * growth,
                    dtype_bytes) is not None
    )


@functools.partial(
    jax.jit,
    static_argnames=("num_layers", "c0", "growth", "h", "w", "rs", "interpret"),
)
def dense_block_strip(x_nhwc, folded, *, num_layers, c0, growth, h, w,
                      rs=None, interpret=None):
    """Run a full dense block on a batch-1 plane via the strip pipeline.

    ``x_nhwc``: (1, h, w, c0) -> (1, h, w, c0 + L*growth). ``folded``: the
    BN-folded stacks from :func:`dense_block.fold_block_params_jnp`.
    ``interpret`` defaults to True off-TPU so tests run the same code path.
    """
    if interpret is None:
        interpret = not any(d.platform == "tpu" for d in jax.devices())
    dt = x_nhwc.dtype
    k = folded["w1"].shape[-1]
    c_max = c0 + num_layers * growth
    if rs is None:
        rs = pick_rs(h, num_layers, w, c0, growth, k,
                     np.dtype(dt).itemsize)
    if rs is None:
        raise ValueError(f"no viable strip height for {h}x{w} c0={c0}")
    n_blocks = h // rs

    # tap-stacked 3x3 weights, output-major: w3s[l, :, t*growth:...] is
    # tap (ty, tx) with t = ty*3 + tx
    w3s = jnp.transpose(folded["w3"], (0, 3, 1, 2, 4)).reshape(
        num_layers, k, 9 * growth)

    x = x_nhwc.reshape(h, w, c0)

    def shifted(shift):
        return pl.BlockSpec(
            (rs, w, c0),
            lambda i: (jnp.clip(i + shift, 0, n_blocks - 1), 0, 0))

    def w_spec(shape):
        return pl.BlockSpec(shape, lambda i: (0,) * len(shape))

    kern = functools.partial(
        _strip_kernel, rs=rs, num_layers=num_layers, c0=c0, growth=growth,
        h=h, w=w, dt=dt)
    flops = 2 * h * w * sum(
        (c0 + l * growth) * k + 9 * k * growth for l in range(num_layers))
    out = pl.pallas_call(
        kern,
        grid=(n_blocks,),
        in_specs=[
            shifted(-1), shifted(0), shifted(1),
            w_spec((num_layers, c_max)), w_spec((num_layers, c_max)),
            w_spec((num_layers, c_max, k)),
            w_spec((num_layers, k)), w_spec((num_layers, k)),
            w_spec((num_layers, k, 9 * growth)),
        ],
        out_specs=pl.BlockSpec((rs, w, c_max), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((h, w, c_max), dt),
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=h * w * (3 * c0 + c_max) * np.dtype(dt).itemsize,
            transcendentals=0,
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024,
        ),
        interpret=interpret,
    )(
        x, x, x,
        folded["g1"], folded["b1"], folded["w1"].astype(dt),
        folded["g2"], folded["b2"], w3s.astype(dt),
    )
    return out.reshape(1, h, w, c_max)
