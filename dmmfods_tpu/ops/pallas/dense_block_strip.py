"""Pallas TPU kernel: a full dense block as a row-strip pipeline (batch 1).

Companion to :mod:`dense_block` (whole-image VMEM kernel, small planes) and
:mod:`phase_head` (the head's strip kernel). Targets the regime neither
covers: LARGE planes at batch 1 — the full-resolution (1280x1920) encoder
blocks, where the whole plane + growing concat cannot be VMEM-resident
(block1: 320x480x256 = 39 MB buffer alone) and XLA's b1 rows-as-batch
lowering still leaves ~14.8 ms on blocks 1/2 for ~1.7 ms of MXU math
(BASELINE.md r3: the remaining full-res attribution).

Design — one grid step produces ``RS`` rows of the block's final concat
feature buffer from a halo'd strip of the input, entirely in VMEM. The
whole kernel works on the FLAT (rows*W, C) form so every 3x3 tap shift is
a single circular roll of the leading dim, never a misaligned 2D slice
(a first 2D-scratch formulation compiled, but Mosaic lowered its
off-by-one sublane slices to per-vreg shuffle code whose compile time
scaled superlinearly in W: 24s/62s/>180s at W=64/128/256 — unusable at
the target W=480):

  * the input rides in THREE times with prev/this/next-strip index maps
    (the phase-head halo trick); a strip assembles ``RS + 2L`` source rows
    (L halo rows per side: each of the L layers' 3x3 convs shrinks row
    validity by one). Halo rows are RECOMPUTED per strip — cheap,
    ``(RS+2L)/RS`` compute overhead,
  * each layer's 3x3 zero padding IS a multiplicative mask on its input
    ``y2`` (the post-BN2-ReLU features): rows beyond the layer's
    shrinking validity window or outside the image read as zero.
    Masking anything EARLIER is insufficient — BN2's bias resurrects
    zeroed rows to ``relu(b2)``,
  * the tx taps fold into the contraction: ``y2cat = [y2 rolled +1, y2,
    y2 rolled -1]`` (flat rolls = W shifts; the wrapped element lands
    exactly on the W-border column the conv pads to zero, so the border
    mask covers it) gives one lane-ALIGNED (R, 3K) @ (3K, 3G) matmul —
    128-deep, 96-lane output (75% MXU lane use),
  * the ty taps are row shifts = flat rolls by ±W (sublane-tile aligned
    for W % 16 == 0): the roll's wrap corrupts only strip rows 0 and
    rws-1, which the next layer's shrinking-window mask excludes and the
    final ``[L, L+RS)`` output slice never reads,
  * the growing concat lives in a VMEM feature scratch (R, c_max): each
    layer reads the ``[:width]`` lane prefix and appends its slab with
    one lane-range store.

HBM traffic per block: read ``x`` once (plus the halo refetch), write the
final buffer once — vs the XLA lowering's O(L^2) concat round trips.

Inference-only, batch 1. Exactness is pinned against the flax DenseBlock
in ``tests/test_pallas_dense_block_strip.py`` (interpret mode = same code
path on CPU).

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


def _strip_kernel(xm1, x0, xp1, g1_ref, b1_ref, w1_ref, g2_ref, b2_ref,
                  w3c_ref, out_ref, fbuf, *, rs, num_layers, c0, growth,
                  h, w, dt):
    L = num_layers
    rws = rs + 2 * L
    R = rws * w
    j0 = pl.program_id(0) * rs

    # flat source rows i = 0..R-1 <-> (global image row j0 - L + i // w,
    # column i % w), assembled from the three halo'd fetches into the
    # feature scratch's [0, c0) lanes (prev/this/next strip; clamped index
    # maps mean the edge programs re-fetch their own block — those rows
    # are out-of-image and the per-layer masks below zero them, which is
    # exactly the conv's zero padding)
    fbuf[0:L * w, 0:c0] = xm1[(rs - L) * w:, :]
    fbuf[L * w:(L + rs) * w, 0:c0] = x0[...]
    fbuf[(L + rs) * w:R, 0:c0] = xp1[0:L * w, :]

    flat = jax.lax.broadcasted_iota(jnp.int32, (R, 1), 0)
    row = flat // w
    gidx = j0 - L + row                 # global image row per position
    col = flat - row * w                # W position per flat index
    # W-border masks for the tx = 0 / 2 taps: the rolled-in neighbor does
    # not exist at the image's left/right edge (and the roll's single
    # wrapped element lands exactly there)
    m_left = (col > 0).astype(jnp.float32)
    m_right = (col < w - 1).astype(jnp.float32)

    for l in range(L):
        width = c0 + l * growth
        g1 = g1_ref[l, :].astype(jnp.float32)[:width]
        b1 = b1_ref[l, :].astype(jnp.float32)[:width]
        feats = fbuf[:, 0:width]
        act = jnp.maximum(feats.astype(jnp.float32) * g1 + b1, 0.0).astype(dt)

        y1 = jax.lax.dot_general(
            act, w1_ref[l, :width, :],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )                                                      # (R, K)
        g2 = g2_ref[l, :].astype(jnp.float32)
        b2 = b2_ref[l, :].astype(jnp.float32)
        y2 = jnp.maximum(y1 * g2 + b2, 0.0)

        # rows valid for THIS layer's 3x3 read: computed correctly so far
        # (shrinking halo window) AND inside the image — everything else
        # must read as zero, which is the conv's zero padding. The mask
        # sits on y2 (the 3x3's input), NOT earlier: BN2's bias makes y2
        # of a zeroed act row relu(b2) != 0.
        lo = j0 - (L - l)
        hi = j0 + rs + (L - l)
        mask = ((gidx >= jnp.maximum(lo, 0)) & (gidx < jnp.minimum(hi, h)))
        y2f = y2 * mask.astype(jnp.float32)

        # tx taps as lanes: flat roll by +-1 IS the W shift; the wrap
        # touches only the border column m_left/m_right zero anyway.
        # Rolls stay f32 — Mosaic's dynamic_rotate has no 16-bit lowering.
        left = (pltpu.roll(y2f, 1, 0) * m_left).astype(dt)   # (r, c-1)
        right = (pltpu.roll(y2f, R - 1, 0) * m_right).astype(dt)
        y2cat = jnp.concatenate(
            [left, y2f.astype(dt), right], axis=-1)          # (R, 3K)

        # ctr[:, ty*G:(ty+1)*G] = sum_tx y2[r, c+tx-1] @ w3[ty, tx] at the
        # SOURCE row r; the ty shift happens on the output below
        ctr = jax.lax.dot_general(
            y2cat, w3c_ref[l],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )                                                      # (R, 3G)

        # ty taps: out[i] += ctr_ty[i + (ty-1)*w] — flat rolls by a
        # multiple of w (sublane-aligned for w % 16 == 0). Wrap corrupts
        # only strip rows 0 / rws-1: outside every later validity window
        # and never in the [L, L+rs) output slice.
        up = pltpu.roll(ctr, w, 0)                    # ctr[i - w]: ty = 0
        down = pltpu.roll(ctr, R - w, 0)              # ctr[i + w]: ty = 2
        acc = (up[:, 0:growth] + ctr[:, growth:2 * growth]
               + down[:, 2 * growth:3 * growth])
        fbuf[:, width:width + growth] = acc.astype(dt)

    out_ref[...] = fbuf[L * w:(L + rs) * w, :]


def _carry_kernel(x0, g1_ref, b1_ref, w1_ref, g2_ref, b2_ref,
                  w3c_ref, out_ref, fbuf, *, rs, num_layers, c0, growth,
                  h, w, dt):
    """Halo-CARRY variant of :func:`_strip_kernel` (VERDICT r4 #2).

    The original strip recomputes ``2L`` halo rows per strip (1.375x /
    1.75x redundant work for block1/block2 at rs=32). Here the feature
    scratch PERSISTS across sequential grid steps: step ``i`` keeps the
    bottom ``L + 2`` window rows as the next step's top halo, and each
    layer processes exactly ``rs + 2`` rows — overhead ``(rs+2)/rs``
    regardless of depth. Layer windows are skewed one row per layer
    (layer ``l`` emits global rows ``[i*rs - l - 1, ... + rs)``), so every
    input row a layer needs is either carried (above) or freshly computed
    one skew-step earlier (below); the classic stencil-pipeline wavefront.
    The output trails the grid by ``L`` rows: ``n_blocks + 1`` steps emit
    ``h + rs`` padded rows and the caller slices rows ``[L, L + h)``.
    """
    L = num_layers
    V = rs + L + 2
    i = pl.program_id(0)
    base = i * rs - L - 2           # global image row of fbuf flat row 0
    cmax = c0 + L * growth

    @pl.when(i == 0)
    def _init():
        # the carry region starts as garbage VMEM; rows are out-of-image
        # (global < 0) and masked below, but NaN * 0 == NaN — zero it
        fbuf[0:(L + 2) * w, :] = jnp.zeros(((L + 2) * w, cmax), dt)

    @pl.when(i != 0)
    def _carry():
        # non-overlapping (rs >= L + 2 enforced by pick_rs_carry)
        fbuf[0:(L + 2) * w, :] = fbuf[rs * w:V * w, :]

    # fresh input rows [i*rs, (i+1)*rs) land below the carried window
    fbuf[(L + 2) * w:V * w, 0:c0] = x0[...]

    R2 = (rs + 2) * w               # per-layer slice: rs + 2 source rows
    flat = jax.lax.broadcasted_iota(jnp.int32, (R2, 1), 0)
    srow = flat // w
    col = flat - srow * w
    m_left = (col > 0).astype(jnp.float32)
    m_right = (col < w - 1).astype(jnp.float32)

    for l in range(L):
        width = c0 + l * growth
        off = (L - l) * w           # slice rows [i*rs - l - 2, ... + rs + 2)
        g1 = g1_ref[l, :].astype(jnp.float32)[:width]
        b1 = b1_ref[l, :].astype(jnp.float32)[:width]
        feats = fbuf[off:off + R2, 0:width]
        act = jnp.maximum(feats.astype(jnp.float32) * g1 + b1, 0.0).astype(dt)
        y1 = jax.lax.dot_general(
            act, w1_ref[l, :width, :],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        g2 = g2_ref[l, :].astype(jnp.float32)
        b2 = b2_ref[l, :].astype(jnp.float32)
        y2 = jnp.maximum(y1 * g2 + b2, 0.0)

        # every slice row holds VALID carried/fresh data — only rows
        # outside the image must read as zero (the conv's padding; mask on
        # y2, after BN2, as in _strip_kernel)
        gidx = (base + (L - l)) + srow
        mask = ((gidx >= 0) & (gidx < h)).astype(jnp.float32)
        y2f = y2 * mask

        left = (pltpu.roll(y2f, 1, 0) * m_left).astype(dt)
        right = (pltpu.roll(y2f, R2 - 1, 0) * m_right).astype(dt)
        y2cat = jnp.concatenate([left, y2f.astype(dt), right], axis=-1)
        ctr = jax.lax.dot_general(
            y2cat, w3c_ref[l],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        up = pltpu.roll(ctr, w, 0)
        down = pltpu.roll(ctr, R2 - w, 0)
        acc = (up[:, 0:growth] + ctr[:, growth:2 * growth]
               + down[:, 2 * growth:3 * growth])
        # interior rows 1..rs of the slice = layer output window W_l
        fbuf[off + w:off + (rs + 1) * w, width:width + growth] = (
            acc[w:(rs + 1) * w, :].astype(dt))

    # this step's completed all-slab rows: global [i*rs - L, i*rs - L + rs)
    out_ref[...] = fbuf[2 * w:(2 + rs) * w, :]


def pick_rs_carry(h, num_layers, w, c0, growth, k, dtype_bytes=2,
                  vmem_budget=90 * 1024 * 1024):
    """RS selection for the carry kernel: RS >= L + 2 (non-overlapping
    carry copy), h % rs == 0, working set in budget. The window is
    ``rs + L + 2`` rows (vs ``rs + 2L``) and per-layer temporaries cover
    ``rs + 2`` rows (vs the whole window), so larger RS fits than in
    :func:`pick_rs`."""
    c_max = c0 + num_layers * growth
    for rs in (64, 48, 40, 32, 24, 20, 16, 8):
        if h % rs != 0 or rs < num_layers + 2:
            continue
        r = (rs + num_layers + 2) * w          # fbuf window rows
        r2 = (rs + 2) * w                      # per-layer slice rows
        buf = r * c_max * dtype_bytes
        act = r2 * c_max * 4
        y1 = r2 * k * 4
        y2cat = r2 * 3 * k * dtype_bytes
        ctr = r2 * 3 * growth * 4
        io = (rs * w * c0 + rs * w * c_max) * dtype_bytes
        weights = num_layers * (
            c_max * k + 3 * k * 3 * growth) * dtype_bytes
        if buf + act + y1 + y2cat + ctr + io + weights <= vmem_budget:
            return rs
    return None


def pick_rs(h, num_layers, w, c0, growth, k, dtype_bytes=2,
            vmem_budget=90 * 1024 * 1024):
    """Largest strip height RS dividing ``h`` with RS >= L and the working
    set in budget. None when no RS works (caller falls back to XLA).

    Budget 90 MB (r4, was 72): the term model above double-counts scratch
    Mosaic actually reuses, so the old budget forced rs=20 at the full-res
    block shapes; rs=32 fits the real 110 MB scoped-vmem cap and measures
    block1 3.45 -> 2.99 ms, block2 2.37 -> 1.96 ms isolated (halo
    recompute overhead drops from 2.2x to 1.75x on block2) — BASELINE.md
    r4. Compile cost at rs=32: 345 s (block1) / 856 s (block2), one-time
    persistent-cached (`cli warmup`)."""
    c_max = c0 + num_layers * growth
    for rs in (64, 48, 40, 32, 24, 20, 16, 8):
        if h % rs != 0 or rs < num_layers:
            continue
        rws = rs + 2 * num_layers
        r = rws * w
        buf = r * c_max * dtype_bytes            # feature scratch (fbuf)
        act = r * c_max * 4                      # widest f32 BN pass
        y1 = r * k * 4
        y2cat = r * 3 * k * dtype_bytes
        ctr = r * 3 * growth * 4
        io = (3 * rs * w * c0 + 2 * rs * w * c_max) * dtype_bytes
        weights = num_layers * (
            c_max * k + 3 * k * 3 * growth) * dtype_bytes
        if buf + act + y1 + y2cat + ctr + io + weights <= vmem_budget:
            return rs
    return None


def eligible(batch, h, w, c0, growth, num_layers, bn_size, dtype_bytes=2,
             carry=False):
    """Static check for the strip kernel's regime (``carry=True`` gates the
    halo-carry variant via :func:`pick_rs_carry`)."""
    w_tile = 16 if dtype_bytes == 2 else 8
    picker = pick_rs_carry if carry else pick_rs
    return (
        batch == 1
        and c0 % 8 == 0 and growth % 8 == 0 and w % w_tile == 0
        and picker(h, num_layers, w, c0, growth, bn_size * growth,
                   dtype_bytes) is not None
    )


@functools.partial(
    jax.jit,
    static_argnames=("num_layers", "c0", "growth", "h", "w", "rs", "interpret"),
)
def dense_block_strip_carry(x_nhwc, folded, *, num_layers, c0, growth, h, w,
                            rs=None, interpret=None):
    """Carry-variant entry point (see :func:`_carry_kernel`): identical
    signature and numerics to :func:`dense_block_strip`, with the halo
    recompute replaced by a persistent-scratch carry across grid steps."""
    if interpret is None:
        interpret = not any(d.platform == "tpu" for d in jax.devices())
    dt = x_nhwc.dtype
    k = folded["w1"].shape[-1]
    L = num_layers
    c_max = c0 + L * growth
    if rs is None:
        rs = pick_rs_carry(h, L, w, c0, growth, k, np.dtype(dt).itemsize)
    if rs is None:
        raise ValueError(f"no viable carry strip height for {h}x{w} c0={c0}")
    n_blocks = h // rs

    w3c = jnp.transpose(folded["w3"], (0, 2, 3, 1, 4)).reshape(
        L, 3 * k, 3 * growth)
    x = x_nhwc.reshape(h * w, c0)

    def w_spec(shape):
        return pl.BlockSpec(shape, lambda i: (0,) * len(shape))

    kern = functools.partial(
        _carry_kernel, rs=rs, num_layers=L, c0=c0, growth=growth,
        h=h, w=w, dt=dt)
    flops = 2 * h * w * sum(
        (c0 + l * growth) * k + 9 * k * growth for l in range(L))
    out = pl.pallas_call(
        kern,
        grid=(n_blocks + 1,),       # output trails the wavefront by L rows
        in_specs=[
            pl.BlockSpec((rs * w, c0),
                         lambda i: (jnp.clip(i, 0, n_blocks - 1), 0)),
            w_spec((L, c_max)), w_spec((L, c_max)),
            w_spec((L, c_max, k)),
            w_spec((L, k)), w_spec((L, k)),
            w_spec((L, 3 * k, 3 * growth)),
        ],
        out_specs=pl.BlockSpec((rs * w, c_max), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct(((h + rs) * w, c_max), dt),
        scratch_shapes=[
            pltpu.VMEM(((rs + L + 2) * w, c_max), dt),
        ],
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=h * w * (c0 + c_max) * np.dtype(dt).itemsize,
            transcendentals=0,
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024,
            dimension_semantics=("arbitrary",),  # carry needs in-order steps
        ),
        interpret=interpret,
    )(
        x,
        folded["g1"], folded["b1"], folded["w1"].astype(dt),
        folded["g2"], folded["b2"], w3c.astype(dt),
    )
    # padded output rows [-L, h + rs - L); the image is rows [L, L + h)
    return out[L * w:(L + h) * w].reshape(1, h, w, c_max)


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

    # tx-major stacked 3x3 weights: w3c[l, tx*K + k, ty*G + g] pairs the
    # y2cat lane slab for tap tx with the output lane slab for tap ty.
    # folded["w3"] is (L, ky, kx, K, G).
    w3c = jnp.transpose(folded["w3"], (0, 2, 3, 1, 4)).reshape(
        num_layers, 3 * k, 3 * growth)

    x = x_nhwc.reshape(h * w, c0)

    def shifted(shift):
        return pl.BlockSpec(
            (rs * w, c0),
            lambda i: (jnp.clip(i + shift, 0, n_blocks - 1), 0))

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
            w_spec((num_layers, 3 * k, 3 * growth)),
        ],
        out_specs=pl.BlockSpec((rs * w, c_max), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((h * w, c_max), dt),
        scratch_shapes=[
            pltpu.VMEM(((rs + 2 * num_layers) * w, c_max), dt),
        ],
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
        folded["g2"], folded["b2"], w3c.astype(dt),
    )
    return out.reshape(1, h, w, c_max)
