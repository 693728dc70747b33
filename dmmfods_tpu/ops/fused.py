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
import os

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
# Phase-space head (XLA): upsample + concat + BN + ReLU + refine0 + BN +
# ReLU + refine1 computed entirely at LOW resolution
# ---------------------------------------------------------------------------
#
# A 3x3 conv over a nearest-2x-upsampled input only ever reads a 2x2 window
# of SOURCE pixels per output pixel, with phase-dependent collapsed weights;
# and the four phases' windows are shifted copies of one window, so a single
# (2, 2, C, 4*c_mid) conv over the zero-padded source grid produces all four
# phase outputs ("shift-and-share"). The raw full-res skip joins the same
# conv after a space-to-depth. refine1's 5x5 full-res taps likewise become a
# (3, 3, 4*c_mid, 4*classes) conv in phase space. Only the final
# 12-channel logits get depth-to-space'd back to full resolution (38 MB at
# b256 — vs the 2.0 GB upsample broadcast + 1.3 ms concat + full-lane-idle
# refine0 the naive graph pays, 16.2 ms of the 44 ms step).
#
# Measured v5e b256: head front 12.2 ms -> see BASELINE.md. A Pallas kernel
# version of the same identity (since removed; numbers in BASELINE.md)
# computed the matmul fine but lost everything re-interleaving to NHWC
# inside VMEM (sublane shuffles): 43.7-56 ms end-to-end vs 40.7 unfused —
# this all-XLA phase-space formulation instead avoids materializing ANY
# full-res intermediate at all.


def space_to_depth_2x(x):
    """``(B, H, W, C) -> (B, H/2, W/2, 4C)``, channel order ``(pu, pv, c)``.

    Lowered as a free W-merge reshape + two stride-2 row slices + channel
    concat instead of the textbook 6-D transpose: the W direction merges
    into channels without moving a byte (NHWC rows are contiguous), and the
    H interleave becomes simple strided row DMA — the 6-D transpose form
    cost 6.9 ms at b1 1280x1920 (r3 profile)."""
    b, h, w, c = x.shape
    xw = x.reshape(b, h, w // 2, 2 * c)
    return jnp.concatenate([xw[:, 0::2], xw[:, 1::2]], axis=-1)


def depth_to_space_2x(x):
    """``(B, H/2, W/2, 4C) -> (B, H, W, C)``, inverse of space_to_depth_2x
    (same lowering rationale: row interleave + free W-split reshape)."""
    b, hh, hw, c4 = x.shape
    c2 = c4 // 2
    even, odd = x[..., :c2], x[..., c2:]
    y = jnp.stack([even, odd], axis=2).reshape(b, 2 * hh, hw, c2)
    return y.reshape(b, 2 * hh, 2 * hw, c2 // 2)


# which original 3x3 taps dy collapse onto shifted-window row r for phase u
_COLLAPSE = {
    (0, 0): (-1,), (0, 1): (0, 1), (1, 0): (-1, 0), (1, 1): (1,),
}


def fold_phase_head_weights(w0, w1, c_up, raw_ch):
    """Collapse refine0/refine1 kernels into their phase-space equivalents.

    Args:
      w0: ``(3, 3, c_up + raw_ch, c_mid)`` refine0 HWIO kernel.
      w1: ``(5, 5, c_mid, n_cls)`` refine1 HWIO kernel.
    Returns:
      w0p: ``(2, 2, c_up + 4*raw_ch, 4*c_mid)`` — window conv over the
        padded source grid; input channels ``[up | s2d raw]``, output
        channels stack phases ``2u+v``.
      w1p: ``(3, 3, 4*c_mid, 4*n_cls)`` — block-space conv over the
        phase-stacked refine0 output.
    """
    w0 = jnp.asarray(w0, jnp.float32)
    w1 = jnp.asarray(w1, jnp.float32)
    c_mid = w0.shape[-1]
    n_cls = w1.shape[-1]
    w_up = w0[:, :, :c_up, :]
    w_raw = w0[:, :, c_up:, :]

    w0p = jnp.zeros((2, 2, c_up + 4 * raw_ch, 4, c_mid), jnp.float32)
    for u in (0, 1):
        for v in (0, 1):
            p = 2 * u + v
            for r in (0, 1):
                for s in (0, 1):
                    acc = jnp.zeros((c_up, c_mid), jnp.float32)
                    for dy in _COLLAPSE[(u, r)]:
                        for dx in _COLLAPSE[(v, s)]:
                            acc = acc + w_up[dy + 1, dx + 1]
                    w0p = w0p.at[r, s, :c_up, p, :].set(acc)
                    for pu in (0, 1):
                        dy = 2 * r + pu - 2 + u
                        if not -1 <= dy <= 1:
                            continue
                        for pv in (0, 1):
                            dx = 2 * s + pv - 2 + v
                            if not -1 <= dx <= 1:
                                continue
                            ch = c_up + (2 * pu + pv) * raw_ch
                            w0p = w0p.at[r, s, ch:ch + raw_ch, p, :].set(
                                w_raw[dy + 1, dx + 1]
                            )
    w0p = w0p.reshape(2, 2, c_up + 4 * raw_ch, 4 * c_mid)

    w1p = jnp.zeros((3, 3, 4, c_mid, 4, n_cls), jnp.float32)
    for up in (0, 1):  # output phase row
        for br in (-1, 0, 1):
            for pu in (0, 1):
                dy = 2 * br + pu - up
                if not -2 <= dy <= 2:
                    continue
                for vp in (0, 1):
                    for bs in (-1, 0, 1):
                        for pv in (0, 1):
                            dx = 2 * bs + pv - vp
                            if not -2 <= dx <= 2:
                                continue
                            w1p = w1p.at[
                                br + 1, bs + 1, 2 * pu + pv, :, 2 * up + vp, :
                            ].set(w1[dy + 2, dx + 2])
    w1p = w1p.reshape(3, 3, 4 * c_mid, 4 * n_cls)
    return w0p, w1p


def phase_head_conv0(a_normed, raw_normed, w0p, dt):
    """Normalized inputs -> the phase-stacked window grid ``P``.

    ``a_normed``: (B, hh, hw, c_up) BN0+ReLU'd up stream at LOW res;
    ``raw_normed``: (B, H, W, raw_ch) BN0+ReLU'd raw skip at full res.
    """
    src = jnp.concatenate(
        [a_normed.astype(dt), space_to_depth_2x(raw_normed.astype(dt))],
        axis=-1,
    )
    return jax.lax.conv_general_dilated(
        src, w0p.astype(dt), (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )                                                  # (B, hh+1, hw+1, 4c_mid)


def phase_head_refine1(P, g1, b1, w1p, dt, hh, hw, c_mid):
    """``P`` -> full-res logits: per-phase BN1-fold + ReLU + block-space
    conv over shifted slices (slices feeding convs stay fused in XLA — the
    channel concat was the 2.4 ms/step materialization), then
    depth-to-space of just the tiny logits tensor."""
    out12 = None
    for pu in (0, 1):
        for pv in (0, 1):
            p = 2 * pu + pv
            hp = jnp.maximum(
                P[:, pu:pu + hh, pv:pv + hw,
                  p * c_mid:(p + 1) * c_mid].astype(jnp.float32)
                * g1 + b1, 0.0
            ).astype(dt)
            part = jax.lax.conv_general_dilated(
                hp, w1p[:, :, p * c_mid:(p + 1) * c_mid, :].astype(dt),
                (1, 1), ((1, 1), (1, 1)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )                                          # (B, hh, hw, 4n_cls)
            out12 = part if out12 is None else out12 + part
    return depth_to_space_2x(out12)


def phase_head_norm1_batch_stats(P, hh, hw, c_mid):
    """Per-REAL-channel batch statistics of the refine0 output, computed
    from the window grid without materializing the phase stack: every
    full-res output position appears exactly once across the four shifted
    phase slices."""
    total = jnp.zeros((c_mid,), jnp.float32)
    total_sq = jnp.zeros((c_mid,), jnp.float32)
    for pu in (0, 1):
        for pv in (0, 1):
            p = 2 * pu + pv
            s = P[:, pu:pu + hh, pv:pv + hw,
                  p * c_mid:(p + 1) * c_mid].astype(jnp.float32)
            total = total + jnp.sum(s, axis=(0, 1, 2))
            total_sq = total_sq + jnp.sum(jnp.square(s), axis=(0, 1, 2))
    n = 4 * P.shape[0] * hh * hw
    mean = total / n
    var = jnp.maximum(total_sq / n - jnp.square(mean), 0.0)
    return mean, var, n


def phase_head_norm1_stats_strips(P, hh, hw, c_mid):
    """Exact slice-union batch statistics of the refine0 output, computed
    with ONE full-plane reduction + cheap edge strips (inclusion-exclusion)
    instead of four f32 slice materializations.

    Same value as :func:`phase_head_norm1_batch_stats` (up to f32 summation
    reassociation): for phase group ``p=(pu, pv)`` the slice covers rows
    ``pu..pu+hh-1`` / cols ``pv..pv+hw-1`` of the ``(hh+1, hw+1)`` window
    grid, i.e. the full plane minus one edge row and one edge column (plus
    their shared corner back). Why this formulation exists: under autodiff
    the slice version's backward converts and pads four full-size f32
    cotangents back into ``P``'s cotangent (profiled 2.4 ms convert +
    2.8 ms add_any per b128 train step); the full-plane sum's backward is a
    per-channel broadcast that fuses into the neighbouring elementwise
    pass.
    """
    pf = P.astype(jnp.float32)
    tot = jnp.sum(pf, axis=(0, 1, 2))                       # (4c,)
    tot_sq = jnp.sum(jnp.square(pf), axis=(0, 1, 2))
    # edge strips: rows {0, hh}, cols {0, hw}, and the four corners — all
    # via STATIC slices (int basic indexing lowers to slice; an index
    # array would lower to gather + a scatter-add backward, measured
    # 3.1 ms/step at b128)
    rows = jnp.stack([pf[:, 0, :, :], pf[:, hh, :, :]])      # (2, B, W1, 4c)
    cols = jnp.stack([pf[:, :, 0, :], pf[:, :, hw, :]])      # (2, B, H1, 4c)
    corn = jnp.stack([
        jnp.stack([pf[:, 0, 0, :], pf[:, 0, hw, :]]),
        jnp.stack([pf[:, hh, 0, :], pf[:, hh, hw, :]]),
    ])                                                       # (2, 2, B, 4c)
    r_sum = jnp.sum(rows, axis=(1, 2))                       # (2, 4c)
    r_sq = jnp.sum(jnp.square(rows), axis=(1, 2))
    c_sum = jnp.sum(cols, axis=(1, 2))                       # (2, 4c)
    c_sq = jnp.sum(jnp.square(cols), axis=(1, 2))
    k_sum = jnp.sum(corn, axis=2)                            # (2, 2, 4c)
    k_sq = jnp.sum(jnp.square(corn), axis=2)

    total = jnp.zeros((c_mid,), jnp.float32)
    total_sq = jnp.zeros((c_mid,), jnp.float32)
    for pu in (0, 1):
        for pv in (0, 1):
            p = 2 * pu + pv
            ch = slice(p * c_mid, (p + 1) * c_mid)
            ri = 1 - pu  # pu=0 excludes row hh (index 1 of [0, hh]), pu=1 row 0
            ci = 1 - pv
            total = total + (tot[ch] - r_sum[ri, ch] - c_sum[ci, ch]
                             + k_sum[ri, ci, ch])
            total_sq = total_sq + (tot_sq[ch] - r_sq[ri, ch] - c_sq[ci, ch]
                                   + k_sq[ri, ci, ch])
    n = 4 * P.shape[0] * hh * hw
    mean = total / n
    var = jnp.maximum(total_sq / n - jnp.square(mean), 0.0)
    return mean, var, n


# The hand backward below (full-lane tap-stacked matmuls) vs XLA autodiff
# of the same conv — A/B'd on v5e at b128 (see BASELINE.md r3 training
# section); the primal is the identical HLO either way.
REFINE1_CUSTOM_VJP = os.environ.get("DMMFODS_REFINE1_VJP", "1") != "0"


def _refine1_conv4x4_primal(pn, w4, dt):
    return jax.lax.conv_general_dilated(
        pn, w4.astype(dt), (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def _refine1_conv4x4(pn, w4, dt):
    """The head's 4x4 refine1 conv with a full-MXU-lane hand backward.

    The primal is bit-identical to the plain ``conv_general_dilated`` (same
    op). Why the custom backward exists: the conv has only ``4*n_cls`` (=12)
    output channels, so XLA's input-gradient (a transposed conv contracting
    over K=12) and weight-gradient (a contraction with N=12) both run
    lane-starved on the MXU (~60 TF/s profiled at b128 vs ~110 for the
    head's other convs). The hand backward stacks the 16 spatial taps of
    the cotangent into the CHANNEL dim (``g16``: 16*n_cls = 192 lanes, pure
    data movement) and computes both gradients as full-lane matmuls:

      dpn[b,p,q,c] = sum_t g16[b,p,q,t*n:(t+1)*n] @ w4[ty,tx,c,:]^T
      dw4[ty,tx,c,n] = sum_{b,p,q} pn[b,p,q,c] * g16[b,p,q,t*n+n]

    Exact same contractions as the conv gradients (f32 accumulation),
    reassociated; pinned by
    ``test_fused.py::test_refine1_conv4x4_vjp_matches_autodiff``.
    """
    return _refine1_conv4x4_primal(pn, w4, dt)


def _refine1_conv4x4_fwd(pn, w4, dt):
    return _refine1_conv4x4_primal(pn, w4, dt), (pn, w4)


def _refine1_conv4x4_bwd(dt, res, g):
    pn, w4 = res
    b, h1, w1_, c4 = pn.shape
    n4 = w4.shape[-1]
    # g16[b, p, q, (4*ty+tx)*n4 + n] = g[b, p - ty + 1, q - tx + 1, n]
    # (zero where the index leaves g — the conv's pad-(1,1) zero halo)
    gp = jnp.pad(g, ((0, 0), (2, 2), (2, 2), (0, 0)))
    g16 = jnp.concatenate(
        [gp[:, 3 - ty:3 - ty + h1, 3 - tx:3 - tx + w1_, :]
         for ty in range(4) for tx in range(4)], axis=-1,
    )                                                   # (B, h1, w1, 16*n4)
    wt = jnp.transpose(w4, (0, 1, 3, 2)).reshape(16 * n4, c4)
    dpn = jax.lax.dot_general(
        g16, wt.astype(g16.dtype), (((3,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(pn.dtype)
    dwt = jax.lax.dot_general(
        pn.reshape(-1, c4), g16.reshape(-1, 16 * n4),
        (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32,
    )                                                   # (c4, 16*n4)
    dw4 = jnp.transpose(
        dwt.reshape(c4, 16, n4), (1, 0, 2)
    ).reshape(4, 4, c4, n4).astype(w4.dtype)
    return dpn, dw4


_refine1_conv4x4.defvjp(_refine1_conv4x4_fwd, _refine1_conv4x4_bwd)


def phase_head_refine1_single(P, g1, b1, w1p, dt, hh, hw, c_mid):
    """``P`` -> full-res logits as ONE structured 4x4 conv (train path).

    Same math as :func:`phase_head_refine1`: phase group ``p=(pu, pv)``'s
    3x3 block conv over its ``(pu, pv)``-shifted slice is a 4x4 conv over
    the whole window grid with the group's kernel placed at taps
    ``pu..pu+2 x pv..pv+2``. Border exactness: the slice formulation
    zero-pads each ``hp`` AFTER BN+ReLU, which zeroes each group's far edge
    row/col of the grid (``hh`` for ``pu=0``, ``0`` for ``pu=1``, ditto
    cols) — reproduced here by masking the normalized grid per group before
    the conv (folding the shift into conv padding alone is wrong at image
    borders; see BASELINE.md round-2 notes). Why: under autodiff the four
    slice convs' backward pads and accumulates four input-gradients into
    ``P``'s cotangent; the single conv's backward is one transposed conv.
    """
    b, h1, w1_, c4 = P.shape
    n_cls = w1p.shape[-1] // 4
    g4 = jnp.tile(g1, 4)
    b4 = jnp.tile(b1, 4)
    pn = jnp.maximum(P.astype(jnp.float32) * g4 + b4, 0.0).astype(dt)
    rmask = jnp.stack([jnp.arange(h1) < hh, jnp.arange(h1) >= 1])   # (pu, H1)
    cmask = jnp.stack([jnp.arange(w1_) < hw, jnp.arange(w1_) >= 1])  # (pv, W1)
    m4 = rmask[:, None, :, None] & cmask[None, :, None, :]           # (pu, pv, H1, W1)
    m4 = jnp.transpose(m4.reshape(4, h1, w1_), (1, 2, 0))            # (H1, W1, 4)
    pn = jnp.where(
        m4[None, :, :, :, None], pn.reshape(b, h1, w1_, 4, c_mid), 0
    ).reshape(b, h1, w1_, c4)

    w4 = jnp.zeros((4, 4, c4, 4 * n_cls), w1p.dtype)
    for pu in (0, 1):
        for pv in (0, 1):
            p = 2 * pu + pv
            ch = slice(p * c_mid, (p + 1) * c_mid)
            w4 = w4.at[pu:pu + 3, pv:pv + 3, ch, :].set(w1p[:, :, ch, :])
    conv = _refine1_conv4x4 if REFINE1_CUSTOM_VJP else _refine1_conv4x4_primal
    out12 = conv(pn, w4, dt)                                         # (B, hh, hw, 4n_cls)
    return depth_to_space_2x(out12)


def phase_space_head_rows(x_lo, raw, *, g0, b0, g1, b1, w0p, w1p, dt):
    """Batch-1 rows-as-batch lowering of the phase-space head.

    Identical math to :func:`phase_space_head` with ``refine1_impl='single'``
    (same folded weights, same masks, same taps), with every plane RESHAPED
    (free at batch 1 — identical element order) to ``(H, 1, W, C)`` so the
    sublane tile fills with W instead of the empty batch dim, and the 2x2 /
    4x4 convs decomposed into row-shifted 1x2 / 1x4 convs. XLA's b1 layout
    assignment runs the standard form at ~7 TF/s (19.4 ms of the 1280x1920
    step, r3 profile); this form sidesteps it the same way the encoder's
    rows dense blocks do.
    """
    c_up = x_lo.shape[-1]
    raw_ch = raw.shape[-1]
    c_mid = w0p.shape[-1] // 4
    n_cls = w1p.shape[-1] // 4
    hh, hw = x_lo.shape[1], x_lo.shape[2]
    H, W = raw.shape[1], raw.shape[2]

    # BN0 + ReLU, rows form
    a = x_lo.reshape(hh, 1, hw, c_up)
    a = jnp.maximum(a * g0[:c_up].astype(dt) + b0[:c_up].astype(dt), 0).astype(dt)

    # space-to-depth FIRST (pure reshapes + unit slices of the pair dims),
    # BN0+ReLU after, on the 16-channel s2d form with phase-tiled scale/
    # bias (s2d is a channel permutation; BN is per-channel, so the fold
    # commutes). Running the elementwise pass on the 4-channel full-res
    # plane paid the 128-lane padding 4x over (r3 profile: the head's
    # reshape/max ops around the raw stream).
    rw = raw.reshape(H // 2, 2, W // 2, 2 * raw_ch)
    rs2d = jnp.concatenate([rw[:, 0:1], rw[:, 1:2]], axis=-1)  # (hh, 1, hw, 4rc)
    g0r = jnp.tile(g0[c_up:], 4).astype(dt)
    b0r = jnp.tile(b0[c_up:], 4).astype(dt)
    rs2d = jnp.maximum(rs2d * g0r + b0r, 0).astype(dt)

    src = jnp.concatenate([a, rs2d], axis=-1)                 # (hh, 1, hw, c_up+4rc)

    # conv0: 2x2 pad(1,1) -> (hh+1, hw+1) grid == two row-shifted 1x2 convs
    def c1x2(r):
        return jax.lax.conv_general_dilated(
            src, w0p[r:r + 1].astype(dt), (1, 1), ((0, 0), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))       # (hh, 1, hw+1, 4c)

    c0, c1 = c1x2(0), c1x2(1)

    # one elementwise pass: P assembly (pad + add), BN1 fold + ReLU in the
    # COMPUTE dtype (the plain path's TorchBatchNorm eval semantics), and
    # the per-phase border masks as MULTIPLICATIVE row/col broadcasts
    # (group (pu, pv) zeroes grid row hh*(1-pu) + 0*pu and col likewise) —
    # the where-over-a-5D-reshape form cost 4.1 ms/step of select +
    # broadcast + reshape at 1280x1920 (r3 profile)
    h1, w1_ = hh + 1, hw + 1
    g4 = jnp.tile(g1, 4).astype(dt)
    b4 = jnp.tile(b1, 4).astype(dt)
    hh_idx = jnp.arange(h1)
    ww_idx = jnp.arange(w1_)
    pu = (jnp.arange(4 * c_mid) // (2 * c_mid))               # 0,0,1,1 groups
    pv = (jnp.arange(4 * c_mid) // c_mid) % 2                 # 0,1,0,1 groups
    rm = jnp.where(pu[None, :] == 0, hh_idx[:, None] < hh,
                   hh_idx[:, None] >= 1).astype(dt)           # (H1, 4c)
    cm = jnp.where(pv[None, :] == 0, ww_idx[:, None] < hw,
                   ww_idx[:, None] >= 1).astype(dt)           # (W1, 4c)
    P = (jnp.pad(c0, ((1, 0), (0, 0), (0, 0), (0, 0)))
         + jnp.pad(c1, ((0, 1), (0, 0), (0, 0), (0, 0))))     # (hh+1, 1, hw+1, 4c)
    pn = (jnp.maximum(P * g4 + b4, 0)
          * rm[:, None, None, :] * cm[None, None, :, :])

    # refine1: structured 4x4 conv pad(1,1) == four row-shifted 1x4 convs
    w4 = jnp.zeros((4, 4, 4 * c_mid, 4 * n_cls), w1p.dtype)
    for pu in (0, 1):
        for pv in (0, 1):
            p = 2 * pu + pv
            ch = slice(p * c_mid, (p + 1) * c_mid)
            w4 = w4.at[pu:pu + 3, pv:pv + 3, ch, :].set(w1p[:, :, ch, :])

    def c1x4(r):
        return jax.lax.conv_general_dilated(
            pn, w4[r:r + 1].astype(dt), (1, 1), ((0, 0), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))       # (h1, 1, hw, 4n)

    # out[i] = sum_r c_r[i + r - 1], i in [0, hh-1]
    c_0, c_1, c_2, c_3 = c1x4(0), c1x4(1), c1x4(2), c1x4(3)
    z1 = jnp.zeros_like(c_0[:1])
    out12 = (jnp.concatenate([z1, c_0[:hh - 1]], axis=0)
             + c_1[:hh]
             + c_2[1:hh + 1]
             + jnp.concatenate([c_3[2:], z1], axis=0))        # (hh, 1, hw, 4n)

    # depth-to-space of the tiny logits tensor, rows form
    even, odd = out12[..., :2 * n_cls], out12[..., 2 * n_cls:]
    y = jnp.concatenate([even, odd], axis=1)                  # (hh, 2, hw, 2n)
    y = y.reshape(2 * hh, 1, hw, 2 * n_cls)                   # rows interleave
    y = y.reshape(2 * hh, 1, 2 * hw, n_cls)                   # W split (free)
    return y.reshape(1, 2 * hh, 2 * hw, n_cls)


def phase_space_head(x_lo, raw, *, norm0, norm0_stats, refine0_kernel,
                     norm1, norm1_stats, refine1_kernel, eps=1e-5,
                     refine1_impl="slices", raw_parts=None):
    """The whole head at low resolution (see block comment above).

    Args:
      x_lo: ``(B, H/2, W/2, c_up)`` decoder output (pre-upsample).
      raw: ``(B, H, W, raw_ch)`` raw input skip.
      norm0/norm1: dicts with ``scale``/``bias``; *_stats with ``mean``/``var``.
      refine1_impl: ``"slices"`` (four shifted-slice convs — wins at small
        planes where the slices stay fused), ``"single"`` (one structured
        4x4 conv over the masked window grid — see
        :func:`phase_head_refine1_single`), or ``"rows"`` (batch-1
        rows-as-batch lowering of the WHOLE head — see
        :func:`phase_space_head_rows`; requires ``B == 1``).
    Returns ``(B, H, W, n_cls)`` logits — numerically the plain head's output
    (weight collapse sums in f32).
    """
    dt = x_lo.dtype
    c_up = x_lo.shape[-1]
    raw_ch = raw.shape[-1]
    c_mid = refine0_kernel.shape[-1]
    n_cls = refine1_kernel.shape[-1]

    g0, b0 = _fold_bn(norm0["scale"], norm0["bias"],
                      norm0_stats["mean"], norm0_stats["var"], eps)
    g1, b1 = _fold_bn(norm1["scale"], norm1["bias"],
                      norm1_stats["mean"], norm1_stats["var"], eps)
    w0p, w1p = fold_phase_head_weights(refine0_kernel, refine1_kernel,
                                       c_up, raw_ch)

    if refine1_impl == "rows":
        return phase_space_head_rows(
            x_lo, raw, g0=g0, b0=b0, g1=g1, b1=b1, w0p=w0p, w1p=w1p, dt=dt)
    if refine1_impl == "strip":
        # Pallas row-strip kernel (batch 1, H/2 % 8 == 0): the whole head
        # in VMEM, no window-grid materialization (ops/pallas/phase_head);
        # interpret mode keeps the identical code path testable off-TPU
        from .pallas.phase_head import phase_space_head_strip

        if raw_parts is not None:
            raw_parts = [p.astype(dt) for p in raw_parts]
        return phase_space_head_strip(
            x_lo, raw, g0=g0, b0=b0, g1=g1, b1=b1, w0p=w0p, w1p=w1p, dt=dt,
            interpret=jax.default_backend() != "tpu", raw_parts=raw_parts)

    # BN0 + ReLU: up stream at low res (upsample commutes), raw at full res.
    # Elementwise pass in the COMPUTE dtype with f32-folded constants —
    # exactly the plain path's TorchBatchNorm eval semantics, and half the
    # HBM traffic of the f32 form this used at full resolution (profiled
    # 4.3 ms of the b1 1280x1920 step).
    a = jnp.maximum(x_lo * g0[:c_up].astype(dt) + b0[:c_up].astype(dt), 0).astype(dt)
    rn = jnp.maximum(raw * g0[c_up:].astype(dt) + b0[c_up:].astype(dt), 0).astype(dt)
    P = phase_head_conv0(a, rn, w0p, dt)
    hh, hw = x_lo.shape[1], x_lo.shape[2]
    if refine1_impl == "single":
        return phase_head_refine1_single(P, g1, b1, w1p, dt, hh, hw, c_mid)
    return phase_head_refine1(P, g1, b1, w1p, dt, hh, hw, c_mid)


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
