"""Pallas TPU kernel: the phase-space head as a row-strip pipeline.

Motivation (full-resolution config 3, 1280x1920 b1 — BASELINE.md r3): the
all-XLA phase-space head costs ~10 ms of the 41.9 ms step, and only
3.6 ms of that is convolution. The rest is HBM traffic on the
``(hh+1, hw+1, 4*c_mid)`` window grid ``P`` — 315 MB at full res — which
the XLA formulation materializes (conv0 out), re-reads for the BN1 fold +
border masks, and re-reads for the shifted refine1 convs: ~2.8 GB of
traffic for 0.16 TFLOP of math. Speed of light is the src read (98 MB) +
logits write (15 MB) + ~1 ms of MXU.

This kernel materializes NOTHING at grid resolution: a grid step produces
``RS`` rows of the low-res logits ``out12`` from a halo'd strip of the
raw inputs, entirely in VMEM:

  1. inputs arrive as pipelined BlockSpec fetches — each array is passed
     THREE times with prev/this/next-strip index maps (the standard halo
     trick; edge programs re-fetch a clamped block and the out-of-range
     rows are zeroed, which is exactly conv padding),
  2. the BN0 fold + ReLU + the raw stream's space-to-depth pack + the
     conv0 W-tap im2col all happen on the VPU while building the strip's
     source rows (XLA's b1-standard-layout formatting — 12 ms of
     pad/reshape/copy when this ran as an XLA prologue — disappears),
  3. conv0 is ONE K-stacked matmul per window-grid row and H tap,
  4. BN1 fold + ReLU + per-phase border masks on the VPU in f32,
  5. refine1 restructured input-major: every grid row is multiplied ONCE
     by the ``(4c_mid, 16 * 4n_cls)`` tap-stacked weight (75% MXU lane
     use vs 9% for the naive ``N = 12`` form), giving each position's
     contribution to all 16 (tap_r, tap_s) output offsets,
  6. ``out12`` rows as 16 static shifted slice-adds of the contributions.

The output stays in the phase-stacked ``(hh, hw, 4*n_cls)`` layout; the
tiny depth-to-space to full resolution runs in XLA (an earlier in-kernel
interleave attempt was sublane-shuffle-bound — BASELINE.md r2 negative).

Batch-1, inference-only (the regime where XLA's layouts collapse — see
the rows-as-batch notes in ``models/dense_unet_lidar.py``). Exactness is
pinned against :func:`dmmfods_tpu.ops.fused.phase_space_head` in
``tests/test_fused.py``.

Reference parity: this computes the reference's ``Upsample`` +
``dec_out_to_heat_maps`` (Dense_U_Net_lidar.py model:120,123-132) output
exactly, via the same folded phase-space weights as ``ops/fused.py``.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(*refs, rs, hh, hw, c_mid4, nc4, dt, n_parts):
    (xm1, x0, xp1), refs = refs[:3], refs[3:]
    parts, refs = refs[:3 * n_parts], refs[3 * n_parts:]
    (w0_ref, wall_ref, g0a_ref, b0a_ref, g0r_ref, b0r_ref,
     g4_ref, b4_ref, out_ref, srcx, contrib) = refs

    j0 = pl.program_id(0) * rs

    g0a = g0a_ref[0, :].astype(dt)
    b0a = b0a_ref[0, :].astype(dt)
    g0r = g0r_ref[0, :].astype(dt)
    b0r = b0r_ref[0, :].astype(dt)

    c_up = xm1.shape[-1]
    rc4 = sum(parts[3 * i].shape[-1] * 2 for i in range(n_parts))
    zrow = jnp.zeros((1, c_up + rc4), dt)

    # strip source rows l = 0 .. rs+3 <-> global rows j0-2+l: BN0+ReLU,
    # per-part s2d pack, and the conv0 W im2col
    # srcx[l][w'] = [srow[w'-1] | srow[w']] (pad col zero), w' in 0..hw
    for l in range(rs + 4):
        g = j0 - 2 + l
        if l < 2:
            # from the prev block (bottom rows); at program 0 the "prev"
            # block is block 0 itself and these rows are invalid anyway
            li, sel = l + rs - 2, 0
        elif l < rs + 2:
            li, sel = l - 2, 1
        else:
            # from the next block (top rows); clamped at the last program
            li, sel = l - rs - 2, 2
        xrow = (xm1, x0, xp1)[sel][li]
        s2d = []
        for i in range(n_parts):
            rrow = parts[3 * i + sel][li]                    # (2, hw, 2*wi)
            # per-part s2d: channels [u=0 (v, c) | u=1 (v, c)] — the
            # wrapper permutes w0p's input rows to this part-major order
            s2d.append(jnp.concatenate([rrow[0], rrow[1]], axis=-1))
        s2d = s2d[0] if n_parts == 1 else jnp.concatenate(s2d, axis=-1)
        srow = jnp.concatenate([
            jnp.maximum(xrow * g0a + b0a, 0),
            jnp.maximum(s2d * g0r + b0r, 0),
        ], axis=-1).astype(dt)                               # (hw, c_up+4rc)
        valid = jnp.logical_and(g >= 0, g < hh).astype(dt)
        srow = srow * valid
        a0 = jnp.concatenate([zrow, srow], axis=0)           # srow[w'-1]
        a1 = jnp.concatenate([srow, zrow], axis=0)           # srow[w']
        srcx[l] = jnp.concatenate([a0, a1], axis=-1)

    # lane-group ids of the phase-stacked channels: phase p = 2*pu + pv
    # occupies lanes [p*c_mid, (p+1)*c_mid)
    c_mid = c_mid4 // 4
    lane = jax.lax.broadcasted_iota(jnp.int32, (hw + 1, c_mid4), 1)
    # pu/pv group indicators as f32 (vector-bool selects hit a Mosaic
    # truncation bug; multiplicative masks lower cleanly)
    pu1 = (lane // (2 * c_mid)).astype(jnp.float32)          # 1 where pu=1
    pu0 = 1.0 - pu1
    pv1 = ((lane // c_mid) % 2).astype(jnp.float32)
    pv0 = 1.0 - pv1
    col = jax.lax.broadcasted_iota(jnp.int32, (hw + 1, c_mid4), 0)
    # border masks: group (pu, pv) excludes grid row/col hh/hw (pu/pv = 0)
    # or 0 (pu/pv = 1) — ops/fused.py::phase_head_refine1_single semantics
    cmask = (pv0 * (col < hw).astype(jnp.float32)
             + pv1 * (col >= 1).astype(jnp.float32))
    g4 = g4_ref[0, :].astype(jnp.float32)
    b4 = b4_ref[0, :].astype(jnp.float32)

    contrib[:, 0:1, :] = jnp.zeros_like(contrib[:, 0:1, :])
    contrib[:, hw + 2:hw + 3, :] = jnp.zeros_like(
        contrib[:, hw + 2:hw + 3, :])

    for m in range(rs + 3):
        k = j0 - 1 + m                  # window-grid row, valid in [0, hh]
        acc = jnp.dot(srcx[m], w0_ref[0],
                      preferred_element_type=jnp.float32)
        acc += jnp.dot(srcx[m + 1], w0_ref[1],
                       preferred_element_type=jnp.float32)
        m_row = jnp.maximum(acc * g4 + b4, 0.0)
        kvalid = jnp.logical_and(k >= 0, k <= hh).astype(jnp.float32)
        rmask = (pu0 * (k < hh).astype(jnp.float32)
                 + pu1 * (k >= 1).astype(jnp.float32))
        m_row = m_row * (cmask * rmask * kvalid)
        c_row = jnp.dot(m_row.astype(dt), wall_ref[...],
                        preferred_element_type=jnp.float32)
        contrib[m, 1:hw + 2, :] = c_row.astype(dt)

    acc = jnp.zeros((rs, hw, nc4), jnp.float32)
    for r in range(4):
        blk3 = contrib[r:r + rs]        # (rs, hw + 3, 16 * nc4)
        for s in range(4):
            blk = (r * 4 + s) * nc4
            acc += blk3[:, s:s + hw, blk:blk + nc4].astype(jnp.float32)
    # split by output row phase u: phase p = 2u+v occupies nc4/4-channel
    # blocks, so u's channels [v=0 | v=1] are one contiguous half. The two
    # u planes land INTERLEAVED in one (hh, 2, hw, nc4/2) output — two
    # strided sub-block stores here make the entire depth-to-space a FREE
    # row-major reshape in XLA ((hh, 2, hw, 2, n) -> (H, W, n) merges
    # adjacent dims only), replacing the 1.9-2.7 ms stack interleave the
    # two-plane form needed at full res (r4 attribution; an in-kernel full
    # depth-to-space remains an unsupported Mosaic shape cast)
    half = nc4 // 2
    out_ref[:, 0, :, :] = acc[:, :, :half].astype(dt)
    out_ref[:, 1, :, :] = acc[:, :, half:].astype(dt)


def phase_head_strip(x_lo2, raw_parts, w0p, w_all, g0, b0, g1, b1, *,
                     hh, hw, n_cls, rs=8, interpret=False):
    """Run the strip kernel -> one ``(hh, 2, hw, 2*n_cls)`` u-interleaved
    plane (dim 1 is the output-row phase u; a free reshape finishes the
    depth-to-space).

    ``x_lo2``: ``(hh, hw, c_up)`` decoder output (batch squeezed).
    ``raw_parts``: list of ``(hh, 2, hw, 2*wi)`` tensors — the raw input
    STREAMS under the FREE relabel ``(H, W, wi) -> (H/2, 2, W/2, 2wi)``
    (row-major identity); their channel-concat is the head's raw skip.
    Passing the streams unconcatenated lets XLA CSE these relabels with
    the s2d stems' identical ones — the concatenated form cost a 0.9 ms
    concat + 1.5 ms relabel at full res.
    ``w0p``: folded ``(2, 2, c_in, 4*c_mid)`` window conv with the RAW
    channel order of the concat (``c_in = c_up + 4*raw_ch``) — permuted
    here to the kernel's part-major s2d order; ``w_all``: ``(4*c_mid,
    16*4*n_cls)`` tap-stacked refine1; ``g0/b0``: BN0 fold over
    ``[up | raw-concat]`` channels; ``g1/b1``: BN1 fold (``c_mid``).
    """
    assert hh % rs == 0, (hh, rs)
    c_up = x_lo2.shape[-1]
    widths = [int(p.shape[-1]) // 2 for p in raw_parts]
    raw_ch = sum(widths)
    c_in = c_up + 4 * raw_ch
    c_mid4 = w0p.shape[-1]
    nc4 = 4 * n_cls
    dt = x_lo2.dtype
    n_blocks = hh // rs

    # permute w0p's raw input rows from concat order (phase-major, part
    # channels interleaved) to the kernel's part-major s2d order, and
    # build the matching phase-tiled BN0 fold for the raw block
    perm = list(range(c_up))
    g0r_parts, b0r_parts = [], []
    off = 0
    for w in widths:
        for p in range(4):
            perm.extend(c_up + p * raw_ch + off + c for c in range(w))
        g0r_parts.append(jnp.tile(g0[c_up + off:c_up + off + w], 4))
        b0r_parts.append(jnp.tile(b0[c_up + off:c_up + off + w], 4))
        off += w
    w0p = jnp.take(w0p, jnp.asarray(perm), axis=2)

    # K-stack the W taps to match the kernel's im2col rows:
    # w0cat[r] = [w0p[r, 0]; w0p[r, 1]]  (2*c_in, 4*c_mid)
    w0cat = jnp.stack([
        jnp.concatenate([w0p[0, 0], w0p[0, 1]], axis=0),
        jnp.concatenate([w0p[1, 0], w0p[1, 1]], axis=0),
    ])

    g0a = g0[:c_up].reshape(1, -1).astype(jnp.float32)
    b0a = b0[:c_up].reshape(1, -1).astype(jnp.float32)
    g0r = jnp.concatenate(g0r_parts).reshape(1, -1).astype(jnp.float32)
    b0r = jnp.concatenate(b0r_parts).reshape(1, -1).astype(jnp.float32)
    g4 = jnp.tile(g1, 4).reshape(1, -1).astype(jnp.float32)
    b4 = jnp.tile(b1, 4).reshape(1, -1).astype(jnp.float32)

    def shifted(shape, shift):
        def imap(i):
            return (jnp.clip(i + shift, 0, n_blocks - 1),) + (0,) * (
                len(shape) - 1)
        return pl.BlockSpec(shape, imap)

    def w_spec(shape):
        return pl.BlockSpec(shape, lambda i: (0,) * len(shape))

    in_specs = [shifted((rs, hw, c_up), s) for s in (-1, 0, 1)]
    operands = [x_lo2, x_lo2, x_lo2]
    for part, w in zip(raw_parts, widths):
        in_specs.extend(shifted((rs, 2, hw, 2 * w), s) for s in (-1, 0, 1))
        operands.extend([part, part, part])
    in_specs.extend([
        w_spec((2, 2 * c_in, c_mid4)),
        w_spec((c_mid4, 16 * nc4)),
        w_spec((1, c_up)), w_spec((1, c_up)),
        w_spec((1, 4 * raw_ch)), w_spec((1, 4 * raw_ch)),
        w_spec((1, c_mid4)), w_spec((1, c_mid4)),
    ])
    operands.extend([w0cat.astype(dt), w_all.astype(dt),
                     g0a, b0a, g0r, b0r, g4, b4])

    kern = functools.partial(
        _kernel, rs=rs, hh=hh, hw=hw, c_mid4=c_mid4, nc4=nc4, dt=dt,
        n_parts=len(raw_parts))
    return pl.pallas_call(
        kern,
        grid=(n_blocks,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((rs, 2, hw, nc4 // 2),
                               lambda i: (i, 0, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((hh, 2, hw, nc4 // 2), dt),
        scratch_shapes=[
            pltpu.VMEM((rs + 4, hw + 1, 2 * c_in), dt),
            pltpu.VMEM((rs + 3, hw + 3, 16 * nc4), dt),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(*operands)


def phase_space_head_strip(x_lo, raw, *, g0, b0, g1, b1, w0p, w1p, dt,
                           rs=None, interpret=False, raw_parts=None):
    """Batch-1 strip-kernel lowering of the whole phase-space head.

    Same contract as :func:`dmmfods_tpu.ops.fused.phase_space_head_rows`
    (identical folded weights and masks). XLA's only jobs are FREE
    relabels on the inputs and a lane-efficient row interleave on the
    output — every formatting op (BN0 pass, s2d pack, concat, channel
    pad) lives inside the kernel's VPU stage, because as an XLA b1
    prologue those ops cost ~12 ms at full resolution (profiled: the same
    pathological layouts the rows lowering dodges).

    ``raw_parts``: optional list of per-stream tensors whose channel
    concat equals ``raw`` — passed through unconcatenated so the relabels
    CSE with the s2d stems' (see :func:`phase_head_strip`). ``raw`` may
    be None when parts are given.
    """
    assert x_lo.shape[0] == 1, "strip head is batch-1"
    if rs is None:
        # rs=8 is the VMEM ceiling at full-res widths: rs=16 (which would
        # cut the 4-row halo recompute from 1.5x to 1.25x) compiles to
        # 192.3 MB of vmem against the 128 MB cap — measured permanent
        # compile OOM at 1280x1920 (r4); the working set is dominated by
        # the (rs+4, hw+1, 2*c_in) source scratch + Mosaic temporaries.
        rs = 8
    if raw_parts is None:
        raw_parts = [raw]
    c_up = x_lo.shape[-1]
    c_mid = w0p.shape[-1] // 4
    n_cls = w1p.shape[-1] // 4
    hh, hw = x_lo.shape[1], x_lo.shape[2]
    H, W = 2 * hh, 2 * hw

    # structured refine1 weight (phase_head_refine1_single), tap-stacked
    # input-major: W_all[:, (r*4+s)*4n : ...] = w4[r, s]
    w4 = jnp.zeros((4, 4, 4 * c_mid, 4 * n_cls), w1p.dtype)
    for pu in (0, 1):
        for pv in (0, 1):
            p = 2 * pu + pv
            ch = slice(p * c_mid, (p + 1) * c_mid)
            w4 = w4.at[pu:pu + 3, pv:pv + 3, ch, :].set(w1p[:, :, ch, :])
    w_all = jnp.transpose(w4, (2, 0, 1, 3)).reshape(4 * c_mid, 16 * 4 * n_cls)

    x_lo2 = x_lo.reshape(hh, hw, c_up).astype(dt)
    parts4 = [
        p.reshape(hh, 2, hw, 2 * p.shape[-1]).astype(dt)  # free relabel
        for p in raw_parts
    ]

    y = phase_head_strip(
        x_lo2, parts4, w0p, w_all, g0, b0, g1, b1,
        hh=hh, hw=hw, n_cls=n_cls, rs=rs, interpret=interpret)
    # the kernel emits the u-interleaved (hh, 2, hw, 2n) layout directly
    # (two strided sub-block stores), so the whole depth-to-space is this
    # ONE free row-major reshape: (hh, 2, hw, 2, n) -> merge (i,u) -> H and
    # (j,v) -> W. History: a phase-stacked (hh, hw, 4n) epilogue cost
    # 5.2 ms of 6-lane slice/pad/copy (r2); two u planes + H-interleave
    # stack cost 1.9 ms and a lane-concat variant 2.8 ms (r4); the
    # kernel-native interleave removes the epilogue copy entirely (r5).
    return y.reshape(1, H, W, n_cls)
