"""Pallas TPU kernel: the encoder stem + pool0 as one row-strip pipeline.

Third member of the strip family (``phase_head``, ``dense_block_strip``).
Targets the remaining large cost at full resolution (BASELINE.md r3 final
attribution): the two stems' conv0 + the s2d input relabels + pool0 sum
to ~10 ms of the 33.7 ms b1 1280x1920 step for < 1 ms of essential work
— conv0 is ~20 GFLOP and the whole stage's unavoidable HBM traffic is
one raw-image read (15 MB) + one pooled write (20 MB). The cost is XLA's
b1 layout assignment formatting 3/1/12-channel tensors (the same
pathology the rows/strip lowerings dodge elsewhere).

One grid step produces ``RS`` rows of the POOLED stem output — conv0 (in
its space-to-depth form), the norm0 fold, relu0 and the 3x3/2 max pool —
from a halo'd strip of the raw image, entirely in VMEM; the (H/2, W/2,
F) stem plane never exists in HBM.

Geometry. conv0 is 7x7 stride 2 pad 3; its s2d form is a 4x4 stride-1
conv with pad (2, 1) over the 2x space-to-depth image (identical taps —
see ``EncoderStem``). The kernel splits the s2d plane by COLUMN parity:
``E[i, k] = s2d[i, 2k]``, ``O[i, k] = s2d[i, 2k+1]`` (both free relabels
of the raw image: raw cols ``4k..4k+3`` are exactly (even, odd) s2d col
``2k, 2k+1``), because stride-2 extraction after the fact is a strided
gather Mosaic has no good lowering for, while parity-separated planes
make BOTH the conv and the pool pure roll/max algebra:

  * stem even cols: taps read s2d cols ``2q-2..2q+1`` = ``E[q-1], O[q-1],
    E[q], O[q]``; odd cols read ``O[q-1], E[q], O[q], E[q+1]`` — one
    lane-concat each (the same K-stacked weight serves both),
  * the 4 H taps stack the same way (rolls by row multiples), giving ONE
    ``(R, 64C) @ (64C, F)`` matmul per parity per strip,
  * pool0 over W: ``max(SE[q], SO[q], SO[q-1])`` — no subsampling op
    exists because the parity split already separated the lanes,
  * pool0 over H: 3-row max via two row rolls, then RS aligned slice
    copies pick the even stem rows.

Everything runs on the flat ``(rows * WQ, C)`` form (dense_block_strip's
roll trick): W shifts are rolls by 1 whose single wrapped element lands
on a masked border column; H shifts are rolls by multiples of ``WQ``
whose wrap corrupts only strip-edge rows the output slices never read.
Conv zero padding IS the masks: out-of-image source rows are zeroed at
assembly (pre-conv, so no BN-bias resurrection), and out-of-image STEM
rows are zeroed post-relu — valid for the max pool because relu output
is >= 0, so a zero row cannot beat a real row (torch pads the pool with
-inf; 0 is equivalent on non-negative inputs).

Batch-1, inference-only (BN pre-folded). Exactness vs conv0+BN+relu+pool
is pinned in ``tests/test_pallas_stem_pool.py`` (interpret mode = same
code path).

Reference parity: computes torchvision densenet's ``conv0/norm0/relu0/
pool0`` stem exactly (the reference model builds it at
Dense_U_Net_lidar.py model:72-80 via torchvision layers).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def s2d_conv0_weight(w7, c, f):
    """Re-index a (7, 7, C, F) stride-2 conv weight to its space-to-depth
    form (4, 4, 4C, F): tap (dy, dx) of the 7x7 kernel reads source pixel
    (2i + dy - 3), which in 2x-block space is block offset
    ``floor((dy - 3) / 2)`` in [-2, 1] with phase ``(dy - 3) & 1``; the
    s2d channel order is ``(py * 2 + px) * C`` (matches ``EncoderStem``
    and the raw image's (H/2, 2, W/2, 2C) free relabel)."""
    w4 = jnp.zeros((4, 4, 4 * c, f), w7.dtype)
    for a in range(4):
        for b in range(4):
            for py in (0, 1):
                for px in (0, 1):
                    dy = 2 * (a - 2) + py + 3
                    dx = 2 * (b - 2) + px + 3
                    if 0 <= dy < 7 and 0 <= dx < 7:
                        ch = (py * 2 + px) * c
                        w4 = w4.at[a, b, ch:ch + c, :].set(w7[dy, dx])
    return w4


def _kernel(xm1, x0, xp1, w_ref, g_ref, b_ref, out_ref, srcE, srcO, *,
            rs, wq, c, f, h2, dt):
    T = 2 * rs + 4
    R = T * wq
    j0 = pl.program_id(0) * rs
    base = 2 * j0 - 3           # s2d (= stem) row of flat strip position 0
    c2 = 2 * c

    # assemble the strip's E/O parity planes from the three halo'd fetches
    # (blocks of 2RS s2d rows; 3 halo rows above, 1 below). Out-of-image
    # rows zero here — that IS conv0's zero padding (mask pre-conv: BN sits
    # after the conv, so nothing resurrects a zeroed source row).
    for t in range(T):
        if t < 3:
            ref, li = xm1, 2 * rs - 3 + t
        elif t < 2 * rs + 3:
            ref, li = x0, t - 3
        else:
            ref, li = xp1, t - 2 * rs - 3
        row = ref[li]                                   # (2, wq, 4c)
        gsrc = base + t
        valid = jnp.logical_and(gsrc >= 0, gsrc < h2).astype(jnp.float32)
        e = jnp.concatenate([row[0, :, 0:c2], row[1, :, 0:c2]], axis=-1)
        o = jnp.concatenate([row[0, :, c2:], row[1, :, c2:]], axis=-1)
        srcE[t * wq:(t + 1) * wq, :] = e.astype(jnp.float32) * valid
        srcO[t * wq:(t + 1) * wq, :] = o.astype(jnp.float32) * valid

    flat = jax.lax.broadcasted_iota(jnp.int32, (R, 1), 0)
    trow = flat // wq
    col = flat - trow * wq
    # W-border masks: the rolled-in neighbor does not exist at the image's
    # left/right edge, and the roll's single wrapped element lands there
    mL = (col > 0).astype(jnp.float32)
    mR = (col < wq - 1).astype(jnp.float32)

    # rolls stay f32 (Mosaic dynamic_rotate has no 16-bit lowering)
    E = srcE[...]
    O = srcO[...]
    Ep = pltpu.roll(E, 1, 0) * mL                       # E[q-1]
    Op = pltpu.roll(O, 1, 0) * mL                       # O[q-1]

    g0 = g_ref[0, :].astype(jnp.float32)
    b0 = b_ref[0, :].astype(jnp.float32)
    # stem-row validity: rows outside the image must be 0 for the H pool
    # (relu(b0) would otherwise leak through the max; 0 is the identity of
    # max over relu outputs)
    gstem = base + trow
    mrow = jnp.logical_and(gstem >= 0, gstem < h2).astype(jnp.float32)

    outs = []
    for parity in (0, 1):
        # W-tap im2col per output parity, built INSIDE the loop so only one
        # (R, 16c)/(R, 64c) pipeline is live at a time (VMEM pressure —
        # both live OOMed the 110 MB scoped limit at 1280x1920); both pair
        # with the same K-stacked weight (taps b = 0..3 in lane order)
        if parity == 0:
            X = jnp.concatenate([Ep, Op, E, O], axis=-1)    # (R, 16c) f32
        else:
            En = pltpu.roll(E, R - 1, 0) * mR               # E[q+1]
            X = jnp.concatenate([Op, E, O, En], axis=-1)
        # H taps a = 0..3: stem row t reads s2d rows t-2 .. t+1 — rolls by
        # row multiples; the wrap corrupts only strip rows {0, 1, T-1},
        # which the pool slices below never read
        X4 = jnp.concatenate([
            pltpu.roll(X, 2 * wq, 0), pltpu.roll(X, wq, 0), X,
            pltpu.roll(X, R - wq, 0),
        ], axis=-1).astype(dt)                          # (R, 64c)
        s = jax.lax.dot_general(
            X4, w_ref[...],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )                                               # (R, f)
        outs.append(jnp.maximum(s * g0 + b0, 0.0) * mrow)
    SE, SO = outs

    # pool0 over W: out col q = max(stem cols 2q-1, 2q, 2q+1) =
    # max(SO[q-1], SE[q], SO[q]); the q-1 roll's masked zero is the pad
    WM = jnp.maximum(jnp.maximum(SE, SO), pltpu.roll(SO, 1, 0) * mL)
    # pool0 over H: M3[t] = max(WM[t], WM[t+1], WM[t+2]); pool row p reads
    # M3 at t = 2(p - j0) + 2 (stem row 2p-1) — aligned slice copies
    M3 = jnp.maximum(jnp.maximum(WM, pltpu.roll(WM, R - wq, 0)),
                     pltpu.roll(WM, R - 2 * wq, 0))
    for dp in range(rs):
        t0 = (2 * dp + 2) * wq
        out_ref[dp * wq:(dp + 1) * wq, :] = M3[t0:t0 + wq, :].astype(dt)


def pick_rs(hq, wq, c, f, dtype_bytes=2, vmem_budget=100 * 1024 * 1024):
    """Largest strip height RS dividing ``hq`` (the pooled row count) with
    the working set in budget. None when no RS works.

    The cost model is CALIBRATED against Mosaic's scoped-vmem stack, which
    is dominated by ~28 (R, F)-shaped f32 roll/max/mask temporaries and is
    nearly independent of the input channel count: measured 122.59 MB
    (c=3) and 123.26 MB (c=1) at rs=16, wq=480, f=64 — both ~R*F*112
    bytes — against the 110 MB scoped limit. The analytic sum of the
    named buffers under-counts that stack ~3.4-5.5x, so we model it
    directly; rs=8 at 1280x1920 lands at ~69 MB."""
    for rs in (16, 8, 4):
        if hq % rs:
            continue
        r = (2 * rs + 4) * wq
        stack = r * f * 112                      # calibrated Mosaic stack
        src = 2 * r * 4 * c * 4                  # srcE/srcO scratch (f32)
        x4 = r * 64 * c * dtype_bytes            # X4 im2col (one parity)
        io = 3 * (2 * rs * 2 * wq * 4 * c) * dtype_bytes + (
            rs * wq * f * dtype_bytes)
        wts = 64 * c * f * dtype_bytes
        if stack + src + x4 + io + wts <= vmem_budget:
            return rs
    return None


def eligible(batch, h, w, c, f, dtype_bytes=2):
    """Static check for the fused stem+pool kernel's regime."""
    tile = 16 if dtype_bytes == 2 else 8
    return (
        batch == 1
        and h % 4 == 0 and w % 4 == 0 and (w // 4) % tile == 0
        and 1 <= c <= 8
        and pick_rs(h // 4, w // 4, c, f, dtype_bytes) is not None
    )


@functools.partial(
    jax.jit, static_argnames=("rs", "interpret"))
def stem_pool_strip(x_nhwc, w7, gamma, beta, *, rs=None, interpret=None):
    """Fused conv0 (7x7/2, as s2d) + norm0 fold + relu0 + pool0 (3x3/2).

    ``x_nhwc``: (1, H, W, C) raw stream -> (1, H//4, W//4, F).
    ``w7``: the (7, 7, C, F) conv0 kernel (checkpoint layout, re-indexed
    here); ``gamma``/``beta``: the folded norm0 scale/shift
    (``TorchBatchNorm(..., return_fold=True)``). ``interpret`` defaults to
    True off-TPU so tests run the same code path.
    """
    if interpret is None:
        interpret = not any(d.platform == "tpu" for d in jax.devices())
    _, h, w, c = x_nhwc.shape
    f = w7.shape[-1]
    dt = x_nhwc.dtype
    h2, wq, hq = h // 2, w // 4, h // 4
    if rs is None:
        rs = pick_rs(hq, wq, c, f, np.dtype(dt).itemsize)
    if rs is None:
        raise ValueError(f"no viable strip height for {h}x{w} c={c}")
    n_blocks = hq // rs

    w4 = s2d_conv0_weight(w7, c, f)
    # K-stack: lane order [a=0..3] x [b=0..3] x 4C matches X4's
    # [roll 2][roll 1][none][roll -1] x [Ep|Op|E|O] assembly
    wk = jnp.concatenate(
        [w4[a, b] for a in range(4) for b in range(4)], axis=0)  # (64c, f)

    part = x_nhwc.reshape(h2, 2, wq, 4 * c)    # free relabel (row-major)

    def shifted(shift):
        return pl.BlockSpec(
            (2 * rs, 2, wq, 4 * c),
            lambda i: (jnp.clip(i + shift, 0, n_blocks - 1), 0, 0, 0))

    def w_spec(shape):
        return pl.BlockSpec(shape, lambda i: (0,) * len(shape))

    kern = functools.partial(
        _kernel, rs=rs, wq=wq, c=c, f=f, h2=h2, dt=dt)
    out = pl.pallas_call(
        kern,
        grid=(n_blocks,),
        in_specs=[
            shifted(-1), shifted(0), shifted(1),
            w_spec((64 * c, f)), w_spec((1, f)), w_spec((1, f)),
        ],
        out_specs=pl.BlockSpec((rs * wq, f), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((hq * wq, f), dt),
        scratch_shapes=[
            pltpu.VMEM(((2 * rs + 4) * wq, 4 * c), jnp.float32),
            pltpu.VMEM(((2 * rs + 4) * wq, 4 * c), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * h2 * (w // 2) * 16 * 4 * c * f,
            bytes_accessed=(h * w * c + hq * wq * f) * np.dtype(dt).itemsize,
            transcendentals=0,
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024,
        ),
        interpret=interpret,
    )(part, part, part, wk.astype(dt),
      gamma.reshape(1, f).astype(jnp.float32),
      beta.reshape(1, f).astype(jnp.float32))
    return out.reshape(1, hq, wq, f)
