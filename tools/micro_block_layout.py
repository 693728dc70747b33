"""Micro-benchmark: dense-block lowerings vs XLA's pathological b1 layout.

At b1 full-res (config 3) XLA assigns {3,0,2,1} T(2,128) layouts to the
(1, H, W, C) activations — the batch dim lands in the sublane tile — and
the block's concats/fusions run at ~6% of HBM bandwidth while batching to
b2 does NOT fix the per-frame cost (measured; the lane-misaligned channel
concats dominate, not the half-empty tiles).

This tool times a full inference-mode dense block (folded BN as
scale/bias) in four lowerings on the real chip:

  concat   textbook growing concat, (1, H, W, C)
  buffer   preallocated buffer + dynamic_update_slice, (1, H, W, C)
  rows     rows-as-batch: (H, 1, W, C); the 3x3 conv becomes three
           row-shifted 1x3 convs (identical taps); N=H fills sublanes
  strips   (S, H/S, W, C) row strips; per-layer halo exchange (roll +
           concat of 1 boundary row each side) keeps 2D 3x3 convs exact

All four compute identical math (cross-checked at the end).
"""

from __future__ import annotations

import argparse
import functools
import os
import sys
import time

import numpy as np


def make_params(rng, num_layers, c0, growth, bn_size, dtype):
    import jax.numpy as jnp

    params = []
    for i in range(num_layers):
        cin = c0 + i * growth
        mid = bn_size * growth
        params.append(dict(
            g1=jnp.asarray(rng.normal(size=(cin,)) * 0.1 + 1.0, dtype),
            b1=jnp.asarray(rng.normal(size=(cin,)) * 0.1, dtype),
            w1=jnp.asarray(rng.normal(size=(1, 1, cin, mid)) * 0.05, dtype),
            g2=jnp.asarray(rng.normal(size=(mid,)) * 0.1 + 1.0, dtype),
            b2=jnp.asarray(rng.normal(size=(mid,)) * 0.1, dtype),
            w2=jnp.asarray(rng.normal(size=(3, 3, mid, growth)) * 0.05, dtype),
        ))
    return params


def conv(x, w, pad_h=1, pad_w=1):
    import jax.lax as lax

    return lax.conv_general_dilated(
        x, w, (1, 1), ((pad_h, pad_h), (pad_w, pad_w)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def layer_std(feats, p):
    import jax.numpy as jnp

    y = jnp.maximum(feats * p["g1"] + p["b1"], 0)
    y = conv(y, p["w1"], 0, 0)
    y = jnp.maximum(y * p["g2"] + p["b2"], 0)
    return conv(y, p["w2"])


def block_concat(x, params):
    import jax.numpy as jnp

    feats = x
    for p in params:
        feats = jnp.concatenate([feats, layer_std(feats, p)], axis=-1)
    return feats


def block_buffer(x, params, growth):
    import jax.lax as lax
    import jax.numpy as jnp

    c0 = x.shape[-1]
    buf = jnp.zeros(x.shape[:-1] + (c0 + len(params) * growth,), x.dtype)
    buf = lax.dynamic_update_slice(buf, x, (0, 0, 0, 0))
    for i, p in enumerate(params):
        width = c0 + i * growth
        new = layer_std(lax.slice_in_dim(buf, 0, width, axis=3), p)
        buf = lax.dynamic_update_slice(buf, new, (0, 0, 0, width))
    return buf


def layer_rows(feats, p):
    """feats: (H, 1, W, C). 3x3 conv = three row-shifted 1x3 convs."""
    import jax.numpy as jnp

    y = jnp.maximum(feats * p["g1"] + p["b1"], 0)
    y = conv(y, p["w1"], 0, 0)
    y = jnp.maximum(y * p["g2"] + p["b2"], 0)
    # out[h] = c0[h-1] + c1[h] + c2[h+1] where c_dy = 1x3 conv with tap row dy
    c0 = conv(y, p["w2"][0:1], 0, 1)
    c1 = conv(y, p["w2"][1:2], 0, 1)
    c2 = conv(y, p["w2"][2:3], 0, 1)
    z = jnp.zeros_like(c1[:1])
    return (jnp.concatenate([z, c0[:-1]], axis=0) + c1
            + jnp.concatenate([c2[1:], z], axis=0))


def block_rows(x, params):
    import jax.numpy as jnp

    feats = x  # (H, 1, W, C)
    for p in params:
        feats = jnp.concatenate([feats, layer_rows(feats, p)], axis=-1)
    return feats


def layer_strips(feats, p):
    """feats: (S, Hs, W, C). Halo-exchange 1 row each side, then VALID-H conv."""
    import jax.lax as lax
    import jax.numpy as jnp

    y = jnp.maximum(feats * p["g1"] + p["b1"], 0)
    y = conv(y, p["w1"], 0, 0)
    y = jnp.maximum(y * p["g2"] + p["b2"], 0)
    top = jnp.concatenate(
        [jnp.zeros_like(y[:1, -1:]), y[:-1, -1:]], axis=0)  # row above strip s
    bot = jnp.concatenate(
        [y[1:, :1], jnp.zeros_like(y[:1, :1])], axis=0)     # row below strip s
    yp = jnp.concatenate([top, y, bot], axis=1)             # (S, Hs+2, W, mid)
    return lax.conv_general_dilated(
        yp, p["w2"], (1, 1), ((0, 0), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def block_strips(x, params):
    import jax.numpy as jnp

    feats = x  # (S, Hs, W, C)
    for p in params:
        feats = jnp.concatenate([feats, layer_strips(feats, p)], axis=-1)
    return feats


def timeit(fn, args, steps):
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from tools._timing import device_time

    t, _ = device_time(fn, args, steps)
    return t, fn(*args)


def bench_block(name, h, w, c0, growth, bn_size, num_layers, steps, strips):
    import jax
    import jax.numpy as jnp

    dtype = jnp.bfloat16
    rng = np.random.default_rng(0)
    params = make_params(rng, num_layers, c0, growth, bn_size, dtype)
    x = jnp.asarray(rng.normal(size=(1, h, w, c0)), dtype)

    flops = 0
    for i in range(num_layers):
        cin = c0 + i * growth
        flops += 2 * h * w * cin * bn_size * growth        # 1x1
        flops += 2 * h * w * bn_size * growth * growth * 9  # 3x3

    f_concat = jax.jit(functools.partial(block_concat, params=params))
    f_buffer = jax.jit(functools.partial(block_buffer, params=params,
                                         growth=growth))
    f_rows = jax.jit(lambda x: jnp.transpose(
        block_rows(jnp.transpose(x, (1, 0, 2, 3)), params), (1, 0, 2, 3)))
    s = strips
    f_strips = jax.jit(lambda x: block_strips(
        x.reshape(s, h // s, w, c0), params).reshape(1, h, w, -1))

    results = {}
    for nm, f in [("concat", f_concat), ("buffer", f_buffer),
                  ("rows", f_rows), ("strips", f_strips)]:
        t, out = timeit(f, (x,), steps)
        results[nm] = (t, np.asarray(out[..., -growth:], np.float32))
        print(f"  {name} {nm:7s} {t * 1e3:7.2f} ms  "
              f"{flops / t / 1e12:5.1f} TF/s", flush=True)
    ref = results["concat"][1]
    for nm in ("buffer", "rows", "strips"):
        err = np.max(np.abs(results[nm][1] - ref))
        if err > 0.25:  # bf16 tolerance on ~unit-scale activations
            print(f"  !! {nm} mismatch max|d|={err}")


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=20)
    p.add_argument("--strips", type=int, default=8)
    args = p.parse_args()

    # block2 (160x240, c0=128, 12 layers) and block1 (320x480, c0=64, 6 layers)
    bench_block("block2 160x240", 160, 240, 128, 32, 4, 12, args.steps,
                args.strips)
    bench_block("block1 320x480", 320, 480, 64, 32, 4, 6, args.steps,
                args.strips)


if __name__ == "__main__":
    main()
