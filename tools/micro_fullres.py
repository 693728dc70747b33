"""Micro-benchmarks for the full-res (config 3) optimization work.

Isolates the conv shapes that dominate the b1 1280x1920 forward
(tools/hlo_group.py attribution) and times candidate lowerings:

  pair      two separate convs (stream_1 + stream_2, the current lowering)
  bgc       one conv with batch_group_count=2 (streams packed in batch,
            filters stacked on the output-channel dim -> 2x lane width)
  wide      one conv with channels doubled (upper bound: perfect packing)
"""

from __future__ import annotations

import argparse
import functools
import sys
import time

import numpy as np


def timeit(fn, args, steps=30):
    import jax

    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(steps):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / steps


def bench_conv(h, w, cin, cout, k, steps=30):
    import jax
    import jax.numpy as jnp

    dn = ("NHWC", "HWIO", "NHWC")
    pad = [(k // 2, k // 2)] * 2
    rng = np.random.default_rng(0)
    x1 = jnp.asarray(rng.normal(size=(1, h, w, cin)), jnp.bfloat16)
    x2 = jnp.asarray(rng.normal(size=(1, h, w, cin)), jnp.bfloat16)
    w1 = jnp.asarray(rng.normal(size=(k, k, cin, cout)), jnp.bfloat16)
    w2 = jnp.asarray(rng.normal(size=(k, k, cin, cout)), jnp.bfloat16)

    @jax.jit
    def pair(x1, x2, w1, w2):
        f = functools.partial(
            jax.lax.conv_general_dilated, window_strides=(1, 1), padding=pad,
            dimension_numbers=dn)
        return f(x1, w1), f(x2, w2)

    @jax.jit
    def bgc(x1, x2, w1, w2):
        x = jnp.concatenate([x1, x2], axis=0)
        wf = jnp.concatenate([w1, w2], axis=-1)
        return jax.lax.conv_general_dilated(
            x, wf, window_strides=(1, 1), padding=pad, dimension_numbers=dn,
            batch_group_count=2)

    @jax.jit
    def wide(x1, w1, w2):
        wf = jnp.concatenate([w1, w2], axis=-1)
        return jax.lax.conv_general_dilated(
            x1, wf, window_strides=(1, 1), padding=pad, dimension_numbers=dn)

    flops = 2 * h * w * cin * cout * k * k * 2  # two streams
    tp = timeit(pair, (x1, x2, w1, w2), steps)
    tb = timeit(bgc, (x1, x2, w1, w2), steps)
    tw = timeit(wide, (x1, w1, w2), steps)
    print(f"conv {h}x{w} {cin}->{cout} k{k}: "
          f"pair {tp*1e3:6.2f} ms ({flops/tp/1e12:5.1f} TF/s)  "
          f"bgc {tb*1e3:6.2f} ms ({flops/tb/1e12:5.1f} TF/s)  "
          f"wide {tw*1e3:6.2f} ms ({flops/tw/1e12:5.1f} TF/s)", flush=True)


def bench_batch2(h, w, cin, cout, k, steps=30):
    """Same conv, two streams packed as batch=2 with SHARED weights vs b1x2
    (how much of the pair cost is launch/blowup vs fundamental)."""
    import jax
    import jax.numpy as jnp

    dn = ("NHWC", "HWIO", "NHWC")
    pad = [(k // 2, k // 2)] * 2
    rng = np.random.default_rng(0)
    xb = jnp.asarray(rng.normal(size=(2, h, w, cin)), jnp.bfloat16)
    w1 = jnp.asarray(rng.normal(size=(k, k, cin, cout)), jnp.bfloat16)

    @jax.jit
    def b2(xb, w1):
        return jax.lax.conv_general_dilated(
            xb, w1, window_strides=(1, 1), padding=pad, dimension_numbers=dn)

    flops = 2 * h * w * cin * cout * k * k * 2
    tb = timeit(b2, (xb, w1), steps)
    print(f"  batch2 shared-w {h}x{w} {cin}->{cout} k{k}: {tb*1e3:6.2f} ms "
          f"({flops/tb/1e12:5.1f} TF/s)", flush=True)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=30)
    args = p.parse_args()

    # block2 shapes (160x240 after stem/4 + transition1)
    bench_conv(160, 240, 304, 128, 1, args.steps)   # mid-block 1x1
    bench_conv(160, 240, 128, 32, 3, args.steps)    # 3x3 growth conv
    bench_batch2(160, 240, 304, 128, 1, args.steps)
    bench_batch2(160, 240, 128, 32, 3, args.steps)
    # block1 shapes (320x480)
    bench_conv(320, 480, 160, 128, 1, args.steps)
    bench_conv(320, 480, 128, 32, 3, args.steps)
    # s2d stem shape (640x960, 12->64 k4)
    bench_conv(640, 960, 12, 64, 4, args.steps)


if __name__ == "__main__":
    main()
