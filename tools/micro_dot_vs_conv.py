"""Probe: is the b1 full-res conv slowness XLA's conv lowering or the
matmul shape itself?

Times, at block2 geometry (M = 38400 pixels):
  dot        (M, K) @ (K, N) plain matmul
  conv1x1    the same contraction expressed as a 1x1 conv
  conv3x3    3x3 conv at the growth-layer shape (K=128 -> N=32)
  conv3x3w   3x3 conv with a WIDE output (N=128) for comparison
repeated R times on independent inputs inside one jit (one dispatch, no
launch-floor aliasing).
"""

from __future__ import annotations

import argparse
import time

import numpy as np


def timeit(fn, args, steps=10):
    import jax

    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(steps):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / steps


def main():
    import jax
    import jax.numpy as jnp

    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=10)
    p.add_argument("--reps", type=int, default=8)
    args = p.parse_args()
    R = args.reps
    rng = np.random.default_rng(0)
    dt = jnp.bfloat16

    M, K, N = 38400, 480, 128
    xs = jnp.asarray(rng.normal(size=(R, M, K)), dt)
    ws = jnp.asarray(rng.normal(size=(R, K, N)), dt)

    @jax.jit
    def dots(xs, ws):
        return sum(xs[i] @ ws[i] for i in range(R))

    t = timeit(dots, (xs, ws), args.steps)
    fl = 2 * M * K * N * R
    print(f"dot      {M}x{K}@{K}x{N}  x{R}: {t*1e3:7.2f} ms {fl/t/1e12:6.1f} TF/s")

    h, w = 160, 240
    xs4 = xs.reshape(R, 1, h, w, K)
    ws4 = ws.reshape(R, 1, 1, K, N)

    @jax.jit
    def convs1(xs4, ws4):
        return sum(
            jax.lax.conv_general_dilated(
                xs4[i], ws4[i], (1, 1), "VALID",
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
            for i in range(R))

    t = timeit(convs1, (xs4, ws4), args.steps)
    print(f"conv1x1  1x{h}x{w}x{K}->{N} x{R}: {t*1e3:7.2f} ms {fl/t/1e12:6.1f} TF/s")

    for cout, tag in ((32, "conv3x3 "), (128, "conv3x3w")):
        cin = 128
        x3 = jnp.asarray(rng.normal(size=(R, 1, h, w, cin)), dt)
        w3 = jnp.asarray(rng.normal(size=(R, 3, 3, cin, cout)), dt)

        @jax.jit
        def convs3(x3, w3):
            return sum(
                jax.lax.conv_general_dilated(
                    x3[i], w3[i], (1, 1), ((1, 1), (1, 1)),
                    dimension_numbers=("NHWC", "HWIO", "NHWC"))
                for i in range(R))

        t = timeit(convs3, (x3, w3), args.steps)
        fl3 = 2 * M * cin * cout * 9 * R
        print(f"{tag} 1x{h}x{w}x{cin}->{cout} x{R}: {t*1e3:7.2f} ms "
              f"{fl3/t/1e12:6.1f} TF/s")

    # batch=8 comparison for the same convs (does N>1 change the picture?)
    for cout, tag in ((32, "b8 c3x3 "), (128, "b8 c3x3w")):
        cin = 128
        x3 = jnp.asarray(rng.normal(size=(8, h, w, cin)), dt)
        w3 = jnp.asarray(rng.normal(size=(3, 3, cin, cout)), dt)

        @jax.jit
        def convb(x3, w3):
            return jax.lax.conv_general_dilated(
                x3, w3, (1, 1), ((1, 1), (1, 1)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"))

        t = timeit(convb, (x3, w3), args.steps)
        fl3 = 2 * 8 * M * cin * cout * 9
        print(f"{tag} 8x{h}x{w}x{cin}->{cout}: {t*1e3:7.2f} ms "
              f"{fl3/t/1e12:6.1f} TF/s")


if __name__ == "__main__":
    main()
