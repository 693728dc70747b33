"""Dependency-chained micro-probes (tunnel-proof timing).

Repeated identical dispatches of one jit can overlap/alias on the axon
tunnel backend (micro_dot_vs_conv.py printed >1000 TF/s — impossible).
Here every repetition consumes the previous result, so device time is
provably serial:

  peak      4096^2 @ 4096^2 chained matmul — calibrates achievable peak
  dotchain  block2-shaped (38400, C) @ (C, C) chained
  convchain 3x3 conv chained at block2 geometry, cin=cout
"""

from __future__ import annotations

import argparse
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax

    p = argparse.ArgumentParser()
    p.add_argument("--reps", type=int, default=30)
    p.add_argument("--steps", type=int, default=5)
    args = p.parse_args()
    R = args.reps
    rng = np.random.default_rng(0)
    dt = jnp.bfloat16

    def timeit(fn, fargs):
        out = fn(*fargs)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        for _ in range(args.steps):
            out = fn(*fargs)
        jax.block_until_ready(out)
        return (time.perf_counter() - t0) / args.steps / R

    # 1) peak calibration
    n = 4096
    x = jnp.asarray(rng.normal(size=(n, n)) * 0.01, dt)
    w = jnp.asarray(rng.normal(size=(n, n)) * 0.01, dt)

    @jax.jit
    def mm_chain(x, w):
        def body(c, _):
            return (c @ w).astype(dt), ()
        return lax.scan(body, x, None, length=R)[0]

    t = timeit(mm_chain, (x, w))
    print(f"peak mm {n}^3:        {t*1e3:7.3f} ms/iter "
          f"{2*n**3/t/1e12:6.1f} TF/s", flush=True)

    # 2) block2-shaped dot, chained
    for M, C in ((38400, 480), (38400, 128)):
        x = jnp.asarray(rng.normal(size=(M, C)) * 0.01, dt)
        w = jnp.asarray(rng.normal(size=(C, C)) * 0.01, dt)

        @jax.jit
        def dot_chain(x, w):
            def body(c, _):
                return (c @ w).astype(dt), ()
            return lax.scan(body, x, None, length=R)[0]

        t = timeit(dot_chain, (x, w))
        print(f"dot {M}x{C}@{C}x{C}: {t*1e3:7.3f} ms/iter "
              f"{2*M*C*C/t/1e12:6.1f} TF/s", flush=True)

    # 3) 3x3 conv chained, block2 plane
    for h, w_, c in ((160, 240, 128), (160, 240, 32), (320, 480, 64)):
        x = jnp.asarray(rng.normal(size=(1, h, w_, c)) * 0.01, dt)
        k = jnp.asarray(rng.normal(size=(3, 3, c, c)) * 0.01, dt)

        @jax.jit
        def conv_chain(x, k):
            def body(cur, _):
                y = lax.conv_general_dilated(
                    cur, k, (1, 1), ((1, 1), (1, 1)),
                    dimension_numbers=("NHWC", "HWIO", "NHWC"))
                return y.astype(dt), ()
            return lax.scan(body, x, None, length=R)[0]

        t = timeit(conv_chain, (x, k))
        fl = 2 * h * w_ * c * c * 9
        print(f"conv3x3 1x{h}x{w_}x{c}->{c}: {t*1e3:7.3f} ms/iter "
              f"{fl/t/1e12:6.1f} TF/s", flush=True)

    # 4) batch=8 strips version of the same conv
    for h, w_, c in ((20, 240, 128), (40, 480, 64)):
        x = jnp.asarray(rng.normal(size=(8, h, w_, c)) * 0.01, dt)
        k = jnp.asarray(rng.normal(size=(3, 3, c, c)) * 0.01, dt)

        @jax.jit
        def conv_chain8(x, k):
            def body(cur, _):
                y = lax.conv_general_dilated(
                    cur, k, (1, 1), ((1, 1), (1, 1)),
                    dimension_numbers=("NHWC", "HWIO", "NHWC"))
                return y.astype(dt), ()
            return lax.scan(body, x, None, length=R)[0]

        t = timeit(conv_chain8, (x, k))
        fl = 2 * 8 * h * w_ * c * c * 9
        print(f"conv3x3 8x{h}x{w_}x{c}->{c}: {t*1e3:7.3f} ms/iter "
              f"{fl/t/1e12:6.1f} TF/s", flush=True)


if __name__ == "__main__":
    main()
