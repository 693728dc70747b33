"""Sweep full-resolution (config 3) inference variants on the real chip.

Usage: python tools/sweep_fullres.py [--variants s2d,s2d+phase,...]

Variants are combinations of:
  base        plain head, no s2d (the r2 BASELINE.md config-3 row)
  s2d         space-to-depth stem lowering
  phase       phase-space head with the gate lifted (auto single-conv
              refine1 above 98k pixels)
  impl=X      dense_block_impl override (e.g. impl=concat,buffer,buffer,buffer)
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def measure(s2d=False, gate=98304, impl=None, batch=1, steps=20,
            rows="none", region="off"):
    import jax

    from tools.profile_attribution import build_fullres

    from tools._timing import device_time

    fn, fargs = build_fullres(impl=impl, fused=True, gate=gate, batch=batch,
                              s2d=s2d, rows=rows, region=region)
    # forced-completion sustained timing (block_until_ready is a no-op on
    # the tunneled backend — see dmmfods_tpu/utils/timing.py)
    sus, _ = device_time(fn, fargs, steps)
    # cross-check: per-call forced completion (includes the tunnel round trip)
    out = fn(*fargs)
    t0 = time.perf_counter()
    for _ in range(max(steps // 2, 3)):
        _, _ = device_time(fn, fargs, 1), None
    sync = (time.perf_counter() - t0) / max(steps // 2, 3)
    # sanity: finite output, full materialization
    full = np.asarray(out, np.float32)
    assert bool(np.isfinite(full).all()), "non-finite output"
    return sus, sync


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--variants", default="s2d;s2d+phase")
    p.add_argument("--steps", type=int, default=20)
    args = p.parse_args()

    for variant in args.variants.split(";"):
        parts = variant.strip().split("+")
        s2d = "s2d" in parts
        gate = 3000000 if "phase" in parts else 98304
        impl = None
        rows = "none"
        region = "off"
        for part in parts:
            if part.startswith("impl="):
                impl = part[5:]
            if part.startswith("rows="):
                rows = part[5:]
            if part.startswith("region="):
                region = part[7:]
        sus, sync = measure(s2d=s2d, gate=gate, impl=impl, steps=args.steps,
                            rows=rows, region=region)
        print(f"variant={variant:<40} sustained {sus * 1e3:7.1f} ms "
              f"(sync {sync * 1e3:7.1f} ms) {1.0 / sus:6.1f} frames/s",
              flush=True)


if __name__ == "__main__":
    main()
