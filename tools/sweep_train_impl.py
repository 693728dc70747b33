"""Sweep dense-block lowerings UNDER AUTODIFF on the real chip.

Measures the sustained b128 raw-record train step (the VERDICT round-2
efficiency target) for each candidate ``tpu.dense_block_impl``, including
the round-3 custom-VJP lowering. Usage::

    python tools/sweep_train_impl.py [--batch 128] [--impls vjp,concat]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def measure(impl, batch, h=128, w=192, steps=10):
    """Sustained DEVICE step time: `steps` train steps in ONE lax.scan
    dispatch (per-call timing on the tunneled dev chip pays a ~30 ms host
    round trip + param-handle churn per call — measured 150 ms/call for a
    known 82 ms device step)."""
    import jax
    import jax.numpy as jnp
    from jax import lax

    from dmmfods_tpu import trainer as trainer_lib
    from dmmfods_tpu.config import get_config
    from dmmfods_tpu.data.synthetic import make_raw_batch
    from dmmfods_tpu.models.dense_unet_lidar import densenet121_u_lidar
    from dmmfods_tpu.utils.cache import enable_persistent_cache

    enable_persistent_cache()
    cfg = get_config("/tmp/dmmfods_sweep")
    cfg.tpu.compute_dtype = "bfloat16"
    cfg.tpu.use_fused_kernels = True
    cfg.tpu.device_preprocess = True
    cfg.tpu.dense_block_impl = impl
    bundle = densenet121_u_lidar(config=cfg, init_hw=(h, w))
    tx = trainer_lib.make_optimizer(cfg)
    state = trainer_lib.create_train_state(bundle, tx)
    step = trainer_lib.make_train_step_ht(
        bundle.module, tx, cfg, donate=False,
        full_height=1280, full_width=1920)
    img, lidar, boxes = make_raw_batch(batch_size=batch, h=h, w=w, seed=3)
    img, lidar, boxes = jnp.asarray(img), jnp.asarray(lidar), jnp.asarray(boxes)

    def body(s, _):
        s, m = step(s, img, lidar, boxes)
        return s, m["loss"]

    @jax.jit
    def many(s):
        return lax.scan(body, s, None, length=steps)

    state2, losses = many(state)  # compile
    np.asarray(losses)  # force completion (block_until_ready is a no-op
    # for remote executions on the tunneled backend — utils/timing.py)
    t0 = time.perf_counter()
    _, losses = many(state)
    loss = float(np.asarray(losses)[-1])
    dt = (time.perf_counter() - t0) / steps
    del state, state2, step, bundle
    return dt, loss


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=128)
    # ';'-separated list of impl strings (each may itself be a
    # comma-separated per-block list)
    p.add_argument("--impls", default="concat;vjp")
    p.add_argument("--steps", type=int, default=10)
    args = p.parse_args()

    fwd_gflops = 15.83  # per 128x192 frame (BASELINE.md)
    for impl in args.impls.split(";"):
        impl = impl.strip()
        dt, loss = measure(impl, args.batch, steps=args.steps)
        tflops = 3 * fwd_gflops * args.batch / dt / 1e3
        print(f"impl={impl!r:<40} b{args.batch}: {dt * 1e3:7.1f} ms/step "
              f"{args.batch / dt:7.0f} fps  ~{tflops:5.1f} TFLOP/s  loss={loss:.1f}",
              flush=True)


if __name__ == "__main__":
    main()
