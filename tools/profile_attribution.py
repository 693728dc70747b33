"""Per-op device-time attribution for any jitted call (SURVEY.md §5.1).

Traces a few executions with ``jax.profiler``, parses the exported
``*.trace.json.gz``, and prints the top device ops by total time with a
coarse category roll-up. Usage::

    python tools/profile_attribution.py --config 3        # full-res b1
    python tools/profile_attribution.py --config train    # b32 raw train
    python tools/profile_attribution.py --config headline # b256 128x192

The script is a tool, not a test: it requires a real accelerator to be
informative (CPU traces attribute to the wrong backend).
"""

from __future__ import annotations

import argparse
import collections
import glob
import gzip
import json
import os
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def trace_and_attribute(fn, args, steps=3, top=28):
    import jax

    out = fn(*args)
    jax.block_until_ready(out)
    tmp = tempfile.mkdtemp(prefix="dmmfods_prof_")
    jax.profiler.start_trace(tmp)
    for _ in range(steps):
        out = fn(*args)
    jax.block_until_ready(out)
    jax.profiler.stop_trace()

    files = glob.glob(os.path.join(tmp, "**", "*.trace.json.gz"), recursive=True)
    if not files:
        print("no trace produced", file=sys.stderr)
        return
    with gzip.open(sorted(files)[-1]) as f:
        data = json.load(f)
    events = [e for e in data.get("traceEvents", []) if e.get("ph") == "X" and "dur" in e]
    pid_names = {
        e["pid"]: e["args"].get("name", "")
        for e in data.get("traceEvents", [])
        if e.get("ph") == "M" and e.get("name") == "process_name" and "args" in e
    }
    device_pids = {
        pid for pid, name in pid_names.items()
        if "TPU" in name or "/device" in name.lower() or "XLA" in name
    }
    dev_events = [e for e in events if e["pid"] in device_pids]
    if not dev_events:  # fall back: the busiest non-python pid
        by_pid = collections.Counter()
        for e in events:
            by_pid[e["pid"]] += e["dur"]
        device_pids = {by_pid.most_common(1)[0][0]}
        dev_events = [e for e in events if e["pid"] in device_pids]

    per_op = collections.Counter()
    for e in dev_events:
        name = e["name"]
        if name.startswith("jit_") or "(" in name:
            continue  # enclosing program event — would double-count children
        per_op[name] += e["dur"]
    total = sum(per_op.values()) / steps

    def category(name):
        n = name.lower()
        if "conv" in n or "dot" in n or "fusion" in n and False:
            return "conv/dot"
        for key in ("copy", "transpose", "reshape", "concatenate", "slice",
                    "pad", "broadcast", "reduce", "scatter", "gather",
                    "fusion", "select", "bitcast", "all-reduce", "rsqrt",
                    "convert", "dynamic-update"):
            if key in n:
                return key
        return "other"

    print(f"\ntotal device time/step: {total / 1e3:.2f} ms  (pids: "
          f"{[pid_names.get(p, p) for p in device_pids]})")
    print(f"{'us/step':>10}  {'%':>5}  op")
    for name, dur in per_op.most_common(top):
        print(f"{dur / steps:>10.0f}  {100 * dur / steps / total:>5.1f}  {name[:110]}")

    cats = collections.Counter()
    for name, dur in per_op.items():
        cats[category(name)] += dur
    print("\ncategory roll-up:")
    for cat, dur in cats.most_common():
        print(f"{dur / steps / 1e3:>9.2f} ms  {100 * dur / steps / total:>5.1f}%  {cat}")
    return per_op, total


def build_fullres(impl=None, fused=True, gate=98304, remat=False, batch=1,
                  h=1280, w=1920, arch="121", s2d=False, rows="none",
                  region="off", strip="auto", stem_pool="auto"):
    import jax
    import jax.numpy as jnp

    from dmmfods_tpu.config import get_config
    from dmmfods_tpu.models.dense_unet_lidar import (
        densenet121_u_lidar, densenet201_u_lidar,
    )
    from dmmfods_tpu.utils.cache import enable_persistent_cache

    enable_persistent_cache()
    cfg = get_config("/tmp/dmmfods_prof")
    cfg.tpu.compute_dtype = "bfloat16"
    cfg.model.concat_before_block_num = 3
    cfg.tpu.use_fused_kernels = fused
    cfg.tpu.fused_head_max_pixels = gate
    cfg.tpu.remat = remat
    cfg.tpu.s2d_stem = s2d
    cfg.tpu.rows_blocks = rows
    cfg.tpu.rows_region = region
    cfg.tpu.dense_block_strip = strip
    cfg.tpu.stem_pool_strip = stem_pool
    if impl:
        cfg.tpu.dense_block_impl = impl
    ctor = densenet201_u_lidar if arch == "201" else densenet121_u_lidar
    # param shapes are resolution-independent: init on a small plane (the
    # eager CPU init at 1280x1920 takes many minutes on a 1-core host)
    bundle = ctor(config=cfg, init_hw=(160, 224))
    module, variables = bundle.module, bundle.variables

    from dmmfods_tpu.utils.cache import jit_auto_out

    @jit_auto_out
    def forward(v, rgb, lidar):
        return module.apply(v, rgb, lidar, False)

    rng = np.random.default_rng(0)
    rgb = jnp.asarray(rng.normal(size=(batch, h, w, 3)), jnp.bfloat16)
    lidar = jnp.asarray(rng.normal(size=(batch, h, w, 1)), jnp.bfloat16)
    return forward, (variables, rgb, lidar)


def build_train(batch=128, h=128, w=192):
    import jax
    import jax.numpy as jnp

    from dmmfods_tpu import trainer as trainer_lib
    from dmmfods_tpu.config import get_config
    from dmmfods_tpu.data.synthetic import make_raw_batch
    from dmmfods_tpu.models.dense_unet_lidar import densenet121_u_lidar
    from dmmfods_tpu.utils.cache import enable_persistent_cache

    enable_persistent_cache()
    cfg = get_config("/tmp/dmmfods_prof")
    cfg.tpu.compute_dtype = "bfloat16"
    cfg.tpu.use_fused_kernels = True
    cfg.tpu.device_preprocess = True
    bundle = densenet121_u_lidar(config=cfg, init_hw=(h, w))
    tx = trainer_lib.make_optimizer(cfg)
    state = trainer_lib.create_train_state(bundle, tx)
    step = trainer_lib.make_train_step_ht(
        bundle.module, tx, cfg, donate=False, full_height=1280, full_width=1920)
    img, lidar, boxes = make_raw_batch(batch_size=batch, h=h, w=w, seed=3)
    img = jnp.asarray(img)
    lidar = jnp.asarray(lidar)
    boxes = jnp.asarray(boxes)
    return step, (state, img, lidar, boxes)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--config", default="3")
    p.add_argument("--steps", type=int, default=3)
    p.add_argument("--impl", default=None)
    p.add_argument("--no-fused", action="store_true")
    p.add_argument("--gate", type=int, default=98304)
    p.add_argument("--batch", type=int, default=None)
    p.add_argument("--s2d", action="store_true")
    p.add_argument("--rows", default="none")
    p.add_argument("--region", default="off")
    p.add_argument("--stem-pool", default="auto")
    args = p.parse_args()

    if args.config == "3":
        fn, fargs = build_fullres(
            impl=args.impl, fused=not args.no_fused, gate=args.gate,
            batch=args.batch or 1, s2d=args.s2d, rows=args.rows,
            region=args.region, stem_pool=args.stem_pool)
    elif args.config == "headline":
        fn, fargs = build_fullres(
            impl=args.impl, fused=not args.no_fused, gate=args.gate,
            batch=args.batch or 256, h=128, w=192, s2d=args.s2d,
            rows=args.rows, region=args.region)
    elif args.config == "train":
        fn, fargs = build_train(batch=args.batch or 128)
    else:
        raise SystemExit(f"unknown --config {args.config}")

    # timing first (sustained)
    from tools._timing import device_time
    sus, _ = device_time(fn, fargs, 10)
    print(f"sustained step: {sus * 1e3:.2f} ms")

    trace_and_attribute(fn, fargs, steps=args.steps)


if __name__ == "__main__":
    main()
