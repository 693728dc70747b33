"""Command-line entry point — replaces the reference's Colab notebook
(``Colab_Setup.ipynb``: install / data transfer / offline conversion /
training / visual assessment; SURVEY.md §7.4 swaps the GDrive plumbing for a
plain CLI).

Commands:
  train     train the Dense U-Net (resume-aware)
  eval      validate / test with the best checkpoint
  convert   offline Waymo tfrecord -> array conversion
  batch     pack converted samples into serialized batches
  assess    visual assessment: write side-by-side PNG panels
            (RGB | LiDAR | sigmoid(prediction) | GT) like notebook cell 12
  bench     run the benchmark harness

Usage: ``python -m dmmfods_tpu.cli <command> [--host-dir DIR] [--set a.b=c ...]``
"""

from __future__ import annotations

import argparse
import ast
import sys


def _apply_overrides(config, pairs):
    """``--set model.growth_rate=48`` style overrides (typed via literal_eval)."""
    for pair in pairs or []:
        key, _, raw = pair.partition("=")
        if raw.lower() in ("true", "false"):  # accept json-style booleans
            value = raw.lower() == "true"
        else:
            try:
                value = ast.literal_eval(raw)
            except (ValueError, SyntaxError):
                value = raw
        node = config
        parts = key.split(".")
        for p in parts[:-1]:
            node = node[p]
        node[parts[-1]] = value
    return config


def _load_config(args):
    from .utils.cache import enable_persistent_cache
    enable_persistent_cache()

    from .config import get_config

    config = get_config(args.host_dir)
    return _apply_overrides(config, args.set)


def _agent_class(name):
    if name == "detector":
        from .agents.detection_baseline import DetectionAgent

        return DetectionAgent
    from .agents.dense_unet_agent import Dense_U_Net_lidar_Agent

    return Dense_U_Net_lidar_Agent


def cmd_train(args):
    config = _load_config(args)
    config.loader.mode = "train"
    agent = _agent_class(args.agent)(
        config, torchvision_init=args.torchvision_init
    )
    agent.run()
    agent.finalize()


def cmd_eval(args):
    config = _load_config(args)
    config.loader.mode = "test"
    agent = _agent_class(args.agent)(config, torchvision_init=False)
    agent.run()
    ap = getattr(agent, "epoch_ap_per_class", None)
    if ap is not None:
        import numpy as np

        ap = np.asarray(ap, dtype=float)
        print("dataset_heatmap_ap_per_class:", ap.tolist())
        print("dataset_heatmap_ap_mean:", float(ap.mean()))
    agent.finalize()


def cmd_convert(args):
    from .data.converter import waymo_to_arrays_offline

    config = _load_config(args)
    waymo_to_arrays_offline(
        args.data_root or config.dir.data.root,
        small_dataset_for_testing=args.small,
        config=config,
        store=args.store,
    )


def cmd_batch(args):
    from .data.converter import save_data_in_batch, save_raw_data_in_batch

    config = _load_config(args)
    if args.raw:
        n = save_raw_data_in_batch(config, args.buckets, args.mode)
    else:
        n = save_data_in_batch(config, args.buckets, args.mode)
    print(f"{n} batches serialized")


def cmd_assess(args):
    from .utils.assessment import visual_assessment

    config = _load_config(args)
    out = visual_assessment(config, num_samples=args.num_samples, out_dir=args.out_dir)
    print(f"wrote {len(out)} panels to {args.out_dir}")


def cmd_port(args):
    """Convert a torch checkpoint (torchvision densenet or a full
    reference-trained model) into an orbax checkpoint loadable by the Agent."""
    import torch

    from .models.dense_unet_lidar import densenet121_u_lidar
    from .models.torch_port import load_full_torch_model, load_torchvision_encoder
    from .utils import checkpoint as ckpt_lib
    from . import trainer as trainer_lib

    config = _load_config(args)
    bundle = densenet121_u_lidar(config=config)
    raw = torch.load(args.torch_checkpoint, map_location="cpu", weights_only=False)
    # reference agent checkpoints nest the model under the state_dict key
    state_dict = raw.get(config.agent.checkpoint.state_dict, raw) if isinstance(raw, dict) else raw

    if args.full_model:
        variables, missing = load_full_torch_model(bundle.variables, state_dict, bundle.spec)
        if missing:
            print(f"note: {len(missing)} checkpoint keys had no target "
                  f"(first: {missing[:3]})")
    else:
        variables = load_torchvision_encoder(bundle.variables, state_dict, bundle.spec)

    tx = trainer_lib.make_optimizer(config)
    path = ckpt_lib.save_checkpoint(
        config,
        params=variables["params"], batch_stats=variables.get("batch_stats", {}),
        opt_state=tx.init(variables["params"]),
        epoch=0, train_iteration=0, val_iteration=0, best_val_iou=0.0,
        filename=args.name, is_best=False,
    )
    print(f"ported checkpoint written to {path}")


def cmd_parity(args):
    """One-command real-data parity: port a reference-trained torch
    checkpoint, evaluate this framework AND (when importable) the actual
    reference torch network on the same data directory, and print a
    side-by-side AP/IoU/accuracy table (VERDICT r4 #8; utils/parity.py)."""
    from .utils.parity import run_parity

    config = _load_config(args)
    _, _, table = run_parity(
        config,
        args.torch_ckpt,
        args.data,
        reference_root=args.reference_root or None,
        full_model=not args.encoder_only,
    )
    print(table)


def cmd_warmup(args):
    """Precompile the model for a target shape into the persistent compile
    cache (VERDICT r3 #10): the Pallas strip kernels cost 200-320 s of Mosaic
    compile per (block, shape) — that belongs in an offline warmup, never in
    a serving/training first step. Compiles eval forwards for each serving
    bucket and (optionally) the train step, all AOT from shape structs: no
    weights, no data, no device memory beyond the compiled programs."""
    import time

    import jax
    import jax.numpy as jnp
    import numpy as np

    from . import trainer as trainer_lib
    from .models.dense_unet_lidar import densenet121_u_lidar
    from .utils.cache import enable_persistent_cache

    enable_persistent_cache(args.cache_dir or None)
    config = _load_config(args)
    if args.height and args.width:
        # config stores (C, W, H) — reference helper.py:169-172 convention
        config.dataset.images.size = (3, args.width, args.height)
    _, w, h = config.dataset.images.size

    if args.serving:
        # the serving engine BAKES variables into its jit (constant-folded
        # weights), so its cache keys depend on the WEIGHT VALUES too — a
        # fresh-init warmup would not warm a checkpoint-weighted engine.
        # Restore the best checkpoint into the bundle when one exists; only
        # fall back to fresh init when there is none.
        from .serving import InferenceEngine
        from .utils import checkpoint as ckpt_lib

        bundle = densenet121_u_lidar(config=config)
        tx = trainer_lib.make_optimizer(config)
        import warnings

        with warnings.catch_warnings():
            warnings.simplefilter("ignore")  # "No checkpoint exists" is fine here
            restored = ckpt_lib.load_checkpoint(
                config,
                template={
                    "params": bundle.variables["params"],
                    "batch_stats": bundle.variables.get("batch_stats", {}),
                    "opt_state": tx.init(bundle.variables["params"]),
                },
            )
        if restored is not None:
            sd = restored[config.agent.checkpoint.state_dict]
            bundle.variables = dict(bundle.variables,
                                    params=sd["params"],
                                    batch_stats=sd["batch_stats"])
            print("warmup serving: weights from best checkpoint")
        else:
            print("warmup serving: no checkpoint found, fresh-init weights")
        engine = InferenceEngine(bundle, buckets=tuple(args.buckets))
        t0 = time.perf_counter()
        engine.warmup()
        print(f"warmup serving buckets {args.buckets} @ {h}x{w}: "
              f"{time.perf_counter() - t0:.1f}s")
        return

    bundle = densenet121_u_lidar(config=config, lazy=True)
    module, spec = bundle.module, bundle.spec
    dtype = spec.dtype
    s2 = spec.stream_2_in_channels

    def shapes(batch):
        rgb = jax.ShapeDtypeStruct((batch, h, w, 3), dtype)
        lidar = jax.ShapeDtypeStruct((batch, h, w, s2), dtype) if s2 else None
        return rgb, lidar

    rgb1, lidar1 = shapes(1)
    var_shapes = jax.eval_shape(
        lambda: module.init(jax.random.PRNGKey(0), jnp.zeros(rgb1.shape, dtype),
                            jnp.zeros(lidar1.shape, dtype) if s2 else None,
                            False)
    )

    forward = trainer_lib.make_forward(module, config)
    for b in args.buckets:
        rgb, lidar = shapes(b)
        t0 = time.perf_counter()
        forward.lower(var_shapes, rgb, lidar).compile()
        print(f"warmup eval {h}x{w} b{b}: compiled in "
              f"{time.perf_counter() - t0:.1f}s")

    if args.train_batch:
        tx = trainer_lib.make_optimizer(config)
        state_shapes = jax.eval_shape(
            lambda v: trainer_lib.TrainState(
                params=v["params"],
                batch_stats=v.get("batch_stats", {}),
                opt_state=tx.init(v["params"]),
            ),
            var_shapes,
        )
        step = trainer_lib.make_train_step(module, tx, config, donate=False)
        b = args.train_batch
        rgb, lidar = shapes(b)
        ht = jax.ShapeDtypeStruct((b, h, w, spec.num_classes), np.float32)
        t0 = time.perf_counter()
        step.lower(state_shapes, rgb, lidar, ht).compile()
        print(f"warmup train {h}x{w} b{b}: compiled in "
              f"{time.perf_counter() - t0:.1f}s")
    print("warmup complete; cache:",
          jax.config.jax_compilation_cache_dir)


def cmd_policy(args):
    """Print the lowering-policy table for a target shape (see
    models/lowering_policy.py) without compiling anything."""
    from .models.dense_unet_lidar import ModelSpec
    from .models import lowering_policy

    config = _load_config(args)
    if args.height and args.width:
        config.dataset.images.size = (3, args.width, args.height)
    _, w, h = config.dataset.images.size
    spec = ModelSpec.from_config(config)
    policy = lowering_policy.describe(
        spec, args.batch, h, w, train=args.train,
        backend=args.backend or None,
    )
    print(lowering_policy.format_table(policy))


def cmd_bench(args):
    import subprocess
    from pathlib import Path

    # resolve bench.py relative to the installed package's repo root, not the
    # caller's CWD, so `dmmfods-tpu bench` works from anywhere
    bench = Path(__file__).resolve().parents[1] / "bench.py"
    cmd = [sys.executable, str(bench)] + (args.bench_args or [])
    raise SystemExit(subprocess.call(cmd))


def main(argv=None):
    parser = argparse.ArgumentParser(prog="dmmfods_tpu", description=__doc__)
    sub = parser.add_subparsers(dest="command", required=True)

    def common(p):
        p.add_argument("--host-dir", default="", help="root dir for runs/config/data")
        p.add_argument("--set", action="append", metavar="KEY=VALUE",
                       help="config override, e.g. --set model.growth_rate=48")

    p = sub.add_parser("train", help="train the Dense U-Net")
    common(p)
    p.add_argument("--torchvision-init", action="store_true",
                   help="bootstrap encoder from config.model.pretrained_path")
    p.add_argument("--agent", choices=["unet", "detector"], default="unet",
                   help="unet: heat-map model; detector: CenterNet baseline "
                        "(trains from raw records)")
    p.set_defaults(fn=cmd_train)

    p = sub.add_parser("eval", help="evaluate with the best checkpoint")
    common(p)
    p.add_argument("--agent", choices=["unet", "detector"], default="unet")
    p.set_defaults(fn=cmd_eval)

    p = sub.add_parser("convert", help="offline Waymo tfrecord conversion")
    common(p)
    p.add_argument("--data-root", default="")
    p.add_argument("--small", action="store_true", help="stop after 10 frames")
    p.add_argument("--store", choices=["dense", "raw", "both"], default="dense",
                   help="dense: reference-equivalent offline tensors; raw: "
                        "points+boxes records for tpu.device_preprocess")
    p.set_defaults(fn=cmd_convert)

    p = sub.add_parser("batch", help="pack converted samples into batches")
    common(p)
    p.add_argument("buckets", nargs="+")
    p.add_argument("--mode", choices=["train", "val", "test"], required=True)
    p.add_argument("--raw", action="store_true",
                   help="pack raw records (images+points+boxes .npz)")
    p.set_defaults(fn=cmd_batch)

    p = sub.add_parser("assess", help="visual assessment panels")
    common(p)
    p.add_argument("--num-samples", type=int, default=4)
    p.add_argument("--out-dir", default="assessment")
    p.set_defaults(fn=cmd_assess)

    p = sub.add_parser("port", help="convert a torch checkpoint to orbax")
    common(p)
    p.add_argument("torch_checkpoint")
    p.add_argument("--full-model", action="store_true",
                   help="import decoder/head too (reference-trained model)")
    p.add_argument("--name", default="ported_checkpoint")
    p.set_defaults(fn=cmd_port)

    p = sub.add_parser("parity", help="side-by-side AP/IoU vs the reference "
                                      "torch agent on the same data")
    common(p)
    p.add_argument("--torch-ckpt", required=True,
                   help="reference-trained torch checkpoint (.pth.tar)")
    p.add_argument("--data", required=True,
                   help="directory of serialized val batch files")
    p.add_argument("--reference-root", default="",
                   help="path to a reference source checkout (if the "
                        "dmmfods package is not installed)")
    p.add_argument("--encoder-only", action="store_true",
                   help="port only the torchvision encoder keys")
    p.set_defaults(fn=cmd_parity)

    p = sub.add_parser("warmup", help="precompile kernels for a target shape "
                                      "into the persistent cache")
    common(p)
    p.add_argument("--height", type=int, default=0)
    p.add_argument("--width", type=int, default=0)
    p.add_argument("--buckets", type=int, nargs="*", default=[1, 4, 8],
                   help="serving batch sizes to compile eval forwards for")
    p.add_argument("--train-batch", type=int, default=0,
                   help="also compile the train step at this batch size")
    p.add_argument("--cache-dir", default="",
                   help="persistent compile cache dir (default "
                        "$DMMFODS_JAX_CACHE or /tmp/dmmfods_jax_cache)")
    p.add_argument("--serving", action="store_true",
                   help="warm the real serving engine (weight-baked jits) "
                        "instead of the parameterized AOT compiles")
    p.set_defaults(fn=cmd_warmup)

    p = sub.add_parser("policy", help="print the lowering-policy table for "
                                      "a target shape")
    common(p)
    p.add_argument("--height", type=int, default=0)
    p.add_argument("--width", type=int, default=0)
    p.add_argument("--batch", type=int, default=1)
    p.add_argument("--train", action="store_true")
    p.add_argument("--backend", default="", choices=["", "tpu", "cpu"])
    p.set_defaults(fn=cmd_policy)

    p = sub.add_parser("bench", help="run the benchmark harness")
    p.add_argument("bench_args", nargs="*")
    p.set_defaults(fn=cmd_bench)

    args = parser.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    main()
