"""Benchmark harness — prints ONE JSON line for the driver.

Headline metric (BASELINE.json): Waymo frames/sec/chip for mid-fusion
DenseNet-121 U-Net inference at the reference working resolution
(128 x 192, 3-ch RGB + 1-ch LiDAR -> 3-class heat maps), bf16 on one chip.

``vs_baseline``: the reference publishes no numbers (BASELINE.md), so the
baseline is a documented analytic estimate of the reference stack on its
implied hardware (Colab GPU, fp32 PyTorch + cuDNN): forward-pass conv FLOPs
are counted exactly from the architecture, and the reference throughput is
modeled as a T4 sustaining 2.5 TFLOP/s effective on fp32 convs (a generous
~30% of peak given cudnn.benchmark autotuning; the north-star target is
>10x this). vs_baseline = measured_fps / baseline_fps_estimate.

Run: ``python bench.py [--batch N] [--steps N] [--config mid121]``
"""

import argparse
import json
import sys
import time

import numpy as np


def conv_flops_per_frame(spec, h, w):
    """Exact conv MAC count (x2 FLOPs) of one forward pass at (h, w) input."""
    macs = 0

    def conv(cin, cout, k, oh, ow):
        nonlocal macs
        macs += cin * cout * k * k * oh * ow

    def dense_block(c_in, n_layers, oh, ow, growth, bn_size):
        c = c_in
        for _ in range(n_layers):
            conv(c, bn_size * growth, 1, oh, ow)
            conv(bn_size * growth, growth, 3, oh, ow)
            c += growth
        return c

    g, bc, init = spec.growth_rate, spec.block_config, spec.num_init_features
    fusion = spec.fusion
    in_ch = spec.stream_1_in_channels + (spec.stream_2_in_channels if fusion == "early" else 0)

    oh, ow = h // 2, w // 2
    conv(in_ch, init, 7, oh, ow)  # stem
    oh, ow = oh // 2, ow // 2
    c = init
    sizes = [init + 2 * g]
    shapes = [(h // 2, w // 2)]
    for i, n_layers in enumerate(bc):
        c = dense_block(c, n_layers, oh, ow, g, spec.bn_size)
        sizes.append(c)
        if i != len(bc) - 1:
            shapes.append((oh, ow))
            conv(c, c // 2, 1, oh, ow)  # transition
            c //= 2
            oh, ow = oh // 2, ow // 2

    if fusion == "mid":
        s2h, s2w = h // 2, w // 2
        conv(spec.stream_2_in_channels, init, 7, s2h, s2w)
        s2h, s2w = s2h // 2, s2w // 2
        c2 = init
        for i in range(spec.concat_before_block_num - 1):
            c2 = dense_block(c2, bc[i], s2h, s2w, g, spec.bn_size)
            conv(c2, c2 // 2, 1, s2h, s2w)
            c2 //= 2
            s2h, s2w = s2h // 2, s2w // 2
        # concat module runs at the post-transition resolution h / 2^(k+1)
        k = spec.concat_before_block_num
        conv(2 * c2, c2, 1, h // (2 ** (k + 1)), w // (2 ** (k + 1)))

    bottleneck = sizes.pop()
    num_in = bottleneck
    for _ in range(len(bc)):
        nf = sizes.pop()
        th, tw = shapes.pop()
        conv(num_in, nf, 1, max(th // 2, 1), max(tw // 2, 1))  # reduce at source res
        conv(nf, nf, 3, th, tw)  # transposed conv emits at target res
        num_in = nf * 2

    nf = spec.decoder_stage_features()[-1]
    head_in = nf + spec.stream_1_in_channels + spec.stream_2_in_channels
    conv(head_in, nf // 2, 3, h, w)
    conv(nf // 2, spec.num_classes, 5, h, w)
    return 2 * macs


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--batch", type=int, default=256)
    parser.add_argument("--steps", type=int, default=30)
    parser.add_argument("--warmup", type=int, default=5)
    parser.add_argument("--height", type=int, default=128)
    parser.add_argument("--width", type=int, default=192)
    parser.add_argument("--dtype", default="bfloat16")
    parser.add_argument("--fused", action=argparse.BooleanOptionalAction, default=True,
                        help="use fused kernels (disable with --no-fused)")
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp

    from dmmfods_tpu.utils.cache import enable_persistent_cache
    enable_persistent_cache()

    from dmmfods_tpu.config import get_config
    from dmmfods_tpu.models.dense_unet_lidar import densenet121_u_lidar

    cfg = get_config("/tmp/dmmfods_bench")
    cfg.tpu.compute_dtype = args.dtype
    cfg.tpu.use_fused_kernels = bool(args.fused)

    bundle = densenet121_u_lidar(config=cfg, init_hw=(64, 96))  # params are resolution-independent
    module, variables = bundle.module, bundle.variables

    from dmmfods_tpu.utils.cache import jit_auto_out

    @jit_auto_out
    def forward(v, rgb, lidar):
        return module.apply(v, rgb, lidar, False)

    rng = np.random.default_rng(0)
    dt = jnp.dtype(args.dtype)
    rgb = jnp.asarray(rng.normal(size=(args.batch, args.height, args.width, 3)), dt)
    lidar = jnp.asarray(rng.normal(size=(args.batch, args.height, args.width, 1)), dt)

    # NOTE(methodology): jax.block_until_ready is a NO-OP for remote
    # executions on the tunneled TPU backend this is benchmarked on — all
    # timing goes through utils/timing.py, which forces completion via a
    # scalar host fetch (validated at 191 TF/s on a chained 4096^3 matmul
    # vs the chip's ~197 peak; see that module's docstring).
    from dmmfods_tpu.utils.timing import (
        sustained_step_time, synchronous_step_times,
    )

    def fwd():
        return forward(variables, rgb, lidar)

    # synchronous per-call times (includes the tunnel round trip; latency
    # context only). First call compiles.
    times = synchronous_step_times(lambda: fwd(), (), steps=args.steps)
    med_sync = float(np.median(times))

    # sustained throughput: back-to-back dispatch, force completion once —
    # how a pipelined server (dmmfods_tpu/serving.py) drives the chip
    med = sustained_step_time(lambda: fwd(), (), steps=args.steps,
                              warmup=args.warmup)
    fps = args.batch / med

    flops = conv_flops_per_frame(bundle.spec, args.height, args.width)
    # documented baseline model: reference torch/fp32 on Colab T4 at
    # 2.5 TFLOP/s effective on these convs
    baseline_fps = 2.5e12 / flops
    achieved_tflops = flops * fps / 1e12

    result = {
        "metric": "waymo_frames_per_sec_per_chip_midfusion_inference_128x192",
        "value": round(fps, 1),
        "unit": "frames/s/chip (sustained)",
        "vs_baseline": round(fps / baseline_fps, 2),
        "detail": {
            "batch": args.batch,
            "sustained_step_s": round(med, 5),
            "sync_step_s": round(med_sync, 5),
            "dtype": args.dtype,
            "model_fwd_gflops_per_frame": round(flops / 1e9, 2),
            "achieved_tflops": round(achieved_tflops, 2),
            "baseline_fps_estimate_colab_t4_fp32": round(baseline_fps, 1),
            "device": str(jax.devices()[0]),
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    sys.exit(main())
