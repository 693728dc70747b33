"""Fused concat+BN+ReLU+1x1 correctness: the fused op (jnp fallback on CPU;
Pallas kernel on TPU) must match the naive concat -> BN -> ReLU -> conv1x1
reference computation."""

import numpy as np

import jax
import jax.numpy as jnp

from dmmfods_tpu.ops.fused import concat_bn_relu_conv1x1


def _naive(a, b, scale, bias, mean, var, kernel, eps=1e-5):
    cat = jnp.concatenate([a, b], axis=-1)
    norm = (cat - mean) * jax.lax.rsqrt(var + eps) * scale + bias
    act = jnp.maximum(norm, 0.0)
    return jax.lax.conv_general_dilated(
        act, kernel, (1, 1), "VALID", dimension_numbers=("NHWC", "HWIO", "NHWC")
    )


def test_fused_matches_naive():
    rng = np.random.default_rng(0)
    B, H, W, Ca, Cb, Cout = 2, 8, 16, 12, 12, 24
    a = jnp.asarray(rng.normal(size=(B, H, W, Ca)), jnp.float32)
    b = jnp.asarray(rng.normal(size=(B, H, W, Cb)), jnp.float32)
    scale = jnp.asarray(rng.normal(size=(Ca + Cb,)), jnp.float32)
    bias = jnp.asarray(rng.normal(size=(Ca + Cb,)), jnp.float32)
    mean = jnp.asarray(rng.normal(size=(Ca + Cb,)), jnp.float32)
    var = jnp.asarray(np.abs(rng.normal(size=(Ca + Cb,))) + 0.3, jnp.float32)
    kernel = jnp.asarray(rng.normal(size=(1, 1, Ca + Cb, Cout)), jnp.float32)

    ref = np.asarray(_naive(a, b, scale, bias, mean, var, kernel))
    out = np.asarray(
        concat_bn_relu_conv1x1(a, b, scale=scale, bias=bias, mean=mean, var=var,
                               kernel=kernel)
    )
    np.testing.assert_allclose(out, ref, atol=2e-4)


def test_fused_model_path_matches_unfused():
    """Inference with use_fused_kernels on == off for the full mid-fusion model."""
    from dmmfods_tpu.models.dense_unet_lidar import DenseUNetLidar, ModelSpec

    spec = ModelSpec(growth_rate=8, block_config=(2, 2), num_init_features=16)
    spec_fused = ModelSpec(growth_rate=8, block_config=(2, 2), num_init_features=16,
                           use_fused_kernels=True)
    rgb = jnp.asarray(np.random.default_rng(1).normal(size=(1, 32, 64, 3)), jnp.float32)
    lidar = jnp.asarray(np.random.default_rng(2).normal(size=(1, 32, 64, 1)), jnp.float32)

    m1 = DenseUNetLidar(spec)
    variables = m1.init(jax.random.PRNGKey(0), rgb, lidar, False)
    out1 = np.asarray(m1.apply(variables, rgb, lidar, False))
    m2 = DenseUNetLidar(spec_fused)
    out2 = np.asarray(m2.apply(variables, rgb, lidar, False))
    np.testing.assert_allclose(out1, out2, atol=2e-4)


def test_phase_space_head_matches_naive():
    """The low-resolution phase-space head (upsample + concat + BN + ReLU +
    refine0 + BN + ReLU + refine1 without any full-res intermediate) equals
    the straightforward pipeline."""
    from dmmfods_tpu.ops import fused

    rng = np.random.default_rng(1)
    B, hh, hw, c_up, raw_ch, c_mid, n_cls = 2, 8, 12, 32, 4, 16, 3
    x_lo = jnp.asarray(rng.normal(size=(B, hh, hw, c_up)), jnp.float32)
    raw = jnp.asarray(rng.normal(size=(B, 2 * hh, 2 * hw, raw_ch)), jnp.float32)
    w0 = jnp.asarray(rng.normal(size=(3, 3, c_up + raw_ch, c_mid)) * 0.1, jnp.float32)
    w1 = jnp.asarray(rng.normal(size=(5, 5, c_mid, n_cls)) * 0.1, jnp.float32)

    def bn(c):
        return (
            {"scale": jnp.asarray(rng.normal(size=c), jnp.float32),
             "bias": jnp.asarray(rng.normal(size=c), jnp.float32)},
            {"mean": jnp.asarray(rng.normal(size=c), jnp.float32),
             "var": jnp.asarray(np.abs(rng.normal(size=c)) + 0.5, jnp.float32)},
        )

    n0, s0 = bn(c_up + raw_ch)
    n1, s1 = bn(c_mid)

    up = jnp.repeat(jnp.repeat(x_lo, 2, axis=1), 2, axis=2)
    cat = jnp.concatenate([up, raw], axis=-1)
    g0 = n0["scale"] * jax.lax.rsqrt(s0["var"] + 1e-5)
    act = jnp.maximum(cat * g0 + (n0["bias"] - s0["mean"] * g0), 0.0)
    h = jax.lax.conv_general_dilated(act, w0, (1, 1), ((1, 1), (1, 1)),
                                     dimension_numbers=("NHWC", "HWIO", "NHWC"))
    g1 = n1["scale"] * jax.lax.rsqrt(s1["var"] + 1e-5)
    h = jnp.maximum(h * g1 + (n1["bias"] - s1["mean"] * g1), 0.0)
    ref = jax.lax.conv_general_dilated(h, w1, (1, 1), ((2, 2), (2, 2)),
                                       dimension_numbers=("NHWC", "HWIO", "NHWC"))

    out = fused.phase_space_head(
        x_lo, raw, norm0=n0, norm0_stats=s0, refine0_kernel=w0,
        norm1=n1, norm1_stats=s1, refine1_kernel=w1)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-4)

    # the single-4x4-conv refine1 lowering (chosen automatically at large
    # planes) is the same math, incl. the per-phase border masking
    out_single = fused.phase_space_head(
        x_lo, raw, norm0=n0, norm0_stats=s0, refine0_kernel=w0,
        norm1=n1, norm1_stats=s1, refine1_kernel=w1, refine1_impl="single")
    np.testing.assert_allclose(np.asarray(out_single), np.asarray(ref),
                               atol=2e-4)

    # the batch-1 rows-as-batch whole-head lowering is the same math too
    out_rows = fused.phase_space_head(
        x_lo[:1], raw[:1], norm0=n0, norm0_stats=s0, refine0_kernel=w0,
        norm1=n1, norm1_stats=s1, refine1_kernel=w1, refine1_impl="rows")
    np.testing.assert_allclose(np.asarray(out_rows), np.asarray(ref[:1]),
                               atol=2e-4)

    # the Pallas row-strip kernel (interpret mode off-TPU; the identical
    # kernel code path) — whole raw, and per-stream raw parts whose
    # relabels CSE with the s2d stems in the model
    out_strip = fused.phase_space_head(
        x_lo[:1], raw[:1], norm0=n0, norm0_stats=s0, refine0_kernel=w0,
        norm1=n1, norm1_stats=s1, refine1_kernel=w1, refine1_impl="strip")
    np.testing.assert_allclose(np.asarray(out_strip), np.asarray(ref[:1]),
                               atol=2e-4)
    out_strip_parts = fused.phase_space_head(
        x_lo[:1], raw[:1], norm0=n0, norm0_stats=s0, refine0_kernel=w0,
        norm1=n1, norm1_stats=s1, refine1_kernel=w1, refine1_impl="strip",
        raw_parts=[raw[:1, :, :, :3], raw[:1, :, :, 3:]])
    np.testing.assert_allclose(np.asarray(out_strip_parts),
                               np.asarray(ref[:1]), atol=2e-4)


def test_phase_head_train_matches_plain():
    """Training-mode phase head == the plain upsample/concat head: outputs,
    GRADIENTS, and the BatchNorm running-stat updates all agree."""
    from dmmfods_tpu.models.dense_unet_lidar import Head

    rng = np.random.default_rng(5)
    B, hh, hw, c_up, raw_ch = 2, 8, 12, 32, 4
    x_lo = jnp.asarray(rng.normal(size=(B, hh, hw, c_up)), jnp.float32)
    raw = jnp.asarray(rng.normal(size=(B, 2 * hh, 2 * hw, raw_ch)), jnp.float32)

    head_plain = Head(16, 3, jnp.float32, use_fused=False)
    head_fused = Head(16, 3, jnp.float32, use_fused=True)
    variables = head_plain.init(jax.random.PRNGKey(0), x_lo, raw, True)
    # nontrivial running stats so the EMA update is visible
    stats0 = jax.tree_util.tree_map(lambda x: x + 0.25, variables["batch_stats"])
    variables = {"params": variables["params"], "batch_stats": stats0}

    def loss_fn(head, params):
        out, mutated = head.apply(
            {"params": params, "batch_stats": stats0}, x_lo, raw, True,
            mutable=["batch_stats"],
        )
        return jnp.sum(out ** 2), mutated["batch_stats"]

    (l1, s1), g1 = jax.value_and_grad(
        lambda p: loss_fn(head_plain, p), has_aux=True)(variables["params"])
    (l2, s2), g2 = jax.value_and_grad(
        lambda p: loss_fn(head_fused, p), has_aux=True)(variables["params"])

    np.testing.assert_allclose(float(l1), float(l2), rtol=1e-5)
    def compare(t1, t2, atol, rtol):
        f1 = {jax.tree_util.keystr(p): v
              for p, v in jax.tree_util.tree_leaves_with_path(t1)}
        f2 = {jax.tree_util.keystr(p): v
              for p, v in jax.tree_util.tree_leaves_with_path(t2)}
        assert f1.keys() == f2.keys()
        for key in f1:
            np.testing.assert_allclose(
                np.asarray(f1[key]), np.asarray(f2[key]),
                atol=atol, rtol=rtol, err_msg=key,
            )

    compare(g1, g2, 2e-3, 1e-3)
    compare(s1, s2, 1e-4, 1e-4)


def test_refine1_conv4x4_vjp_matches_autodiff():
    """The hand backward of the head's 4x4 refine1 conv (tap-stacked
    cotangent, full-lane matmuls) == XLA autodiff of the same conv."""
    from dmmfods_tpu.ops.fused import _refine1_conv4x4, _refine1_conv4x4_primal

    rng = np.random.default_rng(11)
    B, h1, w1, c4, n4 = 2, 9, 13, 32, 12
    pn = jnp.asarray(rng.normal(size=(B, h1, w1, c4)), jnp.float32)
    w4 = jnp.asarray(rng.normal(size=(4, 4, c4, n4)), jnp.float32)
    cot = jnp.asarray(rng.normal(size=(B, h1 - 1, w1 - 1, n4)), jnp.float32)

    def loss(fn, pn, w4):
        return jnp.sum(fn(pn, w4, jnp.float32) * cot)

    l_ref, (dp_ref, dw_ref) = jax.value_and_grad(
        lambda a, b: loss(_refine1_conv4x4_primal, a, b), argnums=(0, 1)
    )(pn, w4)
    l_vjp, (dp, dw) = jax.value_and_grad(
        lambda a, b: loss(_refine1_conv4x4, a, b), argnums=(0, 1)
    )(pn, w4)

    np.testing.assert_allclose(float(l_ref), float(l_vjp), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(dp), np.asarray(dp_ref),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(dw), np.asarray(dw_ref),
                               rtol=1e-5, atol=1e-4)
