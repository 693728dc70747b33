"""Lowering-policy hardening (VERDICT r3 #6).

Two layers of protection against gate-policy rot:

* ``test_policy_table_*``: the table `models/lowering_policy.describe`
  produces for the measured anchor shapes matches the recorded policy
  (BASELINE.md r3) — strip kernels on the full-res big-zone blocks, rows at
  the working resolution, standard lowerings in the mid zone.
* ``test_lowering_numerics_sweep``: the FULL model, evaluated at a sweep of
  (resolution, batch) points covering every gate zone — including the barely
  -measured mid zone and force-enabled Pallas kernels in interpret mode —
  must match the canonical all-gates-off lowering numerically on identical
  weights.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from dmmfods_tpu.models import lowering_policy
from dmmfods_tpu.models.dense_unet_lidar import DenseUNetLidar, ModelSpec


def _tiny(**kw):
    base = dict(growth_rate=8, block_config=(2, 2, 2, 2),
                num_init_features=16, dtype=jnp.float32)
    base.update(kw)
    return ModelSpec(**base)


CANONICAL = dict(
    rows_blocks="none", dense_block_impl="concat", s2d_stem=False,
    use_fused_kernels=False, stem_pool_strip="off", dense_block_strip="off",
    rows_region="off",
)


def test_policy_table_full_res_anchor():
    spec = _tiny(dense_block_impl="concat,concat,buffer,buffer",
                 use_fused_kernels=True)
    p = lowering_policy.describe(spec, 1, 1280, 1920, backend="tpu")
    assert p["stem"] == "s2d_rows"
    # r5: auto resolves to the halo-carry strip kernel (measured better)
    assert [b["impl"] for b in p["blocks"]] == [
        "pallas_strip_carry", "pallas_strip_carry", "buffer", "buffer"]
    # the recompute kernel remains the explicit 'on' opt-in
    p_on = lowering_policy.describe(
        _tiny(dense_block_impl="concat,concat,buffer,buffer",
              use_fused_kernels=True, dense_block_strip="on"),
        1, 1280, 1920, backend="tpu")
    assert [b["impl"] for b in p_on["blocks"]][:2] == [
        "pallas_strip", "pallas_strip"]
    assert [b["zone"] for b in p["blocks"]] == ["big", "big", "mid", "mid"]
    assert p["head"] == "phase_strip"
    # same shape off-TPU: Pallas kernels fall back
    p_cpu = lowering_policy.describe(spec, 1, 1280, 1920, backend="cpu")
    assert [b["impl"] for b in p_cpu["blocks"]][:2] == ["rows", "rows"]
    assert p_cpu["head"] == "phase_rows"


def test_policy_table_working_res_anchor():
    spec = _tiny(use_fused_kernels=True)
    p = lowering_policy.describe(spec, 8, 128, 192, backend="tpu")
    assert all(b["zone"] == "small" for b in p["blocks"])
    assert all(b["impl"] == "rows" for b in p["blocks"])
    assert p["head"] == "phase_slices"
    # above the rows batch ceiling every gate falls back to standard
    p_big = lowering_policy.describe(spec, 256, 128, 192, backend="tpu")
    assert all(b["impl"] == "concat" for b in p_big["blocks"])
    assert p_big["head"] == "phase_slices"
    # train mode: inference-only lowerings off
    p_tr = lowering_policy.describe(spec, 8, 128, 192, backend="tpu",
                                    train=True)
    assert all(b["impl"] == "concat" for b in p_tr["blocks"])


def test_stem_pool_strip_quarantined_on_tpu():
    """VERDICT r4 #3: the fused stem+pool kernel's hardware path crashed
    the device server nondeterministically — 'on' must be interpret/CPU
    only; only the explicit 'force' opt-in reaches real TPU."""
    spec = _tiny(stem_pool_strip="on", use_fused_kernels=True)
    p_cpu = lowering_policy.describe(spec, 1, 512, 768, backend="cpu")
    assert p_cpu["stem"] == "pallas_stem_pool"
    p_tpu = lowering_policy.describe(spec, 1, 512, 768, backend="tpu")
    assert p_tpu["stem"] != "pallas_stem_pool"
    spec_f = _tiny(stem_pool_strip="force", use_fused_kernels=True)
    p_force = lowering_policy.describe(spec_f, 1, 512, 768, backend="tpu")
    assert p_force["stem"] == "pallas_stem_pool"


def test_policy_table_rows_train():
    """rows_train=True admits the rows lowering for blocks/transitions in
    TRAIN mode (the model's own gates don't route through `_rows_ok`'s
    `not train`; ADVICE r4 #1) — while remat re-disables the blocks."""
    spec = _tiny(use_fused_kernels=True, rows_train=True)
    p = lowering_policy.describe(spec, 8, 128, 192, backend="tpu", train=True)
    assert all(b["impl"] == "rows" for b in p["blocks"])
    assert all(b.get("transition", "rows") == "rows" for b in p["blocks"])
    # remat gates the BLOCK rows path off, not the transitions
    spec_r = _tiny(use_fused_kernels=True, rows_train=True, remat=True)
    p_r = lowering_policy.describe(spec_r, 8, 128, 192, backend="tpu",
                                   train=True)
    assert all(b["impl"] == "concat" for b in p_r["blocks"])
    assert all(b.get("transition", "rows") == "rows" for b in p_r["blocks"])
    # and without rows_train, train mode stays standard (regression guard)
    p_off = lowering_policy.describe(_tiny(use_fused_kernels=True), 8, 128,
                                     192, backend="tpu", train=True)
    assert all(b["impl"] == "concat" for b in p_off["blocks"])


def test_policy_table_mid_zone():
    """640x960 b4 — the intermediate deployment shape VERDICT r3 #6 names:
    block1 lands in the big zone, blocks 2-3 in the barely-measured mid zone
    (standard lowerings), block4 in the small zone."""
    spec = _tiny(use_fused_kernels=True)
    p = lowering_policy.describe(spec, 4, 640, 960, backend="tpu")
    zones = [b["zone"] for b in p["blocks"]]
    assert zones == ["big", "mid", "mid", "small"]
    impls = [b["impl"] for b in p["blocks"]]
    assert impls == ["rows", "concat", "concat", "rows"]
    assert p["head"] == "phase_single"  # big plane, batch > 1


def _apply(spec, variables, rgb, lidar, train=False):
    module = DenseUNetLidar(spec)
    if train:
        out, _ = module.apply(variables, rgb, lidar, True,
                              mutable=["batch_stats"])
        return np.asarray(out)
    return np.asarray(module.apply(variables, rgb, lidar, False))


SWEEP = [
    # (h, w, batch, spec overrides for the fast path, id)
    (128, 192, 1, dict(use_fused_kernels=True), "work-b1"),
    (128, 192, 8, dict(use_fused_kernels=True), "work-b8-boundary-masks"),
    (256, 384, 4, dict(use_fused_kernels=True), "mid-zone-b4"),
    (512, 768, 1, dict(use_fused_kernels=True), "big-zone-s2d-b1"),
    (512, 768, 1, dict(use_fused_kernels=True, dense_block_strip="on",
                       stem_pool_strip="on"), "pallas-strips-interpret"),
    (512, 768, 1, dict(use_fused_kernels=True, dense_block_strip="carry"),
     "pallas-strip-carry-interpret"),
    (512, 768, 1, dict(use_fused_kernels=True, rows_region="on"),
     "rows-region"),
]


@pytest.mark.parametrize("h,w,batch,overrides,label",
                         SWEEP, ids=[s[-1] for s in SWEEP])
def test_lowering_numerics_sweep(h, w, batch, overrides, label):
    """Every lowering zone produces the canonical numerics on shared
    weights — the mid-shape policy safety net."""
    canonical = _tiny(concat_before_block_num=2, stream_2_in_channels=1,
                      **CANONICAL)
    fast = _tiny(concat_before_block_num=2, stream_2_in_channels=1,
                 **overrides)

    rng = np.random.default_rng(hash(label) % 2**31)
    rgb = rng.uniform(0, 1, (batch, h, w, 3)).astype(np.float32)
    lidar = rng.uniform(0, 1, (batch, h, w, 1)).astype(np.float32)

    module = DenseUNetLidar(canonical)
    variables = module.init(jax.random.PRNGKey(0), rgb[:1], lidar[:1], False)
    # nontrivial running stats so BN folding paths are exercised
    stats = jax.tree_util.tree_map(lambda x: x, variables["batch_stats"])

    def perturb(path, leaf):
        name = path[-1].key if hasattr(path[-1], "key") else str(path[-1])
        r = np.random.default_rng(abs(hash(jax.tree_util.keystr(path))) % 2**31)
        if name == "mean":
            return jnp.asarray(r.normal(0, 0.1, leaf.shape), leaf.dtype)
        return jnp.asarray(r.uniform(0.5, 1.5, leaf.shape), leaf.dtype)

    variables = dict(variables)
    variables["batch_stats"] = jax.tree_util.tree_map_with_path(perturb, stats)

    want = _apply(canonical, variables, rgb, lidar)
    got = _apply(fast, variables, rgb, lidar)
    np.testing.assert_allclose(got, want, atol=2e-4, rtol=2e-4,
                               err_msg=f"lowering drift at {label}")


def test_lowering_numerics_train_mode():
    """Training-mode parity: the default spec's train path (gates mostly
    off) matches the canonical lowering's outputs AND updated batch stats."""
    canonical = _tiny(concat_before_block_num=2, stream_2_in_channels=1,
                      **CANONICAL)
    fast = _tiny(concat_before_block_num=2, stream_2_in_channels=1,
                 use_fused_kernels=True,
                 dense_block_impl="concat,concat,buffer,buffer")
    rng = np.random.default_rng(5)
    rgb = rng.uniform(0, 1, (2, 128, 192, 3)).astype(np.float32)
    lidar = rng.uniform(0, 1, (2, 128, 192, 1)).astype(np.float32)
    module = DenseUNetLidar(canonical)
    variables = module.init(jax.random.PRNGKey(0), rgb[:1], lidar[:1], False)

    out_c, muts_c = DenseUNetLidar(canonical).apply(
        variables, rgb, lidar, True, mutable=["batch_stats"])
    out_f, muts_f = DenseUNetLidar(fast).apply(
        variables, rgb, lidar, True, mutable=["batch_stats"])
    np.testing.assert_allclose(np.asarray(out_f), np.asarray(out_c),
                               atol=2e-4, rtol=2e-4)
    flat_c = dict(jax.tree_util.tree_leaves_with_path(muts_c["batch_stats"]))
    flat_f = dict(jax.tree_util.tree_leaves_with_path(muts_f["batch_stats"]))
    assert flat_c.keys() == flat_f.keys()
    for k in flat_c:
        np.testing.assert_allclose(np.asarray(flat_f[k]), np.asarray(flat_c[k]),
                                   atol=1e-5, rtol=1e-5,
                                   err_msg=jax.tree_util.keystr(k))
