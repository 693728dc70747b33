"""Strip-pipeline dense-block kernel correctness (interpret mode on CPU).

The strip kernel (ops/pallas/dense_block_strip.py) is the batch-1
large-plane counterpart of the whole-image VMEM kernel; exactness against
the flax DenseBlock must hold at every strip position, including the
image-border programs whose halo fetches are clamped re-fetches."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from dmmfods_tpu.models.dense_unet_lidar import DenseBlock
from dmmfods_tpu.ops.pallas.dense_block import fold_block_params
from dmmfods_tpu.ops.pallas.dense_block_strip import (
    dense_block_strip,
    eligible,
    pick_rs,
)


def _setup(num_layers, c0, growth, h, w, bn_size=4, seed=0):
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.normal(size=(1, h, w, c0)), jnp.float32)
    block = DenseBlock(num_layers=num_layers, growth_rate=growth,
                       bn_size=bn_size, drop_rate=0.0, dtype=jnp.float32)
    variables = block.init(jax.random.PRNGKey(0), x, False)
    # randomize the BN scale/bias vectors (init's scale=1/bias=0 makes
    # every folded BN2 bias negative, so relu(b2)=0 would mask the
    # out-of-image zero-padding semantics this suite must pin — a border
    # bug is only visible when some b2 > 0 resurrects zeroed rows)
    params = jax.tree_util.tree_map(
        lambda a: jnp.asarray(rng.normal(size=a.shape), a.dtype)
        if a.ndim == 1 else a,
        variables["params"],
    )
    stats = jax.tree_util.tree_map(
        lambda a: jnp.asarray(
            np.abs(rng.normal(size=a.shape)) * 0.3 + 0.7, a.dtype),
        variables["batch_stats"],
    )
    variables = {"params": params, "batch_stats": stats}
    return block, variables, x


@pytest.mark.parametrize("L,c0,growth,h,w,rs", [
    (3, 16, 8, 32, 16, 8),     # several strips, halo = 3
    (3, 16, 8, 8, 16, 8),      # single strip (clamped halo both sides)
    (6, 16, 16, 24, 8, 8),     # L close to rs: maximal halo reuse
])
def test_strip_kernel_matches_flax_block(L, c0, growth, h, w, rs):
    block, variables, x = _setup(L, c0, growth, h, w)
    ref = np.asarray(block.apply(variables, x, False))
    folded = fold_block_params(
        variables["params"], variables["batch_stats"], L, c0, growth, 4)
    out = np.asarray(dense_block_strip(
        x, folded, num_layers=L, c0=c0, growth=growth, h=h, w=w, rs=rs,
        interpret=True))
    np.testing.assert_allclose(out, ref, atol=5e-4)


def test_strip_eligibility_gate():
    # the full-res b1 regime the whole-image kernel rejects is the point
    assert eligible(1, 320, 480, 64, 32, 6, 4)     # block1 @ 1280x1920
    assert eligible(1, 160, 240, 128, 32, 12, 4)   # block2 @ 1280x1920
    assert not eligible(2, 320, 480, 64, 32, 6, 4)  # batch > 1
    assert not eligible(1, 10, 10, 64, 32, 6, 4)    # no viable strip
    # picked strips divide H and cover the layer halo
    assert pick_rs(320, 6, 480, 64, 32, 128) >= 6
    assert 160 % pick_rs(160, 12, 240, 128, 32, 128) == 0


@pytest.mark.parametrize("L,c0,growth,h,w,rs", [
    (3, 16, 8, 32, 16, 8),     # several strips: carry crosses 4 steps
    (3, 16, 8, 8, 16, 8),      # single strip + the trailing flush step
    (6, 16, 16, 24, 8, 8),     # rs == L + 2: minimal legal carry margin
    (3, 16, 8, 32, 16, None),  # auto rs via pick_rs_carry
])
def test_carry_kernel_matches_flax_block(L, c0, growth, h, w, rs):
    """The halo-carry variant (VERDICT r4 #2) is numerically identical to
    the flax block — including the cross-strip carried rows and the
    trailing output step."""
    from dmmfods_tpu.ops.pallas.dense_block_strip import (
        dense_block_strip_carry,
    )

    block, variables, x = _setup(L, c0, growth, h, w, seed=3)
    ref = np.asarray(block.apply(variables, x, False))
    folded = fold_block_params(
        variables["params"], variables["batch_stats"], L, c0, growth, 4)
    out = np.asarray(dense_block_strip_carry(
        x, folded, num_layers=L, c0=c0, growth=growth, h=h, w=w, rs=rs,
        interpret=True))
    np.testing.assert_allclose(out, ref, atol=5e-4)


def test_carry_pick_rs():
    from dmmfods_tpu.ops.pallas.dense_block_strip import pick_rs_carry

    # full-res block shapes: larger strips fit than the recompute kernel's
    assert pick_rs_carry(320, 6, 480, 64, 32, 128) >= 32
    rs2 = pick_rs_carry(160, 12, 240, 128, 32, 128)
    assert rs2 >= 16 and 160 % rs2 == 0
    # rs must leave room for the carry copy (rs >= L + 2)
    assert pick_rs_carry(12, 12, 240, 128, 32, 128) is None
