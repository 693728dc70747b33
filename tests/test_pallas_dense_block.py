"""Pallas whole-dense-block kernel correctness (interpret mode on CPU)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from dmmfods_tpu.models.dense_unet_lidar import DenseBlock
from dmmfods_tpu.ops.pallas.dense_block import (
    dense_block_pallas,
    eligible,
    fold_block_params,
    fold_block_params_jnp,
)


@pytest.fixture(scope="module")
def block_setup():
    num_layers, c0, growth, bn_size = 3, 16, 8, 4
    h, w, b = 8, 16, 2
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(b, h, w, c0)), jnp.float32)
    block = DenseBlock(num_layers=num_layers, growth_rate=growth, bn_size=bn_size,
                       drop_rate=0.0, dtype=jnp.float32)
    variables = block.init(jax.random.PRNGKey(0), x, False)
    stats = jax.tree_util.tree_map(
        lambda a: jnp.asarray(np.abs(rng.normal(size=a.shape)) * 0.3 + 0.7, a.dtype),
        variables["batch_stats"],
    )
    variables = {"params": variables["params"], "batch_stats": stats}
    return block, variables, x, (num_layers, c0, growth, bn_size, h, w)


def test_kernel_matches_flax_block(block_setup):
    block, variables, x, (L, c0, g, bs, h, w) = block_setup
    ref = np.asarray(block.apply(variables, x, False))
    folded = fold_block_params(variables["params"], variables["batch_stats"], L, c0, g, bs)
    out = np.asarray(
        dense_block_pallas(x, folded, num_layers=L, c0=c0, growth=g, h=h, w=w,
                           interpret=True)
    )
    np.testing.assert_allclose(out, ref, atol=5e-4)


def test_jnp_folding_matches_numpy(block_setup):
    block, variables, x, (L, c0, g, bs, h, w) = block_setup
    f_np = fold_block_params(variables["params"], variables["batch_stats"], L, c0, g, bs)
    f_jnp = fold_block_params_jnp(variables["params"], variables["batch_stats"], L, c0, g, bs)
    for key in f_np:
        np.testing.assert_allclose(np.asarray(f_jnp[key]), np.asarray(f_np[key]),
                                   atol=1e-6, err_msg=key)


def test_eligibility_gate():
    # DenseNet-121 block2 at 128x192 input scale fits
    assert eligible(12, 128, 32, 4, 16, 24)
    # full-res block1 blows VMEM
    assert not eligible(6, 64, 32, 4, 320, 480)
    # misaligned tile is rejected
    assert not eligible(6, 64, 32, 4, 10, 10)
