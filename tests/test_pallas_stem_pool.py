"""Fused stem+pool strip kernel correctness (interpret mode on CPU).

The kernel (ops/pallas/stem_pool.py) must equal conv0 (7x7/2, pad 3) +
folded-BN + relu + 3x3/2 max pool (pad 1) at every strip position,
including the image-border programs whose halo fetches are clamped
re-fetches and whose pool windows hang over the image edge."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax import lax

from dmmfods_tpu.ops.pallas.stem_pool import (
    eligible,
    pick_rs,
    s2d_conv0_weight,
    stem_pool_strip,
)


def _reference(x, w7, gamma, beta):
    y = lax.conv_general_dilated(
        x, w7, (2, 2), ((3, 3), (3, 3)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    y = jnp.maximum(y * gamma + beta, 0.0)
    return lax.reduce_window(
        y, -jnp.inf, lax.max, (1, 3, 3, 1), (1, 2, 2, 1),
        ((0, 0), (1, 1), (1, 1), (0, 0)))


@pytest.mark.parametrize("c,f,h,w,rs", [
    (3, 8, 32, 64, 4),    # RGB stream, two strips
    (1, 8, 32, 64, 8),    # LiDAR stream, single strip (clamped both sides)
    (4, 16, 64, 64, 8),   # early-fusion 4-channel, two strips
])
def test_stem_pool_strip_matches_reference(c, f, h, w, rs):
    rng = np.random.default_rng(c * 100 + h)
    x = jnp.asarray(rng.normal(size=(1, h, w, c)), jnp.float32)
    w7 = jnp.asarray(rng.normal(size=(7, 7, c, f)) * 0.2, jnp.float32)
    # gamma/beta with both signs: a positive beta is what exposes any
    # masking bug (relu(beta) leaking through conv padding or the pool)
    gamma = jnp.asarray(rng.normal(size=(f,)), jnp.float32)
    beta = jnp.asarray(rng.normal(size=(f,)), jnp.float32)

    ref = np.asarray(_reference(x, w7, gamma, beta))
    out = np.asarray(stem_pool_strip(
        x, w7, gamma, beta, rs=rs, interpret=True))
    np.testing.assert_allclose(out, ref, atol=5e-4, rtol=1e-4)


def test_s2d_weight_is_exact_reindex():
    # the s2d 4x4 form must reproduce the 7x7/2 conv exactly
    rng = np.random.default_rng(0)
    c, f, h, w = 3, 8, 16, 32
    x = jnp.asarray(rng.normal(size=(1, h, w, c)), jnp.float32)
    w7 = jnp.asarray(rng.normal(size=(7, 7, c, f)), jnp.float32)
    ref = lax.conv_general_dilated(
        x, w7, (2, 2), ((3, 3), (3, 3)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    w4 = s2d_conv0_weight(w7, c, f)
    xs2d = x.reshape(h // 2, 2, w // 2, 2 * c)
    xs2d = jnp.concatenate([xs2d[:, 0], xs2d[:, 1]], axis=-1)[None]
    got = lax.conv_general_dilated(
        xs2d, w4, (1, 1), ((2, 1), (2, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-4)


def test_stem_pool_eligibility_gate():
    assert eligible(1, 1280, 1920, 3, 64)     # the full-res RGB stem
    assert eligible(1, 1280, 1920, 1, 64)     # the LiDAR stem
    assert not eligible(2, 1280, 1920, 3, 64)  # batch > 1
    assert not eligible(1, 1282, 1920, 3, 64)  # H % 4
    assert not eligible(1, 1280, 1928, 3, 64)  # WQ tile misalignment
    # picked strips divide the pooled row count
    assert 320 % pick_rs(320, 480, 3, 64) == 0
