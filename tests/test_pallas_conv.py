"""Fused Pallas conv-LRP kernel parity (interpret mode on CPU)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from lrp_imagecaptioning_tpu.ops.lrp_conv import conv2d, lrp_conv_alpha_beta
from lrp_imagecaptioning_tpu.ops.pallas_conv_lrp import (
    conv3x3_fused,
    flip_transpose_kernel,
    lrp_conv_a1b0_pallas,
)


def test_conv3x3_fused_divide_matches_xla():
    # dedicated rng: with the shared session fixture this test's values (and
    # hence how close z gets to 0, where r/z amplifies float differences)
    # depended on test ordering — it flaked under the full suite
    rng = np.random.default_rng(42)
    N, H, W, cin, cout = 2, 8, 16, 8, 16
    x = jnp.abs(jnp.asarray(rng.normal(size=(N, H, W, cin)).astype(np.float32)))
    k = jnp.asarray(rng.normal(size=(3, 3, cin, cout)).astype(np.float32))
    b = jnp.asarray(rng.normal(size=(cout,)).astype(np.float32))
    r = jnp.asarray(rng.normal(size=(N, H, W, cout)).astype(np.float32))
    z = np.asarray(conv2d(x, k) + b)
    expected = np.asarray(r) / (z + (z == 0) * 1e-7)
    got = np.asarray(conv3x3_fused(x, r, k, b, mode="divide", interpret=True))
    # compare only where the quotient is well-conditioned; near-zero z rows
    # amplify conv rounding differences into unbounded relative error
    ok = np.abs(z) > 1e-2
    assert ok.mean() > 0.9
    np.testing.assert_allclose(got[ok], expected[ok], rtol=1e-3, atol=1e-4)


def test_conv3x3_fused_multiply_matches_xla(rng):
    N, H, W, cin, cout = 1, 8, 8, 16, 8
    s = jnp.asarray(rng.normal(size=(N, H, W, cin)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(3, 3, cin, cout)).astype(np.float32))
    ew = jnp.asarray(rng.normal(size=(N, H, W, cout)).astype(np.float32))
    expected = np.asarray(ew) * np.asarray(conv2d(s, k))
    got = conv3x3_fused(s, ew, k, None, mode="multiply", interpret=True)
    np.testing.assert_allclose(np.asarray(got), expected, rtol=1e-3, atol=1e-4)


def test_flip_transpose_kernel_is_conv_transpose(rng):
    """conv(s, flipT(k)) == VJP of conv(., k) applied to s."""
    from lrp_imagecaptioning_tpu.ops.lrp_conv import conv2d_input_vjp

    N, H, W, cin, cout = 1, 6, 6, 4, 8
    s = jnp.asarray(rng.normal(size=(N, H, W, cout)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(3, 3, cin, cout)).astype(np.float32))
    via_vjp = conv2d_input_vjp((N, H, W, cin), k, s)
    via_flip = conv2d(s, flip_transpose_kernel(k))
    np.testing.assert_allclose(np.asarray(via_flip), np.asarray(via_vjp), rtol=2e-4, atol=1e-5)


def test_lrp_a1b0_pallas_matches_reference_rule(rng):
    N, H, W, cin, cout = 2, 8, 8, 8, 16
    x = jnp.abs(jnp.asarray(rng.normal(size=(N, H, W, cin)).astype(np.float32)))
    k = jnp.asarray(rng.normal(size=(3, 3, cin, cout)).astype(np.float32))
    b = jnp.asarray(rng.normal(size=(cout,)).astype(np.float32))
    r = jnp.asarray(rng.normal(size=(N, H, W, cout)).astype(np.float32))
    ref = lrp_conv_alpha_beta(r, x, k, b, alpha=1.0, beta=0.0, input_nonneg=True)
    got = lrp_conv_a1b0_pallas(r, x, k, b, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=2e-3, atol=1e-4)


def test_row_tiling_multiple_tiles(rng):
    """H large enough to force >1 row tile per image."""
    from lrp_imagecaptioning_tpu.ops import pallas_conv_lrp as m

    orig = m._row_tile
    m._row_tile = lambda H, W, cin, budget_bytes=0: 4  # force 4-row tiles
    try:
        N, H, W, cin, cout = 1, 16, 8, 4, 8
        x = jnp.abs(jnp.asarray(rng.normal(size=(N, H, W, cin)).astype(np.float32)))
        k = jnp.asarray(rng.normal(size=(3, 3, cin, cout)).astype(np.float32))
        r = jnp.asarray(rng.normal(size=(N, H, W, cout)).astype(np.float32))
        ref = lrp_conv_alpha_beta(r, x, k, None, 1.0, 0.0, input_nonneg=True)
        got = lrp_conv_a1b0_pallas(r, x, k, None, interpret=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=2e-3, atol=1e-4)
    finally:
        m._row_tile = orig
