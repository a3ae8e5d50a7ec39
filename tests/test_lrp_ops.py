"""LRP primitive tests: conservation and reference-rule semantics."""

import jax
import jax.numpy as jnp
import numpy as np

from lrp_imagecaptioning_tpu.ops import (
    lrp_conv_alpha_beta,
    lrp_conv_epsilon,
    lrp_identity,
    lrp_linear,
    lrp_maxpool_wta,
)
from lrp_imagecaptioning_tpu.ops.lrp_conv import conv2d, maxpool2d


def test_lrp_linear_matches_reference_loop(rng):
    """Vectorized rule == the reference's per-neuron numpy loop
    (explainers.py:156-165)."""
    Din, Dout = 7, 5
    x = rng.normal(size=(Din,)).astype(np.float32)
    w = rng.normal(size=(Din, Dout)).astype(np.float32)
    b = rng.normal(size=(Dout,)).astype(np.float32)
    z = x @ w + b
    r = rng.normal(size=(Dout,)).astype(np.float32)

    eps = 1e-7
    sign_z = np.where(z < 0, -1.0, 1.0)
    z_stab = z + sign_z * eps
    attribution = w * x[:, None]  # bias_factor=0
    expected = ((attribution / z_stab) * r).sum(axis=1)

    got = lrp_linear(jnp.asarray(r), jnp.asarray(x), jnp.asarray(z), jnp.asarray(w))
    np.testing.assert_allclose(np.asarray(got), expected, rtol=1e-5, atol=1e-6)


def test_lrp_linear_conservation_no_bias(rng):
    Din, Dout = 16, 8
    x = rng.normal(size=(Din,)).astype(np.float32)
    w = rng.normal(size=(Din, Dout)).astype(np.float32)
    z = x @ w
    r = rng.normal(size=(Dout,)).astype(np.float32)
    rel = lrp_linear(jnp.asarray(r), jnp.asarray(x), jnp.asarray(z), jnp.asarray(w), eps=1e-9)
    np.testing.assert_allclose(float(rel.sum()), float(r.sum()), rtol=1e-4)


def test_lrp_identity(rng):
    x = rng.normal(size=(6,)).astype(np.float32)
    z = rng.normal(size=(6,)).astype(np.float32)
    r = rng.normal(size=(6,)).astype(np.float32)
    got = lrp_identity(jnp.asarray(r), jnp.asarray(x), jnp.asarray(z))
    eps = 1e-7
    stab = z + np.where(z < 0, -eps, eps)
    np.testing.assert_allclose(np.asarray(got), x * r / stab, rtol=1e-5)


def test_conv_epsilon_conservation(rng):
    """Exact conservation needs f64 — the mixed-sign sums cancel to a value
    ~100x smaller than the term magnitudes, so fp32 wobbles at ~0.5%."""
    jax.config.update("jax_enable_x64", True)
    try:
        x = jnp.asarray(rng.normal(size=(1, 8, 8, 3)))
        k = jnp.asarray(rng.normal(size=(3, 3, 3, 4)) * 0.1)
        z = conv2d(x, k)
        r = z  # seed with the full output as relevance
        eps = 1e-6
        rel = lrp_conv_epsilon(r, x, k, bias=None, eps=eps)
        # exact conservation target: sum_k r_k * z_k / stab(z_k)
        stab = np.asarray(z) + np.where(np.asarray(z) >= 0, eps, -eps)
        expected = float((np.asarray(r) * np.asarray(z) / stab).sum())
        np.testing.assert_allclose(float(rel.sum()), expected, rtol=1e-8)
    finally:
        jax.config.update("jax_enable_x64", False)


def test_conv_alpha1beta0_positive_and_conserving_for_positive_net(rng):
    """With x>=0, W>=0, b=0: alpha1beta0 == z-rule => conservation + positivity."""
    x = jnp.asarray(np.abs(rng.normal(size=(1, 6, 6, 2))).astype(np.float32))
    k = jnp.asarray(np.abs(rng.normal(size=(3, 3, 2, 3))).astype(np.float32))
    z = conv2d(x, k)
    r = jnp.abs(z)
    rel = lrp_conv_alpha_beta(r, x, k, bias=None, alpha=1.0, beta=0.0)
    assert float(rel.min()) >= 0.0
    np.testing.assert_allclose(float(rel.sum()), float(r.sum()), rtol=1e-3)


def test_alpha2beta1_equals_alpha_minus_beta_decomposition(rng):
    x = jnp.asarray(rng.normal(size=(1, 6, 6, 2)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(3, 3, 2, 3)).astype(np.float32))
    r = jnp.asarray(rng.normal(size=(1, 6, 6, 3)).astype(np.float32))
    out = lrp_conv_alpha_beta(r, x, k, bias=None, alpha=2.0, beta=1.0)
    assert out.shape == x.shape
    assert np.isfinite(np.asarray(out)).all()


def test_maxpool_wta_conservation(rng):
    x = jnp.asarray(rng.normal(size=(1, 8, 8, 4)).astype(np.float32))
    y = maxpool2d(x)
    r = jnp.asarray(rng.normal(size=y.shape).astype(np.float32))
    rel = lrp_maxpool_wta(r, x)
    # r.sum() can cancel near zero -> atol on the mismatch, not pure rtol
    np.testing.assert_allclose(float(rel.sum()), float(r.sum()), rtol=1e-4, atol=1e-4)
    # relevance lands only on window maxima
    nonzero = np.count_nonzero(np.asarray(rel))
    assert nonzero <= r.size


def test_overlapping_wta_matches_vjp(rng):
    """The strided-tap overlapping WTA == reduce_window max VJP (3x3/2)."""
    from functools import partial as _partial

    from lrp_imagecaptioning_tpu.ops.lrp_conv import lrp_maxpool_overlapping_wta

    x = jnp.asarray(rng.normal(size=(2, 9, 11, 3)).astype(np.float32))

    def pool(t):
        return jax.lax.reduce_window(t, -jnp.inf, jax.lax.max,
                                     (1, 3, 3, 1), (1, 2, 2, 1), "VALID")

    y = pool(x)
    r = jnp.asarray(rng.normal(size=y.shape).astype(np.float32))
    _, vjp = jax.vjp(pool, x)
    (expected,) = vjp(r)
    got = lrp_maxpool_overlapping_wta(r, x, 3, 2)
    np.testing.assert_allclose(np.asarray(got), np.asarray(expected), rtol=1e-5, atol=1e-6)
