"""Extended analyzer tests: LRP rule variants + gradient-family analyzers."""

import pytest
import numpy as np
import jax
import jax.numpy as jnp

from lrp_imagecaptioning_tpu.models.vgg import init_vgg_params
from lrp_imagecaptioning_tpu.explain.cnn_gradient import (
    vgg_deconvnet,
    vgg_gradient,
    vgg_integrated_gradients,
    vgg_smoothgrad,
)
from lrp_imagecaptioning_tpu.explain.cnn_lrp import (
    vgg_lrp_preset_a_flat,
    vgg_lrp_preset_b_flat,
)
from lrp_imagecaptioning_tpu.ops.lrp_conv import (
    conv2d,
    lrp_conv_bounded,
    lrp_conv_flat,
    lrp_conv_wsquare,
    lrp_conv_zplus,
)

ARCH_KW = dict(arch="vgg16", until="block1_conv2")  # 2-conv stack: fast on CPU


def _setup(rng, B=1, size=16):
    params = init_vgg_params(jax.random.PRNGKey(0), "vgg16", "block1_conv2")
    image = jnp.asarray(rng.normal(size=(B, size, size, 3)).astype(np.float32))
    seed = jnp.asarray(rng.normal(size=(B, size, size, 64)).astype(np.float32))
    return params, image, seed


def test_wsquare_input_independent(rng):
    x1 = jnp.asarray(rng.normal(size=(1, 8, 8, 3)).astype(np.float32))
    x2 = jnp.asarray(rng.normal(size=(1, 8, 8, 3)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(3, 3, 3, 4)).astype(np.float32))
    r = jnp.asarray(rng.normal(size=(1, 8, 8, 4)).astype(np.float32))
    out1 = lrp_conv_wsquare(r, x1, k)
    out2 = lrp_conv_wsquare(r, x2, k)
    np.testing.assert_allclose(np.asarray(out1), np.asarray(out2), rtol=1e-6)


def test_flat_conserves_interior(rng):
    """Flat rule spreads relevance uniformly; total is conserved."""
    x = jnp.asarray(rng.normal(size=(1, 8, 8, 2)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(3, 3, 2, 3)).astype(np.float32))
    r = jnp.abs(jnp.asarray(rng.normal(size=(1, 8, 8, 3)).astype(np.float32)))
    out = lrp_conv_flat(r, x, k)
    np.testing.assert_allclose(float(out.sum()), float(r.sum()), rtol=1e-4)


def test_zplus_equals_alpha1beta0(rng):
    from lrp_imagecaptioning_tpu.ops.lrp_conv import lrp_conv_alpha_beta

    x = jnp.asarray(rng.normal(size=(1, 8, 8, 2)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(3, 3, 2, 3)).astype(np.float32))
    r = jnp.asarray(rng.normal(size=(1, 8, 8, 3)).astype(np.float32))
    np.testing.assert_array_equal(
        np.asarray(lrp_conv_zplus(r, x, k)),
        np.asarray(lrp_conv_alpha_beta(r, x, k, None, 1.0, 0.0)),
    )


def test_bounded_conservation(rng):
    """zB rule conserves relevance (sum over inputs == sum r * z/z)."""
    x = jnp.asarray(rng.uniform(-1, 1, size=(1, 8, 8, 2)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(3, 3, 2, 3)).astype(np.float32))
    r = jnp.asarray(rng.normal(size=(1, 8, 8, 3)).astype(np.float32))
    out = lrp_conv_bounded(r, x, k, low=-1.0, high=1.0)
    assert np.isfinite(np.asarray(out)).all()
    np.testing.assert_allclose(float(out.sum()), float(r.sum()), rtol=5e-2, atol=1e-2)


def test_deconvnet_differs_from_gradient(rng):
    params, image, seed = _setup(rng)
    g = vgg_gradient(params, image, seed, **ARCH_KW)
    d = vgg_deconvnet(params, image, seed, **ARCH_KW)
    assert g.shape == d.shape == image.shape
    assert np.abs(np.asarray(g) - np.asarray(d)).max() > 1e-6


def test_integrated_gradients_completeness(rng):
    """IG's defining property: sum(IG) ~= f(x) - f(baseline) where f is the
    seed-contracted output."""
    params, image, seed = _setup(rng, size=8)
    from lrp_imagecaptioning_tpu.explain.cnn_gradient import _vgg_forward

    def f(img):
        return (_vgg_forward(params, img, ARCH_KW["arch"], ARCH_KW["until"], jax.nn.relu) * seed).sum()

    ig = vgg_integrated_gradients(params, image, seed, steps=64, **ARCH_KW)
    target = float(f(image) - f(jnp.zeros_like(image)))
    np.testing.assert_allclose(float(ig.sum()), target, rtol=0.05, atol=0.5)


def test_smoothgrad_converges_to_gradient_at_zero_noise(rng):
    params, image, seed = _setup(rng, size=8)
    g = vgg_gradient(params, image, seed, **ARCH_KW)
    sg = vgg_smoothgrad(params, image, seed, jax.random.PRNGKey(0), n=4, noise_scale=0.0, **ARCH_KW)
    np.testing.assert_allclose(np.asarray(sg), np.asarray(g), rtol=1e-5, atol=1e-5)


def test_flat_input_presets_run(rng):
    params, image, seed = _setup(rng, size=8)
    a = vgg_lrp_preset_a_flat(params, image, seed, **ARCH_KW)
    b = vgg_lrp_preset_b_flat(params, image, seed, **ARCH_KW)
    assert a.shape == b.shape == image.shape
    assert np.isfinite(np.asarray(a)).all() and np.isfinite(np.asarray(b)).all()


def test_preset_a_bf16_close_to_f32(rng):
    from lrp_imagecaptioning_tpu.explain.cnn_lrp import vgg_lrp_preset_a_wordbatched

    params = init_vgg_params(jax.random.PRNGKey(0), "vgg16", "block1_conv2")
    image = jnp.asarray(rng.normal(size=(1, 16, 16, 3)).astype(np.float32))
    seeds = jnp.asarray(rng.normal(size=(3, 16, 16, 64)).astype(np.float32))
    f32 = np.asarray(vgg_lrp_preset_a_wordbatched(params, image, seeds, **ARCH_KW))
    bf16 = np.asarray(vgg_lrp_preset_a_wordbatched(params, image, seeds,
                                                   compute_dtype=jnp.bfloat16, **ARCH_KW))
    scale = np.abs(f32).max()
    assert np.abs(bf16 - f32).max() / scale < 0.05
    # bf16 STORAGE (HBM-halving mode): output dtype back to f32, close to ref
    st = np.asarray(vgg_lrp_preset_a_wordbatched(params, image, seeds,
                                                 storage_dtype=jnp.bfloat16, **ARCH_KW))
    assert st.dtype == np.float32
    assert np.abs(st - f32).max() / scale < 0.05


def test_preset_a_debug_stats(rng):
    from lrp_imagecaptioning_tpu.explain.cnn_lrp import (
        vgg_lrp_preset_a,
        vgg_lrp_preset_a_debug,
    )

    params, image, seed = _setup(rng, size=8)
    rel, stats = vgg_lrp_preset_a_debug(params, image, seed, **ARCH_KW)
    plain = vgg_lrp_preset_a(params, image, seed, **ARCH_KW)
    np.testing.assert_array_equal(np.asarray(rel), np.asarray(plain))
    assert set(stats) == {"block1_conv1", "block1_conv2"}
    for s in stats.values():
        assert int(s["nonfinite_count"]) == 0
        assert float(s["min"]) <= float(s["max"])


def test_pool_heatmap_to_grid():
    from lrp_imagecaptioning_tpu.evalx.words import pool_heatmap_to_grid

    hp = np.zeros((224, 224), np.float32)
    hp[0, 0] = 5.0    # cell (0,0)
    hp[100, 100] = 3.0  # cell (6,6) for 16x16 windows
    out = pool_heatmap_to_grid(hp, grid=14, pooling="max")
    assert out.shape == (14, 14)
    assert out[0, 0] == 5.0 and out[6, 6] == 3.0
    avg = pool_heatmap_to_grid(hp, grid=14, pooling="avg")
    np.testing.assert_allclose(avg[0, 0], 5.0 / 256)


def test_alpha_beta_nonneg_flag_exact(rng):
    """input_nonneg=True must be bitwise-identical on nonneg inputs (the x-
    branch it elides is exactly zero)."""
    from lrp_imagecaptioning_tpu.ops.lrp_conv import lrp_conv_alpha_beta

    x = jnp.abs(jnp.asarray(rng.normal(size=(2, 8, 8, 4)).astype(np.float32)))
    k = jnp.asarray(rng.normal(size=(3, 3, 4, 6)).astype(np.float32))
    b = jnp.asarray(rng.normal(size=(6,)).astype(np.float32))
    r = jnp.asarray(rng.normal(size=(2, 8, 8, 6)).astype(np.float32))
    full = lrp_conv_alpha_beta(r, x, k, b, 1.0, 0.0, input_nonneg=False)
    fast = lrp_conv_alpha_beta(r, x, k, b, 1.0, 0.0, input_nonneg=True)
    np.testing.assert_array_equal(np.asarray(full), np.asarray(fast))


def test_preset_a_wordbatched_fused_matches_direct(rng):
    """The algebraically-folded word-batched backward (m/w factorization)
    must match the direct rule application, including across a pool (the
    tie-mask rides on the word-independent factor)."""
    from lrp_imagecaptioning_tpu.explain.cnn_lrp import (
        vgg_lrp_preset_a_wordbatched,
        vgg_lrp_preset_a_wordbatched_fused,
    )

    for until in ("block1_conv2", "block2_conv1"):  # without / with a pool
        params = init_vgg_params(jax.random.PRNGKey(0), "vgg16", until)
        image = jnp.asarray(rng.normal(size=(1, 16, 16, 3)).astype(np.float32))
        g = 16 if until == "block1_conv2" else 8
        ch = 64 if until == "block1_conv2" else 128
        seeds = jnp.asarray(rng.normal(size=(3, g, g, ch)).astype(np.float32))
        direct = vgg_lrp_preset_a_wordbatched(params, image, seeds, "vgg16", until)
        fused = vgg_lrp_preset_a_wordbatched_fused(params, image, seeds, "vgg16", until)
        np.testing.assert_allclose(np.asarray(fused), np.asarray(direct),
                                   rtol=2e-4, atol=1e-6, err_msg=until)


def test_preset_a_lane_packed_matches_plain(rng):
    """lane_pack=True (the default, production fast path) packs two words
    into the 128-lane channel dim for the C<=64 backward tail via
    block-diagonal kernels. It must reproduce the plain path exactly up to
    conv summation order — f32, odd word counts, W=1, and bf16 storage."""
    from lrp_imagecaptioning_tpu.explain.cnn_lrp import vgg_lrp_preset_a_wordbatched

    params = init_vgg_params(jax.random.PRNGKey(0), "vgg16", "block2_conv1")
    image = jnp.asarray(rng.normal(size=(1, 16, 16, 3)).astype(np.float32))
    # W=5 (odd: one word pairs with padding) and W=1 (degenerate) cover the
    # packing edge cases; block2_conv1 keeps BOTH a packed C<=64 tail
    # (block1 + pool1) and an unpacked 128-lane head conv in the walk
    for W in (5, 1):
        seeds = jnp.asarray(rng.normal(size=(W, 8, 8, 128)).astype(np.float32))
        plain = vgg_lrp_preset_a_wordbatched(
            params, image, seeds, "vgg16", "block2_conv1", lane_pack=False)
        packed = vgg_lrp_preset_a_wordbatched(
            params, image, seeds, "vgg16", "block2_conv1", lane_pack=True)
        assert packed.shape == plain.shape == (W, 16, 16, 3)
        np.testing.assert_allclose(np.asarray(packed), np.asarray(plain),
                                   rtol=1e-4, atol=1e-7, err_msg=f"W={W}")
    # bf16 storage mode (the bench configuration)
    seeds = jnp.asarray(rng.normal(size=(4, 8, 8, 128)).astype(np.float32))
    plain = vgg_lrp_preset_a_wordbatched(
        params, image, seeds, "vgg16", "block2_conv1",
        storage_dtype=jnp.bfloat16, lane_pack=False)
    packed = vgg_lrp_preset_a_wordbatched(
        params, image, seeds, "vgg16", "block2_conv1",
        storage_dtype=jnp.bfloat16, lane_pack=True)
    scale = np.abs(np.asarray(plain)).max()
    assert np.abs(np.asarray(packed) - np.asarray(plain)).max() / scale < 0.02
    # shallow stacks (until inside block1/2) must silently skip packing
    params1 = init_vgg_params(jax.random.PRNGKey(0), "vgg16", "block1_conv2")
    s1 = jnp.asarray(rng.normal(size=(3, 16, 16, 64)).astype(np.float32))
    a = vgg_lrp_preset_a_wordbatched(params1, image, s1, "vgg16", "block1_conv2", lane_pack=True)
    b = vgg_lrp_preset_a_wordbatched(params1, image, s1, "vgg16", "block1_conv2", lane_pack=False)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6, atol=1e-8)


@pytest.mark.slow
def test_preset_a_imgword_batched_matches_per_image(rng):
    """The image+word-batched backward matches mapping the per-image
    word-batched function (f32 and bf16-storage paths).

    Tolerance is reduction-order drift, not ulp: the flattened layout changes
    conv batch shapes, and XLA:CPU legitimately selects different conv
    algorithms per shape on some hosts (observed 2026-08-18: max abs diff
    7.6e-6 through the 16-layer divide-amplified chain on a host whose
    codegen differs from the original dev machine)."""
    from lrp_imagecaptioning_tpu.explain.cnn_lrp import (
        vgg_lrp_preset_a_imgword_batched,
        vgg_lrp_preset_a_wordbatched,
    )

    params = init_vgg_params(jax.random.PRNGKey(0), "vgg16", "block5_conv3")
    B, W = 2, 3
    imgs = jnp.asarray(rng.normal(size=(B, 32, 32, 3)).astype(np.float32))
    seeds = jnp.asarray(rng.normal(size=(B, W, 2, 2, 512)).astype(np.float32))
    for kw in ({}, {"storage_dtype": jnp.bfloat16}):
        ref = jnp.stack([
            vgg_lrp_preset_a_wordbatched(params, imgs[b][None], seeds[b], **kw)
            for b in range(B)
        ])
        new = vgg_lrp_preset_a_imgword_batched(params, imgs, seeds, **kw)
        np.testing.assert_allclose(np.asarray(ref), np.asarray(new),
                                   rtol=1e-3, atol=1e-5)
