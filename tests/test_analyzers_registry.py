"""Tests for the analyzer registry and the round-2 analyzer families:
DeepTaylor, DeepLIFT, PatternNet/PatternAttribution, perturbation analysis.

Modeled on the reference's dryrun harness (innvestigate/utils/tests/
dryrun.py:103-116): every analyzer runs on a small fixture network and must
return input-shaped, finite output — plus closed-form checks where the math
permits (DeepLIFT completeness on linear nets, pattern recovery on a
generated linear-signal dataset, MoRF ordering semantics).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from lrp_imagecaptioning_tpu.models.vgg import init_vgg_params, vgg_apply
from lrp_imagecaptioning_tpu.explain.analyzers import (
    analyzer_names,
    create_analyzer,
    gaussian_smoother,
    path_integrator,
)
from lrp_imagecaptioning_tpu.explain.cnn_deeplift import (
    vgg_deeplift,
    vgg_deeplift_standalone,
)
from lrp_imagecaptioning_tpu.explain.cnn_lrp import (
    vgg_deep_taylor,
    vgg_lrp_preset_a,
)
from lrp_imagecaptioning_tpu.explain.patterns import (
    compute_vgg_patterns,
    init_pattern_stats,
    update_pattern_stats,
    compute_patterns,
    _conv_patches_3x3,
)
from lrp_imagecaptioning_tpu.explain.perturbation import (
    Perturbation,
    PerturbationAnalysis,
)
from lrp_imagecaptioning_tpu.ops.lrp_conv import conv2d

ARCH_KW = dict(arch="vgg16", until="block1_conv2")  # 2-conv stack: fast on CPU


def _setup(rng, B=1, size=16):
    params = init_vgg_params(jax.random.PRNGKey(0), "vgg16", "block1_conv2")
    image = jnp.asarray(rng.normal(size=(B, size, size, 3)).astype(np.float32))
    seed = jnp.asarray(rng.normal(size=(B, size, size, 64)).astype(np.float32))
    return params, image, seed


# ---------------------------------------------------------------- registry

REFERENCE_REGISTRY_NAMES = [
    # innvestigate/analyzer/__init__.py:35-85, verbatim
    "input", "random",
    "gradient", "gradient.baseline", "input_t_gradient", "deconvnet",
    "guided_backprop", "integrated_gradients", "smoothgrad",
    "lrp.z", "lrp.z_IB", "lrp.epsilon", "lrp.epsilon_IB",
    "lrp.w_square", "lrp.flat", "lrp.alpha_beta",
    "lrp.alpha_2_beta_1", "lrp.alpha_2_beta_1_IB",
    "lrp.alpha_1_beta_0", "lrp.alpha_1_beta_0_IB",
    "lrp.z_plus", "lrp.z_plus_fast",
    "lrp.sequential_preset_a", "lrp.sequential_preset_b",
    "lrp.sequential_preset_a_flat", "lrp.sequential_preset_b_flat",
    "deep_taylor", "deep_taylor.bounded",
    "deep_lift", "deep_lift.wrapper",
    "pattern.net", "pattern.attribution",
]


def test_registry_covers_reference_names():
    missing = set(REFERENCE_REGISTRY_NAMES) - set(analyzer_names())
    assert not missing, f"registry missing reference analyzers: {missing}"


def test_registry_unknown_name_raises(rng):
    params, _, _ = _setup(rng)
    with pytest.raises(KeyError):
        create_analyzer("no.such.analyzer", params)


@pytest.mark.parametrize("name", REFERENCE_REGISTRY_NAMES)
def test_registry_dryrun_shape_and_finite(rng, name):
    """The dryrun invariant (dryrun.py:103-116): input-shaped, finite."""
    params, image, seed = _setup(rng)
    kwargs = dict(ARCH_KW)
    if name == "deep_taylor.bounded":
        kwargs.update(low=-3.0, high=3.0)
    if name == "lrp.alpha_beta":
        kwargs.update(alpha=2.0, beta=1.0)
    if name == "smoothgrad":
        kwargs.update(rng_key=jax.random.PRNGKey(1), n=2)
    if name == "random":
        kwargs.update(rng_key=jax.random.PRNGKey(2))
    if name.startswith("pattern."):
        pats = compute_vgg_patterns(params, [np.asarray(image)], "linear", **ARCH_KW)
        kwargs.update(patterns=pats)
    analyze = create_analyzer(name, params, **kwargs)
    out = np.asarray(analyze(image, seed))
    assert out.shape == image.shape
    assert np.all(np.isfinite(out))


def test_registry_preset_a_matches_direct_call(rng):
    params, image, seed = _setup(rng)
    via_registry = create_analyzer("lrp.sequential_preset_a", params, **ARCH_KW)(image, seed)
    direct = vgg_lrp_preset_a(params, image, seed, **ARCH_KW)
    np.testing.assert_array_equal(np.asarray(via_registry), np.asarray(direct))


# ---------------------------------------------------------------- deep taylor

def test_deep_taylor_equals_preset_a_for_positive_seed(rng):
    """All tapped convs carry ReLU, so DeepTaylor's rule table degenerates to
    alpha1beta0 == PresetA's conv branch; with an already-positive seed the
    head ReLU is the identity (deeptaylor.py:56-61, 144-153)."""
    params, image, seed = _setup(rng)
    pos_seed = jnp.abs(seed)
    dt = vgg_deep_taylor(params, image, pos_seed, **ARCH_KW)
    pa = vgg_lrp_preset_a(params, image, pos_seed, **ARCH_KW)
    np.testing.assert_allclose(np.asarray(dt), np.asarray(pa), rtol=1e-5, atol=1e-6)


def test_deep_taylor_clamps_negative_seed(rng):
    """Negative seed relevance is clipped by the output ReLU: a wholly
    negative seed must produce zero relevance."""
    params, image, seed = _setup(rng)
    out = vgg_deep_taylor(params, image, -jnp.abs(seed), **ARCH_KW)
    assert float(jnp.abs(out).max()) == 0.0


def test_deep_taylor_bounded_differs_on_input_layer(rng):
    params, image, seed = _setup(rng)
    pos = jnp.abs(seed)
    plain = create_analyzer("deep_taylor", params, **ARCH_KW)(image, pos)
    bounded = create_analyzer("deep_taylor.bounded", params, low=-3.0, high=3.0,
                              **ARCH_KW)(image, pos)
    assert not np.allclose(np.asarray(plain), np.asarray(bounded))


# ---------------------------------------------------------------- deeplift

def test_deeplift_completeness_single_linear_layer(rng):
    """For one conv unit with zero bias and a positive-keeping input, DeepLIFT
    against a zero reference satisfies sum(attrib) == sum(seed * dy) with
    seed=ones: the rescale rule redistributes exactly dy."""
    params = init_vgg_params(jax.random.PRNGKey(0), "vgg16", "block1_conv1")
    image = jnp.asarray(rng.normal(size=(1, 8, 8, 3)).astype(np.float32))
    out = vgg_apply(params, image, "vgg16", "block1_conv1")
    seed = out  # == out - out_ref since reference activations are relu(0)=0
    attrib = vgg_deeplift(params, image, seed, arch="vgg16", until="block1_conv1")
    # Conservation: Σ attrib = Σ_{y>0} Δy = Σ seed for the bias-free unit
    # (the rescale rule redistributes exactly the output difference).
    np.testing.assert_allclose(float(jnp.sum(attrib)), float(jnp.sum(seed)), rtol=1e-4)


def test_deeplift_standalone_seed_is_output_difference(rng):
    params, image, _ = _setup(rng)
    via_standalone = vgg_deeplift_standalone(params, image, **ARCH_KW)
    out = vgg_apply(params, image, **{"arch": "vgg16", "until": "block1_conv2"})
    ref = vgg_apply(params, jnp.zeros_like(image), arch="vgg16", until="block1_conv2")
    via_seed = vgg_deeplift(params, image, out - ref, **ARCH_KW)
    np.testing.assert_allclose(np.asarray(via_standalone), np.asarray(via_seed),
                               rtol=1e-5, atol=1e-6)


def test_deeplift_exact_branch_runs(rng):
    params, image, seed = _setup(rng)
    out = vgg_deeplift(params, image, seed, approximate_gradient=False, **ARCH_KW)
    assert np.all(np.isfinite(np.asarray(out)))
    assert out.shape == image.shape


# ---------------------------------------------------------------- patterns

def test_conv_patches_match_conv(rng):
    """patches @ W2D must equal conv2d SAME — the patch order matches the
    kernel's (kh, kw, cin) flatten."""
    x = jnp.asarray(rng.normal(size=(2, 6, 6, 3)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(3, 3, 3, 5)).astype(np.float32))
    patches = _conv_patches_3x3(x)
    via_patches = patches.reshape(-1, 27) @ k.reshape(27, 5)
    via_conv = conv2d(x, k).reshape(-1, 5)
    np.testing.assert_allclose(np.asarray(via_patches), np.asarray(via_conv),
                               rtol=1e-4, atol=1e-5)


def test_linear_pattern_recovers_signal_direction():
    """The closed-form property from the PatternNet paper: for data
    x = a·y + noise with noise ⟂ w, the linear pattern estimator recovers
    direction a (tools/pattern.py:277-305)."""
    rng = np.random.default_rng(7)
    d, n = 27, 20000
    w = rng.normal(size=(d, 1)).astype(np.float32)
    a = rng.normal(size=(d, 1)).astype(np.float32)
    a = a / (w.T @ a)  # normalize so wᵀa = 1 → y_signal = y
    y = rng.normal(size=(n, 1)).astype(np.float32)
    noise = rng.normal(size=(n, d)).astype(np.float32)
    noise -= (noise @ w) @ w.T / float((w.T @ w)[0, 0])  # project out w
    X = y @ a.T + noise
    Y = X @ w
    # Pattern estimator: cov(x,y)/ (wᵀ cov(x,y))
    mean_x, mean_y, mean_xy = X.mean(0), Y.mean(0), (X * Y).mean(0)
    cov = mean_xy - mean_x * mean_y
    A = cov / (w[:, 0] @ cov)
    np.testing.assert_allclose(A, a[:, 0], atol=0.05)


def test_pattern_stats_streaming_equals_one_shot(rng):
    params, image, _ = _setup(rng, B=4)
    one = compute_vgg_patterns(params, [np.asarray(image)], "linear", **ARCH_KW)
    two = compute_vgg_patterns(
        params, [np.asarray(image[:2]), np.asarray(image[2:])], "linear", **ARCH_KW)
    for name in one:
        np.testing.assert_allclose(np.asarray(one[name]), np.asarray(two[name]),
                                   rtol=1e-4, atol=1e-5)


def test_pattern_types_differ(rng):
    params, image, _ = _setup(rng, B=2)
    lin = compute_vgg_patterns(params, [np.asarray(image)], "linear", **ARCH_KW)
    rel = compute_vgg_patterns(params, [np.asarray(image)], "relu", **ARCH_KW)
    assert not np.allclose(np.asarray(lin["block1_conv1"]),
                           np.asarray(rel["block1_conv1"]))


def test_patternnet_vs_attribution_differ(rng):
    params, image, seed = _setup(rng)
    pats = compute_vgg_patterns(params, [np.asarray(image)], "relu", **ARCH_KW)
    net = create_analyzer("pattern.net", params, patterns=pats, **ARCH_KW)(image, seed)
    att = create_analyzer("pattern.attribution", params, patterns=pats, **ARCH_KW)(image, seed)
    assert not np.allclose(np.asarray(net), np.asarray(att))


# ---------------------------------------------------------------- wrappers

def test_gaussian_smoother_zero_noise_equals_subanalyzer(rng):
    params, image, seed = _setup(rng)
    analyze = create_analyzer("gradient", params, **ARCH_KW)
    smoothed = gaussian_smoother(analyze, image, seed, jax.random.PRNGKey(0),
                                 noise_scale=0.0, n=3)
    np.testing.assert_allclose(np.asarray(smoothed), np.asarray(analyze(image, seed)),
                               rtol=1e-5, atol=1e-6)


def test_path_integrator_matches_integrated_gradients(rng):
    """PathIntegrator(gradient) == IntegratedGradients by construction
    (wrapper.py PathIntegrator docstring)."""
    params, image, seed = _setup(rng)
    analyze = create_analyzer("gradient", params, **ARCH_KW)
    via_wrapper = path_integrator(analyze, image, seed, steps=8)
    via_ig = create_analyzer("integrated_gradients", params, steps=8, **ARCH_KW)(image, seed)
    np.testing.assert_allclose(np.asarray(via_wrapper), np.asarray(via_ig),
                               rtol=1e-3, atol=1e-4)


# ---------------------------------------------------------------- perturbation

def test_region_ordering_matches_reference_semantics():
    agg = np.array([[[[3.0, 1.0], [2.0, 4.0]]]])  # (n=1, c=1, 2, 2)
    ranks = Perturbation.compute_region_ordering(agg)
    # rank 0 = highest value (4.0), rank 3 = lowest (1.0)
    assert ranks[0, 0, 1, 1] == 0 and ranks[0, 0, 0, 0] == 1
    assert ranks[0, 0, 1, 0] == 2 and ranks[0, 0, 0, 1] == 3


def test_perturbation_zeros_hits_most_relevant_region():
    x = np.ones((1, 6, 6, 2), np.float32)
    analysis = np.zeros((1, 6, 6, 2), np.float32)
    analysis[0, 0:3, 3:6, :] = 5.0  # top-right 3x3 region is most relevant
    p = Perturbation("zeros", num_perturbed_regions=1, region_shape=(3, 3))
    out = p.perturbate_on_batch(x, analysis)
    assert np.all(out[0, 0:3, 3:6, :] == 0.0)
    assert np.all(out[0, 3:6, :, :] == 1.0) and np.all(out[0, 0:3, 0:3, :] == 1.0)


def test_perturbation_custom_function_and_padding():
    x = np.ones((1, 5, 7, 1), np.float32)  # not a multiple of (3, 3) → pad
    analysis = np.random.default_rng(0).normal(size=x.shape).astype(np.float32)
    p = Perturbation(lambda region: np.full_like(region, -9.0),
                     num_perturbed_regions=2, region_shape=(3, 3))
    out = p.perturbate_on_batch(x, analysis)
    assert out.shape == x.shape
    assert np.any(out == -9.0) and np.any(out == 1.0)


def test_perturbation_value_range_clips():
    x = np.full((1, 3, 3, 1), 2.0, np.float32)
    analysis = np.ones_like(x)
    p = Perturbation("invert", num_perturbed_regions=1, region_shape=(3, 3),
                     value_range=(-1.0, 1.0))
    out = p.perturbate_on_batch(x, analysis)
    assert np.all(out == -1.0)  # -2 clipped to -1


def test_perturbation_analysis_morf_curve():
    """Model score = sum over pixels; relevance = input. Occluding the
    highest-input regions first must produce a decreasing curve with
    steps+1 entries (perturbate.py:374-397)."""
    rng = np.random.default_rng(3)
    x = np.abs(rng.normal(size=(4, 9, 9, 1))).astype(np.float32)
    batches = [(x, np.zeros(len(x)))]
    pa = PerturbationAnalysis(
        analyze_fn=lambda img: img,
        score_fn=lambda img, y: float(np.sum(img)),
        batches=batches,
        perturbation=Perturbation("zeros", region_shape=(3, 3)),
        steps=3, regions_per_step=2,
    )
    scores = pa.compute_perturbation_analysis()
    assert len(scores) == 4
    assert all(a > b for a, b in zip(scores, scores[1:]))


def test_patch_correlate_matches_im2col(rng):
    """_patch_correlate == patches.T @ m without materializing the 9x im2col
    tensor (the statistics pass runs on it; _conv_patches_3x3 is the oracle)."""
    from lrp_imagecaptioning_tpu.explain.patterns import _patch_correlate

    x = jnp.asarray(rng.normal(size=(2, 6, 6, 3)).astype(np.float32))
    m = jnp.asarray(rng.normal(size=(2, 6, 6, 5)).astype(np.float32))
    via_patches = _conv_patches_3x3(x).reshape(-1, 27).T @ m.reshape(-1, 5)
    via_corr = _patch_correlate(x, m)
    np.testing.assert_allclose(np.asarray(via_corr), np.asarray(via_patches),
                               rtol=1e-4, atol=1e-5)
