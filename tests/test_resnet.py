"""ResNet50 encoder tests: shapes, captioner integration, gradient
explanations, H5 import round-trip."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from lrp_imagecaptioning_tpu.config import FlickrConfig
from lrp_imagecaptioning_tpu.models import resnet
from lrp_imagecaptioning_tpu.models.captioner import build_captioner

RESNET_CFG = FlickrConfig(
    img_encoder="resnet50", layer_name="activation_49",
    img_feature_length=4, img_feature_dim=2048,   # 64px input -> 2x2 grid
    embedding_dim=16, hidden_dim=16, sentence_length=5, drop_rate=0.0,
)
VOCAB = 16


def test_resnet50_param_names_match_keras_convention(resnet50_params):
    params = resnet50_params
    assert "conv1" in params and "bn_conv1" in params
    assert "res2a_branch1" in params and "bn2a_branch2c" in params
    assert "res5c_branch2c" in params
    assert params["res5c_branch2c"]["kernel"].shape == (1, 1, 512, 2048)
    # 1 stem + 4 stages x (1 shortcut + 3 per block) convs
    n_convs = sum(1 for k in params if k.startswith(("conv", "res")))
    assert n_convs == 1 + (3 * 3 + 1) + (4 * 3 + 1) + (6 * 3 + 1) + (3 * 3 + 1)


def test_resnet_captioner_decode_and_gradient_explain(rng, resnet50_params):
    from lrp_imagecaptioning_tpu.explain.engine import Explainer

    class PP:
        SOS_TOKEN = "szeros"
        EOS_TOKEN = "zeros"
        SOS_TOKEN_LABEL_ENCODED = 1
        EOS_TOKEN_LABEL_ENCODED = 2
        word_of = {i: f"w{i}" for i in range(1, VOCAB + 1)}

    cap = build_captioner("adaptiveattention", RESNET_CFG, VOCAB)
    params = cap.init_params(jax.random.PRNGKey(0), encoder_params=resnet50_params)
    image = jnp.asarray(rng.normal(size=(64, 64, 3)).astype(np.float32))
    ex = Explainer(cap, params, PP(), method="gradient", beam_size=2)
    result = ex.analyze(image, tokens_1based=np.array([5, 7, 2, 0, 0], np.int32))
    assert result.relevance_maps.shape == (2, 64, 64, 3)
    assert np.isfinite(result.relevance_maps).all()
    assert np.abs(result.relevance_maps).sum() > 0


@pytest.mark.slow
def test_resnet_guided_gradcam(rng, resnet50_params):
    """guided-gradcam on a resnet encoder (guided relu + CAM resize)."""
    from lrp_imagecaptioning_tpu.explain.engine import Explainer

    class PP:
        SOS_TOKEN = "szeros"
        EOS_TOKEN = "zeros"
        SOS_TOKEN_LABEL_ENCODED = 1
        EOS_TOKEN_LABEL_ENCODED = 2
        word_of = {i: f"w{i}" for i in range(1, VOCAB + 1)}

    cap = build_captioner("adaptiveattention", RESNET_CFG, VOCAB)
    params = cap.init_params(jax.random.PRNGKey(0), encoder_params=resnet50_params)
    image = jnp.asarray(rng.normal(size=(64, 64, 3)).astype(np.float32))
    ex_ggc = Explainer(cap, params, PP(), method="guided_gradcam", beam_size=2)
    r2 = ex_ggc.analyze(image, tokens_1based=np.array([5, 7, 2, 0, 0], np.int32))
    assert r2.relevance_maps.shape == (2, 64, 64, 3)
    assert np.isfinite(r2.relevance_maps).all()


@pytest.mark.slow
def test_resnet_augmentation_methods(rng, resnet50_params):
    """IG / SmoothGrad on a non-VGG encoder use the generic VJP path;
    SmoothGrad at zero noise must equal the plain gradient maps."""
    from lrp_imagecaptioning_tpu.explain.engine import Explainer

    class PP:
        SOS_TOKEN = "szeros"
        EOS_TOKEN = "zeros"
        SOS_TOKEN_LABEL_ENCODED = 1
        EOS_TOKEN_LABEL_ENCODED = 2
        word_of = {i: f"w{i}" for i in range(1, VOCAB + 1)}

    cap = build_captioner("adaptiveattention", RESNET_CFG, VOCAB)
    params = cap.init_params(jax.random.PRNGKey(0), encoder_params=resnet50_params)
    image = jnp.asarray(rng.normal(size=(64, 64, 3)).astype(np.float32))
    toks = np.array([5, 7, 2, 0, 0], np.int32)

    ex_ig = Explainer(cap, params, PP(), method="integrated_gradients", beam_size=2)
    ex_ig._ig_steps = 4
    r_ig = ex_ig.analyze(image, tokens_1based=toks)
    assert r_ig.relevance_maps.shape == (2, 64, 64, 3)
    assert np.isfinite(r_ig.relevance_maps).all()
    assert np.abs(r_ig.relevance_maps).sum() > 0

    ex_sg = Explainer(cap, params, PP(), method="smoothgrad", beam_size=2)
    ex_sg._sg_samples = 2
    ex_sg._sg_noise = 0.0
    r_sg = ex_sg.analyze(image, tokens_1based=toks)
    r_g = Explainer(cap, params, PP(), method="gradient", beam_size=2).analyze(
        image, tokens_1based=toks)
    # the two programs fuse differently (lax.map-wrapped VJP vs direct VJP),
    # so allow float accumulation-order noise
    np.testing.assert_allclose(
        r_sg.relevance_maps, r_g.relevance_maps, rtol=1e-3, atol=1e-5)


@pytest.mark.slow
def test_resnet_deep_taylor_and_deeplift(rng, resnet50_params):
    """Engine dispatch of the relevance-family methods on a resnet encoder.
    DeepTaylor maps must be nonnegative (relu-clamped seed through WSquare /
    masks / WTA only ever redistributes nonnegative relevance)."""
    from lrp_imagecaptioning_tpu.explain.engine import Explainer

    class PP:
        SOS_TOKEN = "szeros"
        EOS_TOKEN = "zeros"
        SOS_TOKEN_LABEL_ENCODED = 1
        EOS_TOKEN_LABEL_ENCODED = 2
        word_of = {i: f"w{i}" for i in range(1, VOCAB + 1)}

    cap = build_captioner("adaptiveattention", RESNET_CFG, VOCAB)
    params = cap.init_params(jax.random.PRNGKey(0), encoder_params=resnet50_params)
    image = jnp.asarray(rng.normal(size=(64, 64, 3)).astype(np.float32))
    toks = np.array([5, 7, 2, 0, 0], np.int32)
    for method in ("deep_taylor", "deep_lift"):
        ex = Explainer(cap, params, PP(), method=method, beam_size=2)
        r = ex.analyze(image, tokens_1based=toks)
        assert r.relevance_maps.shape == (2, 64, 64, 3)
        assert np.isfinite(r.relevance_maps).all()
        assert np.abs(r.relevance_maps).sum() > 0
        if method == "deep_taylor":
            assert r.relevance_maps.min() >= 0.0


@pytest.mark.slow
def test_resnet_deeplift_at_own_reference_equals_gradient(rng, resnet50_params):
    """With reference_inputs = the image itself every Δ is zero, so the
    approximate-gradient fallbacks fire everywhere and the DeepLIFT walk
    degenerates to the plain VJP of the encoder."""
    from lrp_imagecaptioning_tpu.explain.resnet_lrp import resnet_deeplift_wordbatched
    from lrp_imagecaptioning_tpu.models.resnet import resnet50_apply

    params = resnet50_params
    image = jnp.asarray(rng.normal(size=(1, 64, 64, 3)).astype(np.float32))
    seeds = jnp.asarray(rng.normal(size=(2, 2, 2, 2048)).astype(np.float32))

    dl = resnet_deeplift_wordbatched(params, image, seeds, reference_inputs=image)

    _, vjp = jax.vjp(lambda im: resnet50_apply(params, im), image)
    grad = jnp.stack([vjp(s[None])[0][0] for s in seeds])
    # the walks compile/fuse differently from the VJP chain, so allow
    # accumulation-order noise (maps reach O(100); observed diffs < 5e-4)
    np.testing.assert_allclose(np.asarray(dl), np.asarray(grad), rtol=1e-3, atol=2e-3)


def test_resnet_h5_roundtrip(tmp_path, resnet50_params):
    """Write params in a Keras-like H5 layout, re-import, compare."""
    h5py = pytest.importorskip("h5py")
    params = resnet50_params
    p = str(tmp_path / "rn.h5")
    with h5py.File(p, "w") as f:
        mw = f.create_group("model_weights")
        for name, tree in params.items():
            g = mw.create_group(name).create_group(name)
            if name.startswith("bn"):
                g.create_dataset("gamma:0", data=np.asarray(tree["gamma"]))
                g.create_dataset("beta:0", data=np.asarray(tree["beta"]))
                g.create_dataset("moving_mean:0", data=np.asarray(tree["moving_mean"]))
                g.create_dataset("moving_variance:0", data=np.asarray(tree["moving_var"]))
            else:
                g.create_dataset("kernel:0", data=np.asarray(tree["kernel"]))
    restored = resnet.load_keras_resnet50_h5(p)
    jax.tree.map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)),
        params, restored,
    )


def test_resnet101_topology(rng, resnet101_params):
    params = resnet101_params
    assert "res4b22_branch2c" in params  # 23-block stage, caffe naming
    x = jnp.asarray(rng.normal(size=(1, 64, 64, 3)).astype(np.float32))
    out = resnet.resnet50_apply(params, x, depth="resnet101")
    assert out.shape == (1, 2, 2, 2048)
    assert np.isfinite(np.asarray(out)).all()


def test_resnet_bn_add_lrp_rules(rng):
    """BN and Add reverse rules: iNNvestigate semantics + conservation."""
    from lrp_imagecaptioning_tpu.explain.resnet_lrp import lrp_add, lrp_bn

    x = jnp.asarray(rng.normal(size=(2, 4, 4, 3)).astype(np.float32))
    mean = jnp.asarray(rng.normal(size=(3,)).astype(np.float32))
    gamma = jnp.asarray(rng.uniform(0.5, 2.0, size=(3,)).astype(np.float32))
    beta = jnp.asarray(rng.normal(size=(3,)).astype(np.float32))
    y = (x - mean) * gamma + beta
    r = jnp.asarray(rng.normal(size=x.shape).astype(np.float32))
    rin = lrp_bn(r, x, y, mean, beta)
    # reference formula: x*(y-beta)*r / stab((x-mu)*y)
    expected = np.asarray(x) * (np.asarray(y) - np.asarray(beta)) * np.asarray(r)
    den = (np.asarray(x) - np.asarray(mean)) * np.asarray(y)
    den = den + np.where(den >= 0, 1e-7, -1e-7)
    np.testing.assert_allclose(np.asarray(rin), expected / den, rtol=1e-4, atol=1e-5)

    a = jnp.abs(jnp.asarray(rng.normal(size=(5,)).astype(np.float32)))
    b = jnp.abs(jnp.asarray(rng.normal(size=(5,)).astype(np.float32)))
    ra, rb = lrp_add(jnp.ones((5,)), [a, b])
    np.testing.assert_allclose(np.asarray(ra + rb), 1.0, rtol=1e-4)


def test_resnet_lrp_end_to_end(rng, resnet50_params):
    """Full rule-based LRP through a resnet50 on small inputs: shapes,
    finiteness, and nonzero relevance reaching the input."""
    from lrp_imagecaptioning_tpu.explain.resnet_lrp import resnet_lrp_preset_a

    params = resnet50_params
    img = jnp.asarray(rng.normal(size=(1, 64, 64, 3)).astype(np.float32))
    # forward shape/sign contract (folded from the old standalone
    # test_resnet50_output_shape — one compile instead of two)
    out = resnet.resnet50_apply(params, img)
    assert out.shape == (1, 2, 2, 2048)  # 64 / 32 total stride
    assert np.isfinite(np.asarray(out)).all()
    assert float(out.min()) >= 0.0  # relu output
    seed = jnp.asarray(rng.normal(size=(1, 2, 2, 2048)).astype(np.float32))
    rel = resnet_lrp_preset_a(params, img, seed)
    assert rel.shape == (1, 64, 64, 3)
    assert np.isfinite(np.asarray(rel)).all()
    assert np.abs(np.asarray(rel)).sum() > 0


def test_resnet_lrp_via_engine(rng, resnet50_params):
    from lrp_imagecaptioning_tpu.explain.engine import Explainer

    class PP:
        SOS_TOKEN = "szeros"
        EOS_TOKEN = "zeros"
        SOS_TOKEN_LABEL_ENCODED = 1
        EOS_TOKEN_LABEL_ENCODED = 2
        word_of = {i: f"w{i}" for i in range(1, VOCAB + 1)}

    cap = build_captioner("adaptiveattention", RESNET_CFG, VOCAB)
    params = cap.init_params(jax.random.PRNGKey(0), encoder_params=resnet50_params)
    ex = Explainer(cap, params, PP(), method="lrp", beam_size=2)
    image = jnp.asarray(rng.normal(size=(64, 64, 3)).astype(np.float32))
    result = ex.analyze(image, tokens_1based=np.array([5, 7, 2, 0, 0], np.int32))
    assert result.relevance_maps.shape == (2, 64, 64, 3)
    assert np.isfinite(result.relevance_maps).all()


@pytest.mark.slow
def test_resnet_deeplift_linear_in_seed(rng, resnet50_params):
    """Every DeepLIFT rule (Linear, Rescale, gradient) is linear in the
    incoming relevance, so the whole walk must be too."""
    from lrp_imagecaptioning_tpu.explain.resnet_lrp import resnet_deeplift_wordbatched

    params = resnet50_params
    image = jnp.asarray(rng.normal(size=(1, 64, 64, 3)).astype(np.float32))
    s1, s2 = (jnp.asarray(rng.normal(size=(1, 2, 2, 2048)).astype(np.float32))
              for _ in range(2))
    f = lambda s: np.asarray(resnet_deeplift_wordbatched(params, image, s))
    combo = f(2.0 * s1 - 3.0 * s2)
    parts = 2.0 * f(s1) - 3.0 * f(s2)
    scale = np.abs(parts).max()
    np.testing.assert_allclose(combo, parts, rtol=1e-3, atol=2e-3 * scale)
