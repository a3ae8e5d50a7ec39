"""InceptionV3 encoder tests: topology, captioner integration, preprocessing,
H5 numbered-layer import."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from lrp_imagecaptioning_tpu.config import FlickrConfig
from lrp_imagecaptioning_tpu.models import inception
from lrp_imagecaptioning_tpu.models.captioner import build_captioner


def test_topology_matches_keras():
    assert len(inception.CONV_ORDER) == 94          # keras inception_v3 conv count
    assert inception.MIXED10_CHANNELS == 2048


@pytest.mark.slow
def test_mixed10_shape_299(rng):
    params = inception.init_inception_v3_params(jax.random.PRNGKey(0))
    x = jnp.asarray(rng.normal(size=(1, 299, 299, 3)).astype(np.float32))
    out = inception.inception_v3_apply(params, x)
    assert out.shape == (1, 8, 8, 2048)
    assert np.isfinite(np.asarray(out)).all()


@pytest.mark.slow
def test_inception_captioner_decode(rng):
    from lrp_imagecaptioning_tpu.infer.greedy import greedy_decode

    cfg = FlickrConfig(
        img_encoder="inception_v3", layer_name="mixed10",
        img_feature_length=64, img_feature_dim=2048,
        embedding_dim=16, hidden_dim=16, sentence_length=4, drop_rate=0.0,
    )
    cap = build_captioner("adaptiveattention", cfg, 12)
    params = cap.init_params(jax.random.PRNGKey(0))
    img = jnp.asarray(rng.normal(size=(1, 299, 299, 3)).astype(np.float32))
    fg = cap.encode(params, img)
    assert fg.shape == (1, 64, 2048)
    toks, _ = greedy_decode(cap, params, fg, 1, 2, 4)
    assert toks.shape == (1, 4)


def test_inception_preprocess_and_image_preprocessor(tmp_path, rng):
    from PIL import Image

    from lrp_imagecaptioning_tpu.data.images import ImagePreprocessor

    arr = (rng.random((310, 420, 3)) * 255).astype(np.uint8)
    p = str(tmp_path / "a.png")
    Image.fromarray(arr).save(p)
    pp = ImagePreprocessor("inception_v3")
    out = pp.preprocess_batch_paths([p])
    assert out.shape == (1, 299, 299, 3)
    assert out.min() >= -1.0 and out.max() <= 1.0


def test_h5_numbered_import_roundtrip(tmp_path, inception_v3_params):
    h5py = pytest.importorskip("h5py")
    params = inception_v3_params
    p = str(tmp_path / "iv3.h5")
    with h5py.File(p, "w") as f:
        mw = f.create_group("model_weights")
        for idx, name in enumerate(inception.CONV_ORDER, start=1):
            g = mw.create_group(f"conv2d_{idx}").create_group(f"conv2d_{idx}")
            g.create_dataset("kernel:0", data=np.asarray(params[name]["kernel"]))
            b = mw.create_group(f"batch_normalization_{idx}").create_group(f"batch_normalization_{idx}")
            b.create_dataset("gamma:0", data=np.asarray(params[name]["bn_gamma"]))
            b.create_dataset("beta:0", data=np.asarray(params[name]["bn_beta"]))
            b.create_dataset("moving_mean:0", data=np.asarray(params[name]["bn_mean"]))
            b.create_dataset("moving_variance:0", data=np.asarray(params[name]["bn_var"]))
    restored = inception.load_keras_inception_v3_h5(p)
    jax.tree.map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)),
        params, restored,
    )


@pytest.mark.slow
def test_inception_lrp_end_to_end(rng, inception_v3_params):
    """Rule-based LRP through the whole inception stack: shape, finiteness,
    nonzero input relevance, and conservation through a concat split."""
    from lrp_imagecaptioning_tpu.explain.inception_lrp import inception_lrp_preset_a

    params = inception_v3_params
    img = jnp.asarray(rng.normal(size=(1, 299, 299, 3)).astype(np.float32))
    seed = jnp.asarray(rng.normal(size=(1, 8, 8, 2048)).astype(np.float32))
    rel = inception_lrp_preset_a(params, img, seed)
    assert rel.shape == (1, 299, 299, 3)
    assert np.isfinite(np.asarray(rel)).all()
    assert np.abs(np.asarray(rel)).sum() > 0


def test_inception_lrp_via_engine(rng, inception_v3_params):
    from lrp_imagecaptioning_tpu.explain.engine import Explainer

    class PP:
        SOS_TOKEN = "szeros"
        EOS_TOKEN = "zeros"
        SOS_TOKEN_LABEL_ENCODED = 1
        EOS_TOKEN_LABEL_ENCODED = 2
        word_of = {i: f"w{i}" for i in range(1, 13)}

    cfg = FlickrConfig(
        img_encoder="inception_v3", layer_name="mixed10",
        img_feature_length=64, img_feature_dim=2048,
        embedding_dim=16, hidden_dim=16, sentence_length=3, drop_rate=0.0,
    )
    cap = build_captioner("adaptiveattention", cfg, 12)
    params = cap.init_params(jax.random.PRNGKey(0),
                             encoder_params=inception_v3_params)
    ex = Explainer(cap, params, PP(), method="lrp", beam_size=2)
    img = jnp.asarray(rng.normal(size=(299, 299, 3)).astype(np.float32))
    result = ex.analyze(img, tokens_1based=np.array([5, 2, 0], np.int32))
    assert result.relevance_maps.shape == (1, 299, 299, 3)
    assert np.isfinite(result.relevance_maps).all()


@pytest.mark.slow
def test_inception_deep_taylor_and_deeplift_via_engine(rng, inception_v3_params):
    """Relevance-family dispatch on the inception encoder; DeepTaylor maps
    are nonnegative (relu-clamped seed, WSquare/mask/WTA walk)."""
    from lrp_imagecaptioning_tpu.explain.engine import Explainer

    class PP:
        SOS_TOKEN = "szeros"
        EOS_TOKEN = "zeros"
        SOS_TOKEN_LABEL_ENCODED = 1
        EOS_TOKEN_LABEL_ENCODED = 2
        word_of = {i: f"w{i}" for i in range(1, 13)}

    cfg = FlickrConfig(
        img_encoder="inception_v3", layer_name="mixed10",
        img_feature_length=64, img_feature_dim=2048,
        embedding_dim=16, hidden_dim=16, sentence_length=3, drop_rate=0.0,
    )
    cap = build_captioner("adaptiveattention", cfg, 12)
    params = cap.init_params(jax.random.PRNGKey(0),
                             encoder_params=inception_v3_params)
    img = jnp.asarray(rng.normal(size=(299, 299, 3)).astype(np.float32))
    toks = np.array([5, 2, 0], np.int32)
    for method in ("deep_taylor", "deep_lift"):
        ex = Explainer(cap, params, PP(), method=method, beam_size=2)
        result = ex.analyze(img, tokens_1based=toks)
        assert result.relevance_maps.shape == (1, 299, 299, 3)
        assert np.isfinite(result.relevance_maps).all()
        assert np.abs(result.relevance_maps).sum() > 0
        if method == "deep_taylor":
            assert result.relevance_maps.min() >= 0.0
