"""AOA model tests: step/scan consistency, training step, explanation."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from lrp_imagecaptioning_tpu.config import FlickrConfig
from lrp_imagecaptioning_tpu.models import aoa
from lrp_imagecaptioning_tpu.models.captioner import build_captioner

CFG = FlickrConfig(
    embedding_dim=16, hidden_dim=16, layer_name="block2_conv1",
    img_feature_length=16, img_feature_dim=128, image_size=(8, 8),
    sentence_length=5, drop_rate=0.0,
)
VOCAB = 16


def test_aoa_scan_equals_step_loop(rng):
    params = aoa.init_params(jax.random.PRNGKey(0), VOCAB, CFG)
    B, T = 2, 4
    feat = jnp.asarray(rng.normal(size=(B, CFG.img_feature_length, CFG.img_feature_dim)).astype(np.float32))
    caps = jnp.asarray(rng.integers(0, VOCAB, size=(B, T)).astype(np.int32))
    logits_scan = aoa.forward_train(params, feat, caps, CFG)

    consts = aoa.prepare_consts(params, feat)
    state = aoa.init_state(B, CFG.hidden_dim)
    outs = []
    for t in range(T):
        state, cache = aoa.step(params, consts, state, params["embedding"][caps[:, t]])
        outs.append(cache.logits)
    np.testing.assert_allclose(
        np.asarray(logits_scan), np.stack([np.asarray(o) for o in outs], 1), rtol=1e-5, atol=1e-5
    )


def test_aoa_attention_normalized(rng):
    params = aoa.init_params(jax.random.PRNGKey(0), VOCAB, CFG)
    feat = jnp.asarray(rng.normal(size=(1, CFG.img_feature_length, CFG.img_feature_dim)).astype(np.float32))
    consts = aoa.prepare_consts(params, feat)
    _, cache = aoa.step(params, consts, aoa.init_state(1, CFG.hidden_dim),
                        params["embedding"][jnp.zeros((1,), jnp.int32)])
    np.testing.assert_allclose(float(cache.attention.sum()), 1.0, rtol=1e-5)


def test_aoa_refine_blocks(rng):
    params = aoa.init_params(jax.random.PRNGKey(0), VOCAB, CFG, encoder_refine_num=2)
    assert len(params["refine"]) == 2
    feat = jnp.asarray(rng.normal(size=(2, CFG.img_feature_length, CFG.img_feature_dim)).astype(np.float32))
    consts = aoa.prepare_consts(params, feat)
    assert consts.v_feat.shape == (2, CFG.img_feature_length, CFG.hidden_dim)
    assert np.isfinite(np.asarray(consts.v_feat)).all()


def test_aoa_train_step_reduces_loss(rng):
    from lrp_imagecaptioning_tpu.train.optimizer import make_optimizer
    from lrp_imagecaptioning_tpu.train.step import make_train_step

    cap = build_captioner("aoa", CFG, VOCAB)
    params = cap.init_params(jax.random.PRNGKey(0))
    opt = make_optimizer("aoa", 1e-3)
    opt_state = opt.init(params)
    step = make_train_step(cap, opt, donate=False)
    B, T = 4, 6
    images = jnp.asarray(rng.normal(size=(B, 8, 8, 3)).astype(np.float32))
    caps = jnp.asarray(rng.integers(0, VOCAB, size=(B, T)).astype(np.int32))
    y = jax.nn.one_hot(jnp.asarray(rng.integers(0, VOCAB, size=(B, T))), VOCAB)
    losses = []
    for _ in range(12):
        params, opt_state, m = step(params, opt_state, images, caps, y, jax.random.PRNGKey(1))
        losses.append(float(m["loss"]))
    # Adam on the GLU/LN stack overshoots for a few steps before settling;
    # assert the settled tail improves on the start
    assert min(losses[-3:]) < losses[0]
    assert np.isfinite(losses).all()


@pytest.mark.parametrize("method", ["lrp", "gradient"])
def test_aoa_explainer(method, rng):
    from lrp_imagecaptioning_tpu.explain.engine import Explainer

    class FakePP:
        SOS_TOKEN = "szeros"
        EOS_TOKEN = "zeros"
        SOS_TOKEN_LABEL_ENCODED = 1
        EOS_TOKEN_LABEL_ENCODED = 2
        word_of = {i: f"w{i}" for i in range(1, VOCAB + 1)}

    cap = build_captioner("aoa", CFG, VOCAB)
    params = cap.init_params(jax.random.PRNGKey(0))
    ex = Explainer(cap, params, FakePP(), method=method)
    image = jnp.asarray(rng.normal(size=(8, 8, 3)).astype(np.float32))
    tokens = np.array([5, 7, 2, 0, 0], np.int32)
    result = ex.analyze(image, tokens_1based=tokens)
    assert result.relevance_maps.shape == (2, 8, 8, 3)
    assert np.isfinite(result.relevance_maps).all()
    assert np.abs(result.relevance_maps).sum() > 0


def test_aoa_lrp_reweights_by_layernormed_grid(rng):
    """The image_features dense consumes the LAYER-NORMED grid
    (aoa.prepare_consts), so its epsilon-rule must re-weight by that same
    LN'd x. LayerNorm makes the whole forward (and hence the relevance)
    ~invariant to a global rescale of the raw grid; re-weighting by the RAW
    grid would scale r_feat with the input instead."""
    from lrp_imagecaptioning_tpu.explain.aoa_backward import explain_word_aoa

    H, T = CFG.hidden_dim, CFG.sentence_length
    params = aoa.init_params(jax.random.PRNGKey(0), VOCAB, CFG)
    tokens0 = jnp.asarray(rng.integers(0, VOCAB, size=(1, T)).astype(np.int32))
    feat = jnp.asarray(rng.normal(
        size=(1, CFG.img_feature_length, CFG.img_feature_dim)).astype(np.float32))

    def r_feat_for(f):
        consts_b = aoa.prepare_consts(params, f)
        caches_b = aoa.forward_cached_from_inputs(params, consts_b, tokens0, H)
        consts = jax.tree.map(lambda x: x[0], consts_b)
        caches = jax.tree.map(lambda x: x[:, 0], caches_b)
        r, _, _ = explain_word_aoa(params, consts, caches, jnp.asarray(2),
                                   jnp.asarray(4), T)
        return np.asarray(r)

    r1 = r_feat_for(feat)
    r10 = r_feat_for(10.0 * feat)
    assert np.abs(r1).sum() > 0
    # LN-invariance: same relevance despite the 10x input rescale (the raw-x
    # pairing would make r10 ~10x r1)
    np.testing.assert_allclose(r10, r1, rtol=2e-2, atol=1e-6)
