"""Explanation engine tests on tiny models: API surface, shapes, finiteness,
and LRP-vs-gradient method dispatch.

Compile-budget note: these tests pin ENGINE MECHANICS (method dispatch,
bucketing, batching, ordering), not CNN depth — the encoder is truncated at
``layer_name="block2_conv1"`` (3 convs + 1 pool, 8x8 images -> 4x4x128 grid).
Full-depth LRP numerics live in test_lrp_parity.py / test_analyzers.py."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from lrp_imagecaptioning_tpu.config import FlickrConfig
from lrp_imagecaptioning_tpu.explain.engine import Explainer
from lrp_imagecaptioning_tpu.models.captioner import build_captioner

CFG = FlickrConfig(
    embedding_dim=16, hidden_dim=16, layer_name="block2_conv1",
    img_feature_length=16, img_feature_dim=128, image_size=(8, 8),
    sentence_length=5, drop_rate=0.0,
)
VOCAB = 16


_CAP_CACHE = {}


def _cap(model_type="adaptiveattention"):
    """Module-level memo of (captioner, params): init is pure eager dispatch
    re-paid by every test otherwise. Params are immutable jax arrays."""
    if model_type not in _CAP_CACHE:
        cap = build_captioner(model_type, CFG, VOCAB)
        _CAP_CACHE[model_type] = (cap, cap.init_params(jax.random.PRNGKey(0)))
    return _CAP_CACHE[model_type]


class FakePP:
    """Minimal caption-preprocessor surface the engine needs."""

    SOS_TOKEN = "szeros"
    EOS_TOKEN = "zeros"
    SOS_TOKEN_LABEL_ENCODED = 1
    EOS_TOKEN_LABEL_ENCODED = 2
    word_of = {i: (f"w{i}" if i > 2 else ("szeros" if i == 1 else "zeros")) for i in range(1, VOCAB + 1)}
    word_of[1] = "szeros"
    word_of[2] = "zeros"


@pytest.mark.parametrize("model_type", ["adaptiveattention", "gridTD"])
@pytest.mark.parametrize("method", ["lrp", "gradient"])
def test_explainer_analyze_shapes(model_type, method, rng):
    cap, params = _cap(model_type)
    ex = Explainer(cap, params, FakePP(), method=method)
    image = jnp.asarray(rng.normal(size=(8, 8, 3)).astype(np.float32))
    result = ex.analyze(image)
    W = len(result.words)
    assert result.relevance_maps.shape == (W, 8, 8, 3)
    assert result.feat_relevance.shape == (W, CFG.img_feature_length, CFG.img_feature_dim)
    assert result.attentions.shape == (W, CFG.img_feature_length)
    assert np.isfinite(result.relevance_maps).all()
    assert result.caption.endswith("zeros") or W == CFG.sentence_length


def test_explainer_with_given_tokens(rng):
    cap, params = _cap("adaptiveattention")
    ex = Explainer(cap, params, FakePP(), method="lrp")
    image = jnp.asarray(rng.normal(size=(8, 8, 3)).astype(np.float32))
    tokens = np.array([5, 7, 2, 0, 0], np.int32)  # two words then EOS
    result = ex.analyze(image, tokens_1based=tokens)
    assert result.words == ["w5", "w7"]
    assert result.relevance_maps.shape[0] == 2


def test_lrp_decoder_relevance_concentrates_on_inputs(rng):
    """Linguistic relevances are normalized to max |r| = 1 over steps
    (explainers.py:660-665)."""
    cap, params = _cap("adaptiveattention")
    ex = Explainer(cap, params, FakePP(), method="lrp")
    image = jnp.asarray(rng.normal(size=(8, 8, 3)).astype(np.float32))
    tokens = np.array([5, 7, 9, 2, 0], np.int32)
    result = ex.analyze(image, tokens_1based=tokens)
    assert result.word_relevances.shape == (3, CFG.sentence_length)
    m = np.abs(result.word_relevances).max(axis=1)
    # the SOS slot is zeroed pre-normalization (explainers.py:661): the FIRST
    # word's only input is SOS, so its row is all-zero; later rows reach 1
    np.testing.assert_allclose(m[0], 0.0, atol=1e-6)
    np.testing.assert_allclose(m[1:], 1.0, rtol=1e-4)


def test_analyze_batch_matches_per_image(rng):
    """analyze_batch must produce the same explanations as per-image analyze."""
    cap, params = _cap("adaptiveattention")
    ex = Explainer(cap, params, FakePP(), method="lrp", beam_size=2)
    images = rng.normal(size=(3, 8, 8, 3)).astype(np.float32)
    batch_results = ex.analyze_batch(images)
    assert len(batch_results) == 3
    for b in range(3):
        single = ex.analyze(images[b], tokens_1based=batch_results[b].tokens_1based)
        assert single.words == batch_results[b].words
        np.testing.assert_allclose(
            single.relevance_maps, batch_results[b].relevance_maps, rtol=1e-4, atol=1e-5
        )


@pytest.mark.parametrize("method", ["input_times_gradient", "guided_gradcam", "guided_backprop",
                                    "deconvnet", "deep_taylor", "deep_lift"])
def test_explainer_remaining_methods(method, rng):
    cap, params = _cap("adaptiveattention")
    ex = Explainer(cap, params, FakePP(), method=method)
    image = jnp.asarray(rng.normal(size=(8, 8, 3)).astype(np.float32))
    result = ex.analyze(image, tokens_1based=np.array([5, 7, 2, 0, 0], np.int32))
    assert result.relevance_maps.shape == (2, 8, 8, 3)
    assert np.isfinite(result.relevance_maps).all()
    assert np.abs(result.relevance_maps).sum() > 0


@pytest.mark.parametrize("method", ["integrated_gradients", "smoothgrad"])
def test_explainer_augmentation_methods(method, rng):
    cap, params = _cap("adaptiveattention")
    ex = Explainer(cap, params, FakePP(), method=method)
    ex._ig_steps = 4
    ex._sg_samples = 2
    image = jnp.asarray(rng.normal(size=(8, 8, 3)).astype(np.float32))
    result = ex.analyze(image, tokens_1based=np.array([5, 7, 2, 0, 0], np.int32))
    assert result.relevance_maps.shape == (2, 8, 8, 3)
    assert np.isfinite(result.relevance_maps).all()
    assert np.abs(result.relevance_maps).sum() > 0


def test_explainer_bf16_storage_close_to_f32(rng):
    """Production throughput mode: bf16-storage heatmaps stay within a few
    percent of the f32 maps (per-map scale)."""
    import jax.numpy as jnp

    cap, params = _cap("adaptiveattention")
    image = jnp.asarray(rng.normal(size=(8, 8, 3)).astype(np.float32))
    toks = np.array([5, 7, 2, 0, 0], np.int32)
    f32 = Explainer(cap, params, FakePP(), method="lrp").analyze(image, tokens_1based=toks)
    bf = Explainer(cap, params, FakePP(), method="lrp",
                   storage_dtype=jnp.bfloat16).analyze(image, tokens_1based=toks)
    assert bf.relevance_maps.dtype == np.float32
    scale = np.abs(f32.relevance_maps).max()
    assert np.abs(bf.relevance_maps - f32.relevance_maps).max() / scale < 0.05


def test_smoothgrad_noise_default_scales_with_encoder():
    """SmoothGrad noise is absolute: ~6% of the caffe ~255 input range for
    vgg/resnet (16.0) but 0.125 for inception's [-1, 1] inputs."""
    from lrp_imagecaptioning_tpu.config import FlickrConfig

    cap_vgg = build_captioner("adaptiveattention", CFG, VOCAB)
    assert Explainer(cap_vgg, None, FakePP(), method="smoothgrad")._sg_noise == 16.0
    icfg = FlickrConfig(
        img_encoder="inception_v3", layer_name="mixed10",
        img_feature_length=64, img_feature_dim=2048,
        embedding_dim=16, hidden_dim=16, sentence_length=3, drop_rate=0.0,
    )
    cap_inc = build_captioner("adaptiveattention", icfg, VOCAB)
    assert Explainer(cap_inc, None, FakePP(), method="smoothgrad")._sg_noise == 0.125


def test_word_bucketing_matches_full_program(rng):
    """Short captions dispatch to a small bucket; outputs bit-match the
    full-length (word_buckets=()) program on the kept positions."""
    cap, params = _cap("adaptiveattention")
    image = jnp.asarray(rng.normal(size=(8, 8, 3)).astype(np.float32))
    tokens = np.array([5, 7, 2, 0, 0], np.int32)  # 2 real words -> bucket 4

    bucketed = Explainer(cap, params, FakePP(), method="lrp", word_buckets=(4,))
    full = Explainer(cap, params, FakePP(), method="lrp", word_buckets=())
    rb = bucketed.analyze(image, tokens_1based=tokens)
    rf = full.analyze(image, tokens_1based=tokens)

    assert list(bucketed._explain_jit) == [4], "bucket 4 should be the only program"
    assert rb.words == rf.words == ["w5", "w7"]
    for name in ("relevance_maps", "feat_relevance", "attentions",
                 "word_relevances", "betas"):
        a, b = getattr(rb, name), getattr(rf, name)
        assert a.shape == b.shape, name
        np.testing.assert_allclose(a, b, atol=1e-6, err_msg=name)


def test_word_bucketing_batch_uses_longest_caption(rng):
    """analyze_batch buckets by the longest caption in the batch."""
    cap, params = _cap("adaptiveattention")
    images = jnp.asarray(rng.normal(size=(2, 8, 8, 3)).astype(np.float32))
    tokens = np.array([[5, 2, 0, 0, 0],
                       [5, 7, 6, 2, 0]], np.int32)  # 1 and 3 real words

    ex = Explainer(cap, params, FakePP(), method="lrp", word_buckets=(2, 4))
    out = ex.analyze_batch(images, tokens_1based=tokens)
    assert list(ex._explain_batch_jit) == [4]
    assert [e.words for e in out] == [["w5"], ["w5", "w7", "w6"]]
    # per-image path agrees with the batch path
    single = ex.analyze(images[1], tokens_1based=tokens[1])
    np.testing.assert_allclose(out[1].relevance_maps, single.relevance_maps, atol=1e-5)


def test_explainer_warmup_compiles_every_bucket(rng):
    """Explainer.warmup pre-builds each bucketed batch program, so serving
    requests never pay tracing/compilation whatever bucket their captions
    land in (CaptionService.warmup guarantee). With sub_batches=True it also
    compiles every halving-ladder size per bucket (the split-bucket serving
    latency mode's no-recompile contract)."""
    from lrp_imagecaptioning_tpu.explain.engine import Explainer
    from lrp_imagecaptioning_tpu.models.captioner import build_captioner

    cap = build_captioner("adaptiveattention", CFG, 16)
    params = cap.init_params(jax.random.PRNGKey(0))
    ex = Explainer(cap, params, FakePP(), method="lrp", word_buckets=(2, 4))
    images = rng.normal(size=(2, 8, 8, 3)).astype(np.float32)
    ex.warmup(images, sub_batches=True)
    assert set(ex._explain_batch_jit) == {2, 4, CFG.sentence_length}
    # a request landing in any bucket dispatches the precompiled program
    n_compiled = len(ex._explain_batch_jit)
    ex.analyze_batch(images)
    assert len(ex._explain_batch_jit) == n_compiled
    # ladder (2, 1): one jit specialization per sub-batch size per bucket
    ladder = ex._sub_batch_ladder(2)
    for bucket, fn in ex._explain_batch_jit.items():
        if hasattr(fn, "_cache_size"):
            assert fn._cache_size() >= len(ladder), bucket
    # split-bucket dispatch then compiles nothing new
    tokens = np.array([[5, 2, 0, 0, 0],
                       [5, 7, 6, 8, 3]], np.int32)
    out = ex.analyze_many(images, tokens_1based=tokens, batch_size=2,
                          split_buckets=True)
    assert [len(e.words) for e in out] == [1, 5]


def test_analyze_many_groups_by_length_and_matches_per_image(rng):
    """analyze_many dispatches each image on ITS caption-length bucket (not
    the batch max), pads short chunks, and returns results in input order
    bit-matching the per-image path."""
    cap, params = _cap("adaptiveattention")
    images = jnp.asarray(rng.normal(size=(5, 8, 8, 3)).astype(np.float32))
    tokens = np.array([
        [5, 2, 0, 0, 0],      # 1 word  -> bucket 2
        [5, 7, 6, 2, 0],      # 3 words -> bucket 4
        [5, 7, 2, 0, 0],      # 2 words -> bucket 2
        [5, 7, 6, 8, 3],      # 5 words (no EOS) -> full T
        [6, 2, 0, 0, 0],      # 1 word  -> bucket 2
    ], np.int32)

    ex = Explainer(cap, params, FakePP(), method="lrp", word_buckets=(2, 4))
    out = ex.analyze_many(images, tokens_1based=tokens, batch_size=2)
    # one program per bucket actually used — NOT just the batch max
    assert sorted(ex._explain_batch_jit) == [2, 4, CFG.sentence_length]
    assert [len(e.words) for e in out] == [1, 3, 2, 5, 1]
    for b in range(5):
        single = ex.analyze(images[b], tokens_1based=tokens[b])
        assert single.words == out[b].words
        np.testing.assert_allclose(
            single.relevance_maps, out[b].relevance_maps, rtol=1e-4, atol=1e-5)


def test_analyze_many_split_buckets_matches_per_image(rng):
    """split_buckets (the serving latency mode) dispatches per-bucket ladder
    sub-batches; results must still come back in input order, bit-matching
    the per-image path, including ladder padding (group of 3 -> [2, 1+pad])."""
    cap, params = _cap("adaptiveattention")
    images = jnp.asarray(rng.normal(size=(5, 8, 8, 3)).astype(np.float32))
    tokens = np.array([
        [5, 2, 0, 0, 0],      # 1 word  -> bucket 2
        [5, 7, 6, 2, 0],      # 3 words -> bucket 4
        [5, 7, 2, 0, 0],      # 2 words -> bucket 2
        [5, 7, 6, 8, 3],      # 5 words (no EOS) -> full T
        [6, 2, 0, 0, 0],      # 1 word  -> bucket 2
    ], np.int32)

    ex = Explainer(cap, params, FakePP(), method="lrp", word_buckets=(2, 4))
    out = ex.analyze_many(images, tokens_1based=tokens, batch_size=4,
                          split_buckets=True)
    assert [len(e.words) for e in out] == [1, 3, 2, 5, 1]
    for b in range(5):
        single = ex.analyze(images[b], tokens_1based=tokens[b])
        assert single.words == out[b].words
        np.testing.assert_allclose(
            single.relevance_maps, out[b].relevance_maps, rtol=1e-4, atol=1e-5)


def test_sub_batch_ladder_and_cover():
    """The halving ladder and its greedy cover: exact decomposition, padded
    remainder, and mesh-divisibility rounding."""
    cap = build_captioner("adaptiveattention", CFG, VOCAB)
    ex = Explainer(cap, None, FakePP(), method="lrp")
    assert ex._sub_batch_ladder(8) == (8, 4, 2, 1)
    assert ex._sub_batch_ladder(56) == (56, 28, 14, 7, 4, 2, 1)
    ladder = ex._sub_batch_ladder(8)
    assert ex._cover_with_ladder(8, ladder) == [8]
    assert ex._cover_with_ladder(7, ladder) == [4, 2, 1]
    assert ex._cover_with_ladder(5, ladder) == [4, 1]
    assert ex._cover_with_ladder(3, ladder) == [2, 1]
    assert ex._cover_with_ladder(1, ladder) == [1]


def test_analyze_many_decodes_when_tokens_absent(rng):
    """Without given tokens analyze_many beam-decodes in chunks first and its
    captions match analyze_batch's."""
    cap, params = _cap("adaptiveattention")
    images = jnp.asarray(rng.normal(size=(3, 8, 8, 3)).astype(np.float32))
    ex = Explainer(cap, params, FakePP(), method="lrp", beam_size=2)
    many = ex.analyze_many(images, batch_size=2)
    batch = ex.analyze_batch(images)
    assert [e.caption for e in many] == [e.caption for e in batch]


def test_analyze_many_gridtd(rng):
    """analyze_many is decoder-agnostic: gridTD through the same sorted
    dispatch, padded final chunk (batch_size > n) included."""
    cap, params = _cap("gridTD")
    images = jnp.asarray(rng.normal(size=(3, 8, 8, 3)).astype(np.float32))
    tokens = np.array([[5, 2, 0, 0, 0],
                       [5, 7, 6, 2, 0],
                       [4, 2, 0, 0, 0]], np.int32)
    ex = Explainer(cap, params, FakePP(), method="lrp", word_buckets=(2, 4))
    out = ex.analyze_many(images, tokens_1based=tokens, batch_size=4)
    assert [len(e.words) for e in out] == [1, 3, 1]
    single = ex.analyze(images[1], tokens_1based=tokens[1])
    np.testing.assert_allclose(
        out[1].relevance_maps, single.relevance_maps, rtol=1e-4, atol=1e-5)
