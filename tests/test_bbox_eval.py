"""Bbox correctness evaluation integration: synthetic annotations through the
EvaluationBbox driver, word-category matching, and aggregation."""

import numpy as np
import jax
import pytest

from lrp_imagecaptioning_tpu.config import FlickrConfig
from lrp_imagecaptioning_tpu.evalx.bbox import (
    EvaluationBbox,
    analyze_results,
    match_words_to_categories,
    process_heatmap,
)
from lrp_imagecaptioning_tpu.explain.engine import Explainer
from lrp_imagecaptioning_tpu.models.captioner import build_captioner

CFG = FlickrConfig(embedding_dim=16, hidden_dim=16, layer_name="block2_conv1",
                   img_feature_length=16, img_feature_dim=128,
                   image_size=(8, 8), sentence_length=5, drop_rate=0.0)
VOCAB = 16


_CAP_CACHE = {}


def _cap(model_type="adaptiveattention"):
    """Module-level memo of (captioner, params): init is pure eager dispatch
    re-paid by every test otherwise. Params are immutable jax arrays."""
    if model_type not in _CAP_CACHE:
        cap = build_captioner(model_type, CFG, VOCAB)
        _CAP_CACHE[model_type] = (cap, cap.init_params(jax.random.PRNGKey(0)))
    return _CAP_CACHE[model_type]


class PP:
    SOS_TOKEN = "szeros"
    EOS_TOKEN = "zeros"
    SOS_TOKEN_LABEL_ENCODED = 1
    EOS_TOKEN_LABEL_ENCODED = 2
    word_of = {1: "szeros", 2: "zeros", 3: "man", 4: "dog", 5: "a",
               **{i: f"w{i}" for i in range(6, 17)}}


def test_match_words_to_categories():
    cats = {"person": "1", "dog": "18"}
    words = ["a", "man", "with", "his", "dog"]
    wc, keys = match_words_to_categories(words, cats)
    assert wc == {"1": {(1, "man")}, "18": {(4, "dog")}}
    assert keys == {"1": "person", "18": "dog"}


def test_match_filters_articles():
    wc, _ = match_words_to_categories(["a", "the"], {"a thing": "9"})
    assert wc == {}


def test_process_heatmap_negation_and_projection(rng):
    m = rng.normal(size=(8, 8, 3)).astype(np.float32)
    hp = process_heatmap(m, negate=True)
    assert hp.shape == (8, 8)
    assert hp.min() >= 0.0 and hp.max() <= 1.0


def test_evaluation_bbox_end_to_end(rng):
    cap, params = _cap("adaptiveattention")
    ex = Explainer(cap, params, PP(), method="lrp", beam_size=2)
    category_dict = {
        "img0.jpg": {
            # every caption word maps to 'person' via the synonym table if it
            # is 'man'; include a catch-all category name matching any wN
            "categories": {"person": "1", **{f"w{i}": str(i) for i in range(3, 17)},
                           "man": "77", "dog": "78", "a": "79"},
            "bbox": {str(i): [[0, 0, 4, 4]] for i in list(range(3, 17)) + [1, 77, 78, 79]},
            "shape": (8, 8),
            "resize_ratio": (1.0, 1.0),
        }
    }
    ev = EvaluationBbox(category_dict, ex, negate=True)
    image = rng.normal(size=(8, 8, 3)).astype(np.float32)
    lrp_s, att_s, keys = ev.evaluate(image, "img0.jpg")
    # scores dict per matched category with all 10 thresholds in [0, 1]
    for scores in (lrp_s, att_s):
        for cat_scores in scores.values():
            assert len(cat_scores) == 10
            for v in cat_scores.values():
                assert 0.0 <= v <= 1.0

    results = {"img0.jpg": {
        "lrp": {k: v for k, v in lrp_s.items()},
        "attention": {k: v for k, v in att_s.items()},
        "category_key": keys,
    }}
    agg = analyze_results(results)
    assert set(agg) == {"lrp", "attention"}
    assert "0.0" in agg["lrp"] and "mean" in agg["lrp"]["0.0"]


def test_show_bbox(tmp_path, rng):
    from PIL import Image

    from lrp_imagecaptioning_tpu.evalx.bbox import show_bbox

    arr = (rng.random((300, 400, 3)) * 255).astype(np.uint8)
    p = str(tmp_path / "img.png")
    Image.fromarray(arr).save(p)
    out = str(tmp_path / "boxed.png")
    img = show_bbox(p, [[10, 10, 100, 80]], "person", (224 / 400, 224 / 300), out_path=out)
    assert img.size == (224, 224)
    import os

    assert os.path.getsize(out) > 0
