"""Caption-metric sanity tests (perfect-match and known-value cases)."""

import math

import pytest

from lrp_imagecaptioning_tpu.evalx.metrics import BLEU, CIDEr, METEOR, ROUGE
from lrp_imagecaptioning_tpu.evalx.words import frequent_object_map


def _wrap(pred, refs):
    id_to_pred = {"img1": [{"caption": pred}]}
    id_to_refs = {"img1": [{"caption": r} for r in refs]}
    return id_to_pred, id_to_refs


def test_bleu_perfect_match():
    p, r = _wrap("a dog runs fast", ["a dog runs fast"])
    out = BLEU(4).calculate(p, r)
    for n in range(1, 5):
        assert abs(out[f"Bleu_{n}"] - 1.0) < 1e-6


def test_bleu_no_overlap():
    p, r = _wrap("x y z w", ["a b c d"])
    out = BLEU(4).calculate(p, r)
    assert out["Bleu_1"] < 1e-3


def test_bleu_partial():
    p, r = _wrap("a dog", ["a dog runs"])
    out = BLEU(1).calculate(p, r)
    # brevity penalty exp(1 - 3/2), precision 1
    assert abs(out["Bleu_1"] - math.exp(1 - 3 / 2)) < 1e-6


def test_rouge_perfect_and_partial():
    p, r = _wrap("a dog runs", ["a dog runs"])
    assert abs(ROUGE().calculate(p, r)["ROUGE_L"] - 1.0) < 1e-9
    p, r = _wrap("a cat", ["a dog"])
    out = ROUGE().calculate(p, r)["ROUGE_L"]
    assert 0 < out < 1  # lcs=1 of 2


def test_meteor_perfect():
    p, r = _wrap("a dog runs", ["a dog runs"])
    out = METEOR().calculate(p, r)["METEOR"]
    # single chunk penalty: 1 - 0.5*(1/3)^3
    assert abs(out - (1 - 0.5 * (1 / 3) ** 3)) < 1e-6


def test_cider_identical_corpus():
    preds = {f"i{k}": [{"caption": f"a dog runs fast {k}"}] for k in range(4)}
    refs = {f"i{k}": [{"caption": f"a dog runs fast {k}"}] for k in range(4)}
    out = CIDEr().calculate(preds, refs)["CIDEr"]
    assert out > 5.0  # perfect match scores near 10 (x10 scaling)


def test_frequent_object_map():
    preds = {"a": "a man with a dog", "b": "a woman on a street"}
    refs = {
        "a": ["the man walks the dog", "a man and his dog"],
        "b": ["a man crosses the street", "the street is busy"],
    }
    cats = ["man", "dog", "street"]
    # man: in refs of a and b (count 2), predicted only in a -> 0.5
    # dog: refs a only, predicted in a -> 1.0 ; street: refs b, predicted b -> 1.0
    v = frequent_object_map(preds, refs, cats)
    assert abs(v - (0.5 + 1.0 + 1.0) / 2 * 100) < 1e-9


def test_bbox_correctness():
    import numpy as np

    from lrp_imagecaptioning_tpu.evalx.bbox import correctness

    rel = np.zeros((10, 10))
    rel[2:4, 2:4] = 1.0   # mass inside box
    rel[8, 8] = 1.0       # mass outside
    box = [2, 2, 4, 4]    # xmin ymin xmax ymax
    assert abs(correctness(box, rel, 0.0) - 4 / 5) < 1e-9
    assert correctness(box, np.zeros((10, 10)), 0.0) == 0.0


def test_word_stats_pickle_roundtrip(tmp_path):
    """dump_word_stats writes the reference's save_dict pickle layout
    (exaimin_word.py:413-414) and load_word_stats round-trips it."""
    from lrp_imagecaptioning_tpu.evalx.words import dump_word_stats, load_word_stats

    stats = {
        "img1.jpg": {
            "predict_caption": "a man with a dog",
            "true_captions": ["a man walks a dog", "person and dog"],
            "beta": [("man", 0.4), ("dog", 0.1)],
            "lrp_mean": [("man", 0.02)],
            "attention_mean": [("man", 0.5)],
        }
    }
    p = str(tmp_path / "out" / "flickr30K_beta_analyze_category_top9.pkl")
    dump_word_stats(stats, p)
    assert load_word_stats(p) == stats


def test_token_cache_eviction_keeps_current_lines(monkeypatch):
    """Cache eviction must not clear entries the CURRENT call still reads —
    a mixed cached+new batch at the cache cap used to KeyError on its cached
    lines (every metric call crashed once the cache filled)."""
    from lrp_imagecaptioning_tpu.evalx import ptb

    monkeypatch.setattr(ptb, "_token_cache", {})
    monkeypatch.setattr(ptb, "_CACHE_MAX", 4)
    old = ["a dog runs", "a cat sits"]
    assert ptb.tokenize_lines(old) == [["a", "dog", "runs"], ["a", "cat", "sits"]]
    mixed = old + [f"new line {i}" for i in range(5)]  # overflow the cap
    toks = ptb.tokenize_lines(mixed)
    assert toks[0] == ["a", "dog", "runs"] and toks[1] == ["a", "cat", "sits"]
    assert toks[2] == ["new", "line", "0"]


def test_lite_tokenizer_tracks_nltk_on_caption_text():
    """The dependency-free fallback (_lite_tokenize) matches the nltk
    Treebank path on ordinary caption sentences, so metrics stay functional
    (and close) without nltk installed."""
    from lrp_imagecaptioning_tpu.evalx import ptb

    nltk = pytest.importorskip("nltk")  # noqa: F841 comparison needs it
    for s in [
        "A man riding a horse on the beach.",
        "Two dogs don't chase the ball (quickly).",
        "The player's bat hits a ball, then he runs.",
    ]:
        lite = [t for t in (x.lower() for x in ptb._lite_tokenize(s))
                if t not in ptb.PUNCTUATIONS]
        assert lite == ptb._python_tokenize_line(s)


def test_tokenize_lines_caches_and_dedupes(monkeypatch):
    """tokenize_lines tokenizes each distinct line once across calls."""
    from lrp_imagecaptioning_tpu.evalx import ptb

    calls = []
    real = ptb._python_tokenize_line

    def counting(line):
        calls.append(line)
        return real(line)

    monkeypatch.setattr(ptb, "_python_tokenize_line", counting)
    ptb._token_cache.clear()
    try:
        out = ptb.tokenize_lines(["a cat sits", "a dog runs", "a cat sits"])
        assert out[0] == out[2] == ["a", "cat", "sits"]
        assert calls == ["a cat sits", "a dog runs"]
        ptb.tokenize_lines(["a cat sits"])  # second call: pure cache hit
        assert len(calls) == 2
    finally:
        ptb._token_cache.clear()
