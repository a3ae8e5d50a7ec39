"""Golden differential fixtures for the caption scorers.

Expected values are hand-derived from pycocoevalcap's published algorithms
(bleu_scorer.py / cider_scorer.py / rouge.py) — the exact semantics the
reference uses via models/metrics.py:22-89 — worked out symbolically in the
comments below, not produced by running this repo's own code. Any semantic
drift from the canonical scorers breaks these at 6+ decimals.
"""

import math

import pytest

from lrp_imagecaptioning_tpu.evalx.metrics import BLEU, CIDEr, METEOR, ROUGE
from lrp_imagecaptioning_tpu.evalx.ptb import PTBTokenizer, ptb_tokenize


def _corpus(pairs):
    """pairs: list of (hyp, [refs]) -> (id_to_pred, id_to_refs)."""
    preds, refs = {}, {}
    for i, (h, rs) in enumerate(pairs):
        preds[f"img{i}"] = [{"caption": h}]
        refs[f"img{i}"] = [{"caption": r} for r in rs]
    return preds, refs


# ---------- PTB tokenization (protocol of pycocoevalcap PTBTokenizer) ----------


def test_ptb_contractions_possessives_punct():
    # Stanford PTB: "man's" -> man 's ; "doesn't" -> does n't ; parens ->
    # -LRB-/-RRB-. pycocoevalcap lowercases INSIDE the jar (-lowerCase) and
    # filters PUNCTUATIONS after, so "-lrb-"/"-rrb-" survive the filter — a
    # known artifact of pycocoevalcap-tokenized corpora that we reproduce.
    toks = ptb_tokenize("A man's dog doesn't run (fast), isn't it?")
    assert toks == ["a", "man", "'s", "dog", "does", "n't", "run",
                    "-lrb-", "fast", "-rrb-", "is", "n't", "it"]


def test_ptb_hyphens_and_ellipsis_dropped():
    # "-", "--", "..." are all in the PUNCTUATIONS drop list
    toks = ptb_tokenize("well -- a red ... fire-truck")
    assert "--" not in toks and "..." not in toks
    # PTB keeps intra-word hyphens as one token
    assert "fire-truck" in toks


def test_ptb_tokenizer_dict_interface():
    tok = PTBTokenizer(jar=None)
    out = tok.tokenize({"a": [{"caption": "The Cat!"}, {"caption": "A dog's toy."}]})
    assert out == {"a": ["the cat", "a dog 's toy"]}


# ---------- BLEU (pycocoevalcap bleu_scorer.py, option='closest') ----------


def test_bleu_golden_short_hypothesis():
    # hyp "the cat" (2 toks), ref "the cat sat" (3 toks).
    # p1 = 2/2, p2 = 1/1; p3 = tiny/small = 1e-6 (no trigram slots);
    # p4 = 1e-6. BP = exp(1 - 3/2).
    # Bleu_1 = BP * p1 = e^-.5
    # Bleu_2 = BP * (p1*p2)^(1/2) = e^-.5
    # Bleu_3 = BP * (p1*p2*p3)^(1/3) = e^-.5 * 1e-2
    # Bleu_4 = BP * (1e-12)^(1/4) = e^-.5 * 1e-3
    p, r = _corpus([("the cat", ["the cat sat"])])
    out = BLEU(4).calculate(p, r)
    bp = math.exp(-0.5)
    assert out["Bleu_1"] == pytest.approx(bp, abs=1e-8)
    assert out["Bleu_2"] == pytest.approx(bp, abs=1e-8)
    assert out["Bleu_3"] == pytest.approx(bp * 1e-2, rel=1e-6)
    assert out["Bleu_4"] == pytest.approx(bp * 1e-3, rel=1e-6)


def test_bleu_golden_closest_ref_tie_breaks_shorter():
    # hyp has 4 tokens; refs of lengths 3 and 5 tie on |len-4| -> pycocoevalcap
    # picks the SHORTER (min over (diff, len) tuples), so reflen=3 < testlen=4
    # -> BP = 1 exactly.
    p, r = _corpus([("a b c d", ["a b c", "a b c d e"])])
    out = BLEU(4).calculate(p, r)
    # p1 = 4/4, p2: hyp bigrams ab,bc,cd all in ref2 -> 3/3, p3: abc,bcd both in
    # ref2 -> 2/2, p4: abcd in ref2 -> 1/1 => all Bleu_n == 1 (BP=1).
    for n in range(1, 5):
        assert out[f"Bleu_{n}"] == pytest.approx(1.0, abs=1e-6)


def test_bleu_golden_corpus_level_pooling():
    # Corpus-level (NOT mean of sentence scores): counts pool over images.
    # img0: hyp "a b", ref "a b"   -> correct1 2, guess1 2, correct2 1, guess2 1
    # img1: hyp "c d", ref "c x"   -> correct1 1, guess1 2, correct2 0, guess2 1
    # testlen 4, reflen 4 -> BP = 1 (ratio ~= 1 with tiny/small).
    # Pooled: p1 = 3/4, p2 = 1/2 -> Bleu_1 = .75, Bleu_2 = sqrt(.75*.5)
    p, r = _corpus([("a b", ["a b"]), ("c d", ["c x"])])
    out = BLEU(2).calculate(p, r)
    assert out["Bleu_1"] == pytest.approx(0.75, abs=1e-8)
    assert out["Bleu_2"] == pytest.approx(math.sqrt(0.75 * 0.5), rel=1e-8)


# ---------- ROUGE-L (pycocoevalcap rouge.py: independent max prec / max rec) ----------


def test_rouge_golden_independent_max_semantics():
    # hyp "a b c d"; ref1 "a b" (prec .5, rec 1.0); ref2 "a b c d e f g h"
    # (prec 1.0, rec .5). pycocoevalcap maxes prec and rec INDEPENDENTLY:
    # prec_max = 1, rec_max = 1 -> F = 1.0.  (Max-F-per-ref would give 0.7093.)
    p, r = _corpus([("a b c d", ["a b", "a b c d e f g h"])])
    out = ROUGE().calculate(p, r)
    assert out["ROUGE_L"] == pytest.approx(1.0, abs=1e-12)


def test_rouge_golden_single_ref_value():
    # hyp "a b c d e", ref "a c e": lcs=3, prec 3/5, rec 1.
    # F = (1+1.44)*.6*1 / (1 + 1.44*.6) = 1.464/1.864
    p, r = _corpus([("a b c d e", ["a c e"])])
    out = ROUGE().calculate(p, r)
    assert out["ROUGE_L"] == pytest.approx(1.464 / 1.864, rel=1e-9)


# ---------- CIDEr-D (pycocoevalcap cider_scorer.py) ----------


def test_cider_golden_two_image_perfect():
    # img0: hyp=ref="a b"; img1: hyp=ref="c d". ndocs=2; every ngram has df 1
    # -> idf = ln2. Per image: sim = [1, 1, 0, 0] (no 3/4-grams), delta=0
    # -> score = mean([1,1,0,0]) * 10 = 5.0 for both images.
    p, r = _corpus([("a b", ["a b"]), ("c d", ["c d"])])
    out = CIDEr().calculate(p, r)
    assert out["CIDEr"] == pytest.approx(5.0, rel=1e-9)


def test_cider_golden_partial_overlap():
    # img0: hyp "a b c", ref "a b d"; img1: hyp "e", ref "e". ndocs=2.
    # All df=1 -> idf=ln2 for every ngram (including hyp-only ones: df=0 ->
    # log(max(df,1))=0).
    # img0 n=1: common {a,b}: sim = 2*ln2^2/(sqrt3*ln2 * sqrt3*ln2) = 2/3
    #      n=2: common {"a b"}: sim = ln2^2/(sqrt2*ln2)^2 = 1/2
    #      n=3: no common -> 0; n=4: empty vec -> 0. delta=0.
    # score0 = (2/3 + 1/2)/4 * 10 = 35/12
    # img1: sim = [1,0,0,0] -> score1 = 10/4 = 2.5
    # CIDEr = (35/12 + 2.5)/2
    p, r = _corpus([("a b c", ["a b d"]), ("e", ["e"])])
    out = CIDEr().calculate(p, r)
    expected = (35.0 / 12.0 + 2.5) / 2.0
    assert out["CIDEr"] == pytest.approx(expected, rel=1e-9)


def test_cider_golden_length_gaussian():
    # img0: hyp "a b" vs ref "a b c d": delta = 2-4 = -2, gaussian
    # exp(-4/72). ndocs=2 (img1 is disjoint filler "x"/"x").
    # img0 n=1: hyp {a,b} w=ln2, norm sqrt2*ln2; ref {a,b,c,d} w=ln2, norm
    #   2*ln2; common a,b -> num = 2*ln2^2; sim = 2/(sqrt2*2) = 1/sqrt2
    # n=2: hyp {"a b"} ref {"a b","b c","c d"}: num = ln2^2,
    #   sim = ln2^2/(ln2 * sqrt3*ln2) = 1/sqrt3
    # n=3: hyp none -> 0 (norm 0); n=4: 0.
    # score0 = (exp(-4/72)*(1/sqrt2 + 1/sqrt3))/4*10
    # img1: "x" vs "x": sim [1,0,0,0], delta 0 -> 2.5
    p, r = _corpus([("a b", ["a b c d"]), ("x", ["x"])])
    out = CIDEr().calculate(p, r)
    g = math.exp(-4.0 / 72.0)
    score0 = g * (1 / math.sqrt(2) + 1 / math.sqrt(3)) / 4.0 * 10.0
    assert out["CIDEr"] == pytest.approx((score0 + 2.5) / 2.0, rel=1e-9)


# ---------- METEOR python-path pinned values ----------


def test_meteor_python_path_exact_match():
    # matches=3, chunks=1 -> frag=1/3, penalty=.5*(1/3)^3; P=R=1 -> fmean=1.
    p, r = _corpus([("the cat sat", ["the cat sat"])])
    out = METEOR().calculate(p, r)
    assert out["METEOR"] == pytest.approx(1 - 0.5 * (1 / 3) ** 3, abs=1e-9)


def test_meteor_stem_stage_matches():
    # "running" matches "runs" only via the Porter-stem stage (both -> "run").
    p, r = _corpus([("dogs running", ["dogs runs"])])
    out = METEOR().calculate(p, r)
    # matches=2 contiguous in both -> chunks=1, frag=.5, pen=.5*.125=.0625
    assert out["METEOR"] == pytest.approx(1 - 0.5 * 0.5 ** 3, abs=1e-9)


# ---------- tokenization flows through the scorers ----------


def test_scorers_apply_ptb_tokenization():
    # "Don't" and "don't" both tokenize to [do, n't]; trailing '.' dropped.
    p, r = _corpus([("Don't run.", ["don't run"])])
    out = BLEU(2).calculate(p, r)
    assert out["Bleu_1"] == pytest.approx(1.0, abs=1e-6)
    assert out["Bleu_2"] == pytest.approx(1.0, abs=1e-6)
    assert ROUGE().calculate(p, r)["ROUGE_L"] == pytest.approx(1.0, abs=1e-12)
