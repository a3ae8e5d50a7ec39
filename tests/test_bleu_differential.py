"""Differential oracle for evalx.metrics.BLEU against NLTK.

VERDICT r2 item 4: the golden fixtures (test_metrics_golden.py) are
hand-derived from pycocoevalcap's algorithms — careful, but a symmetric
transcription error in derivation and implementation would pass. NLTK's
``corpus_bleu`` is an INDEPENDENT implementation of the same corpus-BLEU
definition that pycocoevalcap (vendored next to reference
models/metrics.py:33-46) uses:

* clipped n-gram counts aggregated corpus-wide,
* 'closest' effective reference length with ties broken toward the
  shorter reference (nltk ``closest_ref_length`` == pycocoevalcap
  ``_single_reflen(option='closest')``),
* brevity penalty exp(1 - reflen/hyplen) when hyplen <= reflen,
* Bleu_n = BP * geometric mean of p_1..p_n.

The ONLY deviations are pycocoevalcap's smoothing constants
(p = (correct + 1e-15)/(total + 1e-9) vs nltk's unsmoothed Fractions) and
its `tiny` in the BP denominator — both vanish at 1e-6 tolerance whenever
every n-gram level has matches, and reduce to |ours| < 1e-6 vs nltk's exact
0 when one does not. So agreement is asserted with atol=1e-6 on hundreds of
randomized multi-reference corpora.

Tokenization is deliberately held fixed: both scorers receive the SAME
token lists (ours via the internal ``_pairs`` PTB path over
punctuation-free lowercase words, where PTB tokenization is whitespace
splitting). The differential target is the scorer arithmetic; PTB
tokenization has its own tests (test_metrics.py / test_metrics_golden.py).
"""

from __future__ import annotations

import numpy as np
import pytest

nltk = pytest.importorskip("nltk")
from nltk.translate.bleu_score import corpus_bleu  # noqa: E402

from lrp_imagecaptioning_tpu.evalx import metrics as M  # noqa: E402

VOCAB = ["cat", "dog", "sits", "runs", "on", "mat", "red", "big", "the", "a"]


def _random_corpus(rng, max_segments=8):
    """Random multi-reference corpus: hyps are mutated copies of a reference
    so n-gram overlap at every order is common (the interesting regime)."""
    n_seg = int(rng.integers(1, max_segments + 1))
    id_to_pred, id_to_refs = {}, {}
    for k in range(n_seg):
        n_refs = int(rng.integers(1, 4))
        refs = []
        for _ in range(n_refs):
            ln = int(rng.integers(4, 15))
            refs.append([VOCAB[i] for i in rng.integers(0, len(VOCAB), ln)])
        base = list(refs[int(rng.integers(0, n_refs))])
        # mutate: substitute a few positions, maybe truncate/extend
        for _ in range(int(rng.integers(0, 4))):
            base[int(rng.integers(0, len(base)))] = VOCAB[int(rng.integers(0, len(VOCAB)))]
        if rng.random() < 0.3 and len(base) > 4:
            base = base[: int(rng.integers(4, len(base) + 1))]
        elif rng.random() < 0.3:
            base = base + [VOCAB[i] for i in rng.integers(0, len(VOCAB), int(rng.integers(1, 4)))]
        id_to_pred[k] = [{"caption": " ".join(base)}]
        id_to_refs[k] = [{"caption": " ".join(r)} for r in refs]
    return id_to_pred, id_to_refs


def _nltk_scores(id_to_pred, id_to_refs):
    hyps, refs = M._pairs(id_to_pred, id_to_refs)
    out = {}
    for n in range(1, 5):
        w = (1.0 / n,) * n
        with np.errstate(all="ignore"):
            import warnings

            with warnings.catch_warnings():
                warnings.simplefilter("ignore")  # nltk warns on 0-count orders
                out[f"Bleu_{n}"] = corpus_bleu(refs, hyps, weights=w)
    return out


def test_bleu_matches_nltk_on_random_corpora():
    rng = np.random.default_rng(12345)
    scorer = M.BLEU(4)
    n_corpora = 150
    checked = 0
    for _ in range(n_corpora):
        id_to_pred, id_to_refs = _random_corpus(rng)
        ours = scorer.calculate(id_to_pred, id_to_refs)
        theirs = _nltk_scores(id_to_pred, id_to_refs)
        for key in ("Bleu_1", "Bleu_2", "Bleu_3", "Bleu_4"):
            # when an n-gram order has ZERO corpus-wide matches the two
            # smoothing definitions legitimately diverge (ours: the 1e-15
            # numerator surfaces as tiny^(1/n) ~ 3e-6 at n=3; nltk: ~0) —
            # both are "no signal". Outside that regime: 1e-6 agreement.
            if ours[key] < 1e-4 and theirs[key] < 1e-4:
                checked += 1
                continue
            assert ours[key] == pytest.approx(theirs[key], abs=1e-6), (
                key, ours, theirs, id_to_pred, id_to_refs)
            checked += 1
    assert checked == n_corpora * 4


def test_bleu_matches_nltk_identical_and_disjoint():
    scorer = M.BLEU(4)
    # identical hyp/ref -> all Bleu_n == 1 in both implementations
    pred = {0: [{"caption": "the cat sits on the mat"}]}
    refs = {0: [{"caption": "the cat sits on the mat"}]}
    ours = scorer.calculate(pred, refs)
    theirs = _nltk_scores(pred, refs)
    for key in ours:
        assert ours[key] == pytest.approx(theirs[key], abs=1e-9) == pytest.approx(1.0)
    # fully disjoint vocab -> 0 (nltk exact 0; ours smoothing-tiny)
    pred = {0: [{"caption": "red big dog runs"}]}
    refs = {0: [{"caption": "the cat sits on mat"}]}
    ours = scorer.calculate(pred, refs)
    theirs = _nltk_scores(pred, refs)
    for key in ours:
        assert ours[key] == pytest.approx(theirs[key], abs=1e-6)


def test_bleu_closest_ref_length_tiebreak_matches_nltk():
    """One hyp of length 5 with refs of lengths 4 and 6 (both distance 1):
    both implementations must pick the SHORTER (4), making BP = 1."""
    scorer = M.BLEU(4)
    pred = {0: [{"caption": "the cat sits on mat"}]}
    refs = {0: [{"caption": "the cat sits on"}, {"caption": "the cat sits on the mat"}]}
    ours = scorer.calculate(pred, refs)
    theirs = _nltk_scores(pred, refs)
    for key in ours:
        assert ours[key] == pytest.approx(theirs[key], abs=1e-6)
    # hyp_len 5 > closest ref_len 4 -> no brevity penalty in either scorer
    assert ours["Bleu_1"] == pytest.approx(1.0, abs=1e-6)
