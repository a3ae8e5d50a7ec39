"""Differential oracles for evalx.metrics ROUGE-L and CIDEr-D.

Extends the NLTK BLEU differential (test_bleu_differential.py, VERDICT r2
item 4) to the remaining arithmetic scorers:

* **ROUGE-L** — Google's ``rouge_score`` package is an INDEPENDENT
  implementation of LCS-based ROUGE (different LCS code, different
  tokenizer). pycocoevalcap's variant (vendored next to reference
  models/metrics.py:59-63) takes max precision and max recall
  INDEPENDENTLY over the reference set and combines them with a
  beta=1.2 F-measure; ``rouge_score`` reports per-(hyp, ref) precision
  and recall, so we rebuild exactly that aggregation from its per-pair
  numbers. The LCS length, the normalizations, and the tokenizer are
  all foreign code — only the two-line max/F composition is shared
  arithmetic, and that composition is covered by the hand-derived
  goldens (test_metrics_golden.py::test_rouge_independent_max).

* **CIDEr-D** — no independent library ships in this image, so the
  oracle is a from-the-paper re-derivation (Vedantam et al. 2015 eq. 1-3
  plus the CIDEr-D modifications: count clipping and the length
  gaussian), written in a deliberately different style: numpy vectors
  over the sorted union of n-grams instead of dict walks, n-gram lists
  built by slicing instead of Counter construction. A transcription slip
  in either implementation (a swapped min argument, a wrong norm, a
  dropped max(·,0)) breaks the agreement; only an error made
  identically in two structurally different derivations survives.

Tokenization is held fixed as in the BLEU differential: lowercase
alphabetic words joined by single spaces, which every tokenizer involved
(our PTB path, rouge_score's regex tokenizer) splits identically. The
differential target is scorer arithmetic, not tokenization.
"""

from __future__ import annotations

import math

import numpy as np
import pytest

rouge_score = pytest.importorskip("rouge_score")
from rouge_score import rouge_scorer  # noqa: E402

from lrp_imagecaptioning_tpu.evalx import metrics as M  # noqa: E402

VOCAB = ["cat", "dog", "sits", "runs", "on", "mat", "red", "big", "the", "a"]


def _random_corpus(rng, max_segments=8):
    """Same generator shape as the BLEU differential: hyps are mutated
    copies of one reference so n-gram/LCS overlap is common."""
    n_seg = int(rng.integers(1, max_segments + 1))
    id_to_pred, id_to_refs = {}, {}
    for k in range(n_seg):
        n_refs = int(rng.integers(1, 4))
        refs = []
        for _ in range(n_refs):
            ln = int(rng.integers(4, 15))
            refs.append([VOCAB[i] for i in rng.integers(0, len(VOCAB), ln)])
        base = list(refs[int(rng.integers(0, n_refs))])
        for _ in range(int(rng.integers(0, 4))):
            base[int(rng.integers(0, len(base)))] = VOCAB[int(rng.integers(0, len(VOCAB)))]
        if rng.random() < 0.3 and len(base) > 4:
            base = base[: int(rng.integers(4, len(base) + 1))]
        elif rng.random() < 0.3:
            base = base + [VOCAB[i] for i in rng.integers(0, len(VOCAB), int(rng.integers(1, 4)))]
        id_to_pred[k] = [{"caption": " ".join(base)}]
        id_to_refs[k] = [{"caption": " ".join(r)} for r in refs]
    return id_to_pred, id_to_refs


# ---------------------------------------------------------------------------
# ROUGE-L vs rouge_score
# ---------------------------------------------------------------------------

_RS = rouge_scorer.RougeScorer(["rougeL"], use_stemmer=False)


def _rouge_oracle(id_to_pred, id_to_refs):
    """pycocoevalcap rouge.py::calc_score semantics rebuilt on top of
    rouge_score's foreign LCS: independent max over per-ref precision and
    recall, then the beta=1.2 F-measure."""
    beta2 = 1.2 ** 2
    scores = []
    for k in sorted(id_to_pred):
        hyp = id_to_pred[k][0]["caption"]
        pmax = rmax = 0.0
        for ref in id_to_refs[k]:
            s = _RS.score(target=ref["caption"], prediction=hyp)["rougeL"]
            pmax = max(pmax, s.precision)
            rmax = max(rmax, s.recall)
        if pmax > 0 and rmax > 0:
            scores.append((1 + beta2) * pmax * rmax / (rmax + beta2 * pmax))
        else:
            scores.append(0.0)
    return sum(scores) / len(scores)


def test_rouge_matches_rouge_score_on_random_corpora():
    rng = np.random.default_rng(20260820)
    scorer = M.ROUGE()
    for _ in range(150):
        id_to_pred, id_to_refs = _random_corpus(rng)
        ours = scorer.calculate(id_to_pred, id_to_refs)["ROUGE_L"]
        oracle = _rouge_oracle(id_to_pred, id_to_refs)
        assert ours == pytest.approx(oracle, abs=1e-9), (id_to_pred, id_to_refs)


def test_rouge_matches_rouge_score_edges():
    scorer = M.ROUGE()
    # identical -> F = 1 in both
    pred = {0: [{"caption": "the cat sits on the mat"}]}
    refs = {0: [{"caption": "the cat sits on the mat"}]}
    assert scorer.calculate(pred, refs)["ROUGE_L"] == pytest.approx(
        _rouge_oracle(pred, refs), abs=1e-12)
    # disjoint -> 0 in both
    pred = {0: [{"caption": "red big dog"}]}
    refs = {0: [{"caption": "the cat sits"}]}
    assert scorer.calculate(pred, refs)["ROUGE_L"] == 0.0
    assert _rouge_oracle(pred, refs) == 0.0
    # the regime where independent-max matters: best-precision and
    # best-recall references differ
    pred = {0: [{"caption": "a b c d"}]}
    refs = {0: [{"caption": "a b c d e f g h"}, {"caption": "a b x y"}]}
    # oracle must agree even though no single reference attains both maxima
    ours = M.ROUGE().calculate(pred, refs)["ROUGE_L"]
    assert ours == pytest.approx(_rouge_oracle(pred, refs), abs=1e-12)


# ---------------------------------------------------------------------------
# CIDEr-D vs a from-the-paper numpy re-derivation
# ---------------------------------------------------------------------------


def _grams(tokens, n):
    return [tuple(tokens[i : i + n]) for i in range(len(tokens) - n + 1)]


def _cider_oracle(id_to_pred, id_to_refs, n_max=4, sigma=6.0):
    """CIDEr-D from the definition, vectorized over the n-gram union.

    For each order n: g_k(s) = tf_k(s) * log(N / max(df_k, 1)) computed as
    numpy vectors over the sorted union of hyp/ref n-grams; similarity is
    the clipped dot product min(g(hyp), g(ref)) . g(ref) over norms, scaled
    by the length gaussian; averaged over refs and orders, x10.
    """
    keys = sorted(id_to_pred)
    hyps = {k: id_to_pred[k][0]["caption"].split() for k in keys}
    refs = {k: [r["caption"].split() for r in id_to_refs[k]] for k in keys}
    N = len(keys)
    df = [{} for _ in range(n_max)]
    for k in keys:
        for n in range(1, n_max + 1):
            for g in {g for r in refs[k] for g in _grams(r, n)}:
                df[n - 1][g] = df[n - 1].get(g, 0) + 1

    def weight_vec(tokens, n, union):
        tf = {g: 0 for g in union}
        for g in _grams(tokens, n):
            if g in tf:
                tf[g] += 1
        idf = np.array(
            [math.log(N) - math.log(max(df[n - 1].get(g, 0), 1)) for g in union])
        return np.array([tf[g] for g in union], dtype=float) * idf

    def full_norm(tokens, n):
        # norm over ALL of the sentence's n-grams, not just the union slice
        own = sorted(set(_grams(tokens, n)))
        return float(np.linalg.norm(weight_vec(tokens, n, own)))

    per_image = []
    for k in keys:
        h = hyps[k]
        acc = 0.0
        for r in refs[k]:
            gauss = math.exp(-((len(h) - len(r)) ** 2) / (2 * sigma ** 2))
            for n in range(1, n_max + 1):
                union = sorted(set(_grams(h, n)) | set(_grams(r, n)))
                if not union:
                    continue
                gh = weight_vec(h, n, union)
                gr = weight_vec(r, n, union)
                hn, rn = full_norm(h, n), full_norm(r, n)
                if hn > 0 and rn > 0:
                    acc += gauss * float(np.minimum(gh, gr) @ gr) / (hn * rn)
        per_image.append(10.0 * acc / (n_max * max(len(refs[k]), 1)))
    return sum(per_image) / max(len(per_image), 1)


def test_cider_matches_oracle_on_random_corpora():
    rng = np.random.default_rng(777)
    scorer = M.CIDEr()
    for _ in range(150):
        id_to_pred, id_to_refs = _random_corpus(rng)
        ours = scorer.calculate(id_to_pred, id_to_refs)["CIDEr"]
        oracle = _cider_oracle(id_to_pred, id_to_refs)
        assert ours == pytest.approx(oracle, abs=1e-9), (id_to_pred, id_to_refs)


def test_cider_matches_oracle_edges():
    scorer = M.CIDEr()
    # single segment, identical hyp/ref: idf = log(1) = 0 everywhere -> 0
    pred = {0: [{"caption": "the cat sits"}]}
    refs = {0: [{"caption": "the cat sits"}]}
    assert scorer.calculate(pred, refs)["CIDEr"] == pytest.approx(
        _cider_oracle(pred, refs), abs=1e-12)
    # two segments with distinct vocab: idf is positive, identical pairs
    # score the per-order cosine = 1 path
    pred = {0: [{"caption": "the cat sits on the mat"}],
            1: [{"caption": "a big dog runs"}]}
    refs = {0: [{"caption": "the cat sits on the mat"}],
            1: [{"caption": "a big dog runs"}, {"caption": "a red dog runs on a mat"}]}
    assert scorer.calculate(pred, refs)["CIDEr"] == pytest.approx(
        _cider_oracle(pred, refs), abs=1e-9)
