"""Differential + hand-derived oracles for the METEOR Python fallback.

The reference scores METEOR through meteor-1.5.jar (metrics.py:62-73); no JRE
ships here, so the fallback (evalx/metrics.py::METEOR, exact+stem stages) is
pinned two independent ways, like BLEU/ROUGE/CIDEr are:

1. **Third-party differential oracle**: NLTK's ``meteor_score`` is an
   independent METEOR implementation (same Banerjee & Lavie formula, same
   exact -> stem -> synonym stage ladder). Passing a stub wordnet whose
   ``synsets`` is empty reduces it to exactly our exact+stem configuration,
   with identical alpha/beta/gamma defaults (0.9/3.0/0.5) — per-segment
   scores must agree to float precision over a perturbation corpus.
2. **Hand-derived cases**: alignments (matches, chunks) and full scores
   computed by hand from the METEOR definitions, as explicit arithmetic.

The measured corpus-level deviation artifact lives in
experiments/METEOR_FALLBACK_BOUND.json (experiments/meteor_fallback_bound.py).
"""

import random

import pytest

from lrp_imagecaptioning_tpu.evalx.metrics import METEOR


class _NoWordnet:
    """Stub: disables NLTK's synonym stage, leaving exact+stem — our config."""

    @staticmethod
    def synsets(word):
        return []


def _nltk_meteor(hyp_words, refsets_words):
    from nltk.stem.porter import PorterStemmer
    from nltk.translate import meteor_score as ms

    return ms.meteor_score(refsets_words, hyp_words,
                           stemmer=PorterStemmer(), wordnet=_NoWordnet)


def _ours(hyp_words, refsets_words):
    """Per-segment fallback score on pre-tokenized words (bypasses PTB
    tokenization so the comparison isolates alignment + formula)."""
    m = METEOR()
    m._jar = None  # force the Python path regardless of env
    best = 0.0
    for ref in refsets_words:
        m_h, m_r, chunks = m._align(hyp_words, ref)
        if m_h == 0:
            continue
        p_ = m_h / len(hyp_words)
        q_ = m_r / len(ref)
        fmean = p_ * q_ / (m.ALPHA * p_ + (1 - m.ALPHA) * q_)
        pen = m.GAMMA * ((chunks / ((m_h + m_r) / 2)) ** m.BETA_P)
        best = max(best, fmean * (1 - pen))
    return best


# ---------------------------------------------------------------------------
# 1. NLTK differential over a deterministic perturbation corpus
# ---------------------------------------------------------------------------

_BASE = [
    "a man in a red shirt is riding a brown horse",
    "two dogs are running across the wet grass",
    "the young woman holds a large striped umbrella",
    "a group of people sit around a wooden table",
    "a small child plays with colourful building blocks",
    "the black cat sleeps on the warm window sill",
]

_STEM_SWAPS = {
    "riding": "rides", "running": "runs", "holds": "holding",
    "plays": "played", "sleeps": "sleeping", "dogs": "dog",
    "colourful": "colour", "blocks": "block", "striped": "stripe",
}


def _perturbations():
    rng = random.Random(0)
    cases = []
    for sent in _BASE:
        ref = sent.split()
        variants = []
        variants.append(list(ref))                                # identical
        variants.append([_STEM_SWAPS.get(w, w) for w in ref])     # stem-only
        shuf = list(ref)
        rng.shuffle(shuf)
        variants.append(shuf)                                     # reordered
        variants.append(ref[::2])                                 # every other
        variants.append(ref[3:] + ref[:3])                        # rotated
        drop = [w for w in ref if rng.random() > 0.3]
        variants.append(drop or ref[:1])                          # dropped
        variants.append(["zebra", "quantum", "x"])                # no overlap-ish
        variants.append(ref[:1])                                  # single word
        for hyp in variants:
            cases.append((hyp, [ref]))
        # multi-reference: best-of over the original and a stem variant
        cases.append((variants[2], [ref, variants[1]]))
        cases.append((variants[5], [ref[::2], ref[1::2] or ref[:2]]))
    return cases


def test_meteor_fallback_matches_nltk_per_segment():
    cases = _perturbations()
    assert len(cases) == 60
    worst = 0.0
    for hyp, refs in cases:
        got = _ours(hyp, refs)
        want = _nltk_meteor(hyp, refs)
        worst = max(worst, abs(got - want))
        assert got == pytest.approx(want, abs=1e-12), (hyp, refs, got, want)
    assert worst < 1e-12


# ---------------------------------------------------------------------------
# 1b. Synonym stage: NLTK wordnet-stage differential over the vendored table
# ---------------------------------------------------------------------------


class _TableWordnet:
    """WordNet shim over the vendored synset table: ``synsets(word)`` returns
    one synset whose lemma names are the word's group (morphy-style
    normalization included, as real wordnet.synsets does)."""

    @staticmethod
    def synsets(word):
        from lrp_imagecaptioning_tpu.evalx import synonyms as S

        rep = S.lookup(word)
        group = next((g for g in S.SYNSET_GROUPS if g[0] == rep), None)
        if group is None:
            return []

        class _Lemma:
            def __init__(self, n):
                self._n = n

            def name(self):
                return self._n

        class _Synset:
            def lemmas(self):
                return [_Lemma(w) for w in group]

        return [_Synset()]


# Porter-stem-stable synonym pairs: NLTK feeds the STEMMED leftovers into
# its wordnet stage (so "bicycle" arrives as "bicycl" and misses any
# lookup); the jar and our stage match on surface forms. The differential
# therefore pins on pairs whose stems are identity, where both semantics
# coincide; the divergent case is covered by the hand tests below.
_SYN_SWAPS = {
    "kid": "child", "sofa": "couch", "cab": "taxi", "rock": "stone",
    "shop": "store", "begin": "start", "gift": "present", "bucket": "pail",
    "dock": "pier",
}


def test_meteor_synonym_stage_matches_nltk_wordnet_stage():
    """Base-form, stem-stable synonym substitutions: our stage-3 must
    reproduce NLTK's wordnet stage run over the SAME vendored table."""
    from nltk.stem.porter import PorterStemmer
    from nltk.translate import meteor_score as ms

    bases = [
        "a kid sat on a sofa in the shop",
        "a cab parked by a rock wall near the dock",
        "a man with a gift and a bucket",
    ]
    for sent in bases:
        ref = sent.split()
        hyp = [_SYN_SWAPS.get(w, w) for w in ref]
        assert hyp != ref
        got = _ours(hyp, [ref])
        want = ms.meteor_score([ref], hyp, stemmer=PorterStemmer(),
                               wordnet=_TableWordnet)
        assert got == pytest.approx(want, abs=1e-12), (hyp, ref, got, want)
        # and the substitution is invisible to the score: full alignment
        assert got == pytest.approx(_ours(ref, [ref]), abs=1e-12)


def test_meteor_synonym_stage_hand_case():
    # 'a kid on a bike' vs 'a child on a bicycle': exact matches a/on/a,
    # synonym stage adds kid~child and bike~bicycle -> m=5 ch=1 -> score 1-pen
    got = _ours("a kid on a bike".split(), ["a child on a bicycle".split()])
    want = 1.0 * (1 - 0.5 * (1 / 5) ** 3)
    assert got == pytest.approx(want, abs=1e-12)


def test_meteor_synonym_stage_normalizes_inflections():
    # 'two bikes' vs 'two bicycles': plural forms canonicalize through the
    # bike group on BOTH sides (the jar's morphy behaviour; NLTK's ref side
    # would miss this)
    got = _ours("two bikes".split(), ["two bicycles".split()])
    assert got == pytest.approx(1 - 0.5 * (1 / 2) ** 3, abs=1e-12)


def test_meteor_synonyms_off_reproduces_exact_stem():
    m_off = METEOR(synonyms=False)
    m_off._jar = None
    hyp, ref = "a kid on a bike".split(), "a child on a bicycle".split()
    matches, _, chunks = m_off._align(hyp, ref)
    assert matches == 3  # only the exact a/on/a survive without the stage
    on_matches, _, _ = METEOR()._align(hyp, ref)
    assert on_matches == 5


# ---------------------------------------------------------------------------
# 1c. Paraphrase stage (stage 4, phrase-level — the jar's paraphrase-en.gz
#     matcher over the vendored caption-domain table)
# ---------------------------------------------------------------------------


def test_meteor_paraphrase_stage_never_refires_on_word_matched_spans():
    # stage 4 only sees ALL-unmatched spans: a table phrase whose words all
    # word-matched (identical sentences) must not be double-counted
    m_h, m_r, chunks = METEOR()._align(
        "a trash can on the street".split(), "a trash can on the street".split())
    assert (m_h, m_r, chunks) == (6, 6, 1)


def test_meteor_paraphrase_stage_cross_length():
    # 'a man standing next to a car' vs 'a man standing beside a car':
    # exact matches a/man/standing/a/car; 'next to' (2 words, unmatched)
    # ~ 'beside' (1 word) sit in one vendored group -> phrase block (2,1).
    hyp = "a man standing next to a car".split()
    ref = "a man standing beside a car".split()
    m_h, m_r, chunks = METEOR()._align(hyp, ref)
    assert (m_h, m_r) == (7, 6)  # all 7 hyp words covered, all 6 ref words
    assert chunks == 1  # the phrase block adjoins the exact runs on both sides
    # and the score is the full-coverage score: P=1, R=1 -> fmean=1
    got = _ours(hyp, [ref])
    frag = 1 / ((7 + 6) / 2)
    assert got == pytest.approx(1 - 0.5 * frag ** 3, abs=1e-12)


def test_meteor_paraphrase_stage_inert_without_table_pair():
    # no phrase pair -> scores bit-identical with the stage off
    hyp = "a man rides a horse across the field".split()
    ref = "a man is riding a brown horse".split()
    m_on = METEOR()
    m_on._jar = None
    m_off = METEOR(paraphrases=False)
    m_off._jar = None
    assert m_on._align(hyp, ref) == m_off._align(hyp, ref)


def test_meteor_paraphrases_off_reproduces_stage3():
    hyp = "a man standing next to a car".split()
    ref = "a man standing beside a car".split()
    m_off = METEOR(paraphrases=False)
    m_off._jar = None
    m_h, m_r, _ = m_off._align(hyp, ref)
    assert (m_h, m_r) == (5, 5)  # next/to/beside stay unmatched


def test_meteor_paraphrase_table_invariants():
    """Structural invariants mirroring the synset-table tests: every phrase
    in exactly one group, at least one multi-word member per group, no
    function-word-only phrases."""
    from lrp_imagecaptioning_tpu.evalx import paraphrases as P

    seen = {}
    func = {"a", "an", "the", "of", "to", "on", "in", "at", "with", "and"}
    for g in P.PHRASE_GROUPS:
        assert len(g) >= 2
        assert any(len(p) > 1 for p in g), g
        for p in g:
            assert p not in seen, f"phrase {p} in two groups"
            seen[p] = True
            assert not all(w in func for w in p), p
    assert P.n_groups() >= 60
    assert P.MAX_PHRASE_LEN <= 5
    # lookup round-trips to the canonical representative
    assert P.lookup_phrase(("next", "to")) == P.lookup_phrase(("beside",))
    assert P.lookup_phrase(("next", "to")) is not None
    assert P.lookup_phrase(("purple", "giraffe")) is None
    assert P.are_paraphrases(("hot", "dog"), ("hotdog",))
    assert not P.are_paraphrases(("hot", "dog"), ("ice", "cream"))


@pytest.mark.parametrize(
    "hyp, ref, want_matches, want_chunks",
    [
        # identical: one chunk covering everything
        ("the cat sat on the mat", "the cat sat on the mat", 6, 1),
        # 'X' breaks hyp adjacency even though ref indices stay consecutive:
        # pairs (0,0),(2,1) -> 2 chunks, NOT 1
        ("a X b", "a b", 2, 2),
        # reversal: every match its own chunk (never adjacent in both)
        ("c b a", "a b c", 3, 3),
        # duplicate hyp words greedily claim distinct ref slots in order:
        # hyp 'the the cat' vs ref 'the cat the': (0,0),(1,2),(2,1) -> 3 chunks
        ("the the cat", "the cat the", 3, 3),
        # stem stage fills what exact left: 'running'~'runs' adjacent to 'dogs'
        ("dogs running fast", "dogs runs fast", 3, 1),
        # unmatched ref tail doesn't break the hyp-side chunk
        ("a b", "a b c d", 2, 1),
        # interleaved: (0,0),(1,2) -> ref gap breaks the chunk
        ("a b", "a x b", 2, 2),
        ("q w e", "z z z", 0, 0),
    ],
)
def test_meteor_alignment_hand_cases(hyp, ref, want_matches, want_chunks):
    m = METEOR()
    m_h, m_r, chunks = m._align(hyp.split(), ref.split())
    assert (m_h, chunks) == (want_matches, want_chunks)
    assert m_h == m_r  # no cross-length phrase fires on these cases


# ---------------------------------------------------------------------------
# 3. Hand-derived full scores (explicit arithmetic, alpha=.9 beta=3 gamma=.5)
# ---------------------------------------------------------------------------


def test_meteor_score_hand_case_partial_overlap():
    # hyp 'the cat sat' vs ref 'the cat sat down':
    # m=3, ch=1; P=3/3=1, R=3/4; fmean = P*R/(.9P+.1R) = .75/.975
    # pen = .5*(1/3)**3 = 1/54; score = fmean*(1-pen)
    got = _ours("the cat sat".split(), ["the cat sat down".split()])
    fmean = (1.0 * 0.75) / (0.9 * 1.0 + 0.1 * 0.75)
    want = fmean * (1 - 0.5 * (1 / 3) ** 3)
    assert got == pytest.approx(want, abs=1e-12)


def test_meteor_score_hand_case_fragmented():
    # hyp 'b a d c' vs ref 'a b c d': all 4 match, no pair adjacent in both
    # -> ch=4, frag=1, pen=.5; P=R=1 -> fmean=1; score=.5
    got = _ours("b a d c".split(), ["a b c d".split()])
    assert got == pytest.approx(0.5, abs=1e-12)


def test_meteor_score_hand_case_multi_reference_best():
    # ref1 yields m=1 of hyp-len 2 (low); ref2 identical (high): best-of wins
    hyp = "green ball".split()
    ref1 = "red ball bounces".split()
    ref2 = "green ball".split()
    got = _ours(hyp, [ref1, ref2])
    want = 1 * (1 - 0.5 * (1 / 2) ** 3)  # identical 2-gram: m=2 ch=1 frag=.5
    assert got == pytest.approx(want, abs=1e-12)


def test_meteor_calculate_is_segment_mean():
    """calculate() (the adapter entry) averages per-segment scores after PTB
    tokenization — corpus mean of two hand-computable segments."""
    m = METEOR()
    m._jar = None
    p = {"a": [{"caption": "the cat sat"}], "b": [{"caption": "b a d c"}]}
    r = {"a": [{"caption": "the cat sat"}], "b": [{"caption": "a b c d"}]}
    out = m.calculate(p, r)["METEOR"]
    s_a = 1 - 0.5 * (1 / 3) ** 3
    s_b = 0.5
    assert out == pytest.approx((s_a + s_b) / 2, abs=1e-12)
