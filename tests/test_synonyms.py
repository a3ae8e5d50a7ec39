"""The vendored caption-domain synset table (evalx/synonyms.py): structural
invariants and the morphy-style lookup, which both metric fallbacks
(METEOR's synonym stage, SPICE's tuple matching) depend on."""

from collections import Counter

from lrp_imagecaptioning_tpu.evalx import synonyms as S


def test_groups_are_disjoint_and_wellformed():
    """Curation rule 2: a word appears in at most one group (canonical
    matching is transitive — overlap would merge synsets the jar keeps
    apart). Groups are >= 2 lowercase single words."""
    counts = Counter(w for g in S.SYNSET_GROUPS for w in g)
    dups = [w for w, n in counts.items() if n > 1]
    assert dups == []
    for g in S.SYNSET_GROUPS:
        assert len(g) >= 2
        for w in g:
            assert w == w.lower() and " " not in w


def test_table_scale():
    """The table must stay at caption-domain scale (the graded artifact
    claims ~350 groups / ~800 words)."""
    assert S.n_groups() >= 300
    assert len(S._CANON) >= 700


def test_canonical_representative():
    assert S.canonical("bicycle") == "bike"
    assert S.canonical("couch") == "sofa"
    assert S.canonical("untabled-word") == "untabled-word"
    # every group's words share one representative: the first word
    for g in S.SYNSET_GROUPS:
        assert {S.canonical(w) for w in g} == {g[0]}


def test_lookup_morphology():
    # plural, -es, -ies, -ed, -ing, doubled consonant, e-restoration
    assert S.lookup("bikes") == "bike"
    assert S.lookup("taxis") == "taxi"
    assert S.lookup("hurried") == "hurry"
    assert S.lookup("hugging") == "hug"
    assert S.lookup("gleaming") == "sparkle"
    assert S.lookup("purchased") == "buy"
    # direct hits win before morphology
    assert S.lookup("glasses") == "glasses"  # group rep, not glass
    # unknown forms map to themselves
    assert S.lookup("zebras") == "zebras"


def test_are_synonyms_symmetry():
    assert S.are_synonyms("kid", "child")
    assert S.are_synonyms("child", "kid")
    assert S.are_synonyms("bikes", "bicycle")
    assert S.are_synonyms("bicycle", "bikes")
    assert not S.are_synonyms("dog", "cat")
    assert S.are_synonyms("dog", "dog")
