"""SPICE Python fallback: parser pinned on hand-derived scene graphs, the
F1 algebra pinned on hand-computed values.

The reference's SPICE is the Stanford-parser jar (models/metrics.py:80-84 via
pycocoevalcap/spice); the jar protocol itself is covered by
tests/test_jar_adapters.py. These tests cover the jarless approximation
(evalx/spice_fallback.py): the tuple algebra and scoring are SPICE-paper
exact (Anderson et al., ECCV 2016 §3), the parser is a caption-domain rule
grammar whose outputs are asserted here against hand-derived graphs —
including the paper's own Figure 2 example.
"""

import warnings

import pytest

from lrp_imagecaptioning_tpu.evalx.metrics import SPICE
from lrp_imagecaptioning_tpu.evalx.spice_fallback import parse_tuples, spice_f1


def tuples(caption: str):
    return parse_tuples(caption.split())


# ------------------------------------------------------------- parser


def test_paper_figure2_example():
    # SPICE paper Figure 2: "A young girl standing on top of a tennis
    # court" -> (girl), (girl, young), (girl, standing),
    # (girl, on-top-of, court), (court), (court, tennis) — lemmatized here
    assert tuples("a young girl standing on top of a tennis court") == {
        ("girl",),
        ("girl", "young"),
        ("girl", "stand"),
        ("girl", "on top of", "court"),
        ("court",),
        ("court", "tennis"),
    }


def test_transitive_verb():
    assert tuples("a man riding a horse") == {
        ("man",), ("horse",), ("man", "ride", "horse"),
    }


def test_modifier_coordination():
    assert tuples("a black and white dog") == {
        ("dog",), ("dog", "black"), ("dog", "white"),
    }
    assert tuples("a red , white and blue flag") == {
        ("flag",), ("flag", "red"), ("flag", "white"), ("flag", "blue"),
    }


def test_head_coordination_distributes_relations():
    assert tuples("a man and a woman riding horses") == {
        ("man",), ("woman",), ("horse",),
        ("man", "ride", "horse"), ("woman", "ride", "horse"),
    }


def test_det_marked_conjunct_forces_head_coordination():
    # "glasses and a red hat" must NOT read as modifier coordination
    assert tuples("a woman wearing glasses and a red hat") == {
        ("woman",), ("glasses",), ("hat",), ("hat", "red"),
        ("woman", "wear", "glasses"), ("woman", "wear", "hat"),
    }


def test_numeric_modifiers_become_attributes():
    assert tuples("two dogs") == {("dog",), ("dog", "2")}
    assert tuples("3 small houses on a hill") == {
        ("house",), ("house", "3"), ("house", "small"),
        ("hill",), ("house", "on", "hill"),
    }


def test_predicative_copula_attribute():
    assert tuples("the bench is wooden") == {("bench",), ("bench", "wooden")}
    assert tuples("a dog that is running") == {("dog",), ("dog", "run")}


def test_participle_across_pp_attaches_to_animate_subject():
    # the clause subject is animate -> the participle hangs off it, not the
    # nearest NP ("shirt")
    assert tuples("a man in a white shirt holding a baseball bat") == {
        ("man",), ("shirt",), ("shirt", "white"), ("man", "in", "shirt"),
        ("bat",), ("bat", "baseball"), ("man", "hold", "bat"),
    }
    # inanimate clause subject -> nearest-NP attachment
    assert tuples("a plate with a fork resting on it") == {
        ("plate",), ("fork",), ("plate", "with", "fork"), ("fork", "rest"),
    }


def test_intransitive_verb_plus_prep_decomposition():
    # verb becomes an attribute, the preposition carries the relation
    # (the paper's standing/on-top-of decomposition)
    assert tuples("a man jumping over a fence") == {
        ("man",), ("fence",), ("man", "jump"), ("man", "over", "fence"),
    }


def test_base_form_verb_vs_noun_head():
    # bare base form after a plural subject is the verb...
    assert tuples("two men hold umbrellas") == {
        ("man",), ("man", "2"), ("umbrella",), ("man", "hold", "umbrella"),
    }
    # ...after a singular modifier it is the noun head
    assert tuples("a park bench near the lake") == {
        ("bench",), ("bench", "park"), ("lake",), ("bench", "near", "lake"),
    }


def test_lemmatization():
    assert tuples("men and women") == {("man",), ("woman",)}
    assert tuples("horses and buses") == {("horse",), ("bus",)}
    assert tuples("people walking down a city street") == {
        ("person",), ("person", "walk"), ("street",), ("street", "city"),
        ("person", "down", "street"),
    }


# ------------------------------------------------------------- scoring


def test_f1_hand_computed_third():
    # cand {(man),(horse),(man,ride,horse)} vs ref
    # {(person),(horse),(person,ride,horse)}: 1 match of 3 on each side
    f = spice_f1("a man riding a horse".split(),
                 ["a person rides a horse".split()])
    assert f == pytest.approx(1.0 / 3.0)


def test_f1_identical_is_one_and_disjoint_is_zero():
    c = "a man riding a horse".split()
    assert spice_f1(c, [c]) == 1.0
    assert spice_f1(c, ["two green apples".split()]) == 0.0


def test_f1_reference_union_merging():
    # refs union to {(man),(horse),(horse,brown)}; cand matches 2 of its 3
    # tuples and 2 of the union's 3 -> P = R = 2/3 -> F1 = 2/3
    f = spice_f1(
        "a man riding a horse".split(),
        ["a man".split(), "a brown horse".split()],
    )
    assert f == pytest.approx(2.0 / 3.0)


def test_f1_synonym_matching():
    # bike~bicycle and kid~child are in the curated WordNet pairs
    f = spice_f1("a kid on a bike".split(), ["a child on a bicycle".split()])
    assert f == 1.0


# ------------------------------------------------------------- adapter


def _corpus():
    preds = {
        "1": [{"caption": "a man riding a horse"}],
        "2": [{"caption": "a black and white dog"}],
    }
    refs = {
        "1": [{"caption": "a man riding a horse"}],
        "2": [{"caption": "two green apples"}],
    }
    return preds, refs


def test_spice_adapter_mean_of_per_image_f1():
    preds, refs = _corpus()
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        out = SPICE(jar=None).calculate(preds, refs)
    # image 1 scores 1.0, image 2 scores 0.0 -> corpus mean 0.5; the
    # marker key records that the approximation (not the jar) produced it
    assert out == {"SPICE": pytest.approx(0.5), "SPICE_fallback": True}


def test_spice_adapter_reference_literal_mode():
    preds, refs = _corpus()
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        out = SPICE(jar=None, fallback=False).calculate(preds, refs)
    assert out == {"SPICE": 0.0}


def test_gold_corpus_coverage_pinned():
    """The 60-caption gold corpus (experiments/spice_parser_coverage.py):
    every MODELED construction (the original core set + the round-5
    extension targets: possessives, passives, existentials, comparatives,
    apposition, partitives, control verbs, hyphenated compounds) must parse
    to its exact hand-derived graph; overall tuple micro-F1 (the honest
    still-unmodeled tail included) must stay >= 0.95."""
    import importlib.util
    import os

    spec = importlib.util.spec_from_file_location(
        "spice_parser_coverage",
        os.path.join(os.path.dirname(__file__), "..", "experiments",
                     "spice_parser_coverage.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    from lrp_imagecaptioning_tpu.evalx.spice_fallback import _canon_tuple

    tp = fp = fn = 0
    for idx, (caption, gold) in enumerate(mod.GOLD):
        gold_c = {_canon_tuple(t) for t in gold}
        got = {_canon_tuple(t) for t in parse_tuples(caption.split())}
        if idx < mod.N_MODELED:
            assert got == gold_c, f"modeled caption diverged: {caption!r}"
        tp += len(got & gold_c)
        fp += len(got - gold_c)
        fn += len(gold_c - got)
    p, r = tp / (tp + fp), tp / (tp + fn)
    assert 2 * p * r / (p + r) >= 0.95


def test_spice_detailed_category_breakdown():
    """detailed=True: the jar's per-category keys, hand-computed.

    img1: cand/ref differ only in the horse's colour -> All 0.75,
    Object/Relation 1.0, Attribute/Color 0.0; no Count/Size signal.
    img2: identical "two dogs" -> All/Object/Attribute/Count 1.0; no
    Relation/Color/Size signal. Category means skip non-carrying images
    (the jar's NaN convention): Relation averages over img1 alone, Count
    over img2 alone, Size over nothing -> 0.0."""
    preds = {
        "1": [{"caption": "a man riding a brown horse"}],
        "2": [{"caption": "two dogs"}],
    }
    refs = {
        "1": [{"caption": "a man riding a black horse"}],
        "2": [{"caption": "two dogs"}],
    }
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        out = SPICE(jar=None, detailed=True).calculate(preds, refs)
    assert out["SPICE"] == pytest.approx((0.75 + 1.0) / 2)
    assert out["SPICE_Object"] == pytest.approx(1.0)
    assert out["SPICE_Attribute"] == pytest.approx(0.5)
    assert out["SPICE_Relation"] == pytest.approx(1.0)
    assert out["SPICE_Color"] == pytest.approx(0.0)
    assert out["SPICE_Count"] == pytest.approx(1.0)
    assert out["SPICE_Size"] == pytest.approx(0.0)


def test_parser_never_crashes_or_emits_malformed_tuples():
    """Deterministic fuzz: arbitrary token soup (content words, closed-class
    words, punctuation, numbers, unicode) must parse to a well-formed tuple
    set — arity 1-3, non-empty lowercase string elements — never raise."""
    import random

    rng = random.Random(0)
    vocab = (
        "a the and , or is are on in of with two 3 dog dogs man riding "
        "running bat . ! '' `` 's ' -LRB- über 猫 x y z holding by near park "
        "glasses people baseball & && tall as than larger there appears "
        "lots cut taken being t-shirt one seems full docked thrown".split()
    )
    for _ in range(500):
        toks = [rng.choice(vocab) for _ in range(rng.randint(0, 15))]
        out = parse_tuples(toks)
        for t in out:
            assert isinstance(t, tuple) and 1 <= len(t) <= 3
            for el in t:
                assert isinstance(el, str) and el
                assert el == el.lower()
