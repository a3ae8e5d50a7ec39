"""Measure the SPICE fallback parser against hand-derived gold scene graphs.

The SPICE fallback (evalx/spice_fallback.py) is exact in its scoring
algebra and approximate in its parser. This experiment quantifies the
parser's deviation surface the way METEOR's fallback was quantified
(experiments/meteor_fallback_bound.py): against a 40-caption gold corpus
whose scene-graph tuples were hand-derived from the SPICE paper's rules
(Anderson et al., ECCV 2016 §3: objects from head nouns, attributes from
adjectival/nominal/numeric modifiers and copular complements, relations
from verbs and prepositions), NOT from this parser's output. The corpus
deliberately includes constructions the rule grammar does not model —
passives, possessives, comparatives, apposition — so the coverage number
is an honest bound, not a self-fulfilling one.

Reported (written to SPICE_PARSER_COVERAGE.json):

* tuple-level micro precision / recall / F1 of parsed vs gold tuples over
  the corpus, plus the per-caption breakdown of exact-graph matches;
* score-level deviation: for cand/ref pairings drawn from the corpus,
  |F1(parsed graphs) - F1(gold graphs)| — parsing BOTH sides, as the
  metric runs in practice — max and mean.

Run: python experiments/spice_parser_coverage.py
"""

from __future__ import annotations

import itertools
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from lrp_imagecaptioning_tpu.evalx.spice_fallback import (  # noqa: E402
    _canon_tuple,
    parse_tuples,
)

# (caption, gold tuple set) — tuples lemmatized, SPICE-paper rules.
# Sections: constructions the grammar models, then known-hard ones.
GOLD = [
    # --- core caption grammar ---
    ("a young girl standing on top of a tennis court",
     {("girl",), ("girl", "young"), ("girl", "stand"),
      ("girl", "on top of", "court"), ("court",), ("court", "tennis")}),
    ("a man riding a horse",
     {("man",), ("horse",), ("man", "ride", "horse")}),
    ("a black and white dog",
     {("dog",), ("dog", "black"), ("dog", "white")}),
    ("a man and a woman riding horses",
     {("man",), ("woman",), ("horse",),
      ("man", "ride", "horse"), ("woman", "ride", "horse")}),
    ("two dogs playing in the grass",
     {("dog",), ("dog", "2"), ("dog", "play"), ("grass",),
      ("dog", "in", "grass")}),
    ("a woman wearing glasses and a red hat",
     {("woman",), ("glasses",), ("hat",), ("hat", "red"),
      ("woman", "wear", "glasses"), ("woman", "wear", "hat")}),
    ("the bench is wooden",
     {("bench",), ("bench", "wooden")}),
    ("a dog that is running",
     {("dog",), ("dog", "run")}),
    ("a man in a white shirt holding a baseball bat",
     {("man",), ("shirt",), ("shirt", "white"), ("man", "in", "shirt"),
      ("bat",), ("bat", "baseball"), ("man", "hold", "bat")}),
    ("three small houses on a hill",
     {("house",), ("house", "3"), ("house", "small"), ("hill",),
      ("house", "on", "hill")}),
    ("a cat sleeping on a couch",
     {("cat",), ("cat", "sleep"), ("couch",), ("cat", "on", "couch")}),
    ("people walking down a city street",
     {("person",), ("person", "walk"), ("street",), ("street", "city"),
      ("person", "down", "street")}),
    ("a little boy eating a slice of pizza",
     {("boy",), ("boy", "little"), ("slice",), ("pizza",),
      ("boy", "eat", "slice"), ("slice", "of", "pizza")}),
    ("a red truck parked next to a blue car",
     {("truck",), ("truck", "red"), ("truck", "park"), ("car",),
      ("car", "blue"), ("truck", "next to", "car")}),
    ("an elderly woman sitting on a park bench",
     {("woman",), ("woman", "elderly"), ("woman", "sit"), ("bench",),
      ("bench", "park"), ("woman", "on", "bench")}),
    ("two men hold umbrellas",
     {("man",), ("man", "2"), ("umbrella",), ("man", "hold", "umbrella")}),
    ("a group of people standing around a table",
     {("group",), ("person",), ("group", "of", "person"),
      ("group", "stand"), ("table",), ("group", "around", "table")}),
    ("a surfer riding a large wave",
     {("surfer",), ("wave",), ("wave", "large"),
      ("surfer", "ride", "wave")}),
    ("a brown dog jumping over a fallen tree",
     {("dog",), ("dog", "brown"), ("dog", "jump"), ("tree",),
      ("tree", "fallen"), ("dog", "over", "tree")}),
    ("a plate with a fork resting on it",
     {("plate",), ("fork",), ("plate", "with", "fork"), ("fork", "rest")}),
    ("a young boy in a blue jacket throwing a snowball",
     {("boy",), ("boy", "young"), ("jacket",), ("jacket", "blue"),
      ("boy", "in", "jacket"), ("snowball",), ("boy", "throw", "snowball")}),
    ("a woman and a child looking at a book",
     {("woman",), ("child",), ("book",), ("woman", "look"),
      ("child", "look"), ("woman", "at", "book"), ("child", "at", "book")}),
    ("the tall man wears a black coat",
     {("man",), ("man", "tall"), ("coat",), ("coat", "black"),
      ("man", "wear", "coat")}),
    ("a kid on a bike near the beach",
     {("kid",), ("bike",), ("kid", "on", "bike"), ("beach",),
      ("bike", "near", "beach")}),
    ("a red , white and blue flag",
     {("flag",), ("flag", "red"), ("flag", "white"), ("flag", "blue")}),
    ("birds flying over the water",
     {("bird",), ("bird", "fly"), ("water",), ("bird", "over", "water")}),
    ("a dog catches a frisbee in the air",
     {("dog",), ("frisbee",), ("dog", "catch", "frisbee"), ("air",),
      ("frisbee", "in", "air")}),
    ("a smiling girl holds a small puppy",
     {("girl",), ("girl", "smile"), ("puppy",), ("puppy", "small"),
      ("girl", "hold", "puppy")}),
    ("two children play with a yellow ball",
     {("child",), ("child", "2"), ("child", "play"), ("ball",),
      ("ball", "yellow"), ("child", "with", "ball")}),
    ("a man is climbing a steep rock",
     {("man",), ("rock",), ("rock", "steep"), ("man", "climb", "rock")}),
    # --- constructions the rule grammar does NOT model (honest misses) ---
    ("a cake being cut by a woman",
     {("cake",), ("woman",), ("woman", "cut", "cake")}),  # passive voice
    ("the man 's hat is red",
     {("man",), ("hat",), ("man", "have", "hat"), ("hat", "red")}),  # possessive
    ("a dog larger than its owner",
     {("dog",), ("owner",), ("dog", "larger than", "owner")}),  # comparative
    ("the goalie , a young man , blocks the shot",
     {("goalie",), ("man",), ("man", "young"), ("shot",),
      ("goalie", "block", "shot")}),  # apposition
    ("a picture of a horse taken at sunset",
     {("picture",), ("horse",), ("picture", "of", "horse"), ("sunset",),
      ("picture", "take"), ("picture", "at", "sunset")}),  # reduced passive
    ("there are two boats docked at the pier",
     {("boat",), ("boat", "2"), ("boat", "dock"), ("pier",),
      ("boat", "at", "pier")}),  # existential there
    ("a man trying to catch a ball",
     {("man",), ("ball",), ("man", "try"),
      ("man", "catch", "ball")}),  # control verb + infinitive
    ("one of the dogs is asleep",
     {("dog",), ("dog", "asleep")}),  # partitive subject
    ("a table covered with food and drinks",
     {("table",), ("table", "cover"), ("food",), ("drink",),
      ("table", "with", "food"), ("table", "with", "drink")}),  # reduced relative + coord
    ("a not very happy child",
     {("child",), ("child", "happy")}),  # negated degree adverb (SPICE keeps the attr)
    # --- round-5 additions: the formerly-unmodeled constructions, varied ---
    ("a boy 's dog chasing a ball",
     {("boy",), ("dog",), ("boy", "have", "dog"), ("ball",),
      ("dog", "chase", "ball")}),  # possessive subject
    ("there is a red bus parked near the station",
     {("bus",), ("bus", "red"), ("bus", "park"), ("station",),
      ("bus", "near", "station")}),  # existential + participle
    ("a woman 's face reflected in the mirror",
     {("woman",), ("face",), ("woman", "have", "face"), ("face", "reflect"),
      ("mirror",), ("face", "in", "mirror")}),  # possessive + reduced passive
    ("a sandwich being eaten by a young boy",
     {("sandwich",), ("boy",), ("boy", "young"),
      ("boy", "eat", "sandwich")}),  # progressive passive + agent
    ("the dog , a small terrier , digs a hole",
     {("dog",), ("terrier",), ("terrier", "small"), ("hole",),
      ("dog", "dig", "hole")}),  # apposition
    ("two of the girls are dancing",
     {("girl",), ("girl", "dance")}),  # partitive subject
    ("a man wearing a t-shirt and jeans",
     {("man",), ("t-shirt",), ("jeans",), ("man", "wear", "t-shirt"),
      ("man", "wear", "jeans")}),  # hyphenated compound + coordination
    ("a tree taller than the house",
     {("tree",), ("house",), ("tree", "taller than", "house")}),  # comparative
    ("a fire-truck parked in front of the station",
     {("fire-truck",), ("fire-truck", "park"), ("station",),
      ("fire-truck", "in front of", "station")}),  # hyphen + multiword prep
    ("the girl 's bike is blue",
     {("girl",), ("bike",), ("girl", "have", "bike"),
      ("bike", "blue")}),  # possessive + predicative
    ("a guitar played by a street musician",
     {("guitar",), ("musician",), ("musician", "street"),
      ("musician", "play", "guitar")}),  # reduced passive + agent
    ("there are three birds sitting on a wire",
     {("bird",), ("bird", "3"), ("bird", "sit"), ("wire",),
      ("bird", "on", "wire")}),  # existential + count
    ("the chef 's knife cutting a tomato",
     {("chef",), ("knife",), ("chef", "have", "knife"), ("tomato",),
      ("knife", "cut", "tomato")}),  # possessive inanimate subject
    ("a player trying to score a goal",
     {("player",), ("player", "try"), ("goal",),
      ("player", "score", "goal")}),  # control verb
    ("one of the men is wearing a suit",
     {("man",), ("suit",), ("man", "wear", "suit")}),  # partitive + copula
    ("the players ' uniforms are dirty",
     {("player",), ("uniform",), ("player", "have", "uniform"),
      ("uniform", "dirty")}),  # plural possessive
    ("two men shaking hands after the game",
     {("man",), ("man", "2"), ("hand",), ("man", "shake", "hand"),
      ("game",), ("hand", "after", "game")}),  # temporal PP (nearest-NP convention)
    ("a dog as big as a wolf",
     {("dog",), ("wolf",), ("dog", "as big as", "wolf")}),  # equative comparison
    ("a man who appears to be sleeping on the bench",
     {("man",), ("man", "sleep"), ("bench",),
      ("man", "on", "bench")}),  # raising verb ("appears to be")
    ("a kitchen with lots of pots and pans",
     {("kitchen",), ("pot",), ("pan",), ("kitchen", "with", "pot"),
      ("kitchen", "with", "pan")}),  # non-numeric quantifier partitive
    # --- constructions STILL unmodeled (honest misses, round 5) ---
    ("the ball that the boy threw",
     {("ball",), ("boy",), ("boy", "throw", "ball")}),  # object-gap relative
    ("a basket full of apples",
     {("basket",), ("basket", "full"), ("apple",),
      ("basket", "of", "apple")}),  # adjective + of complement
    ("on the table is a cake",
     {("cake",), ("table",), ("cake", "on", "table")}),  # PP-fronted inversion
]

# captions 0..N_MODELED-1 exercise constructions the grammar models (the
# original 30-core set plus the round-5 extension targets); the tail is the
# honest still-unmodeled set
N_MODELED = 60


def main():
    tp = fp = fn = 0
    exact = 0
    per_caption = []
    parsed_graphs = []
    for caption, gold in GOLD:
        gold_c = {_canon_tuple(t) for t in gold}
        got = {_canon_tuple(t) for t in parse_tuples(caption.split())}
        parsed_graphs.append(got)
        tp += len(got & gold_c)
        fp += len(got - gold_c)
        fn += len(gold_c - got)
        exact += got == gold_c
        per_caption.append({
            "caption": caption,
            "gold": sorted(" ".join(t) for t in gold_c),
            "missed": sorted(" ".join(t) for t in gold_c - got),
            "spurious": sorted(" ".join(t) for t in got - gold_c),
        })
    p = tp / (tp + fp)
    r = tp / (tp + fn)
    f1 = 2 * p * r / (p + r)

    # score-level deviation: every caption scored against the next two
    # captions' graphs as "references" (a deliberately hard, low-overlap
    # pairing — deviations show up strongest when graphs differ), plus
    # identity pairs (must be 1.0 under both).
    def f1_sets(cand, refs):
        ref = set().union(*refs) if refs else set()
        if not cand or not ref:
            return 0.0
        inter = len(cand & ref)
        p_ = inter / len(cand)
        r_ = inter / len(ref)
        return 2 * p_ * r_ / (p_ + r_) if p_ + r_ else 0.0

    golds = [{_canon_tuple(t) for t in g} for _, g in GOLD]
    devs = []
    n = len(GOLD)
    for i in range(n):
        refs_idx = [(i + 1) % n, (i + 2) % n]
        dev = abs(
            f1_sets(parsed_graphs[i], [parsed_graphs[j] for j in refs_idx])
            - f1_sets(golds[i], [golds[j] for j in refs_idx])
        )
        devs.append(dev)
        # identity: same caption on both sides — parser consistency makes
        # this 1.0 under parsed graphs; gold identity is 1.0 by definition
        assert f1_sets(parsed_graphs[i], [parsed_graphs[i]]) == 1.0

    modeled = per_caption[:N_MODELED]
    hard = per_caption[N_MODELED:]
    out = {
        "protocol": "parsed vs hand-derived gold scene graphs (SPICE-paper "
                    "rules, derived independently of the parser; includes "
                    "deliberately unmodeled constructions)",
        "n_captions": len(GOLD),
        "n_modeled": N_MODELED,
        "tuple_micro": {"precision": round(p, 4), "recall": round(r, 4),
                        "f1": round(f1, 4), "tp": tp, "fp": fp, "fn": fn},
        "exact_graph_matches": exact,
        "modeled_captions_exact": sum(not c["missed"] and not c["spurious"] for c in modeled),
        "unmodeled_captions_exact": sum(not c["missed"] and not c["spurious"] for c in hard),
        "score_deviation_vs_gold": {
            "max": round(max(devs), 4),
            "mean": round(sum(devs) / len(devs), 4),
            "pairing": "each caption vs the next two as references "
                       "(low-overlap, deviation-maximizing)",
        },
        "per_caption": per_caption,
    }
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "SPICE_PARSER_COVERAGE.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    slim = {k: v for k, v in out.items() if k != "per_caption"}
    print(json.dumps(slim, indent=1))
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
