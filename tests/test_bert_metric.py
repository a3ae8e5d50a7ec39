"""Executed coverage for the BERTScore adapter (evalx/metrics.py::BERT).

The reference's vendored adapter (pycocoevalcap/bert/bert.py:3-50) needs the
bert_score pip package + downloaded weights; neither exists here, so the
adapter runs against a TINY local transformers model written to disk — real
AutoTokenizer/AutoModel loading, real hidden states, real greedy matching —
plus an independent numpy rederivation of the matching stage.
"""

import numpy as np
import pytest

from lrp_imagecaptioning_tpu.evalx.metrics import BERT

_WORDS = ("a the cat dog man woman sat runs horse grass red blue street "
          "ball tree small big on in with").split()


@pytest.fixture(scope="module")
def tiny_bert(tmp_path_factory):
    """A 2-layer, 32-dim BertModel + WordPiece tokenizer saved locally."""
    torch = pytest.importorskip("torch")
    from transformers import BertConfig, BertModel, BertTokenizer

    d = tmp_path_factory.mktemp("tinybert")
    vocab = ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]"] + _WORDS
    vocab_file = d / "vocab.txt"
    vocab_file.write_text("\n".join(vocab) + "\n")
    tok = BertTokenizer(str(vocab_file), do_lower_case=True)
    cfg = BertConfig(vocab_size=len(vocab), hidden_size=32,
                     num_hidden_layers=2, num_attention_heads=2,
                     intermediate_size=64, max_position_embeddings=32)
    torch.manual_seed(0)
    model = BertModel(cfg)
    model.save_pretrained(str(d))
    tok.save_pretrained(str(d))
    return str(d)


def _corpus(pairs):
    p = {f"i{k}": [{"caption": hyp}] for k, (hyp, _) in enumerate(pairs)}
    r = {f"i{k}": [{"caption": ref} for ref in refs]
         for k, (_, refs) in enumerate(pairs)}
    return p, r


def test_bert_no_model_returns_zero():
    p, r = _corpus([("a cat", ["a cat"])])
    assert BERT().calculate(p, r) == {"BERTScore": 0.0}


def test_bert_identical_corpus_scores_one(tiny_bert):
    # identical strings embed identically; greedy match picks the diagonal,
    # cosine of a unit vector with itself is 1 -> P=R=F1=1 exactly
    p, r = _corpus([("a cat sat on the grass", ["a cat sat on the grass"]),
                    ("the dog runs", ["the dog runs"])])
    out = BERT(model_path=tiny_bert).calculate(p, r)
    assert out["BERTScore"] == pytest.approx(1.0, abs=1e-9)


def test_bert_related_beats_unrelated(tiny_bert):
    related, _ = _corpus([("a man with a dog", ["a man with a small dog"])])
    _, refs = _corpus([("a man with a dog", ["a man with a small dog"])])
    unrelated, _ = _corpus([("red ball on grass", ["a man with a small dog"])])
    b = BERT(model_path=tiny_bert)
    s_rel = b.calculate(related, refs)["BERTScore"]
    s_unrel = b.calculate(unrelated, refs)["BERTScore"]
    assert 0.0 < s_unrel < s_rel <= 1.0


def test_bert_reference_flattening_is_pair_mean(tiny_bert):
    """The reference adapter scores each (hyp, ref) pair and MEANS them
    (bert.py:28-44) — a second reference must enter as its own pair, not as
    best-of. Verified by composing the corpus score from single-pair runs."""
    b = BERT(model_path=tiny_bert)
    hyp = "a man with a dog"
    ref1, ref2 = "a man with a small dog", "red ball on grass"
    p, r = _corpus([(hyp, [ref1, ref2])])
    combined = b.calculate(p, r)["BERTScore"]
    s1 = b.calculate(*_corpus([(hyp, [ref1])]))["BERTScore"]
    s2 = b.calculate(*_corpus([(hyp, [ref2])]))["BERTScore"]
    assert combined == pytest.approx((s1 + s2) / 2, abs=1e-9)
    assert combined != pytest.approx(max(s1, s2), abs=1e-6)  # not best-of


def test_bert_greedy_matching_math(tiny_bert):
    """Independent rederivation: pull the model's own embeddings through the
    adapter's _embed, then recompute greedy-matching F1 with plain loops."""
    b = BERT(model_path=tiny_bert)
    b._load()
    cand, ref = "the cat runs", "a cat sat on grass"
    ce, re_ = b._embed([cand])[0], b._embed([ref])[0]
    # loop rederivation of P/R/F1
    p = np.mean([max(float(c @ r) for r in re_) for c in ce])
    r = np.mean([max(float(c @ r) for c in ce) for r in re_])
    want = 2 * p * r / (p + r)
    assert BERT.pair_f1(ce, re_) == pytest.approx(want, abs=1e-12)
    # and through the public entry
    out = b.calculate(*_corpus([(cand, [ref])]))["BERTScore"]
    assert out == pytest.approx(want, abs=1e-12)


def test_bert_special_tokens_excluded(tiny_bert):
    """[CLS]/[SEP] must not participate in matching: a 1-word sentence
    embeds to exactly one row."""
    b = BERT(model_path=tiny_bert)
    b._load()
    e = b._embed(["cat"])[0]
    assert e.shape[0] == 1
    assert np.linalg.norm(e[0]) == pytest.approx(1.0, abs=1e-9)


def test_bert_scoring_failure_degrades_to_zero(tiny_bert, monkeypatch):
    """A model that loads but cannot score (e.g. a tokenizer with no pad
    token) must degrade to 0 with a warning, not kill the evaluation the
    caller has already half-computed."""
    b = BERT(model_path=tiny_bert)

    def boom(sentences):
        raise ValueError("Asking to pad but the tokenizer does not have a padding token")

    monkeypatch.setattr(b, "_embed", boom)
    with pytest.warns(UserWarning, match="scoring failed"):
        out = b.calculate(*_corpus([("the cat runs", ["a cat"])]))
    assert out == {"BERTScore": 0.0}
