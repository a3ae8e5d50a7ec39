"""Tokenizer / caption-preprocessor parity tests.

These encode the reference's implicit invariants (preprocessors.py:57-222):
1-based tokenizer ids, count-desc stable ordering, SOS/EOS handling, rare-word
discard before SOS/EOS, and the one-hot column-0 drop."""

import numpy as np

from lrp_imagecaptioning_tpu.data.tokenizer import (
    CaptionPreprocessor,
    KerasCompatTokenizer,
    text_to_word_sequence,
)


def test_text_to_word_sequence_filters():
    assert text_to_word_sequence("A dog, runs. FAST!") == ["a", "dog", "runs", "fast"]
    assert text_to_word_sequence("hello\tworld\nfoo") == ["hello", "world", "foo"]


def test_tokenizer_ids_count_desc_stable():
    tok = KerasCompatTokenizer()
    tok.fit_on_texts(["b a a", "c b a"])
    # counts: a=3, b=2, c=1 -> ids a:1 b:2 c:3
    assert tok.word_index == {"a": 1, "b": 2, "c": 3}
    # ties broken by insertion order
    tok2 = KerasCompatTokenizer()
    tok2.fit_on_texts(["z y x"])
    assert tok2.word_index == {"z": 1, "y": 2, "x": 3}


def test_rare_word_discard_before_sos_eos():
    pp = CaptionPreprocessor(rare_words_handling="discard", words_min_occur=2)
    pp.fit_on_captions(["a dog runs", "a dog sits", "rareword here"])
    assert "rareword" not in pp._tokenizer.word_index
    assert "a" in pp._tokenizer.word_index
    # SOS/EOS always survive (added after discard)
    assert pp.SOS_TOKEN in pp._tokenizer.word_index
    assert pp.EOS_TOKEN in pp._tokenizer.word_index


def test_encode_adds_sos_eos_1based():
    pp = CaptionPreprocessor(rare_words_handling="nothing")
    pp.fit_on_captions(["a dog", "a cat"])
    seqs = pp.encode_captions(["a dog"])
    sos, eos = pp.SOS_TOKEN_LABEL_ENCODED, pp.EOS_TOKEN_LABEL_ENCODED
    assert seqs[0][0] == sos and seqs[0][-1] == eos
    assert min(pp._tokenizer.word_index.values()) == 1


def test_preprocess_batch_shift_semantics():
    pp = CaptionPreprocessor(rare_words_handling="nothing")
    pp.fit_on_captions(["a dog", "a cat"])
    seqs = pp.encode_captions(["a dog", "a"])
    x, y = pp.preprocess_batch(seqs)
    V = pp.vocab_size
    assert y.shape == (2, x.shape[1], V)
    # inputs are 0-based: nonzero raw ids decremented
    raw = np.zeros_like(x)
    for i, s in enumerate(seqs):
        raw[i, : len(s)] = s
    assert np.all(x[raw > 0] == raw[raw > 0] - 1)
    # target t is one-hot of input t+1, at (raw id - 1)
    for i, s in enumerate(seqs):
        for t in range(len(s) - 1):
            assert y[i, t, s[t + 1] - 1] == 1
            assert y[i, t].sum() == 1
    # padding rows are all-zero
    assert y[1, len(seqs[1]) - 1 :].sum() == 0


def test_decode_roundtrip():
    pp = CaptionPreprocessor(rare_words_handling="nothing")
    pp.fit_on_captions(["a dog runs fast"])
    enc = pp.encode_captions(["a dog runs fast"])[0]
    dec = pp.decode_captions_from_list1d(enc)[0]
    assert dec == f"{pp.SOS_TOKEN} a dog runs fast {pp.EOS_TOKEN}"
