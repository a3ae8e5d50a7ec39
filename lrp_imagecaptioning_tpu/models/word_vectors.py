"""Pretrained word-vector embedding initializers.

Equivalent of models/word_vectors.py:6-86 (WordVector / Glove / Fasttext):
initialize the embedding table from a pretrained vector file for words in the
vocabulary; unknown words keep their random (glorot-uniform) init, matching
the reference's fallback to the Keras initializer.

File format: the standard GloVe/fastText text format ``word v1 v2 ... vd``
(fastText files may carry a ``count dim`` header line — skipped)."""

from __future__ import annotations

import numpy as np


class WordVector:
    def __init__(self, vocab_words: list[str], initializer, path: str, embedding_dim: int):
        """vocab_words[i] is the word for 1-based token id i+1 == 0-based
        model row i (the reference builds the matrix in model-id order,
        word_vectors.py:44-63)."""
        self._vocab = vocab_words
        self._initializer = initializer
        self._path = path
        self._dim = embedding_dim

    def vectorize_words(self, rng_key=None) -> np.ndarray:
        import jax

        vectors = self._load_vectors()
        V = len(self._vocab)
        if rng_key is None:
            rng_key = jax.random.PRNGKey(0)
        table = np.array(self._initializer(rng_key, (V, self._dim)))  # writable copy
        hit = 0
        for i, word in enumerate(self._vocab):
            v = vectors.get(word)
            if v is not None:
                table[i] = v
                hit += 1
        return table

    def _load_vectors(self) -> dict:
        vectors = {}
        vocab = set(self._vocab)
        with open(self._path, "r", encoding="utf-8", errors="ignore") as f:
            first = f.readline()
            parts = first.rstrip().split(" ")
            if len(parts) != 2:  # not a fastText header -> parse as data
                self._maybe_add(vectors, vocab, parts)
            for line in f:
                self._maybe_add(vectors, vocab, line.rstrip().split(" "))
        return vectors

    def _maybe_add(self, vectors, vocab, parts):
        if len(parts) == self._dim + 1 and parts[0] in vocab:
            vectors[parts[0]] = np.asarray(parts[1:], dtype=np.float32)


class Glove(WordVector):
    """glove.6B-style text files (word_vectors.py:66-74)."""


class Fasttext(WordVector):
    """wiki-news-300d-style .vec files (word_vectors.py:77-86)."""


def init_embedding(key, vocab_words: list[str], embedding_dim: int,
                   pretrained: str | None = None, path: str | None = None) -> np.ndarray:
    """Build the (V, E) embedding table, optionally seeded from
    glove/fasttext (model.py:80-93 _build_word_embedding)."""
    import jax

    def glorot(k, shape):
        limit = float(np.sqrt(6.0 / (shape[0] + shape[1])))
        return jax.random.uniform(k, shape, minval=-limit, maxval=limit)

    if pretrained is None:
        return np.asarray(glorot(key, (len(vocab_words), embedding_dim)))
    cls = {"glove": Glove, "fasttext": Fasttext}[pretrained]
    return cls(vocab_words, glorot, path, embedding_dim).vectorize_words(key)
