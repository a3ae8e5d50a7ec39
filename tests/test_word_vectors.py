"""Pretrained word-vector initializer tests (glove/fasttext text formats)."""

import numpy as np
import jax

from lrp_imagecaptioning_tpu.models.word_vectors import Fasttext, Glove, init_embedding


def test_glove_vectorize(tmp_path):
    p = tmp_path / "glove.txt"
    p.write_text(
        "dog 1.0 2.0 3.0\n"
        "cat 4.0 5.0 6.0\n"
        "irrelevant 7.0 8.0 9.0\n"
    )
    vocab = ["dog", "unknownword", "cat"]

    def init(key, shape):
        return np.full(shape, 0.5, np.float32)

    table = Glove(vocab, init, str(p), 3).vectorize_words(jax.random.PRNGKey(0))
    np.testing.assert_array_equal(table[0], [1.0, 2.0, 3.0])
    np.testing.assert_array_equal(table[1], [0.5, 0.5, 0.5])  # fallback init
    np.testing.assert_array_equal(table[2], [4.0, 5.0, 6.0])


def test_fasttext_header_skipped(tmp_path):
    p = tmp_path / "ft.vec"
    p.write_text(
        "2 3\n"            # fastText count/dim header
        "dog 1.0 2.0 3.0\n"
        "cat 4.0 5.0 6.0\n"
    )

    def init(key, shape):
        return np.zeros(shape, np.float32)

    table = Fasttext(["cat", "dog"], init, str(p), 3).vectorize_words(jax.random.PRNGKey(0))
    np.testing.assert_array_equal(table[0], [4.0, 5.0, 6.0])
    np.testing.assert_array_equal(table[1], [1.0, 2.0, 3.0])


def test_init_embedding_random_when_no_pretrained():
    table = init_embedding(jax.random.PRNGKey(0), ["a", "b", "c"], 4)
    assert table.shape == (3, 4)
    assert np.abs(table).max() > 0


def test_captioner_pretrained_embedding(tmp_path):
    from lrp_imagecaptioning_tpu.config import FlickrConfig
    from lrp_imagecaptioning_tpu.models.captioner import build_captioner

    p = tmp_path / "glove.txt"
    p.write_text("dog 1.0 0.0 0.0 0.0\ncat 0.0 1.0 0.0 0.0\n")
    cfg = FlickrConfig(embedding_dim=4, hidden_dim=8, img_feature_length=4,
                       img_feature_dim=12, sentence_length=4, drop_rate=0.0,
                       pretrained_word_vector="glove")
    cap = build_captioner("adaptiveattention", cfg, 3)
    params = cap.init_params(jax.random.PRNGKey(0),
                             vocab_words=["dog", "zzz", "cat"],
                             word_vector_path=str(p))
    emb = np.asarray(params["decoder"]["embedding"])
    np.testing.assert_array_equal(emb[0], [1, 0, 0, 0])
    np.testing.assert_array_equal(emb[2], [0, 1, 0, 0])
    assert np.abs(emb[1]).max() > 0  # unknown word keeps random init
