"""DatasetProvider + synthetic dataset smoke tests."""

import numpy as np

from lrp_imagecaptioning_tpu.config import FlickrConfig
from lrp_imagecaptioning_tpu.data.datasets import SyntheticDataset
from lrp_imagecaptioning_tpu.data.provider import DatasetProvider


def make_provider(batch_size=4, single_caption=False):
    cfg = FlickrConfig(batch_size=batch_size, rare_words_handling="nothing", image_augmentation=False)
    ds = SyntheticDataset(cfg, n_train=8, n_val=4, n_test=4)
    return DatasetProvider(ds, cfg, single_caption=single_caption)


def test_provider_batches():
    p = make_provider()
    gen = p.training_set()
    (cap_in, imgs), y = next(gen)
    assert imgs.shape == (4, 224, 224, 3)
    assert imgs.dtype == np.float32
    assert cap_in.shape[0] == 4
    assert y.shape == (4, cap_in.shape[1], p.vocab_size)
    assert p.training_steps == 2


def test_provider_pad_to_length():
    p = make_provider()
    (cap_in, imgs), y = next(p.training_set(pad_to_length=20))
    assert cap_in.shape == (4, 20)
    assert y.shape == (4, 20, p.vocab_size)


def test_provider_single_caption_vocab_superset():
    p1 = make_provider(single_caption=False)
    p2 = make_provider(single_caption=True)
    assert set(p1.vocabs) <= set(p2.vocabs)


def test_provider_skip_batches_fast_forward():
    """skip_batches=N yields exactly what pulling N batches and discarding
    them would (resume fast-forward), without preprocessing the skipped ones."""
    p = make_provider()
    ref = p.training_set(pad_to_length=20)
    for _ in range(3):
        next(ref)
    (cap_ref, img_ref), y_ref = next(ref)

    skipped = p.training_set(pad_to_length=20, skip_batches=3)
    (cap_s, img_s), y_s = next(skipped)
    np.testing.assert_array_equal(cap_s, cap_ref)
    np.testing.assert_array_equal(img_s, img_ref)
    np.testing.assert_array_equal(y_s, y_ref)


def test_provider_skip_batches_skips_preprocessing(monkeypatch):
    """The fast-forward must not pay image preprocessing for skipped batches."""
    p = make_provider()
    calls = []
    orig = p.image_preprocessor.preprocess_batch_paths

    def counting(paths, rt):
        calls.append(len(paths))
        return orig(paths, rt)

    monkeypatch.setattr(p.image_preprocessor, "preprocess_batch_paths", counting)
    gen = p.training_set(skip_batches=5)
    next(gen)
    assert len(calls) == 1  # only the yielded batch was preprocessed


def test_provider_drop_remainder():
    """drop_remainder skips the short epoch-tail batch (static jit shapes)."""
    cfg = FlickrConfig(batch_size=3, rare_words_handling="nothing",
                       image_augmentation=False)
    ds = SyntheticDataset(cfg, n_train=8, n_val=4, n_test=4)
    p = DatasetProvider(ds, cfg)
    gen = p.training_set(drop_remainder=True)
    # 8 train data / batch 3 -> [3, 3, (2 dropped)], then wraps to 3 again
    for _ in range(5):
        (cap_in, imgs), _ = next(gen)
        assert imgs.shape[0] == 3
