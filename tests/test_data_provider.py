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
