"""End-to-end LEARNING rehearsal: the framework actually learns to caption —
and its explanations point at the learned evidence.

Every other training test asserts mechanics (finite losses, checkpoints,
bit-equality across execution paths). These assert semantics on the
mini-Flickr30k fixture, whose captions name the colour of a drawn rectangle
(data/minifixture.py):

* the teacher-forced loss collapses and greedy captions name the right
  colour for most training images (the full reference workflow,
  train.py:686-716 semantics: joint encoder+decoder training,
  model.py:435 trainable=True);
* teacher-forced explanations of the trained model are well-formed (the
  geometric bbox-concentration property is deliberately NOT asserted — see
  the second test's note and experiments/relevance_geometry_probe.py).

One shared 350-step training run (~4 min CPU at 64px/hidden-48) feeds both.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from lrp_imagecaptioning_tpu.config import FlickrConfig
from lrp_imagecaptioning_tpu.data.datasets import Flickr30kDataset
from lrp_imagecaptioning_tpu.data.images import ImagePreprocessor
from lrp_imagecaptioning_tpu.data.minifixture import _SCENES, write_mini_flickr30k
from lrp_imagecaptioning_tpu.data.provider import DatasetProvider
from lrp_imagecaptioning_tpu.infer.greedy import greedy_decode
from lrp_imagecaptioning_tpu.models.captioner import build_captioner
from lrp_imagecaptioning_tpu.train.optimizer import make_optimizer
from lrp_imagecaptioning_tpu.train.step import make_train_step

T = 12
# colour accuracy keeps improving after the loss plateaus (~step 120): at
# step 200 only 2/8 images decode the right colour, at 300+ it is 6/8
STEPS = 350


@pytest.fixture(scope="module")
def trained(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("mini"))
    write_mini_flickr30k(root)
    cfg = FlickrConfig(
        dataset_root=root, embedding_dim=32, hidden_dim=48, sentence_length=T,
        drop_rate=0.0, batch_size=8, rare_words_handling="nothing",
        learning_rate=3e-3, image_size=(64, 64), img_feature_length=16,
    )
    ds = Flickr30kDataset(cfg)
    prov = DatasetProvider(ds, cfg)
    cap = build_captioner("adaptiveattention", cfg, prov.vocab_size)
    params = cap.init_params(jax.random.PRNGKey(0))
    opt = make_optimizer("adaptiveattention", cfg.learning_rate)
    opt_state = opt.init(params)
    step = make_train_step(cap, opt, donate=False)

    gen = prov.training_set(pad_to_length=T)
    rng = jax.random.PRNGKey(1)
    first = last = None
    for i in range(STEPS):
        (x, imgs), y = next(gen)
        rng, k = jax.random.split(rng)
        params, opt_state, m = step(params, opt_state, jnp.asarray(imgs),
                                    jnp.asarray(x, jnp.int32), jnp.asarray(y), k)
        if i == 0:
            first = float(m["loss"])
        last = float(m["loss"])

    seen, datums = set(), []
    for d in ds.training_set:
        if d.img_filename not in seen:
            seen.add(d.img_filename)
            datums.append(d)
    return cfg, ds, prov, cap, params, datums, first, last


def _scene(datum):
    table = {s[0]: (s[1], s[2], s[3]) for s in _SCENES}
    return table[datum.img_filename.split(".")[0]]


@pytest.mark.slow
def test_model_learns_to_caption_colours(trained):
    cfg, ds, prov, cap, params, datums, first, last = trained

    # (a) the teacher-forced loss collapses (measured: 2.84 -> ~0.35 by 350)
    assert last < 0.25 * first, (first, last)

    # (b) greedy captions name the drawn rectangle's colour on at least half
    # of the 8 unique training images (measured: 6/8 at 350 steps; threshold
    # leaves margin for cross-host reduction-order drift)
    pp = prov.caption_preprocessor
    ip = ImagePreprocessor(encoder=cfg.img_encoder, image_size=cfg.image_size)
    imgs = ip.preprocess_batch_paths([d.img_path for d in datums])
    feat = cap.encode(params, jnp.asarray(imgs))
    toks, _ = greedy_decode(cap, params, feat, pp.SOS_TOKEN_LABEL_ENCODED,
                            pp.EOS_TOKEN_LABEL_ENCODED, T)
    hits = []
    for d, row in zip(datums, np.asarray(toks)):
        words = [pp.word_of.get(int(t), "?") for t in row if t > 0]
        _, colour, _ = _scene(d)
        hits.append(colour in words)
    assert sum(hits) >= len(hits) // 2, list(zip([d.img_filename for d in datums], hits))


@pytest.mark.slow
def test_teacher_forced_explanations_run_on_trained_model(trained):
    """Explanations of the trained model under teacher-forced ground-truth
    tokens are well-formed (finite, non-degenerate, word-aligned).

    NOTE a stronger geometric assertion (colour-word relevance concentrating
    inside the drawn rectangle) was prototyped and measured: it HOLDS in one
    environment (in/out mean-|relevance| ratios 19-54x on 6/8 images,
    experiments/relevance_geometry_probe.py) but at this toy scale the
    learned evidence geometry is a property of which minimum training lands
    in — a numerically different environment (8-virtual-device CPU codegen)
    converged to a model with correct captions whose colour evidence sits
    OUTSIDE the box. Asserting geometry here would test the trained model,
    not the framework; the probe script records the methodology for real
    checkpoints, where evaluate-bbox is the protocol."""
    from lrp_imagecaptioning_tpu.explain.engine import Explainer

    cfg, ds, prov, cap, params, datums, _, _ = trained
    pp = prov.caption_preprocessor
    ex = Explainer(cap, params, pp, method="lrp", beam_size=2, max_len=T,
                   word_buckets=(4, 8))
    ip = ImagePreprocessor(encoder=cfg.img_encoder, image_size=cfg.image_size)

    d = datums[0]
    img = ip.preprocess_batch_paths([d.img_path])[0]
    _, colour, _ = _scene(d)
    # teacher-forced tokens: ground-truth caption, SOS stripped, pad to T
    enc = pp.encode_captions([d.all_captions_txt[0]])[0]
    toks = np.zeros(T, np.int32)
    body = enc[1:]
    toks[: min(T, len(body))] = body[:T]
    e = ex.analyze(img, tokens_1based=toks)
    assert colour in e.words
    assert e.relevance_maps.shape == (len(e.words), *cfg.image_size, 3)
    hm = np.abs(np.asarray(e.relevance_maps[e.words.index(colour)]))
    assert np.isfinite(hm).all() and hm.max() > 0
    # non-degenerate: relevance is spatially structured, not constant
    assert hm.sum(-1).std() > 1e-6 * hm.sum(-1).mean()
