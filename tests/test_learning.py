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

One shared 600-step training run (~10 min CPU at 64px/hidden-48) feeds both.
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
# RECIPE NOTE (round 5): the original lr=3e-3/350-step recipe was
# trajectory-chaotic across hosts — on the host it was calibrated on it
# reached 6/8 colour captions, but a host with a different XLA:CPU
# reduction order converged (deterministically, both at r04 and r05 HEAD)
# to a colour-HEDGING minimum: teacher-forced loss collapsed to the same
# 0.35 yet greedy decode emitted one modal caption for every image (2/8).
# lr=1e-3 with 600 steps escapes that minimum (measured on the affected
# host: 3/8 @350 -> 4/8 @500 -> 8/8 @600, loss 0.244 — every caption names
# BOTH the correct colour and object), trading ~2x fixture runtime for a
# recipe whose basin is robust to summation-order perturbations.
STEPS = 600


@pytest.fixture(scope="module")
def trained(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("mini"))
    write_mini_flickr30k(root)
    cfg = FlickrConfig(
        dataset_root=root, embedding_dim=32, hidden_dim=48, sentence_length=T,
        drop_rate=0.0, batch_size=8, rare_words_handling="nothing",
        learning_rate=1e-3, image_size=(64, 64), img_feature_length=16,
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


def _greedy_captions(cfg, prov, cap, params, datums):
    """Greedy-decode each datum's image; returns word lists (EOS-stripped)."""
    pp = prov.caption_preprocessor
    ip = ImagePreprocessor(encoder=cfg.img_encoder, image_size=cfg.image_size)
    imgs = ip.preprocess_batch_paths([d.img_path for d in datums])
    feat = cap.encode(params, jnp.asarray(imgs))
    toks, _ = greedy_decode(cap, params, feat, pp.SOS_TOKEN_LABEL_ENCODED,
                            pp.EOS_TOKEN_LABEL_ENCODED, T)
    captions = []
    for row in np.asarray(toks):
        words = []
        for t in row:
            if t <= 0 or t == pp.EOS_TOKEN_LABEL_ENCODED:
                break
            words.append(pp.word_of.get(int(t), "?"))
        captions.append(words)
    return captions


def _colour_hits(cfg, prov, cap, params, datums):
    captions = _greedy_captions(cfg, prov, cap, params, datums)
    return [_scene(d)[1] in words for d, words in zip(datums, captions)]


@pytest.mark.slow
def test_model_learns_to_caption_colours(trained):
    cfg, ds, prov, cap, params, datums, first, last = trained

    # (a) the teacher-forced loss collapses (measured: 2.84 -> ~0.24 by 600)
    assert last < 0.25 * first, (first, last)

    # (b) greedy captions name the drawn rectangle colour on at least half
    # of the 8 unique training images (measured: 8/8 at 600 steps; threshold
    # leaves margin for cross-host reduction-order drift)
    hits = _colour_hits(cfg, prov, cap, params, datums)
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


@pytest.mark.slow
def test_lrp_finetune_semantic_rehearsal(trained, tmp_path, monkeypatch):
    """The paper's core loop, end-to-end and ASSERTED at fixture scale:
    train -> LRP-inference finetune (through the CLI, reference
    train.py:519-673 driven as chunks like train.py:696-716) -> evaluate.

    Asserts (VERDICT r03 item 2):
    (a) the emitted relevance weights follow the reference mechanics on REAL
        model predictions — weight 1 everywhere except the predicted-word
        slot of non-stop pre-EOS words (model.py:2035-2061);
    (b) the dual loss (model.py:1308-1312) decreases over the finetune and
        greedy captions do not degrade;
    (c) the hallucination proxy — frequent-object mAP over the fixture's
        colour+object vocabulary (exaimin_word.py:315-367 semantics via
        evalx.words.frequent_object_map) — does not regress.
    """
    from lrp_imagecaptioning_tpu import cli
    from lrp_imagecaptioning_tpu.evalx.words import frequent_object_map
    from lrp_imagecaptioning_tpu.train.checkpoint import (
        latest_checkpoint, restore_checkpoint, save_params_npz)
    from lrp_imagecaptioning_tpu.train.lrp_finetune import (
        dual_loss, lrp_weights, stop_word_table)

    cfg, ds, prov, cap, params, datums, _, _ = trained
    pp = prov.caption_preprocessor
    monkeypatch.chdir(tmp_path)

    sos = pp.SOS_TOKEN_LABEL_ENCODED
    eos = pp.EOS_TOKEN_LABEL_ENCODED
    stop_t = jnp.asarray(stop_word_table(pp))

    # one fixed teacher-forced batch for the before/after dual-loss probe
    (x_eval, imgs_eval), y_eval = next(prov.training_set(pad_to_length=T))
    x_eval = jnp.asarray(x_eval, jnp.int32)
    imgs_eval = jnp.asarray(imgs_eval)
    y_eval = jnp.asarray(y_eval)

    # max_words=4 throughout: the finetune runs the production
    # --max-explained-words path (first 4 valid words get the 1+score
    # bonus), which cuts the dominant per-step CNN-backward count 3x on
    # this 1-core host; the before/after dual-loss probe uses the SAME
    # capped objective the finetune optimizes
    MAX_WORDS = 4

    def dual_loss_of(p):
        logits = cap.forward_train(p, imgs_eval, x_eval, None)
        w = lrp_weights(cap, p, imgs_eval, logits, stop_t, sos, eos,
                        max_words=MAX_WORDS)
        return float(dual_loss(logits, w, y_eval)), np.asarray(logits), np.asarray(w)

    before_dual, logits_np, w_np = dual_loss_of(params)

    # ---- (a) weight mechanics on real predictions --------------------------
    stop_np = np.asarray(stop_t)
    caption1 = logits_np.argmax(-1) + 1                     # (B,T) 1-based
    n_explained = 0
    for b in range(caption1.shape[0]):
        seen_eos = False
        for t in range(caption1.shape[1]):
            tok = int(caption1[b, t])
            row = w_np[b, t]
            if seen_eos or tok == eos or stop_np[tok]:
                seen_eos = seen_eos or tok == eos
                assert (row == 1.0).all(), (b, t, tok, "skipped word must keep weight 1")
            else:
                off = np.delete(row, tok - 1)
                assert (off == 1.0).all(), (b, t, tok, "only the predicted slot is reweighted")
                if row[tok - 1] != 1.0:
                    n_explained += 1
    # a trained model on this fixture predicts real (non-stop) words: the
    # 1+score bonus must actually fire somewhere
    assert n_explained > 0

    # ---- before metrics ----------------------------------------------------
    hits_before = _colour_hits(cfg, prov, cap, params, datums)
    categories = ["red", "blue", "green", "yellow", "dog", "cat", "ball", "car", "tree"]

    def caption_map(p):
        captions = _greedy_captions(cfg, prov, cap, p, datums)
        id_to_pred = {d.img_filename: " ".join(ws)
                      for d, ws in zip(datums, captions)}
        id_to_refs = {d.img_filename: [c.lower() for c in d.all_captions_txt]
                      for d in datums}
        return frequent_object_map(id_to_pred, id_to_refs, categories)

    map_before = caption_map(params)

    # ---- finetune-lrp through the CLI (2 chunks x 6 iterations) -----------
    save_params_npz("trained.npz", params)
    cli.main([
        "finetune-lrp",
        "--dataset", "flickr30k", "--dataset-root", cfg.dataset_root,
        "--model", "adaptiveattention", "--batch-size", "8",
        "--set", "image_size=64,64",
        "--set", "img_feature_length=16",
        "--set", "embedding_dim=32",
        "--set", "hidden_dim=48",
        "--set", f"sentence_length={T}",
        "--set", "rare_words_handling=nothing",
        "--set", "drop_rate=0.0",
        "--weights", "trained.npz",
        "--chunks", "2", "--epoch-length", "3",
        # 2e-5, not the reference's 1e-6..2e-4 range midpoint: the round-5
        # base recipe (lr 1e-3 / 600 steps) converges to a SHARPER CE
        # optimum (loss 0.244 vs 0.354), and 6 finetune steps at 2e-4 were
        # measured to overshoot the dual objective from it (dual loss
        # 0.232 -> 0.310); first-order descent of the dual loss needs a
        # step gentle enough for the sharper basin
        "--learning-rate", "2e-5",
        "--max-explained-words", str(MAX_WORDS),
        "--out", "ft-out",
    ])
    ckpt = latest_checkpoint("ft-out")
    assert ckpt is not None, "finetune-lrp left no checkpoint"
    params_ft, _ = restore_checkpoint(ckpt, params)

    # ---- (b) dual loss decreases; captions don't degrade -------------------
    after_dual, _, _ = dual_loss_of(params_ft)
    assert after_dual < before_dual, (before_dual, after_dual)

    hits_after = _colour_hits(cfg, prov, cap, params_ft, datums)
    assert sum(hits_after) >= max(sum(hits_before) - 1, len(hits_after) // 2), (
        hits_before, hits_after)

    # ---- (c) hallucination proxy does not regress ---------------------------
    map_after = caption_map(params_ft)
    # one caption flipping one category word moves the fixture mAP by
    # (1/count_cat)/(len-1)*100 ~= 6.3; "does not regress" = no such flip
    assert map_after >= map_before - 1e-9, (map_before, map_after)
