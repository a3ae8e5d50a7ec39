"""Relevance-geometry probe: does the colour word's LRP land on the rectangle?

Trains the adaptive model 350 steps on the mini-Flickr30k fixture (whose
captions name the colour of a drawn rectangle), then measures the
inside/outside mean-|relevance| ratio of each image's TEACHER-FORCED colour
word against the rectangle's bbox — the toy-scale version of the reference's
evaluate_bbox.py correctness protocol.

MEASURED (2026-08-18, final loss 0.35 both times — training is deterministic
per environment):

* plain single-device CPU: in/out ratios red 42.7 / blue 19.7+22.7 /
  yellow 52.7+54.1 / red 29.6, green 1.27+0.64 — median 26x, 6/8 above 2x.
  The explanation pipeline tracks the learned evidence.
* 8-virtual-device CPU (the test-suite environment, different XLA codegen):
  training converges to a DIFFERENT minimum with equally-correct captions
  whose colour evidence sits OUTSIDE the box (median ratio 0.09). At this
  toy scale the geometry is a property of which minimum training lands in,
  which is why tests/test_learning.py asserts caption learning +
  explanation well-formedness but NOT geometry. On real checkpoints the
  bbox-correctness evaluation (cli evaluate-bbox) is the protocol.

Run: python experiments/relevance_geometry_probe.py  (CPU, ~6 min)
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax

jax.config.update("jax_platforms", "cpu")
import numpy as np
import jax.numpy as jnp

from lrp_imagecaptioning_tpu.config import FlickrConfig
from lrp_imagecaptioning_tpu.data.datasets import Flickr30kDataset
from lrp_imagecaptioning_tpu.data.minifixture import _SCENES, write_mini_flickr30k
from lrp_imagecaptioning_tpu.data.provider import DatasetProvider
from lrp_imagecaptioning_tpu.models.captioner import build_captioner
from lrp_imagecaptioning_tpu.train.optimizer import make_optimizer
from lrp_imagecaptioning_tpu.train.step import make_train_step
from lrp_imagecaptioning_tpu.explain.engine import Explainer
from lrp_imagecaptioning_tpu.data.images import ImagePreprocessor

root = "/tmp/lrpic_geometry_probe"
T = 12
if not os.path.exists(os.path.join(root, "Flickr30k_text", "Flickr30k.token")):
    write_mini_flickr30k(root)
cfg = FlickrConfig(dataset_root=root, embedding_dim=32, hidden_dim=48,
    sentence_length=T, drop_rate=0.0, batch_size=8,
    rare_words_handling="nothing", learning_rate=3e-3,
    image_size=(64, 64), img_feature_length=16)
ds = Flickr30kDataset(cfg)
prov = DatasetProvider(ds, cfg)
cap = build_captioner("adaptiveattention", cfg, prov.vocab_size)
params = cap.init_params(jax.random.PRNGKey(0))
opt = make_optimizer("adaptiveattention", cfg.learning_rate)
opt_state = opt.init(params)
step = make_train_step(cap, opt, donate=False)
gen = prov.training_set(pad_to_length=T)
rng = jax.random.PRNGKey(1)
for i in range(350):
    (x, imgs), y = next(gen)
    rng, k = jax.random.split(rng)
    params, opt_state, m = step(params, opt_state, jnp.asarray(imgs),
                                jnp.asarray(x, jnp.int32), jnp.asarray(y), k)
print("final loss", float(m["loss"]))

pp = prov.caption_preprocessor
ex = Explainer(cap, params, pp, method="lrp", beam_size=2, max_len=T,
               word_buckets=(4, 8))
scene_of = {s[0]: (s[1], s[2], s[3]) for s in _SCENES}
seen, datums = set(), []
for d in ds.training_set:
    if d.img_filename not in seen:
        seen.add(d.img_filename); datums.append(d)
ip = ImagePreprocessor(encoder=cfg.img_encoder, image_size=cfg.image_size)
ratios = []
for d in datums:
    img = ip.preprocess_batch_paths([d.img_path])[0]
    obj, colour, bbox = scene_of[d.img_filename.split(".")[0]]
    # teacher-forced: ground-truth first caption, SOS stripped, padded to T
    enc = pp.encode_captions([d.all_captions_txt[0]])[0]
    toks = np.zeros(T, np.int32)
    body = enc[1:]  # strip SOS; keep words + EOS
    toks[:min(T, len(body))] = body[:T]
    e = ex.analyze(img, tokens_1based=toks)
    wi = e.words.index(colour)
    hm = np.abs(np.asarray(e.relevance_maps[wi])).sum(-1)
    x0, y0, x1, y1 = bbox
    sy = 64 / 48
    y0r, y1r = int(y0 * sy), int(y1 * sy)
    mask = np.zeros_like(hm, bool); mask[y0r:y1r, x0:x1] = True
    inside = hm[mask].mean(); outside = hm[~mask].mean()
    ratios.append(float(inside / max(outside, 1e-30)))
    print(d.img_filename, colour, "in/out", round(ratios[-1], 2))
print("median", float(np.median(ratios)), "min", min(ratios))
