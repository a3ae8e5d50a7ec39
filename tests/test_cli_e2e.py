"""End-to-end rehearsal of the full reference workflow from the command line.

One pytest that drives EVERY CLI subcommand against a mini-Flickr30k fixture
written in the reference's exact on-disk formats (Flickr30k.token `#<digit>\t`
lines, split lists, Flickr30kEntities Sentences/*.txt + Annotations/*.xml, a
COCO instances json). This is the in-repo stand-in for the real-data runs the
reference performs in train.py:686-716, inference.py:318-374,
explain_image.py:321-384, evaluate_bbox.py:360-671 and exaimin_word.py:315-746.

All stages run in ONE process so XLA compile caches carry across them, at a
64x64 input / 32-dim model so the whole chain stays minutes-scale on CPU.
"""

import glob
import json
import os
import threading
import urllib.request

import numpy as np
import pytest
import yaml

from lrp_imagecaptioning_tpu import cli
from lrp_imagecaptioning_tpu.data.minifixture import write_mini_flickr30k

pytestmark = pytest.mark.slow


def _common(root):
    return [
        "--dataset", "flickr30k", "--dataset-root", root,
        "--model", "adaptiveattention", "--batch-size", "4",
        "--set", "image_size=64,64",
        "--set", "img_feature_length=16",
        "--set", "embedding_dim=32",
        "--set", "hidden_dim=32",
        "--set", "sentence_length=15",
        "--set", "words_min_occur=1",
        "--set", "rare_words_handling=nothing",
        "--set", "drop_rate=0.0",
    ]


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("mini30k"))
    manifest = write_mini_flickr30k(root)
    assert manifest["n_images"] == 12
    return root


def test_full_reference_workflow(corpus, tmp_path, monkeypatch, capsys):
    monkeypatch.chdir(tmp_path)
    root = corpus

    # ---- train (train.py main_attention parity) -------------------------
    cli.main(["train", *_common(root), "--label", "e2e", "--epochs", "1"])
    ckpts = sorted(glob.glob("results/flickr30k/training-results/e2e/ckpt_*"))
    assert ckpts, "train left no checkpoint"
    assert os.path.exists("results/flickr30k/training-results/e2e/config.yaml")
    assert os.path.exists("results/flickr30k/training-results/e2e/metrics-log.csv")
    weights = ckpts[-1]

    # ---- finetune-lrp (train.py:519-673) --------------------------------
    cli.main([
        "finetune-lrp", *_common(root), "--weights", weights,
        "--chunks", "1", "--epoch-length", "2", "--out", "results/lrp-ft",
    ])
    out = capsys.readouterr().out
    assert "chunk 0:" in out

    # ---- evaluate (inference.py main: 3 yaml outputs) -------------------
    cli.main([
        "evaluate", *_common(root), "--weights", weights,
        "--beam-size", "2", "--out", "eval-out", "--spice-detailed",
    ])
    for name in ("metrics", "predictions", "reference"):
        assert os.path.exists(f"eval-out/test-{name}.yaml")
    with open("eval-out/test-metrics.yaml") as f:
        metrics = yaml.safe_load(f)
    assert "Bleu_1" in metrics and 0.0 <= metrics["Bleu_1"] <= 1.0
    assert "SPICE_Object" in metrics  # --spice-detailed breakdown emitted
    with open("eval-out/test-predictions.yaml") as f:
        preds = yaml.safe_load(f)
    assert len(preds) == 2  # test split size

    # ---- explain (explain_image.py drivers) -----------------------------
    img = os.path.join(root, "Flickr30k_images", "1015118661.jpg")
    cli.main([
        "explain", *_common(root), "--weights", weights,
        "--image", img, "--method", "lrp", "--beam-size", "2",
        "--out", "explain-out",
    ])
    rendered = glob.glob("explain-out/**/*.jpg", recursive=True)
    assert any(p.endswith("lrp_hm.jpg") for p in rendered), rendered
    assert any(p.endswith("attention.jpg") for p in rendered), rendered

    # ---- evaluate-bbox (evaluate_bbox.py) -------------------------------
    cli.main([
        "evaluate-bbox", *_common(root), "--weights", weights,
        "--entities-json", os.path.join(root, "Flickr30kEntities.json"),
        "--method", "lrp", "--beam-size", "2", "--max-images", "2",
        "--out", "bbox-correctness.json",
    ])
    assert os.path.exists("bbox-correctness.json")
    assert os.path.exists("bbox-correctness.csv")
    with open("bbox-correctness.json") as f:
        bbox_results = json.load(f)
    assert isinstance(bbox_results, dict)

    # ---- analyze-words (exaimin_word.py) --------------------------------
    cli.main([
        "analyze-words", *_common(root),
        "--predictions", "eval-out/test-predictions.yaml",
    ])
    out = capsys.readouterr().out
    assert "frequent-object mAP:" in out

    # ---- serve round-trip (deployment surface) --------------------------
    result = {}

    def client():
        import time
        base = "http://127.0.0.1:18931"
        for _ in range(120):
            try:
                with urllib.request.urlopen(f"{base}/healthz", timeout=2) as r:
                    if json.load(r)["ok"]:
                        break
            except Exception:
                time.sleep(1)
        imgs = np.random.default_rng(0).normal(size=(1, 64, 64, 3)).astype(np.float32)
        req = urllib.request.Request(
            f"{base}/caption", data=json.dumps({"images": imgs.tolist()}).encode(),
            headers={"Content-Type": "application/json"})
        with urllib.request.urlopen(req, timeout=120) as r:
            result["captions"] = json.load(r)["captions"]

    t = threading.Thread(target=client)
    t.start()
    cli.main([
        "serve", *_common(root), "--weights", weights, "--beam-size", "1",
        "--batch-size", "2", "--port", "18931", "--serve-seconds", "40",
    ])
    t.join(timeout=60)
    assert len(result.get("captions", [])) == 1
    assert isinstance(result["captions"][0], str)


def _common_model(root, model):
    args = _common(root)
    args[args.index("adaptiveattention")] = model
    return args


@pytest.mark.parametrize("model", ["gridTD", "aoa"])
def test_other_decoders_train_evaluate(corpus, tmp_path, monkeypatch, model):
    """The reference's other decoder families through the same CLI workflow:
    train one epoch on the mini-Flickr30k fixture, then beam-evaluate from
    the produced checkpoint (train.py MODELTYPE registry parity; AOA is the
    reference's dead code made to work)."""
    monkeypatch.chdir(tmp_path)
    root = corpus

    cli.main(["train", *_common_model(root, model), "--label", f"e2e-{model}",
              "--epochs", "1"])
    ckpts = sorted(glob.glob(
        f"results/flickr30k/training-results/e2e-{model}/ckpt_*"))
    assert ckpts, f"{model} train left no checkpoint"

    cli.main([
        "evaluate", *_common_model(root, model), "--weights", ckpts[-1],
        "--beam-size", "2", "--out", f"eval-{model}",
    ])
    with open(f"eval-{model}/test-metrics.yaml") as f:
        metrics = yaml.safe_load(f)
    assert "Bleu_1" in metrics and np.isfinite(metrics["Bleu_1"])
