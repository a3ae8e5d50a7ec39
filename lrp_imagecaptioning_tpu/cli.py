"""Command-line entry points.

The reference has no CLI at all — every entry point is an edit-me
``__main__`` block with hard-coded paths (train.py:686-716,
inference.py:377-420, explain_image.py:374-384). This module replaces that
with argparse subcommands over the same operations:

    python -m lrp_imagecaptioning_tpu.cli train       --dataset flickr30k --model gridTD ...
    python -m lrp_imagecaptioning_tpu.cli finetune-lrp --weights ckpt ...
    python -m lrp_imagecaptioning_tpu.cli evaluate    --weights ckpt --beam-size 3 ...
    python -m lrp_imagecaptioning_tpu.cli explain     --weights ckpt --image path.jpg --method lrp
"""

from __future__ import annotations

import argparse

# mirrors explain.engine.METHODS; kept as a literal so `--help` does not
# import jax (tests assert the two stay in sync)
_METHOD_CHOICES = ("lrp", "gradient", "input_times_gradient", "guided_gradcam",
                   "integrated_gradients", "smoothgrad", "guided_backprop",
                   "deconvnet", "deep_taylor", "deep_lift")


def _coerce_config_value(cfg, key: str, raw: str):
    """Parse a --set key=value string against the dataclass field's type."""
    import dataclasses

    fields = {f.name: f for f in dataclasses.fields(type(cfg))}
    if key not in fields:
        raise SystemExit(f"--set: unknown config field {key!r}")
    current = getattr(cfg, key)
    if raw.lower() in ("none", "null"):
        return None
    if isinstance(current, bool):
        return raw.lower() in ("1", "true", "yes")
    if isinstance(current, int):
        return int(raw)
    if isinstance(current, float):
        return float(raw)
    if isinstance(current, tuple):
        return tuple(int(x) for x in raw.split(","))
    if current is None:
        # default None hides the field's type; use the dataclass annotation
        ann = str(next(f.type for f in dataclasses.fields(cfg) if f.name == key))
        if "tuple" in ann or "Tuple" in ann:
            vals = tuple(int(x) for x in raw.split(","))
            return vals * 2 if len(vals) == 1 else vals  # "64" -> (64, 64)
        if "int" in ann:
            return int(raw)
        if "float" in ann:
            return float(raw)
    return raw


def _build_config(args):
    """Config from --dataset/--set/common flags, WITHOUT touching the
    dataset files (cmd_parity runs dataset-less against a bare .hdf5)."""
    from .config import COCO2014Config, COCOConfig, FlickrConfig

    cfg_cls = {
        "flickr30k": FlickrConfig,
        "coco": COCOConfig,
        "coco2014": COCO2014Config,
        "synthetic": FlickrConfig,
    }[args.dataset]
    cfg = cfg_cls()
    overrides = {}
    for field in ("batch_size", "learning_rate", "epochs"):
        v = getattr(args, field, None)
        if v is not None:
            overrides[field] = v
    if getattr(args, "dataset_root", None):
        overrides["dataset_root"] = args.dataset_root
    if getattr(args, "bf16", False):
        overrides["compute_dtype"] = "bfloat16"
    for kv in getattr(args, "config_set", None) or ():
        key, _, raw = kv.partition("=")
        overrides[key] = _coerce_config_value(cfg, key, raw)
    if overrides:
        cfg = cfg.replace(**overrides)
    return cfg


def _build_dataset(args):
    from .data.datasets import COCODataset, COCODatasetKarpathy, Flickr30kDataset

    cfg = _build_config(args)
    if args.dataset == "synthetic":
        from .data.datasets import SyntheticDataset

        return cfg, SyntheticDataset(cfg)
    ds_cls = {
        "flickr30k": Flickr30kDataset,
        "coco": COCODataset,
        "coco2014": COCODatasetKarpathy,
    }[args.dataset]
    return cfg, ds_cls(cfg)


def _add_common(p):
    p.add_argument("--dataset", default="flickr30k",
                   choices=["flickr30k", "coco", "coco2014", "synthetic"])
    p.add_argument("--model", dest="model_type", default="adaptiveattention",
                   choices=["adaptiveattention", "gridTD", "aoa"])
    p.add_argument("--weights", default=None, help=".npz / orbax dir / reference .hdf5")
    p.add_argument("--batch-size", type=int, dest="batch_size", default=None)
    p.add_argument("--dataset-root", dest="dataset_root", default=None,
                   help="override the config's dataset_root path")
    p.add_argument("--set", dest="config_set", action="append", metavar="KEY=VALUE",
                   help="override any config field, e.g. --set hidden_dim=64 "
                        "(repeatable; values parsed by field type)")
    p.add_argument("--bf16", action="store_true",
                   help="mixed precision: encoder matmuls in bfloat16 on the "
                        "MXU, f32 master params/optimizer "
                        "(= --set compute_dtype=bfloat16)")


def cmd_train(args):
    from .train.trainer import Trainer

    cfg, dataset = _build_dataset(args)
    mesh = None
    if args.num_devices:
        from .parallel import make_mesh

        mesh = make_mesh(args.num_devices)
    t = Trainer(args.model_type, cfg, dataset, label=args.label, mesh=mesh,
                steps_per_call=args.steps_per_call)
    if args.weights:
        t.load_weights(args.weights)
    if args.resume:
        t.resume_latest()
    t.run(epochs=args.epochs, time_limit=args.time_limit)


def cmd_finetune_lrp(args):
    import jax

    from .data.provider import DatasetProvider
    from .models.captioner import build_captioner
    from .train.lrp_finetune import LRPFinetuner

    cfg, dataset = _build_dataset(args)
    provider = DatasetProvider(dataset, cfg)
    captioner = build_captioner(args.model_type, cfg, provider.vocab_size)
    params = _load_params(captioner, args)
    tuner = LRPFinetuner(captioner, params, provider, mode=args.lrp_mode,
                         learning_rate=args.learning_rate or 1e-6,
                         steps_per_call=args.steps_per_call,
                         max_explained_words=args.max_explained_words)
    # reference drives 50 chunks x 10 iterations (train.py:696-716)
    for save_idx in range(args.start_chunk, args.chunks):
        m = tuner.run(save_idx, args.epoch_length, result_dir=args.out or "results/lrp-finetune")
        print(f"chunk {save_idx}: {m}")


def cmd_evaluate(args):
    from .data.provider import DatasetProvider
    from .infer.api import BasicInference, BeamSearchInference
    from .models.captioner import build_captioner

    cfg, dataset = _build_dataset(args)
    provider = DatasetProvider(dataset, cfg)
    captioner = build_captioner(args.model_type, cfg, provider.vocab_size)
    params = _load_params(captioner, args)
    cls = BeamSearchInference if args.beam_size > 1 else BasicInference
    kw = {"beam_size": args.beam_size} if args.beam_size > 1 else {}
    if getattr(args, "spice_detailed", False):
        # swap the detailed SPICE into the metric list up front so the corpus
        # is parsed (or the jar run) once, not twice
        from .evalx.metrics import SPICE, default_metrics

        kw["metrics"] = [m if not isinstance(m, SPICE) else SPICE(detailed=True)
                         for m in default_metrics()]
    inference = cls(captioner, params, provider, max_caption_length=cfg.sentence_length, **kw)
    metrics, preds, refs = inference.evaluate_test_set(include_prediction=True)
    if getattr(args, "bert_model", None):
        from .evalx.metrics import BERT

        metrics.update(BERT(model_path=args.bert_model).calculate(preds, refs))
    print(metrics)
    if args.out:
        import os

        import yaml

        os.makedirs(args.out, exist_ok=True)
        for name, obj in [("metrics", metrics), ("predictions", preds), ("reference", refs)]:
            with open(os.path.join(args.out, f"test-{name}.yaml"), "w") as f:
                yaml.safe_dump(obj, f)


def cmd_explain(args):
    from .data.provider import DatasetProvider
    from .explain.drivers import explain_image_file, process_beam_search
    from .models.captioner import build_captioner

    cfg, dataset = _build_dataset(args)
    provider = DatasetProvider(dataset, cfg)
    captioner = build_captioner(args.model_type, cfg, provider.vocab_size)
    params = _load_params(captioner, args)
    out = args.out or ((args.weights or "model") + ".explanation")
    if args.image:
        ex = explain_image_file(captioner, params, provider.caption_preprocessor,
                                args.image, out, method=args.method, beam_size=args.beam_size)
        print(ex.caption)
    else:
        for ex in process_beam_search(captioner, params, provider, out,
                                      method=args.method, beam_size=args.beam_size,
                                      num_images=args.num_images):
            print(ex.caption)


def cmd_evaluate_bbox(args):
    """evaluate_bbox.py driver parity: bbox correctness over the test split."""
    from .data.categories import load_entities_json
    from .data.provider import DatasetProvider
    from .evalx.bbox import analyze_results, evaluate_dataset
    from .explain.engine import Explainer
    from .models.captioner import build_captioner

    cfg, dataset = _build_dataset(args)
    provider = DatasetProvider(dataset, cfg)
    captioner = build_captioner(args.model_type, cfg, provider.vocab_size)
    params = _load_params(captioner, args)
    explainer = Explainer(captioner, params, provider.caption_preprocessor,
                          method=args.method, beam_size=args.beam_size)
    category_dict = load_entities_json(args.entities_json)
    out_json = args.out or "bbox-correctness.json"
    results = evaluate_dataset(explainer, provider, category_dict, out_json,
                               negate=not args.positive, max_images=args.max_images)
    agg = analyze_results(results, out_csv=out_json.replace(".json", ".csv"))
    print(agg)


def cmd_analyze_words(args):
    """exaimin_word.py driver parity: frequent-object mAP + ROC-AUC stats."""
    import yaml

    from .data.provider import DatasetProvider
    from .evalx.words import (
        COCO_FREQUENT_OBJECT,
        FREQUENT_OBJECT,
        beta_roc_auc,
        collect_word_stats,
        frequent_object_map,
        mean_roc_auc,
    )
    from .explain.engine import Explainer
    from .models.captioner import build_captioner

    cfg, dataset = _build_dataset(args)
    with open(args.predictions) as f:
        raw = yaml.safe_load(f)
    id_to_pred = {k: (v[0]["caption"] if isinstance(v, list) else v) for k, v in raw.items()}
    id_to_refs = {d.img_filename: list(d.all_captions_txt) for d in dataset.test_set}
    cats = COCO_FREQUENT_OBJECT if args.dataset.startswith("coco") else FREQUENT_OBJECT
    print("frequent-object mAP:", frequent_object_map(id_to_pred, id_to_refs, cats))

    if args.roc_auc:
        # the provider (a full vocabulary fit over every training caption —
        # minutes at COCO scale) is only needed for the explainer path
        provider = DatasetProvider(dataset, cfg)
        captioner = build_captioner(args.model_type, cfg, provider.vocab_size)
        params = _load_params(captioner, args)
        explainer = Explainer(captioner, params, provider.caption_preprocessor,
                              method="lrp", beam_size=args.beam_size)
        stats = collect_word_stats(explainer, provider, id_to_pred, cats,
                                   max_images=args.max_images)
        _, _, auc_b = beta_roc_auc(stats)
        _, _, auc_l = mean_roc_auc(stats, "lrp_mean")
        _, _, auc_a = mean_roc_auc(stats, "attention_mean")
        print(f"ROC-AUC beta={auc_b:.4f} lrp_mean={auc_l:.4f} attention_mean={auc_a:.4f}")


def _load_params(captioner, args):
    import jax

    params = captioner.init_params(jax.random.PRNGKey(0))
    if not args.weights:
        return params
    if args.weights.endswith((".h5", ".hdf5")):
        from .models.weights_io import load_reference_checkpoint_h5

        return load_reference_checkpoint_h5(args.weights, captioner.model_type,
                                            captioner.cfg.img_encoder, captioner.cfg.layer_name)
    if args.weights.endswith(".npz"):
        from .train.checkpoint import load_params_npz

        return load_params_npz(args.weights)
    from .train.checkpoint import restore_checkpoint

    params, _ = restore_checkpoint(args.weights, params)
    return params


def parity_diff(got: dict, exp, tol: float) -> list:
    """Compare a freshly-computed parity record against a stored one.

    Returns a list of human-readable failure strings (empty = parity OK)
    and prints per-array deviation lines. Zero-word records (immediate EOS
    decode — the very failure mode the harness exists to diagnose) compare
    by shape alone instead of tripping numpy's empty-reduction error."""
    import numpy as np

    failures = []
    if not np.array_equal(got["tokens_1based"], exp["tokens_1based"]):
        failures.append(
            f"tokens differ: got {np.asarray(got['tokens_1based']).tolist()} "
            f"expected {np.asarray(exp['tokens_1based']).tolist()}")
    for key in ("relevance_maps", "attentions"):
        want = exp[key]
        if got[key].shape != want.shape:
            failures.append(f"{key} shape {got[key].shape} != {want.shape}")
            continue
        if want.size == 0:
            dev = 0.0
        else:
            scale = float(np.abs(want).max()) or 1.0
            dev = float(np.abs(got[key] - want).max()) / scale
        status = "ok" if dev <= tol else "FAIL"
        print(f"{key}: max dev {dev:.3e} of expectation scale "
              f"(tol {tol:g}) {status}")
        if dev > tol:
            failures.append(f"{key} deviates {dev:.3e} > tol {tol:g}")
    return failures


def cmd_parity(args):
    """Published-checkpoint parity harness (MIGRATION.md: the FIRST action
    when reference weights become available). Loads a reference Keras .hdf5
    (README.md:33 pretrained links; save format train.py:79-88), captions +
    explains one image through the full pipeline, then either RECORDS the
    outputs (--out DIR) or DIFFS them against a recorded expectation
    (--expect DIR) — token-exact captions, relevance/attention maps within
    --tol of the expectation's scale. Exit code 1 on mismatch.

    Model dims (vocab/hidden/embedding) are inferred from the .hdf5 itself,
    so no dataset is needed; pass --dataset-root to decode real words (the
    published checkpoints pair with the dataset vocabulary)."""
    import numpy as np

    from .data.images import ImagePreprocessor
    from .explain.engine import Explainer
    from .models.captioner import build_captioner
    from .models.weights_io import infer_h5_dims, load_reference_checkpoint_h5

    dims = infer_h5_dims(args.h5)
    cfg = _build_config(args).replace(embedding_dim=dims["embedding_dim"],
                                      hidden_dim=dims["hidden_dim"])
    if getattr(args, "dataset_root", None):
        from .data.provider import DatasetProvider

        _, dataset = _build_dataset(args)
        pp = DatasetProvider(dataset, cfg).caption_preprocessor
        vocab_size = dims["vocab_size"]
    else:
        from types import SimpleNamespace

        vocab_size = dims["vocab_size"]
        pp = SimpleNamespace(
            SOS_TOKEN="szeros", EOS_TOKEN="zeros",
            SOS_TOKEN_LABEL_ENCODED=1, EOS_TOKEN_LABEL_ENCODED=2,
            word_of={i: f"w{i}" for i in range(1, vocab_size + 1)})
        pp.word_of[1], pp.word_of[2] = "szeros", "zeros"

    captioner = build_captioner(args.model_type, cfg, vocab_size)
    params = load_reference_checkpoint_h5(args.h5, args.model_type,
                                          cfg.img_encoder, cfg.layer_name)
    # image_size=None resolves to the per-encoder default (299 for
    # inception, 224 otherwise) inside ImagePreprocessor — one policy site
    ip = ImagePreprocessor(encoder=cfg.img_encoder, image_size=cfg.image_size)
    img = ip.preprocess_batch_paths([args.image])[0]

    ex = Explainer(captioner, params, pp, method=args.method,
                   beam_size=args.beam_size, max_len=cfg.sentence_length)
    e = ex.analyze(img)
    got = {
        "tokens_1based": np.asarray(e.tokens_1based),
        "relevance_maps": np.asarray(e.relevance_maps),
        "attentions": np.asarray(e.attentions),
    }
    print(f"caption: {e.caption}")

    import os

    if args.expect:
        exp = np.load(os.path.join(args.expect, "parity-expected.npz"))
        failures = parity_diff(got, exp, args.tol)
        if failures:
            raise SystemExit("PARITY FAIL:\n  " + "\n  ".join(failures))
        print("PARITY OK")
    else:
        out = args.out or (args.h5 + ".parity")
        os.makedirs(out, exist_ok=True)
        np.savez(os.path.join(out, "parity-expected.npz"), **got)
        with open(os.path.join(out, "caption.txt"), "w") as f:
            f.write(e.caption + "\n")
        print(f"recorded parity expectation in {out} "
              f"(re-run with --expect {out} to diff)")


def cmd_export_serving(args):
    """Package the compiled decode (+ optional explain) programs as a
    portable StableHLO serving artifact (infer/export.py) — loadable with
    jax+numpy alone, no model/config/tokenizer code."""
    from .data.provider import DatasetProvider
    from .infer.export import export_serving
    from .models.captioner import build_captioner

    cfg, dataset = _build_dataset(args)
    provider = DatasetProvider(dataset, cfg)
    captioner = build_captioner(args.model_type, cfg, provider.vocab_size)
    params = _load_params(captioner, args)
    out = export_serving(
        captioner, params, provider.caption_preprocessor, args.out,
        batch_size=args.batch_size or cfg.batch_size, beam_size=args.beam_size,
        method=args.method if args.with_explain else None,
    )
    print(f"exported serving artifact to {out}")


def cmd_serve(args):
    """Production serving: warmed CaptionService + micro-batching queue behind
    the stdlib HTTP front-end (no reference analog — new deployment surface).
    With ``--exported DIR`` the service is an ExportedService over a
    StableHLO artifact — no model/config/tokenizer code in this process."""
    from .infer.http_server import CaptionHTTPServer

    if getattr(args, "exported", None):
        from .infer.export import ExportedService

        # fail at startup, not per-request (the non-exported path's
        # svc.warmup(explain=..., method=...) contract): the artifact pins
        # explain availability/method and batch/beam at export time —
        # validate against meta.json BEFORE paying deserialize+warmup
        import json as _json
        import os as _os

        with open(_os.path.join(args.exported, "meta.json")) as f:
            meta = _json.load(f)
        exported_method = meta.get("method")
        if args.with_explain and not exported_method:
            raise SystemExit(
                "--with-explain: artifact was exported without explain "
                "programs (re-export with --with-explain/--method)")
        if args.with_explain and args.method and args.method != exported_method:
            raise SystemExit(
                f"--method {args.method}: artifact was exported with method "
                f"{exported_method!r}")
        for flag, val, default in (
            ("--batch-size", args.batch_size, None),
            ("--beam-size", args.beam_size, 3),
            ("--shard-words", getattr(args, "shard_words", False), False),
            ("--split-buckets", getattr(args, "split_buckets", False), False),
        ):
            if val != default:
                print(f"warning: {flag} is fixed at export time; ignoring "
                      f"(artifact: batch {meta['batch_size']}, "
                      f"beam {meta['beam_size']})", flush=True)
        # --mesh N composes with --exported: N params replicas, request
        # chunks round-robined over the first N devices (data-parallel;
        # the 1-device artifact itself is never repartitioned)
        devices = args.mesh if getattr(args, "mesh", 0) > 1 else None
        if devices is not None:
            import jax

            avail = len(jax.devices())
            if devices > avail:
                # validate the flag up front so artifact-corruption errors
                # below surface with their real traceback instead of being
                # blamed on --mesh
                raise SystemExit(
                    f"--mesh {devices}: devices={devices} but only "
                    f"{avail} available")
        print(f"loading exported artifact {args.exported}...", flush=True)
        svc = ExportedService(args.exported, devices=devices)
        print(f"warmed in {svc.stats.get('warmup_s')}s "
              f"(batch {svc.meta['batch_size']}, beam {svc.meta['beam_size']}, "
              f"devices {svc.stats['devices']})",
              flush=True)
    else:
        from .data.provider import DatasetProvider
        from .infer.serving import CaptionService
        from .models.captioner import build_captioner

        cfg, dataset = _build_dataset(args)
        provider = DatasetProvider(dataset, cfg)
        captioner = build_captioner(args.model_type, cfg, provider.vocab_size)
        params = _load_params(captioner, args)
        serve_batch = args.batch_size or cfg.batch_size  # --batch-size defaults None
        mesh = None
        if getattr(args, "mesh", 0) and args.mesh > 1:
            from .parallel import make_mesh

            mesh = make_mesh(args.mesh)
        svc = CaptionService(captioner, params, provider.caption_preprocessor,
                             batch_size=serve_batch, beam_size=args.beam_size,
                             mesh=mesh,
                             shard_words=bool(getattr(args, "shard_words", False)),
                             split_buckets=bool(getattr(args, "split_buckets", False)))
        print(f"warming up (batch {serve_batch}, beam {args.beam_size}, "
              f"explain={args.with_explain})...", flush=True)
        svc.warmup(explain=args.with_explain, method=args.method or "lrp")
        svc.start_queue(linger_ms=args.linger_ms)
    if getattr(args, "transport", "http") == "grpc":
        from .infer.grpc_server import CaptionGrpcServer

        server = CaptionGrpcServer(svc, host=args.host, port=args.port).start()
        print(f"serving gRPC on {args.host}:{server.port} "
              f"(/lrpic.CaptionService/{{Caption,Explain,Health,Stats}})",
              flush=True)
    else:
        server = CaptionHTTPServer(svc, host=args.host, port=args.port).start()
        print(f"serving on http://{args.host}:{server.port} "
              f"(POST /caption, /explain; GET /healthz, /stats)", flush=True)
    if getattr(args, "serve_seconds", None):
        import time as _time
        _time.sleep(args.serve_seconds)
    else:  # pragma: no cover - interactive loop
        import threading
        try:
            threading.Event().wait()
        except KeyboardInterrupt:
            pass
    server.stop()
    if hasattr(svc, "stop_queue"):
        svc.stop_queue()


def main(argv=None):
    ap = argparse.ArgumentParser(prog="lrp_imagecaptioning_tpu")
    ap.add_argument("--jax-cache", default=None, metavar="DIR",
                    help="persistent XLA compile cache directory (first run "
                         "populates it; later runs skip recompilation — "
                         "cuts serve/evaluate startup from minutes to "
                         "seconds). Opt-in: it can stall under some "
                         "remote-compile PJRT backends")
    ap.add_argument("--profile", default=None, metavar="DIR",
                    help="capture a jax.profiler (xprof/tensorboard) trace of "
                         "the whole command into DIR — device timelines, XLA "
                         "op breakdown, HBM usage; view with tensorboard or "
                         "xprof (utils/profiling.py::trace)")
    sub = ap.add_subparsers(dest="cmd", required=True)

    p = sub.add_parser("train", help="train a captioner (train.py main_attention parity)")
    _add_common(p)
    p.add_argument("--label", default="run")
    p.add_argument("--epochs", type=int, default=None)
    p.add_argument("--learning-rate", type=float, dest="learning_rate", default=None)
    p.add_argument("--time-limit", default=None, help="e.g. '12 hours'")
    p.add_argument("--resume", action="store_true")
    p.add_argument("--num-devices", type=int, default=None, help="data-parallel mesh size")
    p.add_argument("--steps-per-call", type=int, default=1,
                   help="optimizer steps per device dispatch (lax.scan over "
                        "stacked batches; amortizes dispatch latency)")
    p.set_defaults(fn=cmd_train)

    p = sub.add_parser("finetune-lrp", help="LRP-inference finetuning (train.py:519-673)")
    _add_common(p)
    p.add_argument("--lrp-mode", default="mean", choices=["mean", "pos_mean", "quantile"])
    p.add_argument("--learning-rate", type=float, dest="learning_rate", default=1e-6)
    p.add_argument("--chunks", type=int, default=50)
    p.add_argument("--start-chunk", type=int, default=0)
    p.add_argument("--epoch-length", type=int, default=10)
    p.add_argument("--steps-per-call", type=int, default=1,
                   help="finetune steps per device dispatch (lax.scan over "
                        "stacked batches; amortizes dispatch latency)")
    p.add_argument("--max-explained-words", type=int, default=None,
                   dest="max_explained_words",
                   help="run the per-word LRP backward for at most this many "
                        "non-stop pre-EOS positions per sample (the reference "
                        "explains only those words; default: all positions)")
    p.add_argument("--out", default=None)
    p.set_defaults(fn=cmd_finetune_lrp)

    p = sub.add_parser("evaluate", help="caption-metric evaluation (inference.py main)")
    p.add_argument("--bert-model", dest="bert_model", default=None,
                   help="local transformers model dir: also report BERTScore "
                        "(pycocoevalcap/bert adapter semantics)")
    p.add_argument("--spice-detailed", dest="spice_detailed",
                   action="store_true",
                   help="also report the SPICE per-category breakdown "
                        "(Object/Attribute/Relation/Color/Count/Size)")
    _add_common(p)
    p.add_argument("--beam-size", type=int, default=3)
    p.add_argument("--out", default=None)
    p.set_defaults(fn=cmd_evaluate)

    p = sub.add_parser("explain", help="word-by-word explanation (explain_image.py)")
    _add_common(p)
    p.add_argument("--method", default="lrp",
                   choices=list(_METHOD_CHOICES))
    p.add_argument("--image", default=None, help="explain one image file")
    p.add_argument("--num-images", type=int, default=1)
    p.add_argument("--beam-size", type=int, default=3)
    p.add_argument("--out", default=None)
    p.set_defaults(fn=cmd_explain)

    p = sub.add_parser("evaluate-bbox", help="bbox explanation correctness (evaluate_bbox.py)")
    _add_common(p)
    p.add_argument("--entities-json", required=True,
                   help="COCOvalEntities.json / Flickr30kEntities.json")
    p.add_argument("--method", default="lrp",
                   choices=list(_METHOD_CHOICES))
    p.add_argument("--beam-size", type=int, default=3)
    p.add_argument("--positive", action="store_true",
                   help="score positive evidence (reference default negates)")
    p.add_argument("--max-images", type=int, default=None)
    p.add_argument("--out", default=None)
    p.set_defaults(fn=cmd_evaluate_bbox)

    p = sub.add_parser("analyze-words", help="frequent-object mAP + ROC-AUC (exaimin_word.py)")
    _add_common(p)
    p.add_argument("--predictions", required=True, help="predictions yaml from `evaluate`")
    p.add_argument("--roc-auc", action="store_true")
    p.add_argument("--beam-size", type=int, default=3)
    p.add_argument("--max-images", type=int, default=None)
    p.set_defaults(fn=cmd_analyze_words)

    p = sub.add_parser("serve", help="HTTP/gRPC caption/explanation service (new capability)")
    _add_common(p)
    # default None (not 'lrp'): with --exported the artifact pins the method,
    # and a hard-coded default would reject every non-lrp artifact unless the
    # user redundantly repeated --method; live serving falls back to lrp
    p.add_argument("--method", default=None,
                   choices=list(_METHOD_CHOICES))
    p.add_argument("--beam-size", type=int, default=3)
    p.add_argument("--host", default="127.0.0.1")
    p.add_argument("--port", type=int, default=8000)
    p.add_argument("--transport", default="http", choices=("http", "grpc"),
                   help="front-end protocol (grpc_server.py generic-bytes service)")
    p.add_argument("--mesh", type=int, default=0,
                   help="shard request batches over an N-device data-parallel mesh")
    p.add_argument("--split-buckets", dest="split_buckets", action="store_true",
                   help="explain requests dispatch per caption-length bucket "
                        "at ladder sub-batch sizes (latency mode; ~log2(batch)x "
                        "warmup compile bill)")
    p.add_argument("--shard-words", action="store_true",
                   help="with --mesh: shard single-image explain requests over "
                        "the per-word backward passes (latency mode)")
    p.add_argument("--linger-ms", type=float, default=5.0,
                   help="micro-batching window for concurrent requests")
    p.add_argument("--with-explain", action="store_true",
                   help="also pre-compile the explanation endpoint")
    p.add_argument("--serve-seconds", type=float, default=None,
                   help="exit after N seconds (tests/smoke); default: run forever")
    p.add_argument("--exported", default=None, metavar="DIR",
                   help="serve from an export-serving StableHLO artifact "
                        "instead of building the model")
    p.set_defaults(fn=cmd_serve)

    p = sub.add_parser("parity",
                       help="published-checkpoint parity: decode+explain one "
                            "image from a reference .hdf5 and diff against a "
                            "recorded expectation (MIGRATION.md)")
    _add_common(p)
    p.add_argument("--h5", required=True, help="reference Keras .hdf5 checkpoint")
    p.add_argument("--image", required=True, help="image file to caption+explain")
    p.add_argument("--expect", default=None,
                   help="dir with parity-expected.npz to diff against")
    p.add_argument("--out", default=None,
                   help="record the expectation here (default <h5>.parity)")
    p.add_argument("--method", default="lrp")
    p.add_argument("--beam-size", type=int, default=3)
    p.add_argument("--tol", type=float, default=1e-3,
                   help="max allowed map deviation as a fraction of the "
                        "expectation's scale")
    p.set_defaults(fn=cmd_parity)

    p = sub.add_parser("export-serving",
                       help="package compiled decode/explain programs as a "
                            "portable StableHLO artifact (infer/export.py)")
    _add_common(p)
    p.add_argument("--method", default="lrp", choices=list(_METHOD_CHOICES))
    p.add_argument("--beam-size", type=int, default=3)
    p.add_argument("--with-explain", action="store_true",
                   help="also export the bucketed explain programs")
    p.add_argument("--out", required=True)
    p.set_defaults(fn=cmd_export_serving)

    args = ap.parse_args(argv)
    if args.jax_cache:
        import jax

        jax.config.update("jax_compilation_cache_dir", args.jax_cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    if args.profile:
        from .utils.profiling import trace

        with trace(args.profile):
            args.fn(args)
    else:
        args.fn(args)


if __name__ == "__main__":
    main()
