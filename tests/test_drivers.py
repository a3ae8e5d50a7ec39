"""Driver-level integration tests: rendering grids, process_beam_search over
a provider, and the CLI on the synthetic dataset. The encoder is truncated
at layer_name="block2_conv1" (3 convs + 1 pool, 8x8 images -> 4x4x128 grid):
these tests pin driver/serving mechanics, not CNN depth (full-depth numerics
live in test_lrp_parity.py / test_analyzers.py)."""

import os

import numpy as np
import jax
import pytest

from lrp_imagecaptioning_tpu.config import FlickrConfig
from lrp_imagecaptioning_tpu.models.captioner import build_captioner

CFG = FlickrConfig(
    embedding_dim=16, hidden_dim=16, layer_name="block2_conv1",
    img_feature_length=16, img_feature_dim=128, image_size=(8, 8),
    sentence_length=5, drop_rate=0.0, batch_size=2,
)


_CAP_CACHE = {}


def _cap(model_type="adaptiveattention"):
    """Module-level memo of (captioner, params): init is pure eager dispatch
    re-paid by every test otherwise. Params are immutable jax arrays."""
    if model_type not in _CAP_CACHE:
        cap = build_captioner(model_type, CFG, 16)
        _CAP_CACHE[model_type] = (cap, cap.init_params(jax.random.PRNGKey(0)))
    return _CAP_CACHE[model_type]


class FakePP:
    SOS_TOKEN = "szeros"
    EOS_TOKEN = "zeros"
    SOS_TOKEN_LABEL_ENCODED = 1
    EOS_TOKEN_LABEL_ENCODED = 2
    word_of = {i: f"w{i}" for i in range(1, 17)}


def test_render_explanation(tmp_path, rng):
    from lrp_imagecaptioning_tpu.explain.drivers import render_explanation
    from lrp_imagecaptioning_tpu.explain.engine import Explainer
    from lrp_imagecaptioning_tpu.models.captioner import build_captioner

    cap, params = _cap("adaptiveattention")
    ex = Explainer(cap, params, FakePP(), method="lrp")
    image = rng.normal(size=(8, 8, 3)).astype(np.float32)
    result = ex.analyze(image, tokens_1based=np.array([5, 7, 2, 0, 0], np.int32))
    raw = (rng.random((8, 8, 3)) * 255).astype(np.float32)
    written = render_explanation(result, raw, str(tmp_path / "out"), "img.jpg",
                                 method="lrp", grid=4, upscale=2)
    assert len(written) == 3
    for p in written:
        assert os.path.exists(p) and os.path.getsize(p) > 0


def test_evaluate_cli_on_synthetic(tmp_path, monkeypatch, rng):
    """CLI evaluate end-to-end on the synthetic dataset (greedy, tiny model)."""
    from lrp_imagecaptioning_tpu import cli

    monkeypatch.chdir(tmp_path)

    # shrink the default config the CLI builds
    orig = cli._build_dataset

    def small(args):
        cfg, ds = orig(args)
        cfg = cfg.replace(embedding_dim=16, hidden_dim=16, sentence_length=5,
                          drop_rate=0.0, layer_name="block2_conv1",
                          img_feature_length=16, img_feature_dim=128,
                          image_size=(8, 8))
        return cfg, ds

    monkeypatch.setattr(cli, "_build_dataset", small)
    cli.main([
        "evaluate", "--dataset", "synthetic", "--model", "adaptiveattention",
        "--batch-size", "2", "--beam-size", "1", "--out", str(tmp_path / "ev"),
    ])
    assert (tmp_path / "ev" / "test-metrics.yaml").exists()
    assert (tmp_path / "ev" / "test-predictions.yaml").exists()


def test_profile_flag_writes_xprof_trace(tmp_path, monkeypatch, rng):
    """--profile DIR captures a jax.profiler trace of the whole subcommand
    (utils/profiling.py::trace wired through cli.main)."""
    from lrp_imagecaptioning_tpu import cli

    monkeypatch.chdir(tmp_path)
    orig = cli._build_dataset

    def small(args):
        cfg, ds = orig(args)
        cfg = cfg.replace(embedding_dim=16, hidden_dim=16, sentence_length=5,
                          drop_rate=0.0, layer_name="block2_conv1",
                          img_feature_length=16, img_feature_dim=128,
                          image_size=(8, 8))
        return cfg, ds

    monkeypatch.setattr(cli, "_build_dataset", small)
    trace_dir = tmp_path / "xprof"
    cli.main([
        "--profile", str(trace_dir),
        "evaluate", "--dataset", "synthetic", "--model", "adaptiveattention",
        "--batch-size", "2", "--beam-size", "1",
    ])
    # jax.profiler writes <dir>/plugins/profile/<run>/<host>.xplane.pb
    planes = list(trace_dir.glob("plugins/profile/*/*.xplane.pb"))
    assert planes, f"no xplane.pb under {trace_dir}"
    assert planes[0].stat().st_size > 0


def test_caption_service(rng):
    from lrp_imagecaptioning_tpu.infer.serving import CaptionService
    from lrp_imagecaptioning_tpu.models.captioner import build_captioner

    cap, params = _cap("adaptiveattention")
    svc = CaptionService(cap, params, FakePP(), batch_size=4, beam_size=1).warmup()
    # ragged request (3 < batch 4) and oversized request (5 > 4)
    out3 = svc.caption(rng.normal(size=(3, 8, 8, 3)).astype(np.float32))
    assert len(out3) == 3
    out5 = svc.caption(rng.normal(size=(5, 8, 8, 3)).astype(np.float32))
    assert len(out5) == 5
    assert svc.stats["images"] == 8
    for c in out3 + out5:
        assert isinstance(c, str)


def test_beam_search_inference_api(tmp_path, monkeypatch, rng):
    """BeamSearchInference class end-to-end over the synthetic provider."""
    monkeypatch.chdir(tmp_path)
    from lrp_imagecaptioning_tpu.data.datasets import SyntheticDataset
    from lrp_imagecaptioning_tpu.data.provider import DatasetProvider
    from lrp_imagecaptioning_tpu.infer.api import BeamSearchInference
    from lrp_imagecaptioning_tpu.models.captioner import build_captioner
    import jax as _jax

    cfg = CFG.replace(rare_words_handling="nothing")
    ds = SyntheticDataset(cfg, n_train=4, n_val=2, n_test=2,
                          cache_dir=str(tmp_path / "imgs"))
    provider = DatasetProvider(ds, cfg)
    cap = build_captioner("adaptiveattention", cfg, provider.vocab_size)
    params = cap.init_params(_jax.random.PRNGKey(0))
    inf = BeamSearchInference(cap, params, provider, beam_size=2,
                              max_caption_length=cfg.sentence_length)
    metrics = inf.evaluate_test_set()
    assert "Bleu_1" in metrics and "CIDEr" in metrics
    for v in metrics.values():
        assert np.isfinite(v)


def test_caption_service_explain_and_queue(rng):
    """explain() endpoint + submit()/micro-batching queue on CaptionService."""
    from lrp_imagecaptioning_tpu.infer.serving import CaptionService
    from lrp_imagecaptioning_tpu.explain.engine import Explanation
    from lrp_imagecaptioning_tpu.models.captioner import build_captioner

    cap, params = _cap("adaptiveattention")
    svc = CaptionService(cap, params, FakePP(), batch_size=4, beam_size=1)
    svc.warmup(explain=True)

    # ragged explain request (3 < batch 4)
    exps = svc.explain(rng.normal(size=(3, 8, 8, 3)).astype(np.float32))
    assert len(exps) == 3
    for e in exps:
        assert isinstance(e, Explanation)
        assert e.relevance_maps.shape[0] == len(e.words)
        assert np.isfinite(e.relevance_maps).all()

    # micro-batching queue: mixed caption + explain submissions coalesce
    svc.start_queue(linger_ms=50.0)
    imgs = rng.normal(size=(5, 8, 8, 3)).astype(np.float32)
    futs = [svc.submit(imgs[i]) for i in range(4)]
    fut_e = svc.submit(imgs[4], explain=True)
    captions = [f.result(timeout=120) for f in futs]
    assert all(isinstance(c, str) for c in captions)
    assert isinstance(fut_e.result(timeout=120), Explanation)
    svc.stop_queue()
    # same image through direct path == queued path (determinism)
    direct = svc.caption(imgs[:1])[0]
    assert captions[0] == direct


def test_caption_service_split_buckets_matches(rng):
    """CaptionService(split_buckets=True) — the per-bucket ladder latency
    mode — returns the same explanations as the default batch-max dispatch."""
    from lrp_imagecaptioning_tpu.infer.serving import CaptionService
    from lrp_imagecaptioning_tpu.models.captioner import build_captioner

    cap, params = _cap("adaptiveattention")
    imgs = rng.normal(size=(2, 8, 8, 3)).astype(np.float32)
    base = CaptionService(cap, params, FakePP(), batch_size=2, beam_size=1)
    split = CaptionService(cap, params, FakePP(), batch_size=2, beam_size=1,
                           split_buckets=True)
    # no warmup: programs compile on demand (the no-recompile-after-warmup
    # contract is pinned by test_explain_engine's warmup test)
    a = base.explain(imgs)
    b = split.explain(imgs)
    assert [e.words for e in a] == [e.words for e in b]
    for ea, eb in zip(a, b):
        np.testing.assert_allclose(ea.relevance_maps, eb.relevance_maps,
                                   rtol=1e-4, atol=1e-5)


def test_queue_groups_explain_by_method(rng):
    """The micro-batcher must NOT coalesce explain requests with different
    analyzer methods into one dispatch (a ?method=gradient request answered
    with lrp maps would be silently wrong). Pinned by stubbing the endpoints
    so no device work runs."""
    from lrp_imagecaptioning_tpu.infer.serving import CaptionService
    from lrp_imagecaptioning_tpu.models.captioner import build_captioner

    cap, params = _cap("adaptiveattention")
    svc = CaptionService(cap, params, FakePP(), batch_size=4, beam_size=1)

    calls = []

    def fake_explain(images, method="lrp"):
        if method not in ("lrp", "gradient"):  # real Explainer raises too
            raise ValueError(f"method {method!r} not supported")
        calls.append(("explain", method, images.shape[0]))
        return [f"{method}-{i}" for i in range(images.shape[0])]

    def fake_caption(images):
        calls.append(("caption", None, images.shape[0]))
        return [f"cap-{i}" for i in range(images.shape[0])]

    svc.explain = fake_explain
    svc.caption = fake_caption

    img = rng.normal(size=(8, 8, 3)).astype(np.float32)
    batch = [
        (img, False, "lrp", None),
        (img, True, "lrp", None),
        (img, True, "gradient", None),
        (img, True, "lrp", None),
    ]
    from concurrent.futures import Future

    batch = [(im, ex, m, Future()) for im, ex, m, _ in batch]
    svc._dispatch_queue_batch(batch)

    assert sorted(calls) == [
        ("caption", None, 1),
        ("explain", "gradient", 1),
        ("explain", "lrp", 2),
    ]
    # each future resolved with its own group's result
    assert batch[0][3].result(timeout=1) == "cap-0"
    assert batch[1][3].result(timeout=1) == "lrp-0"
    assert batch[2][3].result(timeout=1) == "gradient-0"
    assert batch[3][3].result(timeout=1) == "lrp-1"

    # caption group dispatches before explain groups (cheap endpoint first)
    assert calls[0][0] == "caption"

    # hostile inputs must resolve every future (exception, not a stranded
    # future from a dead batcher thread): unhashable method objects and
    # mixed image shapes in one linger window
    calls.clear()
    img2 = rng.normal(size=(4, 4, 3)).astype(np.float32)
    hostile = [
        (img, True, ["lrp"], Future()),       # unhashable pre-fix
        (img, False, "lrp", Future()),
        (img2, False, "lrp", Future()),       # different shape: own group
    ]
    svc._dispatch_queue_batch(hostile)
    assert isinstance(hostile[0][3].exception(timeout=1), ValueError)
    assert hostile[1][3].result(timeout=1) == "cap-0"
    assert hostile[2][3].result(timeout=1) == "cap-0"
    assert calls == [("caption", None, 1), ("caption", None, 1)]


def test_caption_http_server(rng):
    """stdlib HTTP front-end: JSON caption, npy explain, stats, errors."""
    import io
    import json
    import urllib.request

    from lrp_imagecaptioning_tpu.infer import CaptionHTTPServer, CaptionService
    from lrp_imagecaptioning_tpu.models.captioner import build_captioner

    cap, params = _cap("adaptiveattention")
    svc = CaptionService(cap, params, FakePP(), batch_size=2, beam_size=1)
    svc.warmup(explain=True)
    srv = CaptionHTTPServer(svc, port=0).start()
    base = f"http://127.0.0.1:{srv.port}"
    try:
        with urllib.request.urlopen(f"{base}/healthz") as r:
            assert json.load(r)["ok"] is True

        imgs = rng.normal(size=(2, 8, 8, 3)).astype(np.float32)
        # JSON body
        req = urllib.request.Request(
            f"{base}/caption", data=json.dumps({"images": imgs.tolist()}).encode(),
            headers={"Content-Type": "application/json"})
        with urllib.request.urlopen(req) as r:
            caps_json = json.load(r)["captions"]
        assert len(caps_json) == 2 and all(isinstance(c, str) for c in caps_json)
        # raw .npy body gives identical captions
        buf = io.BytesIO(); np.save(buf, imgs)
        req = urllib.request.Request(f"{base}/caption", data=buf.getvalue(),
                                     headers={"Content-Type": "application/x-npy"})
        with urllib.request.urlopen(req) as r:
            assert json.load(r)["captions"] == caps_json

        # explain endpoint returns an npz with per-image heatmaps
        buf = io.BytesIO(); np.save(buf, imgs[:1])
        req = urllib.request.Request(f"{base}/explain?method=lrp", data=buf.getvalue(),
                                     headers={"Content-Type": "application/x-npy"})
        with urllib.request.urlopen(req) as r:
            z = np.load(io.BytesIO(r.read()), allow_pickle=False)
        # Explanation captions keep the EOS word (reference style)
        assert str(z["caption_0"]) == f"{caps_json[0]} {FakePP.EOS_TOKEN}"
        assert z["relevance_maps_0"].shape[1:] == (8, 8, 3)
        assert np.isfinite(z["relevance_maps_0"]).all()

        with urllib.request.urlopen(f"{base}/stats") as r:
            assert json.load(r)["images"] >= 5

        # malformed request -> 400
        req = urllib.request.Request(f"{base}/caption", data=b"{}",
                                     headers={"Content-Type": "application/json"})
        try:
            urllib.request.urlopen(req)
            assert False, "expected HTTP 400"
        except urllib.error.HTTPError as e:
            assert e.code == 400

        # wrong resolution -> 400 (the service programs are compiled at 8)
        wrong = rng.normal(size=(1, 48, 48, 3)).astype(np.float32)
        req = urllib.request.Request(
            f"{base}/caption", data=json.dumps({"images": wrong.tolist()}).encode(),
            headers={"Content-Type": "application/json"})
        try:
            urllib.request.urlopen(req)
            assert False, "expected HTTP 400"
        except urllib.error.HTTPError as e:
            assert e.code == 400 and "resolution" in e.read().decode()

        # oversized DECLARED body -> 413 before buffering a byte
        import http.client

        conn = http.client.HTTPConnection("127.0.0.1", srv.port)
        try:
            conn.putrequest("POST", "/caption")
            conn.putheader("Content-Type", "application/json")
            conn.putheader("Content-Length", str(1 << 40))
            conn.endheaders()
            assert conn.getresponse().status == 413
        finally:
            conn.close()
    finally:
        srv.stop()


@pytest.mark.slow
def test_cli_serve_smoke(tmp_path, monkeypatch, rng):
    """CLI serve: boots the HTTP service on the synthetic dataset, answers a
    caption request, exits after --serve-seconds."""
    import json
    import threading
    import urllib.request

    from lrp_imagecaptioning_tpu import cli

    monkeypatch.chdir(tmp_path)
    orig = cli._build_dataset

    def small(args):
        cfg, ds = orig(args)
        cfg = cfg.replace(embedding_dim=16, hidden_dim=16, sentence_length=5,
                          drop_rate=0.0, layer_name="block2_conv1",
                          img_feature_length=16, img_feature_dim=128,
                          image_size=(8, 8))
        return cfg, ds

    monkeypatch.setattr(cli, "_build_dataset", small)

    result = {}

    def client():
        import time
        base = "http://127.0.0.1:18923"
        for _ in range(120):
            try:
                with urllib.request.urlopen(f"{base}/healthz", timeout=2) as r:
                    if json.load(r)["ok"]:
                        break
            except Exception:
                time.sleep(1)
        imgs = rng.normal(size=(1, 8, 8, 3)).astype(np.float32)
        req = urllib.request.Request(
            f"{base}/caption", data=json.dumps({"images": imgs.tolist()}).encode(),
            headers={"Content-Type": "application/json"})
        with urllib.request.urlopen(req, timeout=120) as r:
            result["captions"] = json.load(r)["captions"]

    t = threading.Thread(target=client)
    t.start()
    cli.main([
        "serve", "--dataset", "synthetic", "--model", "adaptiveattention",
        "--batch-size", "2", "--beam-size", "1", "--port", "18923",
        "--serve-seconds", "45",
    ])
    t.join(timeout=60)
    assert len(result.get("captions", [])) == 1
    assert isinstance(result["captions"][0], str)


def test_cli_method_choices_match_engine():
    """cli keeps a jax-free literal copy of the engine method registry."""
    from lrp_imagecaptioning_tpu.cli import _METHOD_CHOICES
    from lrp_imagecaptioning_tpu.explain.engine import METHODS

    assert _METHOD_CHOICES == METHODS


def test_expected_hw_derivation():
    """Service input resolution: image_size override wins; inception is 299;
    vgg/resnet derive from their feature grid at the right stride (the old
    16*g rule compiled 128-input warmups for inception's 8x8 grid)."""
    from lrp_imagecaptioning_tpu.infer.serving import CaptionService

    def hw(**kw):
        svc = CaptionService.__new__(CaptionService)  # property only needs cfg
        kw.setdefault("image_size", None)  # module CFG pins one; derive here
        kw.setdefault("layer_name", "block5_conv3")

        class Cap:
            cfg = CFG.replace(**kw)

        svc.captioner = Cap()
        return svc.expected_hw

    assert hw(img_feature_length=196) == (224, 224)                      # vgg16
    assert hw(img_encoder="resnet50", img_feature_length=49) == (224, 224)
    assert hw(img_encoder="inception_v3", img_feature_length=64) == (299, 299)
    assert hw(img_feature_length=4) == (32, 32)                          # 2x2 grid, stride 16
    assert hw(img_encoder="inception_v3", image_size=(75, 75),
              img_feature_length=1) == (75, 75)                          # override wins


def test_service_latency_stats_are_smoothed(rng):
    """stats carry a real EMA plus the raw last latency (the 'EMA' used to be
    just the last request's wall time)."""
    from lrp_imagecaptioning_tpu.infer.serving import CaptionService
    from lrp_imagecaptioning_tpu.models.captioner import build_captioner

    cap, params = _cap("adaptiveattention")
    svc = CaptionService(cap, params, FakePP(), batch_size=2, beam_size=1)
    imgs = rng.normal(size=(2, 8, 8, 3)).astype(np.float32)
    svc.caption(imgs)
    first = svc.stats["latency_ema_s"]
    assert first == svc.stats["last_latency_s"] > 0
    svc.caption(imgs)
    last = svc.stats["last_latency_s"]
    ema = svc.stats["latency_ema_s"]
    assert ema == pytest.approx(0.9 * first + 0.1 * last)


def test_stop_queue_serves_already_submitted(rng):
    """submit_many is atomic under the queue lock: futures enqueued before
    stop_queue() are served by the drain; submissions after it raise."""
    from lrp_imagecaptioning_tpu.infer.serving import CaptionService
    from lrp_imagecaptioning_tpu.models.captioner import build_captioner

    cap, params = _cap("adaptiveattention")
    svc = CaptionService(cap, params, FakePP(), batch_size=4, beam_size=1)
    svc.start_queue(linger_ms=200.0)
    imgs = rng.normal(size=(3, 8, 8, 3)).astype(np.float32)
    futs = svc.submit_many(imgs)
    svc.stop_queue()  # drain must resolve every already-queued future
    for f in futs:
        assert isinstance(f.result(timeout=60), str)
    with pytest.raises(RuntimeError):
        svc.submit_many(imgs)
    # dispatch falls back to the direct path after the queue stops
    assert len(svc.dispatch(imgs)) == 3


def test_caption_grpc_server(rng):
    """gRPC front-end: npy caption, metadata-selected explain, stats, errors.

    Mirrors test_caption_http_server's assertions over the gRPC transport
    (generic bytes handlers, infer/grpc_server.py)."""
    grpc = pytest.importorskip("grpc")

    from lrp_imagecaptioning_tpu.infer import (
        CaptionGrpcClient, CaptionGrpcServer, CaptionService)
    from lrp_imagecaptioning_tpu.models.captioner import build_captioner

    cap, params = _cap("adaptiveattention")
    svc = CaptionService(cap, params, FakePP(), batch_size=2, beam_size=1)
    svc.warmup(explain=True)
    srv = CaptionGrpcServer(svc, port=0).start()
    client = CaptionGrpcClient(f"127.0.0.1:{srv.port}")
    try:
        assert client.health() is True

        imgs = rng.normal(size=(2, 8, 8, 3)).astype(np.float32)
        caps_npy = client.caption(imgs)
        assert len(caps_npy) == 2 and all(isinstance(c, str) for c in caps_npy)

        # JSON request body gives identical captions
        import json as _json
        body = _json.dumps({"images": imgs.tolist()}).encode()
        assert _json.loads(client._caption(body))["captions"] == caps_npy

        # explain: npz payload layout matches the HTTP front-end's
        z = client.explain(imgs[:1], method="lrp")
        assert str(z["caption_0"]) == f"{caps_npy[0]} {FakePP.EOS_TOKEN}"
        assert z["relevance_maps_0"].shape[1:] == (8, 8, 3)
        assert np.isfinite(z["relevance_maps_0"]).all()

        assert client.stats()["images"] >= 5

        # malformed request -> INVALID_ARGUMENT
        try:
            client._caption(b"{}")
            assert False, "expected INVALID_ARGUMENT"
        except grpc.RpcError as e:
            assert e.code() == grpc.StatusCode.INVALID_ARGUMENT

        # queued path returns the same captions (micro-batching coalesces)
        svc.start_queue(linger_ms=20.0)
        try:
            assert client.caption(imgs) == caps_npy
        finally:
            svc.stop_queue()
    finally:
        client.close()
        srv.stop()


def test_grpc_accepts_payloads_over_4mb(rng):
    """grpc's 4 MB default receive limit used to reject realistic image
    batches (8 x 224^2 x 3 float32 npy ~ 4.8 MB) that HTTP accepts; the
    server/client now raise both directions."""
    pytest.importorskip("grpc")

    from lrp_imagecaptioning_tpu.infer import CaptionGrpcClient, CaptionGrpcServer

    class Stub:  # no device work — this tests the transport limits only
        stats = {}

        def dispatch(self, images, explain=False, method=None):
            return [f"n={len(images)}"] * len(images)

    srv = CaptionGrpcServer(Stub(), port=0).start()
    client = CaptionGrpcClient(f"127.0.0.1:{srv.port}")
    try:
        imgs = rng.normal(size=(8, 224, 224, 3)).astype(np.float32)  # ~4.8 MB
        caps = client.caption(imgs)
        assert caps == ["n=8"] * 8
    finally:
        client.close()
        srv.stop()


@pytest.mark.slow
def test_cli_serve_grpc_smoke(tmp_path, monkeypatch, rng):
    """CLI serve --transport grpc: boots the gRPC service on the synthetic
    dataset, answers a caption request, exits after --serve-seconds."""
    import threading
    import time

    pytest.importorskip("grpc")
    from lrp_imagecaptioning_tpu import cli
    from lrp_imagecaptioning_tpu.infer import CaptionGrpcClient

    monkeypatch.chdir(tmp_path)
    orig = cli._build_dataset

    def small(args):
        cfg, ds = orig(args)
        cfg = cfg.replace(embedding_dim=16, hidden_dim=16, sentence_length=5,
                          drop_rate=0.0, layer_name="block2_conv1",
                          img_feature_length=16, img_feature_dim=128,
                          image_size=(8, 8))
        return cfg, ds

    monkeypatch.setattr(cli, "_build_dataset", small)

    result = {}

    def client():
        cl = CaptionGrpcClient("127.0.0.1:18924")
        for _ in range(120):
            try:
                if cl.health():
                    break
            except Exception:
                time.sleep(1)
        imgs = rng.normal(size=(1, 8, 8, 3)).astype(np.float32)
        result["captions"] = cl.caption(imgs)
        cl.close()

    t = threading.Thread(target=client)
    t.start()
    cli.main([
        "serve", "--dataset", "synthetic", "--model", "adaptiveattention",
        "--batch-size", "2", "--beam-size", "1", "--port", "18924",
        "--transport", "grpc", "--serve-seconds", "45",
    ])
    t.join(timeout=60)
    assert len(result.get("captions", [])) == 1
    assert isinstance(result["captions"][0], str)


def test_collect_word_stats_batched(tmp_path, monkeypatch, rng):
    """collect_word_stats gathers per-category-word beta / mean-LRP /
    mean-attention stats through the batched analyze_many dispatch
    (exaimin_word.py:371-460 semantics)."""
    monkeypatch.chdir(tmp_path)
    from lrp_imagecaptioning_tpu.data.datasets import SyntheticDataset
    from lrp_imagecaptioning_tpu.data.provider import DatasetProvider
    from lrp_imagecaptioning_tpu.evalx.words import collect_word_stats
    from lrp_imagecaptioning_tpu.explain.engine import Explainer
    from lrp_imagecaptioning_tpu.models.captioner import build_captioner

    cfg = CFG.replace(rare_words_handling="nothing", batch_size=2)
    ds = SyntheticDataset(cfg, n_train=4, n_val=2, n_test=4,
                          cache_dir=str(tmp_path / "imgs"))
    provider = DatasetProvider(ds, cfg)
    cap = build_captioner("adaptiveattention", cfg, provider.vocab_size)
    params = cap.init_params(jax.random.PRNGKey(0))
    ex = Explainer(cap, params, provider.caption_preprocessor, method="lrp",
                   beam_size=2, word_buckets=(2,))

    # predictions containing known category words, keyed by test filenames
    cats = ["dog", "cat"]
    id_to_pred = {d.img_filename: f"a dog near a cat"
                  for d in ds.test_set}
    stats = collect_word_stats(ex, provider, id_to_pred, cats, max_images=3)
    assert 0 < len(stats) <= 3
    for fname, entry in stats.items():
        assert entry["predict_caption"] == "a dog near a cat"
        recorded = {c for c, _ in entry["beta"]}
        # word positions beyond the decoded caption are skipped (idx >= W),
        # so recorded is a subset of the hits
        assert recorded <= {"dog", "cat"}
        for key in ("beta", "lrp_mean", "attention_mean"):
            for _, v in entry[key]:
                assert np.isfinite(v)
