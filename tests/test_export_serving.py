"""jax.export serving artifact: round-trip equality with the live framework.

export_serving packages the compiled beam-decode (+ bucketed explain)
programs as StableHLO blobs + params.npz + tokenizer meta; ExportedCaptioner
must reproduce the live CaptionService/Explainer outputs exactly while using
only the artifact (no model construction)."""

import numpy as np
import jax
import pytest

from lrp_imagecaptioning_tpu.config import FlickrConfig
from lrp_imagecaptioning_tpu.explain.engine import Explainer
from lrp_imagecaptioning_tpu.infer.export import ExportedCaptioner, export_serving
from lrp_imagecaptioning_tpu.models.captioner import build_captioner

CFG = FlickrConfig(
    embedding_dim=16, hidden_dim=16, layer_name="block2_conv1",
    img_feature_length=16, img_feature_dim=128, image_size=(8, 8),
    sentence_length=5, drop_rate=0.0,
)
VOCAB = 16


class PP:
    SOS_TOKEN = "szeros"
    EOS_TOKEN = "zeros"
    SOS_TOKEN_LABEL_ENCODED = 1
    EOS_TOKEN_LABEL_ENCODED = 2
    word_of = {i: f"w{i}" for i in range(1, VOCAB + 1)}
    word_of[1] = "szeros"
    word_of[2] = "zeros"


@pytest.fixture(scope="module")
def artifact(tmp_path_factory):
    cap = build_captioner("adaptiveattention", CFG, VOCAB)
    params = cap.init_params(jax.random.PRNGKey(0))
    out = str(tmp_path_factory.mktemp("export") / "artifact")
    export_serving(cap, params, PP(), out, batch_size=3, beam_size=2,
                   method="lrp", word_buckets=(2,))
    return out, cap, params


def test_exported_caption_matches_live(artifact, rng):
    out, cap, params = artifact
    from lrp_imagecaptioning_tpu.infer.serving import CaptionService

    images = rng.normal(size=(5, 8, 8, 3)).astype(np.float32)
    exported = ExportedCaptioner(out)
    live = CaptionService(cap, params, PP(), batch_size=3, beam_size=2)
    # 5 images through the batch-3 artifact: chunked 3 + padded 2
    assert exported.caption(images) == live.caption(images)


def test_exported_explain_matches_live(artifact, rng):
    out, cap, params = artifact
    images = rng.normal(size=(2, 8, 8, 3)).astype(np.float32)
    exported = ExportedCaptioner(out)
    ex = Explainer(cap, params, PP(), method="lrp", beam_size=2,
                   word_buckets=(2,))
    got = exported.explain(images)
    want = ex.analyze_batch(images)
    for g, w in zip(got, want):
        assert g["caption"] == w.caption
        np.testing.assert_allclose(g["relevance_maps"], w.relevance_maps,
                                   rtol=1e-5, atol=1e-7)
        np.testing.assert_allclose(g["betas"], w.betas, rtol=1e-5, atol=1e-7)


def test_exported_pipeline_order_with_many_chunks(artifact, rng):
    """Requests far larger than the in-flight cap (2 per device) must come
    back complete and in request order through the bounded sliding-window
    pipeline — 17 images / batch 3 = 6 chunks > cap for both caption()
    (1-stage window) and explain() (2-stage decode->explain window)."""
    out, _, _ = artifact
    exported = ExportedCaptioner(out)
    images = rng.normal(size=(17, 8, 8, 3)).astype(np.float32)

    got = exported.caption(images)
    # per-chunk calls have no pipeline: ground truth for content + order
    want = [c for i in range(0, 17, 3)
            for c in exported.caption(images[i:i + 3])]
    assert got == want

    got_e = exported.explain(images)
    want_e = [e for i in range(0, 17, 3)
              for e in exported.explain(images[i:i + 3])]
    assert len(got_e) == 17
    for g, w in zip(got_e, want_e):
        assert g["words"] == w["words"]
        np.testing.assert_array_equal(g["relevance_maps"], w["relevance_maps"])


def test_exported_artifact_is_self_contained(artifact):
    """Loading must touch only jax + numpy + the artifact directory: the
    meta carries the tokenizer surface and shapes."""
    import json
    import os

    out, _, _ = artifact
    files = sorted(os.listdir(out))
    assert "decode.jexport" in files and "params.npz" in files
    assert "explain_w2.jexport" in files and "explain_w5.jexport" in files
    with open(os.path.join(out, "meta.json")) as f:
        meta = json.load(f)
    assert meta["batch_size"] == 3 and meta["eos"] == 2
    assert meta["word_of"]["3"] == "w3"
    assert meta["buckets"] == [2, 5]


def test_exported_service_dispatch(artifact, rng):
    """ExportedService: the CaptionService-compatible facade the HTTP/gRPC
    front-ends need (dispatch/stats), incl. the export-method guard."""
    from lrp_imagecaptioning_tpu.infer.export import ExportedService

    out, _, _ = artifact
    svc = ExportedService(out, warmup=False)
    images = rng.normal(size=(2, 8, 8, 3)).astype(np.float32)
    caps = svc.dispatch(images)
    assert len(caps) == 2 and all(isinstance(c, str) for c in caps)
    exps = svc.dispatch(images, explain=True, method="lrp")
    assert exps[0].caption.endswith("zeros")
    assert exps[0].relevance_maps.shape[1:] == (8, 8, 3)
    assert svc.stats["requests"] == 2 and svc.stats["images"] == 4
    # method=None (a front-end default) serves the artifact's own method
    # instead of 500ing on a hard-coded 'lrp'
    exps_default = svc.dispatch(images, explain=True)
    assert exps_default[0].caption == exps[0].caption
    # front-ends validate request resolutions against the traced shape
    assert svc.expected_hw == (8, 8)
    with pytest.raises(ValueError):
        svc.dispatch(images, explain=True, method="gradient")


def test_exported_service_warmup_covers_all_buckets(artifact, monkeypatch):
    """ExportedService warmup must .call EVERY exported explain program
    (Explainer.warmup contract: no request pays compilation after warmup),
    not just the bucket the dummy batch lands in."""
    from lrp_imagecaptioning_tpu.infer.export import ExportedService

    out, _, _ = artifact
    called = []

    class Spy:
        def __init__(self, prog, w):
            self._prog, self._w = prog, w

        def call(self, *a):
            called.append(self._w)
            return self._prog.call(*a)

    def wrap_init(self, d, devices=None, _real=ExportedCaptioner.__init__):
        _real(self, d, devices=devices)
        self._explain = {w: Spy(p, w) for w, p in self._explain.items()}

    monkeypatch.setattr(ExportedCaptioner, "__init__", wrap_init)
    ExportedService(out, warmup=True)
    assert sorted(set(called)) == [2, 5]


def test_http_front_end_over_exported_service(artifact, rng):
    """The HTTP front-end serves caption AND explain straight from a
    StableHLO artifact (the `lrpic serve --exported` deployment shape)."""
    import io
    import json
    import urllib.request

    from lrp_imagecaptioning_tpu.infer import CaptionHTTPServer
    from lrp_imagecaptioning_tpu.infer.export import ExportedService

    out, _, _ = artifact
    svc = ExportedService(out, warmup=False)
    srv = CaptionHTTPServer(svc, port=0).start()
    base = f"http://127.0.0.1:{srv.port}"
    try:
        imgs = rng.normal(size=(2, 8, 8, 3)).astype(np.float32)
        req = urllib.request.Request(
            f"{base}/caption", data=json.dumps({"images": imgs.tolist()}).encode(),
            headers={"Content-Type": "application/json"})
        with urllib.request.urlopen(req) as r:
            caps = json.load(r)["captions"]
        assert caps == ExportedCaptioner(out).caption(imgs)

        req = urllib.request.Request(
            f"{base}/explain?method=lrp",
            data=json.dumps({"images": imgs.tolist()}).encode(),
            headers={"Content-Type": "application/json"})
        with urllib.request.urlopen(req) as r:
            assert r.headers["Content-Type"] == "application/x-npz"
            z = np.load(io.BytesIO(r.read()), allow_pickle=False)
        assert str(z["caption_0"]).endswith("zeros")
        assert z["relevance_maps_0"].shape[1:] == (8, 8, 3)
        assert np.isfinite(z["relevance_maps_0"]).all()
    finally:
        srv.stop()


def test_grpc_front_end_over_exported_service(artifact, rng):
    """The gRPC front-end serves caption + explain from a StableHLO artifact
    (the `lrpic serve --exported --transport grpc` deployment shape)."""
    pytest.importorskip("grpc")
    from lrp_imagecaptioning_tpu.infer import CaptionGrpcClient, CaptionGrpcServer
    from lrp_imagecaptioning_tpu.infer.export import ExportedService

    out, _, _ = artifact
    svc = ExportedService(out, warmup=False)
    srv = CaptionGrpcServer(svc, port=0).start()
    try:
        client = CaptionGrpcClient(f"127.0.0.1:{srv.port}")
        assert client.health() is True
        imgs = rng.normal(size=(2, 8, 8, 3)).astype(np.float32)
        caps = client.caption(imgs)
        assert caps == ExportedCaptioner(out).caption(imgs)
        z = client.explain(imgs, "lrp")
        assert str(z["caption_0"]).endswith("zeros")
        assert z["relevance_maps_0"].shape[1:] == (8, 8, 3)
        assert np.isfinite(np.asarray(z["relevance_maps_0"], np.float32)).all()
    finally:
        srv.stop()


def test_grpc_typed_contract_over_exported_service(artifact, rng):
    """The typed lrpic.v1.CaptionService (committed .proto + vendored stubs)
    serves caption + explain on the same server as the raw-bytes service,
    with identical results."""
    pytest.importorskip("grpc")
    from lrp_imagecaptioning_tpu.infer import (
        CaptionGrpcClient,
        CaptionGrpcServer,
        CaptionGrpcTypedClient,
    )
    from lrp_imagecaptioning_tpu.infer.export import ExportedService

    out, _, _ = artifact
    svc = ExportedService(out, warmup=False)
    srv = CaptionGrpcServer(svc, port=0).start()
    assert srv.typed, "vendored stubs must register the lrpic.v1 service"
    try:
        typed = CaptionGrpcTypedClient(f"127.0.0.1:{srv.port}")
        legacy = CaptionGrpcClient(f"127.0.0.1:{srv.port}")
        assert typed.health() is True
        assert typed.stats()["requests"] == legacy.stats()["requests"]

        imgs = rng.normal(size=(2, 8, 8, 3)).astype(np.float32)
        caps = typed.caption(imgs)
        assert caps == ExportedCaptioner(out).caption(imgs)
        exps = typed.explain(imgs, "lrp")
        z = legacy.explain(imgs, "lrp")
        assert len(exps) == 2
        for i, e in enumerate(exps):
            assert e["caption"] == str(z[f"caption_{i}"])
            np.testing.assert_array_equal(
                e["relevance_maps"], z[f"relevance_maps_{i}"])
            np.testing.assert_array_equal(
                e["word_relevances"], z[f"word_relevances_{i}"])

        # malformed batch (data length contradicts dims) -> INVALID_ARGUMENT
        import grpc

        from lrp_imagecaptioning_tpu.infer.proto import caption_service_pb2 as pb2
        bad = pb2.CaptionRequest(images=pb2.ImageBatch(
            n=2, height=8, width=8, data=b"\x00" * 7))
        with pytest.raises(grpc.RpcError) as err:
            typed._stub.Caption(bad)
        assert err.value.code() == grpc.StatusCode.INVALID_ARGUMENT
    finally:
        srv.stop()


def test_serve_cli_validates_exported_artifact(artifact, tmp_path):
    """cli serve --exported fails at STARTUP (not per-request) when the
    requested configuration contradicts what the artifact was exported
    with."""
    from lrp_imagecaptioning_tpu import cli

    out, cap, params = artifact
    # artifact exported WITHOUT explain programs
    bare = str(tmp_path / "bare")
    export_serving(cap, params, PP(), bare, batch_size=3, beam_size=2)
    with pytest.raises(SystemExit, match="without explain"):
        cli.main(["serve", "--exported", bare, "--with-explain",
                  "--dataset", "synthetic"])
    # method mismatch against an lrp artifact
    with pytest.raises(SystemExit, match="exported with method"):
        cli.main(["serve", "--exported", out, "--with-explain",
                  "--method", "gradient", "--dataset", "synthetic"])


def test_exported_multidevice_matches_single(artifact, rng):
    """devices=K data-parallel serving: round-robined chunks over K devices
    must reproduce the single-device outputs exactly (same program, same
    params replica, different chip), and the facade must actually place
    work on distinct devices."""
    out, _, _ = artifact
    images = rng.normal(size=(8, 8, 8, 3)).astype(np.float32)  # 3 chunks @ B=3
    single = ExportedCaptioner(out)
    multi = ExportedCaptioner(out, devices=4)
    assert [str(d) for d in multi._devs] == [str(d) for d in jax.devices()[:4]]
    # params replicas are committed one-per-device
    first_leaf = lambda t: jax.tree_util.tree_leaves(t)[0]
    placed = {next(iter(first_leaf(p).devices())).id for p in multi._params_dev}
    assert placed == {d.id for d in jax.devices()[:4]}

    assert multi.caption(images) == single.caption(images)
    got = multi.explain(images)
    want = single.explain(images)
    assert len(got) == len(want) == 8
    for g, w in zip(got, want):
        assert g["caption"] == w["caption"]
        np.testing.assert_allclose(g["relevance_maps"], w["relevance_maps"],
                                   rtol=1e-5, atol=1e-7)
        np.testing.assert_allclose(g["word_relevances"], w["word_relevances"],
                                   rtol=1e-5, atol=1e-7)


def test_exported_service_multidevice(artifact, rng):
    """ExportedService(devices=K): warmup touches every device's executable
    cache and dispatch round-robins; stats report the serving width."""
    from lrp_imagecaptioning_tpu.infer.export import ExportedService

    out, _, _ = artifact
    svc = ExportedService(out, warmup=True, devices=2)
    assert svc.stats["devices"] == 2
    images = rng.normal(size=(7, 8, 8, 3)).astype(np.float32)
    caps = svc.dispatch(images)
    assert len(caps) == 7
    ref = ExportedService(out, warmup=False).dispatch(images)
    assert caps == ref
    with pytest.raises(ValueError):
        ExportedService(out, warmup=False, devices=99)


# ---------------------------------------------------------------------------
# encoder x decoder matrix: export_serving must generalize beyond the
# default VGG/adaptive configuration (resnet50 / inception_v3 encoders and
# the AOA / grid-TD decoders), through ExportedService and HTTP
# ---------------------------------------------------------------------------

_MATRIX = {
    "resnet50-adaptive": dict(
        model_type="adaptiveattention",
        cfg=FlickrConfig(img_encoder="resnet50", layer_name="activation_49",
                         img_feature_length=4, img_feature_dim=2048,
                         image_size=(64, 64), embedding_dim=16, hidden_dim=16,
                         sentence_length=4, drop_rate=0.0)),
    "inception-adaptive": dict(
        model_type="adaptiveattention",
        cfg=FlickrConfig(img_encoder="inception_v3", layer_name="mixed10",
                         img_feature_length=64, img_feature_dim=2048,
                         embedding_dim=16, hidden_dim=16,
                         sentence_length=4, drop_rate=0.0)),
    "vgg-aoa": dict(
        model_type="aoa",
        cfg=CFG),
    "vgg-gridTD": dict(
        model_type="gridTD",
        cfg=CFG),
}


@pytest.mark.parametrize("case", [
    # vgg-gridTD is the cheap representative in the default tier; the heavy
    # encoders (resnet 64px ~3 min, inception 299px) and AOA run slow-tier
    pytest.param("resnet50-adaptive", marks=pytest.mark.slow),
    pytest.param("inception-adaptive", marks=pytest.mark.slow),
    pytest.param("vgg-aoa", marks=pytest.mark.slow),
    "vgg-gridTD",
])
def test_export_matrix_caption_and_explain(case, rng, tmp_path):
    """Full matrix: export -> ExportedService.dispatch -> HTTP, outputs
    matching the live Explainer (VERDICT r03 item 5)."""
    import json
    import urllib.request

    from lrp_imagecaptioning_tpu.infer import CaptionHTTPServer
    from lrp_imagecaptioning_tpu.infer.export import ExportedService

    spec = _MATRIX[case]
    cfg = spec["cfg"]
    cap = build_captioner(spec["model_type"], cfg, VOCAB)
    params = cap.init_params(jax.random.PRNGKey(0))
    out = str(tmp_path / "artifact")
    export_serving(cap, params, PP(), out, batch_size=2, beam_size=2,
                   method="lrp", word_buckets=(2,))

    size = cfg.image_size or (224, 224)
    if cfg.img_encoder == "inception_v3" and size == (224, 224):
        size = (299, 299)
    images = rng.normal(size=(2, size[0], size[1], 3)).astype(np.float32)

    svc = ExportedService(out, warmup=False)
    assert svc.expected_hw == tuple(size)

    # captions through the facade == live decode
    caps = svc.dispatch(images)
    from lrp_imagecaptioning_tpu.infer.serving import CaptionService

    live = CaptionService(cap, params, PP(), batch_size=2, beam_size=2)
    assert caps == live.caption(images)

    # explanations through the facade == live Explainer
    got = svc.dispatch(images, explain=True)
    ex = Explainer(cap, params, PP(), method="lrp", beam_size=2,
                   word_buckets=(2,))
    want = ex.analyze_batch(images)
    assert len(got) == len(want) == 2
    for g, w in zip(got, want):
        assert g.caption == w.caption
        assert g.relevance_maps.shape == w.relevance_maps.shape
        np.testing.assert_allclose(g.relevance_maps, w.relevance_maps,
                                   rtol=1e-4, atol=1e-6)

    # one request over real HTTP per matrix case
    srv = CaptionHTTPServer(svc, port=0).start()
    try:
        req = urllib.request.Request(
            f"http://127.0.0.1:{srv.port}/caption",
            data=json.dumps({"images": images.tolist()}).encode(),
            headers={"Content-Type": "application/json"})
        with urllib.request.urlopen(req) as r:
            assert json.load(r)["captions"] == caps
    finally:
        srv.stop()


def test_serve_exported_mesh_overflow_exits_cleanly(artifact):
    """serve --exported --mesh N with N > available devices must exit with
    the clean flag-attributed message BEFORE touching the artifact — and
    artifact corruption must NOT be blamed on --mesh (it surfaces with its
    real traceback)."""
    from lrp_imagecaptioning_tpu import cli

    out, _, _ = artifact
    with pytest.raises(SystemExit) as ei:
        cli.main(["serve", "--exported", out, "--mesh", "999"])
    assert "--mesh 999" in str(ei.value) and "only" in str(ei.value)
