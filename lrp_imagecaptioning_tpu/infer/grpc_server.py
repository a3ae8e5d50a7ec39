"""gRPC front-end over ``CaptionService``.

No reference analog (the reference is research scripts, SURVEY.md §2.10);
this completes the deployment surface next to the stdlib HTTP server
(``infer/http_server.py``): same endpoints, same wire payloads, but over
HTTP/2 with streaming-capable transport, deadline propagation, and
connection multiplexing — the standard production serving protocol.

Implementation note: the service is registered through grpc's *generic
method handlers* with raw-bytes (identity) serializers instead of
protoc-generated stubs. The environment ships ``grpcio`` but not the
protoc Python plugin, and the payloads are already self-describing
(``.npy``/``.npz``/JSON) — a ``.proto`` wrapper would only re-wrap bytes.
The method surface is the stable contract:

* ``/lrpic.CaptionService/Health``  -> JSON ``{"ok": true}``.
* ``/lrpic.CaptionService/Stats``   -> JSON request/image/latency counters.
* ``/lrpic.CaptionService/Caption`` -> request: ``.npy`` bytes (detected by
  the NUMPY magic) or JSON ``{"images": [...]}`` of (N,H,W,3) float images;
  response: JSON ``{"captions": [...]}``.
* ``/lrpic.CaptionService/Explain`` -> same request formats, plus either a
  JSON ``"method"`` field or the ``lrpic-method`` invocation-metadata key
  selecting the analyzer (``lrp``/``gradient``/... — the Explainer's
  method catalogue). Response: ``.npz`` bytes with, per image ``i``:
  ``caption_i``, ``words_i``, ``relevance_maps_i`` (float16),
  ``word_relevances_i`` — byte-identical layout to the HTTP ``/explain``
  response.

Requests are funneled through the service's micro-batching queue when it is
running (concurrent RPC callers then share device dispatches); otherwise
they dispatch directly. Malformed requests abort with INVALID_ARGUMENT;
dispatch failures abort with INTERNAL.
"""

from __future__ import annotations

import io
import json
from concurrent import futures as _futures

import numpy as np

_NPY_MAGIC = b"\x93NUMPY"


def _parse_request(body: bytes):
    """-> (images float32 (N,H,W,3), method_or_None). Mirrors http_server."""
    method = None
    if body[:6] == _NPY_MAGIC:
        arr = np.load(io.BytesIO(body), allow_pickle=False)
    else:
        obj = json.loads(body)
        arr = np.asarray(obj["images"], dtype=np.float32)
        method = obj.get("method")
    if arr.ndim == 3:
        arr = arr[None]
    if arr.ndim != 4 or arr.shape[-1] != 3:
        raise ValueError(f"expected (N, H, W, 3) images, got {arr.shape}")
    return arr.astype(np.float32), method


def _npz_bytes(explanations) -> bytes:
    out = {}
    for i, e in enumerate(explanations):
        out[f"caption_{i}"] = np.asarray(e.caption)
        out[f"words_{i}"] = np.asarray(e.words)
        out[f"relevance_maps_{i}"] = e.relevance_maps.astype(np.float16)
        out[f"word_relevances_{i}"] = e.word_relevances.astype(np.float16)
    buf = io.BytesIO()
    np.savez_compressed(buf, **out)
    return buf.getvalue()


class CaptionGrpcServer:
    """gRPC wrapper around a (warmed) ``CaptionService``.

    ``port=0`` binds an ephemeral port (read it back from ``.port``).
    ``max_workers`` bounds concurrent handler threads; device work still
    serializes through the service (and coalesces when its micro-batching
    queue is running)."""

    SERVICE = "lrpic.CaptionService"

    def __init__(self, service, host: str = "127.0.0.1", port: int = 0,
                 max_workers: int = 8, max_message_bytes: int = 256 << 20):
        import grpc

        self.service = service
        self._grpc = grpc
        # grpc's 4 MB default receive limit rejects realistic image batches
        # (8 x 224x224x3 float32 .npy is ~4.8 MB) that the HTTP front-end
        # accepts; raise both directions to the same cap the HTTP server uses
        self._server = grpc.server(
            _futures.ThreadPoolExecutor(max_workers=max_workers),
            options=[
                ("grpc.max_receive_message_length", int(max_message_bytes)),
                ("grpc.max_send_message_length", int(max_message_bytes)),
            ])
        handlers = {
            "Health": grpc.unary_unary_rpc_method_handler(self._health),
            "Stats": grpc.unary_unary_rpc_method_handler(self._stats),
            "Caption": grpc.unary_unary_rpc_method_handler(self._caption),
            "Explain": grpc.unary_unary_rpc_method_handler(self._explain),
        }
        self._server.add_generic_rpc_handlers(
            (grpc.method_handlers_generic_handler(self.SERVICE, handlers),))
        self.port = self._server.add_insecure_port(f"{host}:{port}")

    # -- handlers (bytes in -> bytes out) --------------------------------
    def _health(self, request: bytes, context) -> bytes:
        return b'{"ok": true}'

    def _stats(self, request: bytes, context) -> bytes:
        return json.dumps(dict(self.service.stats)).encode()

    def _images(self, request: bytes, context):
        try:
            images, method = _parse_request(request)
            expected = getattr(self.service, "expected_hw", None)
            if expected is not None and tuple(images.shape[1:3]) != tuple(expected):
                raise ValueError(
                    f"images must be {tuple(expected)} (service resolution), "
                    f"got {tuple(images.shape[1:3])}")
            return images, method
        except Exception as e:
            context.abort(self._grpc.StatusCode.INVALID_ARGUMENT, str(e))

    def _caption(self, request: bytes, context) -> bytes:
        images, _ = self._images(request, context)
        try:
            captions = self.service.dispatch(images)
        except Exception as e:
            context.abort(self._grpc.StatusCode.INTERNAL,
                          f"{type(e).__name__}: {e}")
        return json.dumps({"captions": captions}).encode()

    def _explain(self, request: bytes, context) -> bytes:
        images, method = self._images(request, context)
        for key, value in context.invocation_metadata():
            if key == "lrpic-method":
                method = value
        try:
            # method=None -> the service's default analyzer (for exported
            # artifacts: whatever method the artifact carries)
            exps = self.service.dispatch(images, explain=True, method=method)
        except Exception as e:
            context.abort(self._grpc.StatusCode.INTERNAL,
                          f"{type(e).__name__}: {e}")
        return _npz_bytes(exps)

    # -- lifecycle -------------------------------------------------------
    def start(self):
        self._server.start()
        return self

    def stop(self, grace: float = 1.0):
        self._server.stop(grace).wait()


class CaptionGrpcClient:
    """Minimal client for ``CaptionGrpcServer`` (identity serializers).

    >>> client = CaptionGrpcClient("127.0.0.1:50051")
    >>> client.caption(images)          # -> list[str]
    >>> client.explain(images, "lrp")   # -> dict of numpy arrays
    """

    def __init__(self, target: str, max_message_bytes: int = 256 << 20):
        import grpc

        # multi-image Explain responses (W x H x W x 3 float16 maps per
        # image) blow through the 4 MB channel default
        self._channel = grpc.insecure_channel(target, options=[
            ("grpc.max_receive_message_length", int(max_message_bytes)),
            ("grpc.max_send_message_length", int(max_message_bytes)),
        ])
        svc = CaptionGrpcServer.SERVICE

        def method(name):
            return self._channel.unary_unary(f"/{svc}/{name}")

        self._health = method("Health")
        self._stats = method("Stats")
        self._caption = method("Caption")
        self._explain = method("Explain")

    @staticmethod
    def _npy(images: np.ndarray) -> bytes:
        buf = io.BytesIO()
        np.save(buf, np.asarray(images, dtype=np.float32), allow_pickle=False)
        return buf.getvalue()

    def health(self) -> bool:
        return json.loads(self._health(b""))["ok"]

    def stats(self) -> dict:
        return json.loads(self._stats(b""))

    def caption(self, images: np.ndarray) -> list:
        return json.loads(self._caption(self._npy(images)))["captions"]

    def explain(self, images: np.ndarray, method: str = "lrp") -> dict:
        body = self._explain(self._npy(images),
                             metadata=(("lrpic-method", method),))
        with np.load(io.BytesIO(body), allow_pickle=False) as z:
            return {k: z[k] for k in z.files}

    def close(self):
        self._channel.close()
