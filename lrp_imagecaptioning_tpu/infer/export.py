"""Deployable serving artifacts via ``jax.export`` (serialized StableHLO).

The reference's only deployment artifact is a Keras HDF5 weight file that
needs the full model-building code (and Keras 2.2.4) to run. This module
packages the COMPILED programs instead — the batched beam-decode program and
(optionally) the bucketed explain programs — as portable StableHLO blobs
plus a flat ``params.npz`` and a json with the tokenizer surface. Loading
needs only jax + numpy: no model classes, no config system, no tokenizer
fitting; the artifact pins shapes/semantics at export time, so a serving
fleet cannot drift from the evaluated model.

Layout of an export directory::

    decode.jexport          batched beam decode: (params, (B,H,W,3)) -> tokens
    explain_w{W}.jexport    per word-bucket explain programs (optional)
    params.npz              flat param export (train/checkpoint.py layout)
    meta.json               vocab id->word, SOS/EOS ids, shapes, buckets

``jax.export`` serializes with version guarantees (StableHLO forward
compatibility), runs on any backend at load time, and embeds nothing
device-specific — the same artifact serves on CPU for tests and TPU in
production (verified 2026-08-17: an artifact exported on the CPU backend
decoded + explained on a v5e chip unmodified).
"""

from __future__ import annotations

import json
import os

import jax
import numpy as np

_DECODE = "decode.jexport"
_META = "meta.json"
_PARAMS = "params.npz"


def export_serving(captioner, params, caption_pp, out_dir: str, *,
                   batch_size: int = 8, beam_size: int = 3,
                   max_len: int | None = None, method: str | None = None,
                   word_buckets=(4, 8, 12, 16)) -> str:
    """Write a self-contained serving artifact directory.

    ``method``: also export the bucketed explain programs for this
    explanation method (e.g. ``"lrp"``) — one program per word bucket plus
    the full length, mirroring ``Explainer.warmup``'s compile set.
    """
    from jax import export as jex
    import jax.numpy as jnp

    from ..infer.beam import beam_search
    from ..train.checkpoint import save_params_npz

    T = max_len or captioner.cfg.sentence_length
    sos = caption_pp.SOS_TOKEN_LABEL_ENCODED
    eos = caption_pp.EOS_TOKEN_LABEL_ENCODED
    size = getattr(captioner.cfg, "image_size", None) or (224, 224)
    if captioner.cfg.img_encoder == "inception_v3" and size == (224, 224):
        size = (299, 299)

    os.makedirs(out_dir, exist_ok=True)
    # abstract shape specs: jax.export traces symbolically, so no real
    # buffers are allocated (and nothing concrete can leak into the trace)
    imgs_spec = jax.ShapeDtypeStruct((batch_size, size[0], size[1], 3), jnp.float32)

    def decode(params, images):
        feat_grid = captioner.encode(params, images)
        tokens, scores = beam_search(captioner, params, feat_grid, sos, eos,
                                     beam_size, T)
        return tokens, scores

    blob = jex.export(jax.jit(decode))(params, imgs_spec).serialize()
    with open(os.path.join(out_dir, _DECODE), "wb") as f:
        f.write(blob)

    buckets = []
    if method is not None:
        from ..explain.engine import Explainer

        ex = Explainer(captioner, params, caption_pp, method=method,
                       beam_size=beam_size, max_len=T,
                       word_buckets=word_buckets)
        toks_spec = jax.ShapeDtypeStruct((batch_size, T), jnp.int32)
        buckets = sorted({*ex._buckets, T})
        for w in buckets:
            import functools

            body = functools.partial(ex._explain_batch_impl, n_words=w)
            blob = jex.export(jax.jit(body))(params, imgs_spec, toks_spec).serialize()
            with open(os.path.join(out_dir, f"explain_w{w}.jexport"), "wb") as f:
                f.write(blob)

    save_params_npz(os.path.join(out_dir, _PARAMS), params)
    meta = {
        "batch_size": batch_size,
        "beam_size": beam_size,
        "max_len": T,
        "image_size": list(size),
        "sos": int(sos),
        "eos": int(eos),
        "eos_word": caption_pp.EOS_TOKEN,
        "method": method,
        "buckets": [int(w) for w in buckets],
        "word_of": {str(i): w for i, w in caption_pp.word_of.items()},
    }
    with open(os.path.join(out_dir, _META), "w") as f:
        json.dump(meta, f)
    return out_dir


class ExportedCaptioner:
    """Serve from an ``export_serving`` artifact — no model code needed.

    ``caption(images)`` / ``explain(images)`` mirror ``CaptionService``
    semantics (requests chunked/padded to the exported batch size).

    ``devices``: a list of jax devices (or an int: the first N of
    ``jax.devices()``) for DATA-PARALLEL multi-chip serving from the same
    single-device artifact. ``jax.export`` pins a 1-device calling
    convention, so the artifact cannot be repartitioned by GSPMD — but an
    exported program executes on whichever device its committed inputs
    live on, so the facade keeps a params replica per device and
    round-robins request chunks, launching all chunks asynchronously
    before collecting (each chip decodes/explains its chunks while the
    others run theirs). Throughput scales with the device count; per-chunk
    latency is that of the single-device program.
    """

    def __init__(self, out_dir: str, devices=None):
        import jax
        from jax import export as jex

        from ..train.checkpoint import load_params_npz

        with open(os.path.join(out_dir, _META)) as f:
            self.meta = json.load(f)
        self._word_of = {int(i): w for i, w in self.meta["word_of"].items()}
        self.params = load_params_npz(os.path.join(out_dir, _PARAMS))
        with open(os.path.join(out_dir, _DECODE), "rb") as f:
            self._decode = jex.deserialize(f.read())
        self._explain = {}
        for w in self.meta["buckets"]:
            with open(os.path.join(out_dir, f"explain_w{w}.jexport"), "rb") as f:
                self._explain[w] = jex.deserialize(f.read())
        self._B = self.meta["batch_size"]
        if isinstance(devices, int):
            avail = jax.devices()
            if devices > len(avail):
                raise ValueError(
                    f"devices={devices} but only {len(avail)} available")
            devices = avail[:devices]
        self._devs = list(devices) if devices else None
        if self._devs:
            # one committed params replica per device; inputs follow
            self._params_dev = [jax.device_put(self.params, d)
                                for d in self._devs]

    # -- helpers -------------------------------------------------------------

    def _slot(self, chunk_index: int):
        """(params, device) for round-robin chunk placement."""
        if not self._devs:
            return self.params, None
        k = chunk_index % len(self._devs)
        return self._params_dev[k], self._devs[k]

    def _launch_decode(self, chunk, chunk_index: int):
        """Dispatch one decode chunk (async); returns the device-resident
        tokens array."""
        import jax

        params, dev = self._slot(chunk_index)
        x = self._pad(np.asarray(chunk, np.float32))
        if dev is not None:
            x = jax.device_put(x, dev)
        tokens, _ = self._decode.call(params, x)
        return tokens

    def _pad(self, arr):
        n = arr.shape[0]
        if n == self._B:
            return arr
        reps = np.concatenate([arr] + [arr[-1:]] * (self._B - n))
        return reps

    def _n_explained(self, row) -> int:
        from ..explain.engine import _n_explained

        return _n_explained(row, self.meta["eos"])

    def _tokens_to_string(self, row) -> str:
        # CaptionService semantics: words only, no EOS sentinel appended
        # (the Explanation captions from explain() DO carry it, matching
        # Explainer.analyze*)
        n = self._n_explained(row)
        return " ".join(self._word_of[int(tok)] for tok in row[:n])

    def _inflight_cap(self) -> int:
        # bound in-flight chunks so device memory stays O(devices), not
        # O(request size): two chunks per device keeps the pipeline full
        # (one executing, one queued) without unbounded residency
        return 2 * (len(self._devs) if self._devs else 1)

    # -- public API ------------------------------------------------------

    def caption(self, images) -> list[str]:
        images = np.asarray(images, np.float32)
        chunks = [images[i:i + self._B]
                  for i in range(0, images.shape[0], self._B)]
        cap = self._inflight_cap()
        pending: list = []
        out: list[str] = []

        def collect(item):
            chunk, tokens = item
            out.extend(self._tokens_to_string(r)
                       for r in np.asarray(tokens)[: chunk.shape[0]])

        # sliding window: launch chunk j, collect chunk j-cap — keeps every
        # device busy (round-robin) while only `cap` outputs stay resident
        for j, c in enumerate(chunks):
            pending.append((c, self._launch_decode(c, j)))
            if len(pending) > cap:
                collect(pending.pop(0))
        for item in pending:
            collect(item)
        return out

    def explain(self, images):
        """-> list of dicts: caption, words, relevance_maps, attentions,
        word_relevances, betas (the Explanation fields, minus framework
        types). Buckets by the chunk's longest caption like analyze_batch."""
        import jax

        if not self._explain:
            raise RuntimeError("artifact was exported without explain programs"
                               " (pass method= to export_serving)")
        images = np.asarray(images, np.float32)
        chunks = [images[i:i + self._B]
                  for i in range(0, images.shape[0], self._B)]
        cap = self._inflight_cap()
        out: list[dict] = []

        def launch_explain(item):
            # fetching tokens lands the decode; pick the bucket and launch
            # the explain program on the SAME device (images stay resident)
            chunk, x, params, tokens = item
            toks = np.asarray(tokens)[: chunk.shape[0]]
            n_max = max((self._n_explained(row) for row in toks), default=0)
            bucket = min((w for w in self._explain if w >= max(n_max, 1)),
                         default=self.meta["max_len"])
            toks_pad = self._pad(toks).astype(np.int32)
            return chunk, toks, self._explain[bucket].call(params, x, toks_pad)

        def collect(item):
            chunk, toks, (maps, r_feat, r_words, atts, betas) = item
            for b in range(chunk.shape[0]):
                n = self._n_explained(toks[b])
                words = [self._word_of[int(tok)] for tok in toks[b][:n]]
                keep = np.arange(n, dtype=np.int64)
                out.append({
                    "caption": " ".join(words + [self.meta["eos_word"]]),
                    "words": words,
                    "tokens_1based": toks[b],
                    "relevance_maps": np.asarray(maps[b])[keep],
                    "feat_relevance": np.asarray(r_feat[b])[keep],
                    "attentions": np.asarray(atts[b])[keep],
                    "word_relevances": np.asarray(r_words[b])[keep],
                    "betas": np.asarray(betas[b])[keep],
                })

        # bounded two-stage pipeline (decode in flight -> explain in flight
        # -> collected, request order preserved): explain outputs are the
        # heavy residents (per-word relevance maps), so capping both stages
        # keeps device memory O(devices) instead of O(request)
        decodes: list = []
        launched: list = []
        for j, chunk in enumerate(chunks):
            params, dev = self._slot(j)
            x = self._pad(chunk)
            if dev is not None:
                x = jax.device_put(x, dev)
            tokens, _ = self._decode.call(params, x)
            decodes.append((chunk, x, params, tokens))
            if len(decodes) > cap:
                launched.append(launch_explain(decodes.pop(0)))
            if len(launched) > cap:
                collect(launched.pop(0))
        for item in decodes:
            launched.append(launch_explain(item))
            if len(launched) > cap:
                collect(launched.pop(0))
        for item in launched:
            collect(item)
        return out


class ExportedService:
    """CaptionService-compatible facade over an export directory, so the
    HTTP/gRPC front-ends (which need ``dispatch``/``stats``) can serve from
    a StableHLO artifact with no model/config/tokenizer code in the serving
    process (``cli serve --exported DIR``).

    ``devices``: data-parallel multi-chip serving (see ExportedCaptioner);
    ``cli serve --exported DIR --mesh N`` maps here."""

    def __init__(self, out_dir: str, warmup: bool = True, devices=None):
        import time

        self._ec = ExportedCaptioner(out_dir, devices=devices)
        self.meta = self._ec.meta
        self.stats = {"requests": 0, "images": 0, "latency_ema_s": 0.0,
                      "exported_artifact": os.path.abspath(out_dir),
                      "devices": len(self._ec._devs) if self._ec._devs else 1}
        if warmup:
            size = self.meta["image_size"]
            dummy = np.zeros((self.meta["batch_size"], size[0], size[1], 3),
                             np.float32)
            t0 = time.time()
            # warm EVERY exported program on EVERY serving device (each
            # device has its own executable cache entry; Explainer.warmup
            # contract: no request pays compilation after warmup) — going
            # through ExportedCaptioner.explain would only hit the one
            # bucket the dummy captions land in
            toks0 = np.zeros((self.meta["batch_size"], self.meta["max_len"]),
                             np.int32)
            n_slots = len(self._ec._devs) if self._ec._devs else 1
            for j in range(n_slots):
                params, dev = self._ec._slot(j)
                x = dummy
                if dev is not None:
                    import jax

                    x = jax.device_put(dummy, dev)
                last = self._ec._decode.call(params, x)[0]
                for prog in self._ec._explain.values():
                    # betas (index -1) is the smallest output — fetch target
                    last = prog.call(params, x, toks0)[-1]
                # host-fetch the per-device LAST result: device execution is
                # FIFO, so this lands every warmup program on this device
                # before warmup_s is stamped (block_until_ready does not
                # reliably wait on the relay backend — see bench_sound.py)
                np.asarray(last)
            self.stats["warmup_s"] = round(time.time() - t0, 3)

    @property
    def expected_hw(self) -> tuple:
        """(H, W) the exported programs were traced at (front-ends validate
        request shapes against this)."""
        return tuple(self.meta["image_size"])

    def dispatch(self, images, explain: bool = False, method: str | None = None):
        """``method=None`` serves whatever analyzer the artifact was exported
        with (a front-end default of a SPECIFIC method would 500 every
        default request against an artifact exported with another one).
        An explicit mismatching method is still an error."""
        import time
        from types import SimpleNamespace

        t0 = time.perf_counter()
        if explain:
            exported = self.meta.get("method")
            if exported and method and method != exported:
                raise ValueError(
                    f"artifact was exported with method {exported!r}; "
                    f"cannot serve {method!r}")
            out = [SimpleNamespace(**e) for e in self._ec.explain(images)]
        else:
            out = self._ec.caption(images)
        dt = time.perf_counter() - t0
        self.stats["requests"] += 1
        self.stats["images"] += int(np.asarray(images).shape[0])
        self.stats["last_latency_s"] = dt
        ema = self.stats.get("latency_ema_s") or None
        self.stats["latency_ema_s"] = dt if ema is None else 0.9 * ema + 0.1 * dt
        return out
