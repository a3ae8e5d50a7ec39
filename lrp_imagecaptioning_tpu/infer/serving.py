"""Batched caption / explanation serving.

No reference analog (the reference is research scripts); this is the
production-deployment surface of the framework: a service object that owns
AOT-compiled executables for fixed batch shapes, pads incoming requests to
those shapes, and keeps everything device-resident between stages.

Design: jit programs are lowered + compiled ahead of time (``warmup()``), so
request latency never pays tracing/compilation; ragged request sizes are
padded to the compiled batch and the padding outputs dropped. Statistics
(requests, images, EMA latency) are exposed for monitoring.
"""

from __future__ import annotations

import queue
import threading
import time
from concurrent.futures import Future

import jax
import jax.numpy as jnp
import numpy as np

from .beam import beam_search
from .greedy import greedy_decode


class CaptionService:
    """Pad-and-dispatch caption + per-word heatmap serving.

    Endpoints: ``caption(images)`` (strings), ``explain(images)``
    (Explanation objects with LRP/gradient heatmaps), and a micro-batching
    queue (``start_queue()`` + ``submit(image)`` -> Future) that coalesces
    concurrent single-image requests into one device dispatch."""

    def __init__(self, captioner, params, caption_pp, batch_size: int = 8,
                 beam_size: int = 3, max_len: int | None = None,
                 compute_dtype=None, storage_dtype=None, mesh=None,
                 shard_words: bool = False, split_buckets: bool = False):
        """``mesh``: a ``parallel.make_mesh`` device mesh — requests then
        shard over the mesh's data axis (params replicated), scaling serving
        throughput across chips with the same padded-batch contract.
        ``batch_size`` must be divisible by the mesh's data-axis size.

        ``shard_words`` (requires ``mesh``): single-image ``explain()``
        requests shard the per-word backward passes over the mesh instead of
        waiting for a batch — the latency mode (``Explainer(shard_words=)``).
        Multi-image requests keep sharding over images.

        ``split_buckets``: explain requests dispatch per caption-length
        bucket at halving-ladder sub-batch sizes instead of one padded batch
        at the longest caption's bucket (``Explainer.analyze_many``'s
        ``split_buckets`` latency mode) — a micro-batched queue group's short
        captions then cost their OWN length, not the group max. Multiplies
        the explain warmup compile bill ~log2(batch_size)x; see
        experiments/bench_serve_split.py for the measured latency delta."""
        self.captioner = captioner
        self.params = params
        self._mesh = mesh
        if shard_words and mesh is None:
            raise ValueError("shard_words=True requires a mesh")
        self._shard_words = bool(shard_words)
        self._split_buckets = bool(split_buckets)
        if mesh is not None:
            from ..parallel import replicated

            n_data = mesh.shape[mesh.axis_names[0]]
            if batch_size % n_data:
                raise ValueError(
                    f"batch_size {batch_size} not divisible by the mesh "
                    f"data-axis size {n_data}")
            self.params = jax.device_put(params, replicated(mesh))
        self._pp = caption_pp
        self._B = batch_size
        self._beam = beam_size
        self._T = max_len or captioner.cfg.sentence_length
        self._dtype = compute_dtype
        self._storage_dtype = storage_dtype  # bf16: +12% explain throughput
        self.stats = {"requests": 0, "images": 0}

        def decode(params, images):
            feat_grid = captioner.encode(params, images, compute_dtype=self._dtype)
            if beam_size > 1:
                tokens, scores = beam_search(
                    captioner, params, feat_grid,
                    caption_pp.SOS_TOKEN_LABEL_ENCODED, caption_pp.EOS_TOKEN_LABEL_ENCODED,
                    beam_size, self._T,
                )
            else:
                tokens, _ = greedy_decode(
                    captioner, params, feat_grid,
                    caption_pp.SOS_TOKEN_LABEL_ENCODED, caption_pp.EOS_TOKEN_LABEL_ENCODED,
                    self._T,
                )
                scores = jnp.zeros((tokens.shape[0],))
            return tokens, scores

        if mesh is not None:
            from ..parallel import batch_sharding, replicated

            self._decode = jax.jit(
                decode, in_shardings=(replicated(mesh), batch_sharding(mesh)))
        else:
            self._decode = jax.jit(decode)
        self._compiled = None
        self._explainers = {}          # method -> Explainer (kept warm)
        self._explainer_lock = threading.Lock()
        self._queue = None
        self._queue_thread = None
        self._queue_lock = threading.Lock()  # guards queue start/stop/submit

    @property
    def expected_hw(self) -> tuple:
        """(H, W) input resolution the service's programs are compiled for —
        the config's ``image_size`` when set, else the encoder's canonical
        input: 299 for inception_v3 (ImagePreprocessor's resolution), else
        the grid-implied size stride x g (VGG taps are stride 16, resnet's
        conv5 tap is stride 32 — both give 224 at their standard grids).
        Front-ends validate request shapes against this before dispatching."""
        cfg = self.captioner.cfg
        size = getattr(cfg, "image_size", None)
        if size:
            return tuple(size)
        if cfg.img_encoder == "inception_v3":
            return (299, 299)
        g = int(round(float(np.sqrt(cfg.img_feature_length))))
        stride = 32 if cfg.img_encoder.startswith("resnet") else 16
        return (stride * g, stride * g)

    def warmup(self, explain: bool = False, method: str = "lrp"):
        """AOT-compile the decode executable for the service batch shape.

        With ``explain=True`` also builds the Explainer and traces/compiles
        its batched decode program and EVERY word-bucketed explain program
        (``Explainer.warmup``), so the first ``explain()`` request pays no
        compilation either — whatever bucket its captions land in."""
        h, w = self.expected_hw
        dummy = jnp.zeros((self._B, h, w, 3), jnp.float32)
        self._compiled = self._decode.lower(self.params, dummy).compile()
        if explain:
            self._get_explainer(method).warmup(
                dummy, sub_batches=self._split_buckets)
        return self

    def _get_explainer(self, method: str = "lrp"):
        # one Explainer PER METHOD, built under a lock: a single shared slot
        # would (a) race under the threaded front-ends (a ?method=lrp request
        # could be answered by a concurrently-assigned gradient explainer) and
        # (b) discard all warmed/compiled programs on every method switch
        with self._explainer_lock:
            ex = self._explainers.get(method)
            if ex is None:
                from ..explain.engine import Explainer

                ex = Explainer(
                    self.captioner, self.params, self._pp, method=method,
                    beam_size=self._beam, max_len=self._T,
                    storage_dtype=self._storage_dtype, mesh=self._mesh,
                    shard_words=self._shard_words,
                )
                self._explainers[method] = ex
            return ex

    def caption(self, images: np.ndarray) -> list[str]:
        """images: (N, 224, 224, 3) preprocessed, N <= batch_size (padded up)."""
        n = images.shape[0]
        if n > self._B:
            # chunk oversized requests
            out = []
            for i in range(0, n, self._B):
                out += self.caption(images[i : i + self._B])
            return out
        t0 = time.perf_counter()
        if n < self._B:
            pad = np.zeros((self._B - n, *images.shape[1:]), images.dtype)
            batch = np.concatenate([images, pad], axis=0)
        else:
            batch = images
        batch = jnp.asarray(batch)
        if self._compiled is not None:
            tokens, _ = self._compiled(self.params, batch)
        else:
            tokens, _ = self._decode(self.params, batch)
        tokens = np.asarray(tokens)[:n]
        self._note_request(n, t0)
        return [self._tokens_to_string(row) for row in tokens]

    def _note_request(self, n_images: int, t0: float):
        dt = time.perf_counter() - t0
        self.stats["requests"] += 1
        self.stats["images"] += n_images
        self.stats["last_latency_s"] = dt
        ema = self.stats.get("latency_ema_s")
        self.stats["latency_ema_s"] = dt if ema is None else 0.9 * ema + 0.1 * dt

    def explain(self, images: np.ndarray, method: str = "lrp") -> list:
        """Caption + per-word heatmap explanation endpoint.

        images: (N, H, W, 3) preprocessed, any N (chunked/padded to the
        service batch). Returns a list of N ``Explanation`` objects (caption,
        words, relevance_maps, attentions, ...). Reuses the Explainer's
        batched jitted programs, so after the first call (or
        ``warmup(explain=True)``) each request is two device dispatches.
        """
        n = images.shape[0]
        t0 = time.perf_counter()
        if self._shard_words and n == 1:
            # latency mode: one image -> shard the per-word backward over
            # the mesh rather than padding up to the service batch
            result = [self._get_explainer(method).analyze(images[0])]
        else:
            # analyze_many chunks at the compiled batch size, pads short
            # chunks by repeating a REAL row (so pad captions can never widen
            # the word-count bucket), and length-sorts multi-chunk requests;
            # split_buckets additionally dispatches per-bucket ladder
            # sub-batches so one long caption cannot drag a whole queue
            # group onto the big program
            result = self._get_explainer(method).analyze_many(
                images, batch_size=self._B, split_buckets=self._split_buckets)
        self._note_request(n, t0)
        return result

    def dispatch(self, images: np.ndarray, explain: bool = False,
                 method: str | None = None) -> list:
        """Serve a request through the micro-batching queue when it is
        running, else directly. The front-ends' (HTTP/gRPC) single entry
        point. ``method=None`` means the service default analyzer (``lrp``).

        Enqueueing is atomic (``submit_many``), so a concurrent
        ``stop_queue()`` either takes the whole request (its drain serves
        every already-queued future) or none of it (RuntimeError -> direct
        dispatch) — never half. Only the enqueue is guarded: execution
        errors from ``Future.result()`` propagate to the caller instead of
        being silently retried on the direct path."""
        method = method or "lrp"
        try:
            futs = self.submit_many(images, explain=explain, method=method)
        except RuntimeError:  # queue not running (or stopped concurrently)
            futs = None
        if futs is not None:
            return [f.result() for f in futs]
        if explain:
            return self.explain(images, method=method)
        return self.caption(images)

    # -- micro-batching queue ----------------------------------------------

    def start_queue(self, linger_ms: float = 5.0):
        """Start the background micro-batcher for ``submit()``.

        Single-image requests from concurrent callers are coalesced: the
        batcher takes the first queued request, lingers up to ``linger_ms``
        collecting more (up to the compiled batch size), then dispatches ONE
        padded batch — so B concurrent callers share one executable launch
        instead of paying B padded launches.
        """
        with self._queue_lock:
            if self._queue is not None:
                return self
            self._queue = queue.Queue()
            self._queue_linger = linger_ms / 1000.0
            self._queue_stop = threading.Event()
            self._queue_thread = threading.Thread(
                target=self._queue_loop, args=(self._queue, self._queue_stop),
                daemon=True)
            self._queue_thread.start()
        return self

    def stop_queue(self):
        """Stop the micro-batcher; pending requests are still served.

        The queue reference is nulled UNDER the submit lock before the
        worker is joined, so no ``submit``/``submit_many`` can enqueue onto
        a queue nobody watches (a put landing after the drain would strand
        its Future forever)."""
        with self._queue_lock:
            if self._queue is None:
                return
            q, thread, stop = self._queue, self._queue_thread, self._queue_stop
            self._queue = None
            self._queue_thread = None
        stop.set()
        q.put(None)  # wake the loop
        thread.join()

    def submit(self, image: np.ndarray, explain: bool = False,
               method: str = "lrp") -> Future:
        """Enqueue one (H, W, 3) image; returns a Future.

        Future resolves to the caption string, or an ``Explanation`` when
        ``explain=True``. Requires ``start_queue()``."""
        return self.submit_many(np.asarray(image)[None],
                                explain=explain, method=method)[0]

    def submit_many(self, images, explain: bool = False,
                    method: str = "lrp") -> list[Future]:
        """Enqueue N (H, W, 3) images ATOMICALLY; returns N Futures.

        All-or-nothing under the queue lock: either every image lands on the
        live queue (a concurrent ``stop_queue`` then serves them in its
        drain), or the queue is already stopped and RuntimeError is raised
        before anything is enqueued."""
        with self._queue_lock:
            if self._queue is None:
                raise RuntimeError("call start_queue() before submit()")
            futs = []
            for image in images:
                fut: Future = Future()
                self._queue.put((np.asarray(image), explain, method, fut))
                futs.append(fut)
            return futs

    def _queue_loop(self, q, stop):
        # `q`/`stop` are pinned at thread start: stop_queue() nulls
        # self._queue before joining (the drain must keep reading THIS
        # queue), and a concurrent restart replaces self._queue_stop
        while not stop.is_set():
            item = q.get()
            if item is None:
                continue
            batch = [item]
            deadline = time.perf_counter() + self._queue_linger
            while len(batch) < self._B:
                left = deadline - time.perf_counter()
                if left <= 0:
                    break
                try:
                    nxt = q.get(timeout=left)
                except queue.Empty:
                    break
                if nxt is None:
                    continue
                batch.append(nxt)
            self._dispatch_queue_batch(batch)
        # drain: serve whatever arrived between stop() and join()
        leftovers = []
        while True:
            try:
                item = q.get_nowait()
            except queue.Empty:
                break
            if item is not None:
                leftovers.append(item)
        if leftovers:
            self._dispatch_queue_batch(leftovers)

    def _dispatch_queue_batch(self, batch):
        # split by endpoint AND method AND image shape: captions batch
        # together, explanations batch per analyzer method (coalescing a
        # ?method=gradient request into an lrp batch would silently answer
        # it with the wrong analyzer); differing resolutions cannot np.stack.
        # Keys must never raise (an unhashable client-supplied method or a
        # ragged shape would otherwise kill the batcher thread and strand
        # every pending future), so method is stringified and shape derives
        # from np.shape. Caption groups dispatch FIRST: they are cheap, and
        # making them wait on a multi-second explain group would regress the
        # common endpoint's latency under mixed load.
        groups = {}
        for b in batch:
            key = ((1, str(b[2])) if b[1] else (0, None)) + (np.shape(b[0]),)
            groups.setdefault(key, []).append(b)
        for (want_explain, method, _), group in sorted(
                groups.items(), key=lambda kv: kv[0]):
            try:
                images = np.stack([g[0] for g in group])
                if want_explain:
                    results = self.explain(images, method=method)
                else:
                    results = self.caption(images)
                if len(results) != len(group):
                    raise RuntimeError(
                        f"dispatch returned {len(results)} results for "
                        f"{len(group)} requests")
                for (_, _, _, fut), res in zip(group, results):
                    fut.set_result(res)
            except Exception as e:  # propagate to callers, keep the thread
                for _, _, _, fut in group:
                    if not fut.done():
                        fut.set_exception(e)

    def _tokens_to_string(self, row) -> str:
        words = []
        for tok in row:
            if tok == 0 or tok == self._pp.EOS_TOKEN_LABEL_ENCODED:
                break
            words.append(self._pp.word_of[int(tok)])
        return " ".join(words)
