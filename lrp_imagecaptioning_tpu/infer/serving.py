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

import time

import jax
import jax.numpy as jnp
import numpy as np

from ..utils.profiling import StepTimer
from .beam import beam_search
from .greedy import greedy_decode


class CaptionService:
    """Pad-and-dispatch caption (and optional heatmap) serving."""

    def __init__(self, captioner, params, caption_pp, batch_size: int = 8,
                 beam_size: int = 3, max_len: int | None = None,
                 compute_dtype=None):
        self.captioner = captioner
        self.params = params
        self._pp = caption_pp
        self._B = batch_size
        self._beam = beam_size
        self._T = max_len or captioner.cfg.sentence_length
        self._dtype = compute_dtype
        self._timer = StepTimer()
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

        self._decode = jax.jit(decode)
        self._compiled = None

    def warmup(self):
        """AOT-compile the decode executable for the service batch shape."""
        # input resolution implied by the feature grid: g x g grid from 4
        # stride-2 pools => input = 16 * g (224 for the standard 14x14)
        g = int(round(float(np.sqrt(self.captioner.cfg.img_feature_length))))
        size = 16 * g
        dummy = jnp.zeros((self._B, size, size, 3), jnp.float32)
        self._compiled = self._decode.lower(self.params, dummy).compile()
        return self

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
        self.stats["requests"] += 1
        self.stats["images"] += n
        self._timer.update()
        self.stats["latency_ema_s"] = time.perf_counter() - t0
        return [self._tokens_to_string(row) for row in tokens]

    def _tokens_to_string(self, row) -> str:
        words = []
        for tok in row:
            if tok == 0 or tok == self._pp.EOS_TOKEN_LABEL_ENCODED:
                break
            words.append(self._pp.word_of[int(tok)])
        return " ".join(words)
