"""Serving queue-batch explain latency: batch-max vs split-bucket dispatch.

VERDICT r2 item 7. ``CaptionService.explain`` routes through
``Explainer.analyze_many``, whose length-sorting fixes the DATASET-scale
dispatch (experiments/bench_natural.py: 1.33x) — but a serving micro-batch
(n <= service batch, the ``start_queue()`` coalescing case) is a SINGLE
chunk, and a single chunk still dispatches once at the longest caption's
bucket. With natural-length captions (~N(10,3)) a batch of 8 contains a
>=13-word caption ~70% of the time, so most queue groups pay the 16- or
20-word program for every image.

``analyze_many(split_buckets=True)`` (engine.py) instead splits the sorted
chunk into per-bucket groups, each dispatched at the smallest covering size
from a halving ladder (8,4,2,1) — short captions then cost their own length.
The trade: more dispatches per request (up to ~buckets x log2(B)) on a relay
with ~85 ms/hop launch latency, and a ~log2(B)x warmup compile bill.

This experiment measures end-to-end wall latency of the REAL
``analyze_many`` API (tokens given, isolating the explain stage; the decode
dispatch is identical under both policies) over R=24 independently-drawn
natural-length queue batches at the serving configuration (batch 8, 224x224,
V=7003, bf16 storage). Host fetches happen inside ``_assemble`` for both
policies, so the timing protocol is sound (no block_until_ready reliance —
BASELINE.md round-2 measurement correction).

Run on the TPU:  python experiments/bench_serve_split.py
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

import os as _os_p
import sys as _sys_p
_sys_p.path.insert(0, _os_p.path.dirname(_os_p.path.dirname(_os_p.path.abspath(__file__))))

BATCH = 8          # serving micro-batch (CaptionService default)
N_REQUESTS = 24    # independently drawn queue batches
VOCAB = 7003
T = 20
# coarser bucket set than the engine default (4,8,12,16): the sub_batches
# warmup compiles |buckets+1| x |ladder| programs on the remote-compile
# path (~2-4 min each) — 3 buckets x 4 sizes keeps the warmup under the
# run budget while preserving the policy contrast under test
BUCKETS = (8, 16)


def measure(write_json_path=None):
    from lrp_imagecaptioning_tpu.config import FlickrConfig
    from lrp_imagecaptioning_tpu.explain.engine import Explainer
    from lrp_imagecaptioning_tpu.models.captioner import build_captioner

    class PP:
        SOS_TOKEN = "szeros"
        EOS_TOKEN = "zeros"
        SOS_TOKEN_LABEL_ENCODED = 1
        EOS_TOKEN_LABEL_ENCODED = 2
        word_of = {i: f"w{i}" for i in range(1, VOCAB + 1)}

    cfg = FlickrConfig(sentence_length=T)
    cap = build_captioner("adaptiveattention", cfg, VOCAB)
    with jax.default_device(jax.local_devices(backend="cpu")[0]):
        params = cap.init_params(jax.random.PRNGKey(0))
    params = jax.device_put(params, jax.devices()[0])

    ex = Explainer(cap, params, PP(), method="lrp", max_len=T,
                   storage_dtype=jnp.bfloat16, word_buckets=BUCKETS)

    rng = np.random.default_rng(0)
    requests = []
    for _ in range(N_REQUESTS):
        images = jnp.asarray(
            rng.normal(size=(BATCH, 224, 224, 3)).astype(np.float32))
        lengths = np.clip(np.round(rng.normal(10.0, 3.0, size=BATCH)),
                          4, T).astype(int)
        toks = np.zeros((BATCH, T), np.int32)
        for i, ln in enumerate(lengths):
            toks[i, :ln] = rng.integers(3, VOCAB, size=ln)
            if ln < T:
                toks[i, ln] = PP.EOS_TOKEN_LABEL_ENCODED
        requests.append((images, toks, lengths))

    # warmup: compile every (bucket x ladder-size) program both policies use
    t0 = time.perf_counter()
    ex.warmup(requests[0][0], sub_batches=True)
    warmup_s = time.perf_counter() - t0

    results = {}
    for name, split in [("batch_max", False), ("split_buckets", True)]:
        # one untimed pass over a request to settle caches
        ex.analyze_many(requests[0][0], tokens_1based=requests[0][1],
                        batch_size=BATCH, split_buckets=split)
        lat = []
        for images, toks, _ in requests:
            t0 = time.perf_counter()
            out = ex.analyze_many(images, tokens_1based=toks,
                                  batch_size=BATCH, split_buckets=split)
            lat.append(time.perf_counter() - t0)
            assert len(out) == BATCH
        lat_ms = np.asarray(lat) * 1e3
        results[name] = {
            "mean_ms": round(float(lat_ms.mean()), 1),
            "p50_ms": round(float(np.percentile(lat_ms, 50)), 1),
            "p90_ms": round(float(np.percentile(lat_ms, 90)), 1),
            "img_per_s": round(BATCH * len(lat) / (lat_ms.sum() / 1e3), 1),
        }
        print(f"{name:14s}: mean {results[name]['mean_ms']:7.1f} ms  "
              f"p50 {results[name]['p50_ms']:7.1f}  "
              f"p90 {results[name]['p90_ms']:7.1f}  "
              f"({results[name]['img_per_s']} img/s)", flush=True)

    out = {"latency": results,
           "split_vs_batchmax_mean": round(
               results["batch_max"]["mean_ms"]
               / results["split_buckets"]["mean_ms"], 3),
           "warmup_s_sub_batches": round(warmup_s, 1),
           "protocol": {
               "batch": BATCH, "n_requests": N_REQUESTS, "vocab": VOCAB,
               "T": T, "buckets": list(BUCKETS), "storage_dtype": "bfloat16",
               "lengths": "clip(round(N(10,3)), 4, 20) per request, seed 0",
               "timed": "full analyze_many wall latency per request batch "
                        "(host fetches inside _assemble make this sound)",
               "backend": jax.devices()[0].platform,
           }}
    print(json.dumps(out))
    if write_json_path is not None:
        with open(write_json_path, "w") as f:
            json.dump(out, f, indent=1)
    return out


if __name__ == "__main__":
    measure()
