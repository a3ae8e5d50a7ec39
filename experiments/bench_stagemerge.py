"""Measure whether merging pipeline stages cuts relay-dispatch overhead.

The headline bench (bench.py) runs THREE dependent programs per batch
(caption -> decoder-LRP -> CNN-LRP). This environment reaches the chip
through a relay that cannot pipeline dependent program launches (~85 ms
per dependent hop, BASELINE.md "training dispatch anatomy"), so each
iteration may carry up to 2x85 ms of pure launch latency between stages.
The FULLY fused single program fails to compile on the remote-compile
path (bench.py:175-180), but the two 2-stage splits were never measured:

  A) [caption+decoderLRP] -> [cnnLRP]     (merge the small programs)
  B) [caption] -> [decoderLRP+cnnLRP]     (merge the big programs)

This script times the steady-state loop for the 3-stage baseline and both
2-stage variants on identical inputs, printing one JSON line per config.

Run: python experiments/bench_stagemerge.py  (on the TPU backend)
"""

from __future__ import annotations

import json
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402  (repo-root bench.py: reuses its stage builder)


def timed_loop(fn_iter, iters=10):
    """bench.py's method: device-side per-image checksum per iteration,
    materialized on the host AFTER the loop — block_until_ready alone
    under-reports through the relay backend."""
    def checksum(hm):
        return hm.sum(axis=tuple(range(1, hm.ndim)))

    _ = np.asarray(checksum(fn_iter()))  # warmup (compile)
    t0 = time.perf_counter()
    checks = [checksum(fn_iter()) for _ in range(iters)]
    _ = [np.asarray(c) for c in checks]
    return (time.perf_counter() - t0) / iters


def main():
    fn, params = bench.build()
    stages = fn.stages
    rng = np.random.default_rng(0)
    images = jnp.asarray(
        rng.normal(size=(bench.BATCH, 224, 224, 3)).astype(np.float32))

    s_cap = stages["caption"]
    s_dec = stages["decoder_lrp"]
    s_cnn = stages["cnn_lrp"]

    def three():
        feat, tok = s_cap(params, images)
        r = s_dec(params, feat, tok)
        return s_cnn(params, images, r)

    dt3 = timed_loop(three)
    print(json.dumps({"config": "3stage", "ms_per_batch": round(dt3 * 1e3, 1),
                      "img_per_s": round(bench.BATCH / dt3, 1)}), flush=True)

    # A: caption+decoder merged (uses the UN-jitted bodies via closures --
    # jit of a composition of jitted fns just inlines them)
    @jax.jit
    def cap_dec(params, images):
        feat, tok = s_cap(params, images)
        return s_dec(params, feat, tok)

    def two_a():
        r = cap_dec(params, images)
        return s_cnn(params, images, r)

    try:
        dt_a = timed_loop(two_a)
        print(json.dumps({"config": "2stage_capdec", "ms_per_batch": round(dt_a * 1e3, 1),
                          "img_per_s": round(bench.BATCH / dt_a, 1)}), flush=True)
    except Exception as e:  # remote-compile FailedPrecondition etc.
        print(json.dumps({"config": "2stage_capdec", "error": repr(e)[:200]}), flush=True)

    # B: decoder+cnn merged
    @jax.jit
    def dec_cnn(params, images, feat, tok):
        r = s_dec(params, feat, tok)
        return s_cnn(params, images, r)

    def two_b():
        feat, tok = s_cap(params, images)
        return dec_cnn(params, images, feat, tok)

    try:
        dt_b = timed_loop(two_b)
        print(json.dumps({"config": "2stage_deccnn", "ms_per_batch": round(dt_b * 1e3, 1),
                          "img_per_s": round(bench.BATCH / dt_b, 1)}), flush=True)
    except Exception as e:
        print(json.dumps({"config": "2stage_deccnn", "error": repr(e)[:200]}), flush=True)


if __name__ == "__main__":
    main()
