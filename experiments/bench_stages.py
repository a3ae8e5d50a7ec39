"""Per-stage timing of the headline bench at production shapes.

Times each of bench.py's three programs independently with the chained
async-dispatch methodology (device-side checksum, host materialization after
the loop) at the default batch, so the per-stage numbers sum to roughly the
end-to-end 556 ms/batch and show where the remaining non-CNN time goes.

Run: python experiments/bench_stages.py  (TPU backend)
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

import bench  # noqa: E402


def timed(fn_iter, iters=10):
    def checksum(x):
        if isinstance(x, tuple):
            x = x[0]
        return x.sum(axis=tuple(range(1, x.ndim))) if x.ndim > 1 else x

    _ = np.asarray(checksum(fn_iter()))
    t0 = time.perf_counter()
    checks = [checksum(fn_iter()) for _ in range(iters)]
    _ = [np.asarray(c) for c in checks]
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    fn, params = bench.build()
    s = fn.stages
    rng = np.random.default_rng(0)
    images = jnp.asarray(
        rng.normal(size=(bench.BATCH, 224, 224, 3)).astype(np.float32))

    feat, tok = s["caption"](params, images)
    feat, tok = jax.block_until_ready((feat, tok))
    r = jax.block_until_ready(s["decoder_lrp"](params, feat, tok))

    out = {
        "caption_ms": round(timed(lambda: s["caption"](params, images)), 1),
        "decoder_lrp_ms": round(timed(lambda: s["decoder_lrp"](params, feat, tok)), 1),
        "cnn_lrp_ms": round(timed(lambda: s["cnn_lrp"](params, images, r)), 1),
        "batch": bench.BATCH,
    }
    out["sum_ms"] = round(out["caption_ms"] + out["decoder_lrp_ms"] + out["cnn_lrp_ms"], 1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
