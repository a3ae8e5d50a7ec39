"""Measure how the CNN-LRP backward cost scales with the word-bucket size.

The Explainer's word-count bucketing (explain/engine.py, buckets 4/8/12/16/T)
claims ~2x real-data throughput because the CNN backward — the dominant
pipeline cost — runs over only the real caption words instead of the padded
T=20. This script measures the claim's foundation directly: the word-batched
VGG PresetA backward program at W in {4, 8, 12, 16, 20} seeds per image,
timed with bench.py's methodology (chained iterations, device-side checksum
materialized after the loop, so relay latency is amortized).

Per-image `Explainer.analyze` calls through THIS environment's ~85 ms relay
are latency-dominated, which would mask the scaling — measuring the program
cost at each bucket size is the honest signal that transfers to
directly-attached hardware.

Run: python experiments/bench_buckets.py  (TPU backend)
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

BATCH = 8          # images per iteration (lax.map over per-image backward)
GRID, FDIM = 14, 512
ITERS = 8


def main():
    import sys

    sys.path.insert(0, __file__.rsplit("/", 2)[0])
    from lrp_imagecaptioning_tpu.config import FlickrConfig
    from lrp_imagecaptioning_tpu.explain.cnn_lrp import vgg_lrp_preset_a_wordbatched
    from lrp_imagecaptioning_tpu.models.captioner import build_captioner

    cfg = FlickrConfig()
    cap = build_captioner("adaptiveattention", cfg, 7003)
    with jax.default_device(jax.local_devices(backend="cpu")[0]):
        params = cap.init_params(jax.random.PRNGKey(0))
    vgg = jax.device_put(params["vgg"], jax.devices()[0])

    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.normal(size=(BATCH, 224, 224, 3)).astype(np.float32))
    bf16 = jnp.bfloat16

    results = {}
    for W in (4, 8, 12, 16, 20):
        seeds = jnp.asarray(
            rng.normal(size=(BATCH, W, GRID, GRID, FDIM)).astype(np.float32))

        @jax.jit
        def backward(vgg, images, seeds):
            def one(args):
                image, s = args
                return vgg_lrp_preset_a_wordbatched(
                    vgg, image[None], s, cfg.img_encoder, cfg.layer_name,
                    compute_dtype=bf16, storage_dtype=bf16)

            return jax.lax.map(one, (images, seeds))

        def checksum(hm):
            return hm.sum(axis=tuple(range(1, hm.ndim)))

        _ = np.asarray(checksum(backward(vgg, images, seeds)))  # compile
        t0 = time.perf_counter()
        checks = [checksum(backward(vgg, images, seeds)) for _ in range(ITERS)]
        _ = [np.asarray(c) for c in checks]
        ms = (time.perf_counter() - t0) / ITERS * 1e3
        results[W] = ms
        print(json.dumps({"bucket_W": W, "ms_per_batch8": round(ms, 1),
                          "ms_per_image": round(ms / BATCH, 2)}), flush=True)

    # Real-data projection: Flickr30k/COCO captions average ~10 real words
    # (SURVEY.md §3); with buckets 4/8/12/16/20 a 10-word caption pays W=12.
    full, avg = results[20], results[12]
    print(json.dumps({
        "summary": "cnn_backward_bucket_scaling",
        "speedup_W12_vs_W20": round(full / avg, 2),
        "speedup_W8_vs_W20": round(full / results[8], 2),
    }), flush=True)


if __name__ == "__main__":
    main()
