"""Mixed-precision training: f32 vs bf16 encoder matmuls, full train step.

``cfg.compute_dtype='bfloat16'`` (CLI ``train --bf16``) casts the VGG conv
inputs/kernels to bf16 for the MXU fast path while params and optimizer state
stay f32 masters (models/captioner.py::_cfg_compute_dtype). The decoder stays
f32 — at 512 dims it is a rounding error of the step cost; the VGG forward +
backward is where the FLOPs are.

Measures the full jitted train-step program (fwd + bwd + Adam) at the
production config (adaptive 512-dim, full VGG16, 224x224, T=20, V=7003) over
a batch-size sweep, with the independent-dispatch protocol (same params every
call, losses fetched after the loop) — BASELINE.md's "training dispatch
anatomy" measured the program at 47 ms (batch 32, f32) under the same rules.

Result: see BASELINE.md "mixed-precision training" entry (numbers recorded
there from this script's output on the v5e chip). Parity bounds are pinned by
tests/test_train.py::test_bf16_mixed_precision_train_step.
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

VOCAB = 7003
T = 20


def main():
    from lrp_imagecaptioning_tpu.config import FlickrConfig
    from lrp_imagecaptioning_tpu.models.captioner import build_captioner
    from lrp_imagecaptioning_tpu.train.optimizer import make_optimizer
    from lrp_imagecaptioning_tpu.train.step import make_train_step

    rng = np.random.default_rng(0)
    results = {}
    for batch in (32, 64):
        images = jnp.asarray(rng.normal(size=(batch, 224, 224, 3)).astype(np.float32))
        caps_in = jnp.asarray(rng.integers(0, VOCAB, size=(batch, T + 1)), jnp.int32)
        y = jax.nn.one_hot(jnp.asarray(rng.integers(0, VOCAB, size=(batch, T + 1))), VOCAB)
        for mode in ("float32", "bfloat16"):
            cfg = FlickrConfig(sentence_length=T, compute_dtype=mode)
            cap = build_captioner("adaptiveattention", cfg, VOCAB)
            with jax.default_device(jax.local_devices(backend="cpu")[0]):
                params = cap.init_params(jax.random.PRNGKey(0))
            params = jax.device_put(params, jax.devices()[0])
            opt = make_optimizer("adaptiveattention", cfg.learning_rate)
            opt_state = opt.init(params)
            step = make_train_step(cap, opt, donate=False)
            _, _, m = step(params, opt_state, images, caps_in, y, jax.random.PRNGKey(1))
            loss0 = float(m["loss"])
            iters = 20
            losses = []
            t0 = time.perf_counter()
            for i in range(iters):
                _, _, m = step(params, opt_state, images, caps_in, y,
                               jax.random.PRNGKey(i))
                losses.append(m["loss"])
            _ = [float(l) for l in losses]
            dt = time.perf_counter() - t0
            ms = dt / iters * 1000
            results[f"{mode}@B{batch}"] = round(ms, 1)
            print(f"batch {batch} {mode}: {ms:.1f} ms/step "
                  f"({batch / (ms / 1000):.0f} img/s)  loss {loss0:.5f}", flush=True)

    print(json.dumps({"ms_per_step": results}))


if __name__ == "__main__":
    main()
