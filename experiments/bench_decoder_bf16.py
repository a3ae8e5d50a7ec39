"""Does bf16 storage speed up the decoder-LRP stage (bench stage 2)?

The CNN backward ships a measured bf16 fast mode (storage_dtype, 0.4% rel
err); the decoder reverse-scan BPTT still runs f32. This measures the same
cast-everything-to-bf16 treatment on stage_decoder_lrp at bench shapes
(B=56, T=20, H=512, V=7003) with the async-dispatch protocol, plus the
numerical deviation of the resulting CNN seeds.

Run: python experiments/bench_decoder_bf16.py  (TPU backend)
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
        return x.sum(axis=tuple(range(1, x.ndim)))

    _ = np.asarray(checksum(fn_iter()))
    t0 = time.perf_counter()
    checks = [checksum(fn_iter()) for _ in range(iters)]
    _ = [np.asarray(c) for c in checks]
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    from lrp_imagecaptioning_tpu.config import FlickrConfig
    from lrp_imagecaptioning_tpu.explain.decoder_lrp import explain_word_adaptive
    from lrp_imagecaptioning_tpu.models.captioner import build_captioner

    cfg = FlickrConfig()
    cap = build_captioner("adaptiveattention", cfg, bench.VOCAB)
    with jax.default_device(jax.local_devices(backend="cpu")[0]):
        params = cap.init_params(jax.random.PRNGKey(0))
    params = jax.device_put(params, jax.devices()[0])
    B, T = bench.BATCH, bench.T

    fn, _ = bench.build()
    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.normal(size=(B, 224, 224, 3)).astype(np.float32))
    feat, tok = fn.stages["caption"](params, images)

    def make_stage(cast):
        @jax.jit
        def stage(params, feat_grid, tokens):
            if cast is not None:
                params = jax.tree.map(
                    lambda a: a.astype(cast) if a.dtype == jnp.float32 else a, params)
                feat_grid = feat_grid.astype(cast)
            consts_b = cap.prepare_consts(params, feat_grid)
            prev = jnp.concatenate(
                [jnp.full((B, 1), 1, jnp.int32), tokens[:, :-1].astype(jnp.int32)], axis=1)
            inputs0 = jnp.maximum(prev - 1, 0)
            caches_b = cap.decoder.forward_cached_from_inputs(
                params["decoder"], consts_b, inputs0, cfg.hidden_dim)
            words0 = jnp.maximum(tokens - 1, 0).astype(jnp.int32)

            def per_b(consts, caches, w0):
                def one(t, w):
                    r_feat, _, _ = explain_word_adaptive(
                        params["decoder"], consts, caches, t, w, T)
                    return r_feat

                return jax.vmap(one)(jnp.arange(T), w0)

            caches_bt = jax.tree.map(lambda x: jnp.moveaxis(x, 1, 0), caches_b)
            out = jax.vmap(per_b)(consts_b, caches_bt, words0)
            return out.astype(jnp.float32)

        return stage

    f32 = make_stage(None)
    bf16 = make_stage(jnp.bfloat16)

    r32 = np.asarray(f32(params, feat, tok))
    r16 = np.asarray(bf16(params, feat, tok))
    scale = np.abs(r32).max()
    rel = np.abs(r16 - r32).max() / max(scale, 1e-30)
    # sign agreement on the non-negligible entries (heatmap semantics)
    big = np.abs(r32) > 1e-3 * scale
    sign_match = float((np.sign(r16[big]) == np.sign(r32[big])).mean())

    t32 = timed(lambda: f32(params, feat, tok))
    t16 = timed(lambda: bf16(params, feat, tok))
    print(json.dumps({
        "decoder_lrp_f32_ms": round(t32, 2),
        "decoder_lrp_bf16_ms": round(t16, 2),
        "speedup": round(t32 / t16, 3),
        "max_rel_err_vs_f32": float(rel),
        "sign_match_big": sign_match,
        "batch": B,
    }))


if __name__ == "__main__":
    main()
