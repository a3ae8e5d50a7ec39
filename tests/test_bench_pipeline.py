"""Benchmark pipeline tests: the mesh-sharded caption+heatmap pipeline must
produce the same results as the single-device path (8 virtual CPU devices)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import bench
from lrp_imagecaptioning_tpu.parallel import batch_sharding, make_mesh


@pytest.mark.slow
def test_sharded_bench_pipeline_matches_single_device(rng, monkeypatch):
    # shrink the pipeline so the CPU run stays fast: tiny decoder dims and a
    # 2x2 feature grid (32px inputs)
    monkeypatch.setattr(bench, "BATCH", 8)
    monkeypatch.setattr(bench, "VOCAB", 32)
    monkeypatch.setattr(bench, "T", 4)
    monkeypatch.setattr(bench, "BEAM", 2)
    monkeypatch.setattr(bench, "CFG_OVERRIDES", dict(
        embedding_dim=16, hidden_dim=16, img_feature_length=4, img_feature_dim=512,
        sentence_length=4, drop_rate=0.0,
    ))

    images = jnp.asarray(rng.normal(size=(8, 32, 32, 3)).astype(np.float32))

    fn_single, params = bench.build(mesh=None)
    tokens_s, maps_s = fn_single(params, images)

    mesh = make_mesh(8)
    fn_mesh, params_m = bench.build(mesh=mesh)
    images_m = jax.device_put(images, batch_sharding(mesh))
    tokens_m, maps_m = fn_mesh(params_m, images_m)

    np.testing.assert_array_equal(np.asarray(tokens_s), np.asarray(tokens_m))
    np.testing.assert_allclose(np.asarray(maps_s), np.asarray(maps_m), rtol=2e-3, atol=1e-4)
