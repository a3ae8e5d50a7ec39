"""Benchmark pipeline tests: the mesh-sharded caption+heatmap pipeline must
produce the same results as the single-device path (8 virtual CPU devices)."""

import json

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import bench
from lrp_imagecaptioning_tpu.parallel import batch_sharding, make_mesh


def test_retry_succeeds_after_transient_failure():
    """One FailedPrecondition-like error must not kill the run (VERDICT r04 #1)."""
    calls = []
    sleeps = []
    logs = []

    def attempt(i):
        calls.append(i)
        if len(calls) == 1:
            raise RuntimeError("TPU backend error (FailedPrecondition)")
        return 42.0

    out = bench._retry(attempt, attempts=3, backoff_s=5.0,
                       sleep=sleeps.append, log=logs.append)
    assert out == 42.0
    assert calls == [0, 1]          # second attempt succeeded; no third
    assert sleeps == [5.0]          # backed off exactly once
    assert any("FailedPrecondition" in m for m in logs)


def test_retry_exhausts_and_reraises():
    sleeps = []

    def attempt(i):
        raise ValueError(f"attempt {i}")

    with pytest.raises(ValueError, match="attempt 2"):
        bench._retry(attempt, attempts=3, backoff_s=1.0,
                     sleep=sleeps.append, log=lambda m: None)
    assert sleeps == [1.0, 1.0]     # no sleep after the final failure


def test_main_survives_first_attempt_failure(rng, monkeypatch, capsys):
    """End-to-end: main() produces its JSON line even when the first measured
    attempt raises (fresh buffers on retry, stderr-only failure log)."""
    monkeypatch.setattr(bench, "BATCH", 2)
    monkeypatch.setattr(bench, "VOCAB", 16)
    monkeypatch.setattr(bench, "T", 3)
    monkeypatch.setattr(bench, "BEAM", 2)
    # truncated encoder (3 convs + 1 pool, 8x8 inputs -> 4x4x128 grid): the
    # smoke tier's standard trick for keeping XLA compiles cheap
    monkeypatch.setattr(bench, "CFG_OVERRIDES", dict(
        embedding_dim=8, hidden_dim=8, layer_name="block2_conv1",
        img_feature_length=16, img_feature_dim=128,
        sentence_length=3, drop_rate=0.0, image_size=(8, 8),
    ))
    monkeypatch.setattr(bench.time, "sleep", lambda s: None)

    real_build = bench.build
    state = {"failed": False}

    def failing_build(mesh=None):
        fn, params = real_build(mesh)

        def wrapped(params, images):
            if not state["failed"]:
                state["failed"] = True
                raise RuntimeError("TPU backend error (FailedPrecondition)")
            return fn(params, images)

        return wrapped, params

    monkeypatch.setattr(bench, "build", failing_build)
    bench.main()
    out = capsys.readouterr()
    line = json.loads(out.out.strip().splitlines()[-1])
    assert line["metric"] == "caption+lrp_heatmap_throughput"
    assert line["value"] > 0
    assert state["failed"]
    assert "FailedPrecondition" in out.err  # logged to stderr, not the JSON line


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
