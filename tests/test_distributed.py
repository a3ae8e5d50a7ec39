"""Multi-host layer semantics, exercised single-process on the 8-virtual-
device CPU mesh: the degenerate (1-process) case must be bit-identical to the
single-host path, and the slice arithmetic must partition exactly."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from lrp_imagecaptioning_tpu.parallel import make_mesh, shard_batch
from lrp_imagecaptioning_tpu.parallel.distributed import (
    global_batch_from_local,
    initialize_distributed,
    make_multihost_mesh,
    process_batch_slice,
    shard_global_batch,
)


def test_initialize_single_process_noop():
    assert initialize_distributed() == 1


@pytest.mark.slow
def test_two_process_multihost_training():
    """REAL multi-process validation of the pod-slice layer: 2 processes x 2
    virtual CPU devices run the vocab-sharded train step over a (data=2,
    model=2) hybrid mesh, with the data-axis gradient psum crossing processes
    (gloo — the DCN role). Loss trajectories must agree across processes and
    match the single-process 4-device reference."""
    import json
    import os
    import socket
    import subprocess
    import sys

    here = os.path.dirname(os.path.abspath(__file__))
    worker = os.path.join(here, "multihost_worker.py")
    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]

    env = dict(os.environ)
    env["PYTHONPATH"] = os.path.dirname(here) + os.pathsep + env.get("PYTHONPATH", "")
    # the worker pins its own JAX_PLATFORMS/XLA_FLAGS; scrub the parent's
    env.pop("XLA_FLAGS", None)
    # share the session's host-fingerprinted compile cache (conftest.py) so
    # the worker never executes a foreign host's AOT artifacts
    import jax

    env["LRPIC_TEST_CACHE"] = jax.config.jax_compilation_cache_dir

    outs = [os.path.join(here, f".mh_out_{pid}.json") for pid in range(2)]
    procs = [
        subprocess.Popen([sys.executable, worker, str(pid), "2", str(port), outs[pid]],
                         env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
                         text=True)
        for pid in range(2)
    ]
    logs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=540)
            logs.append(out)
            assert p.returncode == 0, f"worker failed:\n{out[-3000:]}"
        results = []
        for o in outs:
            with open(o) as f:
                results.append(json.load(f))
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
        for o in outs:
            if os.path.exists(o):
                os.unlink(o)

    l0, l1 = results[0]["losses"], results[1]["losses"]
    assert len(l0) == 3
    # both processes observe the SAME replicated loss
    np.testing.assert_array_equal(l0, l1)
    assert all(np.isfinite(l0))
    assert l0[2] < l0[0], f"loss did not decrease: {l0}"
    # steps_per_call x multihost: the scanned 3-step dispatch reproduces the
    # chained singles (same equivalence tolerance as the single-process
    # multi-vs-chained tests in test_train.py — XLA reduction-order noise)
    m0, m1 = results[0]["multi_losses"], results[1]["multi_losses"]
    np.testing.assert_array_equal(m0, m1)
    np.testing.assert_allclose(m0, l0, rtol=1e-3)

    # single-process 4-device reference (same batch, same seeds)
    from lrp_imagecaptioning_tpu.config import FlickrConfig
    from lrp_imagecaptioning_tpu.models.captioner import build_captioner
    from lrp_imagecaptioning_tpu.train.optimizer import make_optimizer
    from lrp_imagecaptioning_tpu.train.step import make_sharded_train_step

    mesh = make_mesh(4, model_parallel=2)
    cfg = FlickrConfig(embedding_dim=16, hidden_dim=16, layer_name="block2_conv1",
                       img_feature_length=16, img_feature_dim=128, sentence_length=6, batch_size=8)
    cap = build_captioner("adaptiveattention", cfg, 32)
    params = cap.init_params(jax.random.PRNGKey(0))
    opt = make_optimizer("adaptiveattention", 1e-3)
    opt_state = opt.init(params)
    step, place = make_sharded_train_step(
        cap, opt, mesh, shard_vocab=True, params_template=params,
        opt_state_template=opt_state, donate=False)
    params, opt_state = place(params, opt_state)

    r = np.random.default_rng(0)
    images = r.normal(size=(8, 8, 8, 3)).astype(np.float32)
    caps = r.integers(0, 32, size=(8, 7)).astype(np.int32)
    y = np.eye(32, dtype=np.float32)[r.integers(0, 32, size=(8, 7))]
    images, caps, y = shard_batch(mesh, images, caps, y)
    ref = []
    for i in range(3):
        params, opt_state, m = step(params, opt_state, images, caps, y,
                                    jax.random.PRNGKey(100 + i))
        ref.append(float(m["loss"]))
    np.testing.assert_allclose(l0, ref, rtol=2e-5)


def test_process_batch_slice_partitions_exactly():
    # mocked 4-process world: slices must tile [0, 32) without overlap
    rows = []
    for pi in range(4):
        s = process_batch_slice(32, process_index=pi, process_count=4)
        rows += list(range(32)[s])
    assert rows == list(range(32))
    # single process: the slice is the whole batch
    assert process_batch_slice(8, process_index=0, process_count=1) == slice(0, 8)
    with pytest.raises(ValueError):
        process_batch_slice(10, process_index=0, process_count=4)


def test_multihost_mesh_degenerates_to_single_host_layout():
    mesh = make_multihost_mesh(model_parallel=2)
    assert mesh.devices.shape == (4, 2)
    assert mesh.axis_names == ("data", "model")
    # same device layout as the single-host constructor
    ref = make_mesh(8, model_parallel=2)
    assert (mesh.devices == ref.devices).all()
    with pytest.raises(ValueError):
        make_multihost_mesh(model_parallel=3)


def test_global_batch_from_local_matches_device_put(rng):
    """1-process: assembled global array == shard_batch bit-for-bit, with the
    same sharding, and feeds a jitted reduction identically."""
    mesh = make_mesh(8)
    x_local = rng.normal(size=(16, 5)).astype(np.float32)
    g = global_batch_from_local(mesh, x_local)
    direct = shard_batch(mesh, x_local)
    assert g.shape == (16, 5)
    assert g.sharding == NamedSharding(mesh, P("data"))
    np.testing.assert_array_equal(np.asarray(g), np.asarray(direct))

    f = jax.jit(lambda a: jnp.sum(a * a, axis=1))
    np.testing.assert_allclose(np.asarray(f(g)), np.asarray(f(direct)))


def test_global_stacked_batch_from_local_matches_device_put(rng):
    """1-process: the (K, B, ...) steps_per_call stack assembles to the same
    array + sharding as a direct stacked device_put (multihost composition
    leg of the dispatch-amortization lever, VERDICT r2 item 6)."""
    from lrp_imagecaptioning_tpu.parallel import stacked_batch_sharding
    from lrp_imagecaptioning_tpu.parallel.distributed import (
        global_stacked_batch_from_local,
    )

    mesh = make_mesh(8)
    x_local = rng.normal(size=(3, 16, 5)).astype(np.float32)
    g = global_stacked_batch_from_local(mesh, x_local)
    direct = jax.device_put(x_local, stacked_batch_sharding(mesh))
    assert g.shape == (3, 16, 5)
    assert g.sharding == NamedSharding(mesh, P(None, "data"))
    np.testing.assert_array_equal(np.asarray(g), np.asarray(direct))


def test_shard_global_batch_multiple_arrays(rng):
    mesh = make_mesh(8)
    a = rng.normal(size=(8, 3)).astype(np.float32)
    b = rng.integers(0, 9, size=(8,)).astype(np.int32)
    ga, gb = shard_global_batch(mesh, a, b)
    np.testing.assert_array_equal(np.asarray(ga), a)
    np.testing.assert_array_equal(np.asarray(gb), b)


def test_opt_state_mirrors_param_shardings():
    """Adam moments of vocab-sharded params carry the SAME PartitionSpec as
    the params; scalars (count) replicate (VERDICT r1 item 6)."""
    from lrp_imagecaptioning_tpu.config import FlickrConfig
    from lrp_imagecaptioning_tpu.models.captioner import build_captioner
    from lrp_imagecaptioning_tpu.parallel import opt_state_shardings, param_shardings
    from lrp_imagecaptioning_tpu.train.optimizer import make_optimizer

    cfg = FlickrConfig(embedding_dim=16, hidden_dim=16, layer_name="block2_conv1",
                       img_feature_length=16, img_feature_dim=128, sentence_length=6, batch_size=4)
    mesh = make_mesh(8, model_parallel=2)
    cap = build_captioner("adaptiveattention", cfg, 32)
    params = cap.init_params(jax.random.PRNGKey(0))
    opt = make_optimizer("adaptiveattention", 1e-3)
    opt_state = opt.init(params)

    p_shard = param_shardings(mesh, params, shard_vocab=True)
    o_shard = opt_state_shardings(mesh, opt_state, params, shard_vocab=True)

    # every sharded param must have an identically-sharded mu and nu
    p_flat = {jax.tree_util.keystr(kp): s
              for kp, s in jax.tree_util.tree_flatten_with_path(p_shard)[0]}
    sharded_paths = {k: s for k, s in p_flat.items() if s.spec != P()}
    assert sharded_paths, "expected vocab-sharded params in the fixture"
    o_flat = jax.tree_util.tree_flatten_with_path(o_shard)[0]
    for pk, s in sharded_paths.items():
        mirrors = [os for okp, os in o_flat if jax.tree_util.keystr(okp).endswith(pk)]
        # Adam: mu + nu
        assert len(mirrors) >= 2, f"no opt-state mirrors for {pk}"
        for m in mirrors:
            assert m.spec == s.spec, f"{pk}: opt spec {m.spec} != param spec {s.spec}"
    # scalar count leaves replicate
    for okp, os_ in o_flat:
        if jax.tree_util.keystr(okp).endswith(".count"):
            assert os_.spec == P()


def test_sharded_step_keeps_opt_state_sharded(rng):
    """After a step, the embedding Adam moments still carry P('model', None) —
    the layout survives the update (no silent replication)."""
    from lrp_imagecaptioning_tpu.config import FlickrConfig
    from lrp_imagecaptioning_tpu.models.captioner import build_captioner
    from lrp_imagecaptioning_tpu.train.optimizer import make_optimizer
    from lrp_imagecaptioning_tpu.train.step import make_sharded_train_step

    cfg = FlickrConfig(embedding_dim=16, hidden_dim=16, layer_name="block2_conv1",
                       img_feature_length=16, img_feature_dim=128, sentence_length=6, batch_size=8)
    mesh = make_mesh(8, model_parallel=2)
    cap = build_captioner("adaptiveattention", cfg, 32)
    params = cap.init_params(jax.random.PRNGKey(0))
    opt = make_optimizer("adaptiveattention", 1e-3)
    opt_state = opt.init(params)
    step, place = make_sharded_train_step(
        cap, opt, mesh, shard_vocab=True, params_template=params,
        opt_state_template=opt_state, donate=False)
    params, opt_state = place(params, opt_state)

    images = jnp.asarray(rng.normal(size=(8, 8, 8, 3)).astype(np.float32))
    caps = jnp.asarray(rng.integers(0, 32, size=(8, 7)).astype(np.int32))
    y = jax.nn.one_hot(jnp.asarray(rng.integers(0, 32, size=(8, 7))), 32)
    images, caps, y = shard_batch(mesh, images, caps, y)
    params, opt_state, m = step(params, opt_state, images, caps, y, jax.random.PRNGKey(1))
    assert np.isfinite(float(m["loss"]))

    flat = jax.tree_util.tree_flatten_with_path(opt_state)[0]
    emb_specs = [leaf.sharding.spec for kp, leaf in flat
                 if "embedding" in jax.tree_util.keystr(kp) and hasattr(leaf, "sharding")]
    assert emb_specs, "no embedding moments found in opt state"
    assert any(spec == P("model", None) for spec in emb_specs), emb_specs


def test_mesh_sharded_serving_matches_single_device(rng):
    """CaptionService(mesh=...) / Explainer(mesh=...): request batches shard
    over the data axis; captions must be identical and heatmaps allclose to
    the single-device service."""
    from lrp_imagecaptioning_tpu.config import FlickrConfig
    from lrp_imagecaptioning_tpu.infer.serving import CaptionService
    from lrp_imagecaptioning_tpu.models.captioner import build_captioner

    class PP:
        SOS_TOKEN = "szeros"
        EOS_TOKEN = "zeros"
        SOS_TOKEN_LABEL_ENCODED = 1
        EOS_TOKEN_LABEL_ENCODED = 2
        word_of = {i: f"w{i}" for i in range(1, 17)}

    cfg = FlickrConfig(embedding_dim=16, hidden_dim=16, layer_name="block2_conv1",
                       img_feature_length=16, img_feature_dim=128, sentence_length=5, drop_rate=0.0)
    cap = build_captioner("adaptiveattention", cfg, 16)
    params = cap.init_params(jax.random.PRNGKey(0))
    images = rng.normal(size=(8, 8, 8, 3)).astype(np.float32)

    single = CaptionService(cap, params, PP(), batch_size=8, beam_size=1)
    mesh = make_mesh(8)
    sharded = CaptionService(cap, params, PP(), batch_size=8, beam_size=1,
                             mesh=mesh)
    assert sharded.caption(images) == single.caption(images)

    exp_s = single.explain(images)
    exp_m = sharded.explain(images)
    for a, b in zip(exp_s, exp_m):
        assert a.caption == b.caption
        np.testing.assert_allclose(b.relevance_maps, a.relevance_maps,
                                   rtol=2e-4, atol=2e-6)

    # batch not divisible by the data axis is rejected up front
    with pytest.raises(ValueError):
        CaptionService(cap, params, PP(), batch_size=6, mesh=mesh)


def test_mesh_analyze_many_matches_single_device(rng):
    """Explainer.analyze_many over a mesh: length-sorted chunks dispatch the
    shard_map bucket programs (chunks padded to the mesh-divisible batch
    size); results must match the single-device path in input order."""
    from lrp_imagecaptioning_tpu.config import FlickrConfig
    from lrp_imagecaptioning_tpu.explain.engine import Explainer
    from lrp_imagecaptioning_tpu.models.captioner import build_captioner

    class PP:
        SOS_TOKEN = "szeros"
        EOS_TOKEN = "zeros"
        SOS_TOKEN_LABEL_ENCODED = 1
        EOS_TOKEN_LABEL_ENCODED = 2
        word_of = {i: f"w{i}" for i in range(1, 17)}

    cfg = FlickrConfig(embedding_dim=16, hidden_dim=16, layer_name="block2_conv1",
                       img_feature_length=16, img_feature_dim=128, sentence_length=5, drop_rate=0.0)
    cap = build_captioner("adaptiveattention", cfg, 16)
    params = cap.init_params(jax.random.PRNGKey(0))
    images = rng.normal(size=(10, 8, 8, 3)).astype(np.float32)
    tokens = np.zeros((10, 5), np.int32)
    for b in range(10):  # varied lengths -> several buckets
        ln = 1 + b % 4
        tokens[b, :ln] = 5 + np.arange(ln)
        if ln < 5:
            tokens[b, ln] = 2

    plain = Explainer(cap, params, PP(), method="lrp", word_buckets=(2, 4))
    sharded = Explainer(cap, params, PP(), method="lrp", word_buckets=(2, 4),
                        mesh=make_mesh(8))
    a = plain.analyze_many(images, tokens_1based=tokens, batch_size=8)
    b = sharded.analyze_many(images, tokens_1based=tokens, batch_size=8)
    for ea, eb in zip(a, b):
        assert ea.words == eb.words
        np.testing.assert_allclose(eb.relevance_maps, ea.relevance_maps,
                                   rtol=2e-4, atol=2e-6)

    # default batch size stays mesh-divisible (reuses the compiled B=8
    # programs here); an explicitly indivisible one is rejected up front
    c = sharded.analyze_many(images[:8], tokens_1based=tokens[:8])
    assert [e.words for e in c] == [e.words for e in b[:8]]
    with pytest.raises(ValueError):
        sharded.analyze_many(images, tokens_1based=tokens, batch_size=3)


def test_word_sharded_analyze_matches_single_device(rng):
    """Explainer(shard_words=True): the single-image analyze path shards the
    per-word backward passes over the mesh's data axis (latency mode). Must
    reproduce the unsharded analyze — words identical, maps/relevances
    allclose — for both the LRP and gradient method families."""
    from lrp_imagecaptioning_tpu.config import FlickrConfig
    from lrp_imagecaptioning_tpu.explain.engine import Explainer
    from lrp_imagecaptioning_tpu.models.captioner import build_captioner

    class PP:
        SOS_TOKEN = "szeros"
        EOS_TOKEN = "zeros"
        SOS_TOKEN_LABEL_ENCODED = 1
        EOS_TOKEN_LABEL_ENCODED = 2
        word_of = {i: f"w{i}" for i in range(1, 17)}

    cfg = FlickrConfig(embedding_dim=16, hidden_dim=16, layer_name="block2_conv1",
                       img_feature_length=16, img_feature_dim=128, sentence_length=5, drop_rate=0.0)
    cap = build_captioner("adaptiveattention", cfg, 16)
    params = cap.init_params(jax.random.PRNGKey(0))
    image = rng.normal(size=(8, 8, 3)).astype(np.float32)
    tokens = np.array([5, 7, 9, 2, 0], np.int32)  # 3 words then EOS

    mesh = make_mesh(8)
    for method in ("lrp", "gradient"):
        plain = Explainer(cap, params, PP(), method=method)
        sharded = Explainer(cap, params, PP(), method=method, mesh=mesh,
                            shard_words=True)
        ea = plain.analyze(image, tokens_1based=tokens)
        eb = sharded.analyze(image, tokens_1based=tokens)
        assert eb.words == ea.words
        np.testing.assert_allclose(eb.relevance_maps, ea.relevance_maps,
                                   rtol=2e-4, atol=2e-6)
        np.testing.assert_allclose(eb.word_relevances, ea.word_relevances,
                                   rtol=2e-4, atol=2e-6)
        np.testing.assert_allclose(eb.betas, ea.betas, rtol=2e-4, atol=2e-6)

    # shard_words without a mesh is rejected up front
    with pytest.raises(ValueError):
        Explainer(cap, params, PP(), shard_words=True)


@pytest.mark.slow
def test_word_sharded_analyze_gridtd(rng):
    """shard_words parity for the two-LSTM grid-TD decoder (4 carried states,
    per-word V accumulation across time — the heavier backward)."""
    from lrp_imagecaptioning_tpu.config import FlickrConfig
    from lrp_imagecaptioning_tpu.explain.engine import Explainer
    from lrp_imagecaptioning_tpu.models.captioner import build_captioner

    class PP:
        SOS_TOKEN = "szeros"
        EOS_TOKEN = "zeros"
        SOS_TOKEN_LABEL_ENCODED = 1
        EOS_TOKEN_LABEL_ENCODED = 2
        word_of = {i: f"w{i}" for i in range(1, 17)}

    cfg = FlickrConfig(embedding_dim=16, hidden_dim=16, layer_name="block2_conv1",
                       img_feature_length=16, img_feature_dim=128, sentence_length=5, drop_rate=0.0)
    cap = build_captioner("gridTD", cfg, 16)
    params = cap.init_params(jax.random.PRNGKey(0))
    image = rng.normal(size=(8, 8, 3)).astype(np.float32)
    tokens = np.array([5, 7, 9, 2, 0], np.int32)

    mesh = make_mesh(8)
    plain = Explainer(cap, params, PP(), method="lrp")
    sharded = Explainer(cap, params, PP(), method="lrp", mesh=mesh,
                        shard_words=True)
    ea = plain.analyze(image, tokens_1based=tokens)
    eb = sharded.analyze(image, tokens_1based=tokens)
    assert eb.words == ea.words
    np.testing.assert_allclose(eb.relevance_maps, ea.relevance_maps,
                               rtol=2e-4, atol=2e-6)
    np.testing.assert_allclose(eb.betas, ea.betas, rtol=2e-4, atol=2e-6)


def test_make_mesh_insufficient_devices_raises():
    """Requesting more devices than exist must raise, not silently shrink."""
    with pytest.raises(ValueError, match="only"):
        make_mesh(1024)


def test_trainer_multihost_requires_mesh(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    from lrp_imagecaptioning_tpu.config import FlickrConfig
    from lrp_imagecaptioning_tpu.data.datasets import SyntheticDataset
    from lrp_imagecaptioning_tpu.train.trainer import Trainer

    cfg = FlickrConfig(embedding_dim=16, hidden_dim=16, sentence_length=5,
                       batch_size=4, rare_words_handling="nothing")
    ds = SyntheticDataset(cfg, n_train=4, n_val=2, n_test=2,
                          cache_dir=str(tmp_path / "imgs"))
    with pytest.raises(ValueError, match="multihost"):
        Trainer("adaptiveattention", cfg, ds, multihost=True)
