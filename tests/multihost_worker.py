#!/usr/bin/env python3
"""One process of the real multi-process multihost validation.

Spawned by ``tests/test_distributed.py::test_two_process_multihost_training``
(2 processes x 2 virtual CPU devices each -> a 4-device (data=2, model=2)
hybrid mesh whose data axis crosses processes over gloo collectives, exactly
the DCN role on a pod slice). Each process:

* joins the runtime through ``initialize_distributed`` (the library API,
  not raw jax.distributed),
* builds ``make_multihost_mesh(model_parallel=2)`` — model axis within the
  host, data axis across hosts,
* loads ONLY its ``process_batch_slice`` rows of a deterministic global
  batch and assembles global arrays via ``shard_global_batch`` (no host
  gather),
* runs 3 real vocab-sharded train steps and writes the loss trajectory.

The parent asserts both processes saw identical losses and that they match
the single-process 4-device reference run bit-for-bit semantics (allclose).

Usage: multihost_worker.py <pid> <nproc> <port> <out.json>
"""
import json
import os
import sys


def main():
    pid, nproc, port, outpath = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3], sys.argv[4]
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    import jax

    jax.config.update("jax_platforms", "cpu")  # sitecustomize may force a TPU
    jax.config.update("jax_compilation_cache_dir",
                      os.environ.get("LRPIC_TEST_CACHE", "/tmp/lrpic_jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import numpy as np

    from lrp_imagecaptioning_tpu.config import FlickrConfig
    from lrp_imagecaptioning_tpu.models.captioner import build_captioner
    from lrp_imagecaptioning_tpu.parallel.distributed import (
        global_stacked_batch_from_local,
        initialize_distributed,
        make_multihost_mesh,
        process_batch_slice,
        shard_global_batch,
    )
    from lrp_imagecaptioning_tpu.train.optimizer import make_optimizer
    from lrp_imagecaptioning_tpu.train.step import (
        make_sharded_multi_train_step,
        make_sharded_train_step,
    )

    n = initialize_distributed(coordinator_address=f"localhost:{port}",
                               num_processes=nproc, process_id=pid)
    assert n == nproc, f"process_count {n} != {nproc}"
    assert len(jax.local_devices()) == 2
    assert len(jax.devices()) == 2 * nproc

    mesh = make_multihost_mesh(model_parallel=2)
    assert mesh.devices.shape == (nproc, 2)

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

    # deterministic GLOBAL batch; this process materializes only its slice
    rng = np.random.default_rng(0)
    g_images = rng.normal(size=(8, 8, 8, 3)).astype(np.float32)
    g_caps = rng.integers(0, 32, size=(8, 7)).astype(np.int32)
    g_y = np.eye(32, dtype=np.float32)[rng.integers(0, 32, size=(8, 7))]
    sl = process_batch_slice(8)
    images, caps, y = shard_global_batch(
        mesh, g_images[sl], g_caps[sl], g_y[sl], global_batch=8)

    losses = []
    for i in range(3):
        params, opt_state, m = step(params, opt_state, images, caps, y,
                                    jax.random.PRNGKey(100 + i))
        losses.append(float(m["loss"]))

    # steps_per_call x multihost: scan the SAME 3 steps in one dispatch from
    # the same initial state — each process stacks only its K local batches
    # and global_stacked_batch_from_local assembles (K, B_global, ...) with
    # no cross-host gather. Losses must match the chained singles above.
    params2 = cap.init_params(jax.random.PRNGKey(0))
    opt_state2 = opt.init(params2)
    multi, mplace = make_sharded_multi_train_step(
        cap, opt, mesh, shard_vocab=True, params_template=params2,
        opt_state_template=opt_state2, donate=False)
    params2, opt_state2 = mplace(params2, opt_state2)
    local = g_images[sl]
    s_images = global_stacked_batch_from_local(
        mesh, np.stack([local] * 3), global_batch=8)
    s_caps = global_stacked_batch_from_local(
        mesh, np.stack([g_caps[sl]] * 3), global_batch=8)
    s_y = global_stacked_batch_from_local(
        mesh, np.stack([g_y[sl]] * 3), global_batch=8)
    rngs = jax.numpy.stack([jax.random.PRNGKey(100 + i) for i in range(3)])
    _, _, mm = multi(params2, opt_state2, s_images, s_caps, s_y, rngs)
    multi_losses = [float(v) for v in mm["loss"]]

    with open(outpath, "w") as f:
        json.dump({"pid": pid, "losses": losses, "multi_losses": multi_losses}, f)


if __name__ == "__main__":
    main()
