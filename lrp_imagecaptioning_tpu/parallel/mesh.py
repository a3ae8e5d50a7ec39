"""Device mesh + sharding layout for data-parallel (and optional vocab-model-
parallel) training over ICI.

The reference is strictly single-GPU (train.py:687 sets CUDA_VISIBLE_DEVICES;
no collectives anywhere — SURVEY.md §2.11), so parallelism here is a new,
TPU-native capability: a 2-D ``(data, model)`` ``jax.sharding.Mesh`` where

* the batch is sharded over ``data`` — XLA inserts the grad ``psum`` over ICI;
* optionally the vocabulary dimension of the embedding / output projection is
  sharded over ``model`` (the only >512-wide axis in these models), giving a
  simple tensor-parallel split of the logits matmul + its softmax-CE.

At 512-dim/VGG16 scale pure DP (``model=1``) is the performant default; the
2-D mesh exists so the same train step scales and is exercised by the
multi-chip dryrun.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh(n_devices: int | None = None, model_parallel: int = 1,
              devices=None) -> Mesh:
    """1-D data-parallel mesh, or 2-D (data, model) when model_parallel > 1.

    When the default backend has fewer than ``n_devices`` devices (e.g. one
    real TPU) but the CPU backend carries virtual devices
    (--xla_force_host_platform_device_count), the mesh falls back to CPU —
    the dryrun configuration."""
    if devices is None:
        devices = jax.devices()
        if n_devices is not None and len(devices) < n_devices:
            try:
                cpu = jax.devices("cpu")
                if len(cpu) >= n_devices:
                    devices = cpu
            except RuntimeError:
                pass
    if n_devices is not None:
        if len(devices) < n_devices:
            # silently returning a smaller mesh would e.g. run an "8-way"
            # job 4-way with doubled per-device batch and no indication
            raise ValueError(
                f"requested a {n_devices}-device mesh but only "
                f"{len(devices)} devices are available (default and CPU "
                f"backends); set --xla_force_host_platform_device_count "
                f"for virtual CPU devices")
        devices = devices[:n_devices]
    n = len(devices)
    if n % model_parallel:
        raise ValueError(f"{n} devices not divisible by model_parallel={model_parallel}")
    arr = np.asarray(devices).reshape(n // model_parallel, model_parallel)
    return Mesh(arr, (DATA_AXIS, MODEL_AXIS))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading (batch) axis split over the data axis."""
    return NamedSharding(mesh, P(DATA_AXIS))


def stacked_batch_sharding(mesh: Mesh) -> NamedSharding:
    """(K, B, ...) stacks for steps_per_call: the scan (K) axis stays whole,
    the batch axis splits over data."""
    return NamedSharding(mesh, P(None, DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def decoder_param_pspecs(decoder_params, shard_vocab: bool) -> dict:
    """PartitionSpec tree for a decoder param pytree.

    With ``shard_vocab`` the embedding table (V, E) splits over ``model`` on V
    and the output projection (H, V) on its V column — the two only
    vocab-sized tensors. Everything else replicates (512-dim weights are far
    below the point where sharding pays for its collectives).
    """

    def spec_for(path, leaf):
        if not shard_vocab:
            return P()
        keys = [getattr(p, "key", getattr(p, "name", None)) for p in path]
        if "embedding" in keys:
            return P(MODEL_AXIS, None)
        if "output" in keys:
            return P(None, MODEL_AXIS) if leaf.ndim == 2 else P(MODEL_AXIS)
        return P()

    return jax.tree_util.tree_map_with_path(spec_for, decoder_params)


def param_shardings(mesh: Mesh, params, shard_vocab: bool = False):
    """NamedSharding pytree for a full captioner params tree
    ({'vgg': ..., 'decoder': ...}); VGG always replicates."""
    specs = jax.tree.map(lambda _: P(), params)
    if shard_vocab and "decoder" in params:
        specs = dict(specs)
        specs["decoder"] = decoder_param_pspecs(params["decoder"], True)
    return jax.tree.map(lambda s: NamedSharding(mesh, s), specs,
                        is_leaf=lambda x: isinstance(x, P))


def opt_state_shardings(mesh: Mesh, opt_state, params, shard_vocab: bool = False):
    """NamedSharding pytree for an optax state that MIRRORS the param layout.

    Adam's ``mu``/``nu`` (and any other per-param moment) carry the same
    keypath suffix and shape as their param, so they get the param's
    sharding — sharded-vocab embeddings keep their Adam moments sharded
    instead of replicated-and-reshuffled every step. Scalars (``count``,
    schedule state) and anything unmatched replicate.
    """
    p_shard = jax.tree_util.tree_flatten_with_path(
        param_shardings(mesh, params, shard_vocab)
    )[0]
    p_leaves = jax.tree_util.tree_flatten_with_path(params)[0]
    by_path = {
        jax.tree_util.keystr(kp): (s, tuple(np.shape(leaf)))
        for (kp, s), (_, leaf) in zip(p_shard, p_leaves)
    }
    rep = NamedSharding(mesh, P())

    def spec_for(kp, leaf):
        ks = jax.tree_util.keystr(kp)
        shape = tuple(np.shape(leaf))
        best = None
        for pk, (s, pshape) in by_path.items():
            if ks.endswith(pk) and shape == pshape:
                if best is None or len(pk) > len(best[0]):
                    best = (pk, s)
        return best[1] if best is not None else rep

    return jax.tree_util.tree_map_with_path(spec_for, opt_state)


def shard_batch(mesh: Mesh, *arrays):
    """Host arrays -> device arrays sharded over the data axis."""
    s = batch_sharding(mesh)
    out = tuple(jax.device_put(a, s) for a in arrays)
    return out if len(out) > 1 else out[0]
