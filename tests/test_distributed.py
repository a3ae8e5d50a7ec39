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


def test_shard_global_batch_multiple_arrays(rng):
    mesh = make_mesh(8)
    a = rng.normal(size=(8, 3)).astype(np.float32)
    b = rng.integers(0, 9, size=(8,)).astype(np.int32)
    ga, gb = shard_global_batch(mesh, a, b)
    np.testing.assert_array_equal(np.asarray(ga), a)
    np.testing.assert_array_equal(np.asarray(gb), b)
