"""Multi-host (pod-slice) extensions of the mesh layer.

The reference is strictly single-GPU (train.py:687 pins one CUDA device), so
everything here is new TPU-native capability: running the same sharded train
step across multiple hosts of a pod slice, where each host owns a subset of
the chips and the DCN (data-center network) links hosts while ICI links chips
within a host.

Layout rule (the scaling-book recipe): put the *data* axis over DCN — its
gradient ``psum`` is one small all-reduce per step and tolerates DCN latency —
and keep any *model* axis inside a host so tensor-parallel collectives ride
ICI. ``make_multihost_mesh`` builds exactly that ordering by grouping the
global device list by owning process.

Data loading is process-local: each host loads only its shard of the global
batch (``process_batch_slice``) and ``global_batch_from_local`` assembles the
logical global array from the per-process pieces without any host gather
(``jax.make_array_from_process_local_data``). The jitted train step is
unchanged — GSPMD sees one global array either way, which is why everything
here is testable single-process: with one process the local slice IS the
global batch and the assembled array is bit-identical to ``device_put``.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .mesh import DATA_AXIS, MODEL_AXIS, batch_sharding, stacked_batch_sharding


def initialize_distributed(coordinator_address: str | None = None,
                           num_processes: int | None = None,
                           process_id: int | None = None,
                           auto: bool = False) -> int:
    """Join (or skip joining) the multi-process JAX runtime.

    With no arguments in a single-process environment this is a no-op that
    returns 1 (``jax.process_count()`` is always 1 before initialization, so
    a no-arg call can NOT auto-detect a pod slice — that would make every
    single-host run fail). On a pod slice either pass the coordinator's
    ``host:port`` (and, off TPU, the process count/id) or pass ``auto=True``
    to run jax's no-arg environment auto-detection (Cloud TPU metadata /
    SLURM); after this, ``jax.devices()`` is global and
    ``jax.local_devices()`` is this host's chips.
    """
    if auto and coordinator_address is None:
        jax.distributed.initialize()
        return jax.process_count()
    if coordinator_address is None and jax.process_count() == 1:
        return 1
    if coordinator_address is not None:
        jax.distributed.initialize(coordinator_address=coordinator_address,
                                   num_processes=num_processes,
                                   process_id=process_id)
    return jax.process_count()


def make_multihost_mesh(model_parallel: int = 1, devices=None) -> Mesh:
    """(data, model) mesh over all global devices, DCN-aware.

    The data axis spans processes (DCN + leftover ICI); the model axis stays
    within a host (pure ICI). Single-process this degenerates to the same
    layout as ``mesh.make_mesh``.
    """
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    if n % model_parallel:
        raise ValueError(f"{n} devices not divisible by model_parallel={model_parallel}")
    n_proc = max(jax.process_count(), 1)
    if n_proc > 1:
        local = n // n_proc
        if model_parallel > local:
            raise ValueError(
                f"model_parallel={model_parallel} exceeds the {local} chips per "
                f"host — model collectives would cross DCN")
        # Group by process so the data axis crosses hosts and the model axis
        # stays within one. (mesh_utils.create_hybrid_device_mesh is the
        # multi-SLICE tool — it keys on slice_index, which is absent on a
        # single pod slice and on CPU — so we build the grouping directly.)
        by_proc: dict[int, list] = {}
        for d in devices:
            by_proc.setdefault(d.process_index, []).append(d)
        if len(by_proc) != n_proc:
            raise ValueError(
                f"devices span {len(by_proc)} processes but process_count={n_proc}")
        rows = []
        for pi in sorted(by_proc):
            ds = sorted(by_proc[pi], key=lambda d: d.id)
            if len(ds) != local:
                raise ValueError(f"process {pi} owns {len(ds)} devices, expected {local}")
            rows.append(np.asarray(ds, dtype=object).reshape(
                local // model_parallel, model_parallel))
        arr = np.concatenate(rows, axis=0)
    else:
        arr = np.asarray(devices).reshape(n // model_parallel, model_parallel)
    return Mesh(arr, (DATA_AXIS, MODEL_AXIS))


def process_batch_slice(global_batch: int,
                        process_index: int | None = None,
                        process_count: int | None = None) -> slice:
    """Which rows of the global batch this process should load.

    Contiguous equal split. ``global_batch`` must divide evenly by the
    process count: the provider does NOT pad ragged epoch tails (it yields
    the short remainder, data/provider.py::_batch_generator), so multihost
    loaders should size epochs to full batches or drop the remainder."""
    pi = jax.process_index() if process_index is None else process_index
    pc = max(jax.process_count() if process_count is None else process_count, 1)
    if global_batch % pc:
        raise ValueError(f"global batch {global_batch} not divisible by {pc} processes")
    per = global_batch // pc
    return slice(pi * per, (pi + 1) * per)


def global_batch_from_local(mesh: Mesh, local_array: np.ndarray,
                            global_batch: int | None = None,
                            sharding: NamedSharding | None = None):
    """Assemble the logical global batch from this process's local rows.

    ``local_array`` holds only this process's slice (see
    ``process_batch_slice``); the returned jax.Array has global shape with the
    leading axis sharded over ``data``. No cross-host data movement happens —
    each host places its rows on its own chips.
    """
    if sharding is None:
        sharding = batch_sharding(mesh)
    if global_batch is None:
        global_batch = local_array.shape[0] * max(jax.process_count(), 1)
    global_shape = (global_batch, *local_array.shape[1:])
    return jax.make_array_from_process_local_data(sharding, np.asarray(local_array),
                                                  global_shape)


def global_stacked_batch_from_local(mesh: Mesh, local_array: np.ndarray,
                                    global_batch: int | None = None):
    """``global_batch_from_local`` for (K, B_local, ...) ``steps_per_call``
    stacks: the scan (K) axis stays whole on every device, the batch axis
    (axis 1) assembles across processes into ``global_batch`` rows.

    Each process stacks only its own K local batches; the returned jax.Array
    has global shape (K, global_batch, ...) sharded ``P(None, 'data')`` — the
    layout ``make_sharded_multi_train_step`` expects — again with no
    cross-host data movement.
    """
    local_array = np.asarray(local_array)
    if global_batch is None:
        global_batch = local_array.shape[1] * max(jax.process_count(), 1)
    global_shape = (local_array.shape[0], global_batch, *local_array.shape[2:])
    return jax.make_array_from_process_local_data(
        stacked_batch_sharding(mesh), local_array, global_shape)


def shard_global_batch(mesh: Mesh, *local_arrays, global_batch: int | None = None):
    """Multi-host analog of ``mesh.shard_batch`` (process-local inputs)."""
    out = tuple(global_batch_from_local(mesh, a, global_batch) for a in local_arrays)
    return out if len(out) > 1 else out[0]
