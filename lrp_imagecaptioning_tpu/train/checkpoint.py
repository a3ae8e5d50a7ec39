"""Orbax checkpointing of params + optimizer state (+ epoch metadata).

Improves on the reference's HDF5 weight-only checkpoints (train.py:79-88):
optimizer moments are saved too, so resume does not restart Adam from zero
(the reference's known limitation, SURVEY.md §5.4). Checkpoint names encode
the monitored metric like the reference's
``keras_model_{epoch:02d}_{val_cider:.4f}.hdf5`` pattern.
"""

from __future__ import annotations

import glob
import os
import re

import jax
import numpy as np


def _ckptr():
    import orbax.checkpoint as ocp

    return ocp.StandardCheckpointer()


def ckpt_name(epoch: int, metric: float | None) -> str:
    if metric is None:
        return f"ckpt_{epoch:02d}"
    return f"ckpt_{epoch:02d}_{metric:.4f}"


def save_checkpoint(directory: str, epoch: int, params, opt_state=None, metric: float | None = None) -> str:
    os.makedirs(directory, exist_ok=True)
    path = os.path.abspath(os.path.join(directory, ckpt_name(epoch, metric)))
    state = {"params": params}
    if opt_state is not None:
        state["opt_state"] = opt_state
    c = _ckptr()
    c.save(path, state, force=True)
    c.wait_until_finished()  # saves are async; finalize before returning
    return path


def latest_checkpoint(directory: str) -> str | None:
    """Find the newest checkpoint by epoch number encoded in the name
    (the reference globs checkpoint names the same way, train.py:563-564)."""
    cands = [c for c in glob.glob(os.path.join(directory, "ckpt_*")) if "-tmp" not in c]
    best, best_epoch = None, -1
    for c in cands:
        m = re.match(r"ckpt_(\d+)", os.path.basename(c))
        if m and int(m.group(1)) > best_epoch:
            best, best_epoch = c, int(m.group(1))
    return best


def restore_checkpoint(path: str, params_template, opt_state_template=None):
    """Restore into the given templates; returns (params, opt_state|None).

    With no opt_state template (inference-time loads), a params-only partial
    restore is used so checkpoints that carry optimizer state still load."""
    import orbax.checkpoint as ocp

    target = {"params": params_template}
    if opt_state_template is not None:
        target["opt_state"] = opt_state_template
        restored = _ckptr().restore(os.path.abspath(path), target)
    else:
        with ocp.PyTreeCheckpointer() as c:
            restored = c.restore(
                os.path.abspath(path),
                args=ocp.args.PyTreeRestore(item=target, partial_restore=True),
            )
    return restored["params"], restored.get("opt_state")


def save_params_npz(path: str, params) -> None:
    """Flat .npz export (portable, dependency-light alternative).

    Lists/tuples are encoded as ``#<index>`` path segments, with sentinel
    entries (``#emptylist`` / ``#emptydict`` for empty containers, ``#tuple``
    to distinguish tuples from lists) so pytrees like the AOA decoder's
    ``refine`` block list round-trip STRUCTURALLY — jax.export pins the exact
    pytree of its arguments, so a list flattened into a bare array (or a
    tuple restored as a list) would make the exported program unloadable
    (caught by tests/test_export_serving.py's matrix)."""
    flat = {}

    def walk(prefix, tree):
        if isinstance(tree, dict):
            if len(tree) == 0:
                flat[f"{prefix}/#emptydict"] = np.zeros(0, np.float32)
            for k, v in tree.items():
                walk(f"{prefix}/{k}" if prefix else k, v)
        elif isinstance(tree, (list, tuple)):
            if isinstance(tree, tuple):
                flat[f"{prefix}/#tuple"] = np.zeros(0, np.float32)
            if len(tree) == 0:
                flat[f"{prefix}/#emptylist"] = np.zeros(0, np.float32)
            for i, v in enumerate(tree):
                walk(f"{prefix}/#{i}", v)
        else:
            flat[prefix] = np.asarray(tree)

    walk("", params)
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    np.savez(path, **flat)


def load_params_npz(path: str):
    """Inverse of save_params_npz -> nested dict (lists restored from the
    ``#<index>`` encoding) of jnp arrays."""
    import jax.numpy as jnp

    out = {}
    with np.load(path) as f:
        for key in f.files:
            node = out
            parts = key.split("/")
            for p in parts[:-1]:
                node = node.setdefault(p, {})
            node[parts[-1]] = jnp.asarray(f[key])

    def listify(node):
        if not isinstance(node, dict):
            return node
        node = {k: listify(v) for k, v in node.items()}
        if "#emptydict" in node:
            return {}
        is_tuple = node.pop("#tuple", None) is not None
        if node and all(k.startswith("#") for k in node):
            seq = [] if "#emptylist" in node else \
                [node[f"#{i}"] for i in range(len(node))]
            return tuple(seq) if is_tuple else seq
        if is_tuple:  # empty tuple: only the #tuple sentinel was written
            return ()
        return node

    return listify(out)
