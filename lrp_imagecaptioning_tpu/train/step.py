"""Jitted train / eval steps, single-chip and mesh-sharded.

One ``value_and_grad`` over the scan-based teacher-forcing forward replaces
the reference's Keras ``fit_generator`` inner step (train.py:389). On a mesh,
params/opt state are placed replicated (or vocab-sharded) and the batch is
sharded over the data axis; XLA inserts the ICI ``psum`` for the gradients —
no hand-written collectives (scaling-book recipe: shardings in, collectives
out).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import optax

from ..models.captioner import masked_accuracy
from ..parallel import (
    batch_sharding,
    opt_state_shardings,
    param_shardings,
    replicated,
    stacked_batch_sharding,
)


def _step_body(captioner, optimizer):
    """The ONE train-step body shared by the single, multi (scan) and
    sharded step factories: loss -> grad -> optimizer update -> metrics."""
    loss_fn = captioner.loss_fn()

    def one(carry, batch):
        params, opt_state = carry
        images, captions_in, y_onehot, rng = batch

        def loss(p):
            logits = captioner.forward_train(p, images, captions_in, rng)
            return loss_fn(logits, y_onehot), logits

        (l, logits), grads = jax.value_and_grad(loss, has_aux=True)(params)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return (params, opt_state), {"loss": l, "accuracy": masked_accuracy(logits, y_onehot)}

    return one


def make_train_step(captioner, optimizer, donate: bool = True):
    """-> jitted fn (params, opt_state, images, captions_in, y_onehot, rng)
    -> (params, opt_state, metrics dict)."""
    one = _step_body(captioner, optimizer)

    def train_step(params, opt_state, images, captions_in, y_onehot, rng):
        (params, opt_state), m = one((params, opt_state), (images, captions_in, y_onehot, rng))
        return params, opt_state, m

    kw = {"donate_argnums": (0, 1)} if donate else {}
    return jax.jit(train_step, **kw)


def make_multi_train_step(captioner, optimizer, donate: bool = True):
    """K optimizer steps in ONE dispatch: a ``lax.scan`` over K stacked batches.

    -> jitted fn (params, opt_state, images (K,B,H,W,3), captions_in (K,B,T),
    y_onehot (K,B,T,V), rngs (K,) key array) -> (params, opt_state, metrics
    dict with (K,)-stacked values). Semantically identical to K chained
    single steps.

    Motivation (measured on v5e behind an ~85 ms host<->device relay): chained
    single-step dispatches cannot pipeline — each dependent step pays the
    full host round trip, 717 ms/step for a 47 ms program (donate=True:
    1368 ms). Scanning K batches amortizes the dispatch to one round trip
    per K steps. On directly-attached TPUs single steps enqueue
    asynchronously and the difference shrinks to the dispatch overhead.
    """
    one = _step_body(captioner, optimizer)

    def multi_step(params, opt_state, images, captions_in, y_onehot, rngs):
        (params, opt_state), metrics = jax.lax.scan(
            one, (params, opt_state), (images, captions_in, y_onehot, rngs)
        )
        return params, opt_state, metrics

    kw = {"donate_argnums": (0, 1)} if donate else {}
    return jax.jit(multi_step, **kw)


def metric_accumulator(keys=("loss", "accuracy")):
    """Device-side metric accumulation shared by Trainer and LRPFinetuner.

    ``record(m)`` appends per-dispatch device sums (no host sync per step);
    ``finalize(steps)`` performs ONE device reduction + transfer per metric
    and returns host floats averaged over ``steps``."""
    acc = {k: [] for k in keys}

    def record(m):
        for k in acc:
            acc[k].append(jnp.sum(m[k]))

    def finalize(steps):
        return {k: (float(jnp.sum(jnp.stack(vs))) if vs else 0.0) / max(steps, 1)
                for k, vs in acc.items()}

    return record, finalize


def run_stepped_steps(generator, steps, K, place, split_rng, multi_fn, single_fn,
                      params, opt_state, record, place_stacked=None):
    """Shared ``steps_per_call`` driver used by Trainer and LRPFinetuner.

    Pulls ``steps`` batches from ``generator`` (yielding
    ``((captions_in, images), y_onehot)``), running ``multi_fn`` on stacks of
    K and ``single_fn`` on the ragged tail. ``place(arr)`` moves host arrays
    onto the device/mesh; ``place_stacked`` does the same for (K, B, ...)
    stacks (defaults to ``place``; on a mesh it must shard axis 1, not 0);
    ``split_rng(n)`` returns n fresh keys; ``record(metrics)`` is called once
    per dispatch with the (possibly (k,)-stacked) metrics dict — keep sums
    device-side there. Returns the updated (params, opt_state)."""
    import numpy as np

    if place_stacked is None:
        place_stacked = place
    done = 0
    while done < steps:
        k = min(K, steps - done)
        if k == K and K > 1:
            batches = [next(generator) for _ in range(K)]
            # a ragged tail BATCH (dataset_size % batch_size != 0 puts a short
            # batch inside the epoch) cannot np.stack with full ones — run
            # those K batches as singles instead of crashing mid-epoch
            if len({b[0][1].shape[0] for b in batches}) == 1:
                imgs = place_stacked(np.stack([b[0][1] for b in batches]))
                cap_in = place_stacked(np.stack([b[0][0] for b in batches]))
                y = place_stacked(np.stack([b[1] for b in batches]))
                params, opt_state, m = multi_fn(params, opt_state, imgs, cap_in, y,
                                                split_rng(K))
                record(m)
                done += K
                continue
            for (cap_in, imgs), y in batches:
                params, opt_state, m = single_fn(params, opt_state, place(imgs),
                                                 place(cap_in), place(y),
                                                 split_rng(1)[0])
                record(m)
                done += 1
            continue
        (cap_in, imgs), y = next(generator)
        params, opt_state, m = single_fn(params, opt_state, place(imgs),
                                         place(cap_in), place(y), split_rng(1)[0])
        record(m)
        done += 1
    return params, opt_state


def make_eval_step(captioner):
    loss_fn = captioner.loss_fn()

    def eval_step(params, images, captions_in, y_onehot):
        logits = captioner.forward_train(params, images, captions_in, None)
        return {"loss": loss_fn(logits, y_onehot), "accuracy": masked_accuracy(logits, y_onehot)}

    return jax.jit(eval_step)


def _state_shardings(mesh, shard_vocab, params_template, opt_state_template):
    """(param shardings, opt-state shardings) for a mesh; opt state mirrors
    the param layout (Adam moments of sharded params stay sharded)."""
    rep = replicated(mesh)
    if params_template is None:
        return rep, rep
    p_shard = param_shardings(mesh, params_template, shard_vocab)
    if opt_state_template is None:
        return p_shard, rep
    o_shard = opt_state_shardings(mesh, opt_state_template, params_template, shard_vocab)
    return p_shard, o_shard


def make_sharded_train_step(captioner, optimizer, mesh, shard_vocab: bool = False,
                            params_template=None, donate: bool = True,
                            opt_state_template=None):
    """Mesh-parallel train step: batch over the data axis, params replicated
    (or vocab-sharded over the model axis when ``shard_vocab``).

    Returns (train_step, place_state) where ``place_state(params, opt_state)``
    moves host state onto the mesh with the right layout. When
    ``opt_state_template`` is given, the optimizer state mirrors the param
    shardings (Adam moments of vocab-sharded params are sharded, not
    replicated-and-reshuffled each step); otherwise it replicates.
    """
    one = _step_body(captioner, optimizer)
    data_s = batch_sharding(mesh)
    rep = replicated(mesh)
    p_shard, o_shard = _state_shardings(mesh, shard_vocab, params_template, opt_state_template)

    def train_step(params, opt_state, images, captions_in, y_onehot, rng):
        (params, opt_state), m = one((params, opt_state), (images, captions_in, y_onehot, rng))
        return params, opt_state, m

    def place_state(params, opt_state):
        return jax.device_put(params, p_shard), jax.device_put(opt_state, o_shard)

    kw = {"donate_argnums": (0, 1)} if donate else {}
    jitted = jax.jit(
        train_step,
        in_shardings=(p_shard, o_shard, data_s, data_s, data_s, rep),
        out_shardings=(p_shard, o_shard, rep),
        **kw,
    )
    return jitted, place_state


def make_sharded_multi_train_step(captioner, optimizer, mesh, shard_vocab: bool = False,
                                  params_template=None, donate: bool = True,
                                  opt_state_template=None):
    """K sharded optimizer steps in ONE dispatch: ``lax.scan`` over (K, B, ...)
    batch stacks whose batch axis is sharded over the data axis.

    Combines the two previously exclusive levers — dispatch amortization
    (make_multi_train_step) and data-parallel scale-out
    (make_sharded_train_step). Semantically identical to K chained sharded
    single steps. Returns (multi_step, place_state).
    """
    one = _step_body(captioner, optimizer)
    stack_s = stacked_batch_sharding(mesh)
    rep = replicated(mesh)
    p_shard, o_shard = _state_shardings(mesh, shard_vocab, params_template, opt_state_template)

    def multi_step(params, opt_state, images, captions_in, y_onehot, rngs):
        (params, opt_state), metrics = jax.lax.scan(
            one, (params, opt_state), (images, captions_in, y_onehot, rngs)
        )
        return params, opt_state, metrics

    def place_state(params, opt_state):
        return jax.device_put(params, p_shard), jax.device_put(opt_state, o_shard)

    kw = {"donate_argnums": (0, 1)} if donate else {}
    jitted = jax.jit(
        multi_step,
        in_shardings=(p_shard, o_shard, stack_s, stack_s, stack_s, rep),
        out_shardings=(p_shard, o_shard, rep),
        **kw,
    )
    return jitted, place_state
