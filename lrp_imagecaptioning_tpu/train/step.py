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
import optax

from ..models.captioner import masked_accuracy
from ..parallel import batch_sharding, param_shardings, replicated


def make_train_step(captioner, optimizer, donate: bool = True):
    """-> jitted fn (params, opt_state, images, captions_in, y_onehot, rng)
    -> (params, opt_state, metrics dict)."""
    loss_fn = captioner.loss_fn()

    def train_step(params, opt_state, images, captions_in, y_onehot, rng):
        def loss(p):
            logits = captioner.forward_train(p, images, captions_in, rng)
            return loss_fn(logits, y_onehot), logits

        (l, logits), grads = jax.value_and_grad(loss, has_aux=True)(params)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        acc = masked_accuracy(logits, y_onehot)
        return params, opt_state, {"loss": l, "accuracy": acc}

    kw = {"donate_argnums": (0, 1)} if donate else {}
    return jax.jit(train_step, **kw)


def make_eval_step(captioner):
    loss_fn = captioner.loss_fn()

    def eval_step(params, images, captions_in, y_onehot):
        logits = captioner.forward_train(params, images, captions_in, None)
        return {"loss": loss_fn(logits, y_onehot), "accuracy": masked_accuracy(logits, y_onehot)}

    return jax.jit(eval_step)


def make_sharded_train_step(captioner, optimizer, mesh, shard_vocab: bool = False,
                            params_template=None, donate: bool = True):
    """Mesh-parallel train step: batch over the data axis, params replicated
    (or vocab-sharded over the model axis when ``shard_vocab``).

    Returns (train_step, place_state) where ``place_state(params, opt_state)``
    moves host state onto the mesh with the right layout.
    """
    loss_fn = captioner.loss_fn()
    data_s = batch_sharding(mesh)
    rep = replicated(mesh)

    def train_step(params, opt_state, images, captions_in, y_onehot, rng):
        def loss(p):
            logits = captioner.forward_train(p, images, captions_in, rng)
            return loss_fn(logits, y_onehot), logits

        (l, logits), grads = jax.value_and_grad(loss, has_aux=True)(params)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        acc = masked_accuracy(logits, y_onehot)
        return params, opt_state, {"loss": l, "accuracy": acc}

    if params_template is not None:
        p_shard = param_shardings(mesh, params_template, shard_vocab)
    else:
        p_shard = rep

    def place_state(params, opt_state):
        params = jax.tree.map(
            lambda x, s: jax.device_put(x, s), params, p_shard
        ) if params_template is not None else jax.device_put(params, rep)
        # opt state mirrors param layout where leaves match param shapes
        opt_state = jax.device_put(opt_state, rep)
        return params, opt_state

    kw = {"donate_argnums": (0, 1)} if donate else {}
    jitted = jax.jit(
        train_step,
        in_shardings=(p_shard if params_template is not None else rep, rep, data_s, data_s, data_s, rep),
        out_shardings=(p_shard if params_template is not None else rep, rep, rep),
        **kw,
    )
    return jitted, place_state
