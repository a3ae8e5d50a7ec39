"""Optimizer factory matching the reference's Keras Adam configs.

Reference compile calls: Adam(lr, clipvalue=0.1) for adaptive attention
(model.py:468-470) and Adam(lr, beta_1=0.8, clipvalue=0.1) for grid-TD
(model.py:662-664). Keras ``clipvalue`` clips each gradient ELEMENT to
[-c, c] before the moment updates — optax.clip, not clip_by_global_norm.

The learning rate goes through ``optax.inject_hyperparams`` so the
ReduceLROnPlateau callback can rescale it in the optimizer state without
rebuilding the train step (the Keras callback mutates ``optimizer.lr`` the
same way, train.py:107-117).
"""

from __future__ import annotations

import optax

ADAM_BETAS = {"adaptiveattention": (0.9, 0.999), "gridTD": (0.8, 0.999)}


def make_optimizer(model_type: str, learning_rate: float, clipvalue: float = 0.1):
    b1, b2 = ADAM_BETAS.get(model_type, (0.9, 0.999))
    adam = optax.inject_hyperparams(optax.adam)(learning_rate=learning_rate, b1=b1, b2=b2)
    return optax.chain(optax.clip(clipvalue), adam)


def get_learning_rate(opt_state) -> float:
    return float(opt_state[1].hyperparams["learning_rate"])


def set_learning_rate(opt_state, lr: float):
    """Functionally update the injected learning rate."""
    import jax.numpy as jnp

    inner = opt_state[1]
    hp = dict(inner.hyperparams)
    hp["learning_rate"] = jnp.asarray(lr, jnp.asarray(hp["learning_rate"]).dtype)
    return (opt_state[0], inner._replace(hyperparams=hp))
