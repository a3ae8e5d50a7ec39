"""LSTM cell as a pure function + initializers shared by both decoders.

Gate layout follows Keras: z = [i, f, g, o] concatenated on the last axis
(reference numpy replica: explainers.py:125-139). recurrent_activation is
sigmoid, activation tanh; Keras's ``unit_forget_bias`` adds +1 to the forget
gate bias at init.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np


class LSTMState(NamedTuple):
    h: jnp.ndarray
    c: jnp.ndarray


class LSTMCache(NamedTuple):
    """Everything any backward pass (LRP or gradient) needs from one step."""

    z_pre: jnp.ndarray  # (..., 4H) gate pre-activations [i, f, g, o]
    c: jnp.ndarray      # (..., H) new cell state


def lstm_init(key, in_dim: int, hidden: int, dtype=jnp.float32):
    """glorot_uniform kernel, orthogonal recurrent, zeros(+forget 1) bias."""
    k1, k2 = jax.random.split(key)
    limit = float(np.sqrt(6.0 / (in_dim + 4 * hidden)))
    wi = jax.random.uniform(k1, (in_dim, 4 * hidden), dtype, -limit, limit)
    wh = jax.nn.initializers.orthogonal()(k2, (hidden, 4 * hidden), dtype)
    b = jnp.zeros((4 * hidden,), dtype).at[hidden : 2 * hidden].set(1.0)
    return {"wi": wi, "wh": wh, "b": b}


def lstm_step(params, x, state: LSTMState, dropout_masks=None):
    """One LSTM step. Returns (new_state, cache).

    ``dropout_masks``, when given, is ``(x_masks (4, in_dim), h_masks (4, H))``
    — Keras LSTM dropout semantics: one inverted-dropout mask per gate for
    the input and one per gate for the recurrent state, constant across
    timesteps (Keras ``dropout=``/``recurrent_dropout=``, used by the
    reference training graphs, model.py:455-460)."""
    h, c = state
    hidden = h.shape[-1]
    if dropout_masks is None:
        z = x @ params["wi"] + h @ params["wh"] + params["b"]
    else:
        x_masks, h_masks = dropout_masks
        parts = []
        for g_idx in range(4):
            wi_g = params["wi"][:, g_idx * hidden : (g_idx + 1) * hidden]
            wh_g = params["wh"][:, g_idx * hidden : (g_idx + 1) * hidden]
            parts.append((x * x_masks[g_idx]) @ wi_g + (h * h_masks[g_idx]) @ wh_g)
        z = jnp.concatenate(parts, axis=-1) + params["b"]
    zi, zf, zg, zo = jnp.split(z, 4, axis=-1)
    i = jax.nn.sigmoid(zi)
    f = jax.nn.sigmoid(zf)
    g = jnp.tanh(zg)
    o = jax.nn.sigmoid(zo)
    c_new = f * c + i * g
    h_new = o * jnp.tanh(c_new)
    return LSTMState(h_new, c_new), LSTMCache(z_pre=z, c=c_new)


def lstm_dropout_masks(key, in_dim: int, hidden: int, rate: float, batch: int | None = None):
    """Per-gate inverted-dropout masks, shared across timesteps.

    Returns (x_masks, h_masks) with shapes (4, [B,] in_dim) / (4, [B,] H)."""
    kx, kh = jax.random.split(key)
    keep = 1.0 - rate
    x_shape = (4, in_dim) if batch is None else (4, batch, in_dim)
    h_shape = (4, hidden) if batch is None else (4, batch, hidden)
    x_masks = jax.random.bernoulli(kx, keep, x_shape) / keep
    h_masks = jax.random.bernoulli(kh, keep, h_shape) / keep
    return x_masks.astype(jnp.float32), h_masks.astype(jnp.float32)


def dense_init(key, in_dim: int, out_dim: int, dtype=jnp.float32):
    limit = float(np.sqrt(6.0 / (in_dim + out_dim)))
    kernel = jax.random.uniform(key, (in_dim, out_dim), dtype, -limit, limit)
    return {"kernel": kernel, "bias": jnp.zeros((out_dim,), dtype)}


def dense(params, x):
    return x @ params["kernel"] + params["bias"]


def attn_weight_init(key, shape, dtype=jnp.float32):
    """glorot_uniform, the wrapper's weight_initializer (model.py:555-571)."""
    fan_in, fan_out = shape[0], shape[-1]
    limit = float(np.sqrt(6.0 / (fan_in + fan_out)))
    return jax.random.uniform(key, shape, dtype, -limit, limit)
