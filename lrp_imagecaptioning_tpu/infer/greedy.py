"""Greedy decoding as one jitted scan with carried LSTM state.

The reference's greedy loop re-runs the FULL teacher-forcing graph (VGG16
included) once per generated word (inference.py:101-126) — O(T^2) decoder cost
and 20 encoder re-runs per caption. Here the encoder runs once and the decoder
steps in a ``lax.scan`` carrying (h, c): O(T), one XLA program.

Token spaces: the scan works in 0-based model space; outputs are converted to
1-based tokenizer space (+1, inference.py:115) with EOS-masked padding.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


def greedy_decode(captioner, params, feat_grid, sos_id_1based: int, eos_id_1based: int, max_len: int = 20):
    """feat_grid (B,L,D) -> (tokens_1based (B,max_len), logits (B,max_len,V)).

    tokens after the first EOS are 0 (padding). The returned sequence includes
    the EOS itself, matching the reference caption encoding used by the
    explainers (the final 'zeros' token, explainers.py:386).
    """
    dec = captioner.decoder
    consts = captioner.prepare_consts(params, feat_grid)
    B = feat_grid.shape[0]
    H = captioner.cfg.hidden_dim
    emb = params["decoder"]["embedding"]

    def scan_fn(carry, _):
        state, token0, done = carry
        new_state, cache = dec.step(params["decoder"], consts, state, emb[token0])
        nxt0 = jnp.argmax(cache.logits, axis=-1)  # 0-based
        tok1 = jnp.where(done, 0, nxt0 + 1)       # 1-based output, 0 after EOS
        new_done = done | (nxt0 + 1 == eos_id_1based)
        return (new_state, nxt0, new_done), (tok1, cache.logits)

    init = (
        dec.init_state(B, H),
        jnp.full((B,), sos_id_1based - 1, jnp.int32),
        jnp.zeros((B,), bool),
    )
    _, (tokens, logits) = jax.lax.scan(scan_fn, init, None, length=max_len)
    return jnp.moveaxis(tokens, 0, 1), jnp.moveaxis(logits, 0, 1)


@partial(jax.jit, static_argnums=(0, 3, 4, 5))
def greedy_decode_jit(captioner, params, feat_grid, sos_id, eos_id, max_len=20):
    return greedy_decode(captioner, params, feat_grid, sos_id, eos_id, max_len)
