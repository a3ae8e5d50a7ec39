"""grid-TD decoder (bottom-up/top-down on a CNN grid + adaptive sentinel).

Reproduces ExternalBottomUpAttentionAdaptive.step (reference model.py:784-818)
== numpy replica explainers.py:1092-1178, as one pure ``step`` function with
two LSTMs (top-down + language):

    x1_t    = [h2, g, e_t]                 g = global image feature (E)
    h1',c1' = TD-LSTM(x1_t, h1, c1)
    a_l     = W_a^T tanh(W_va v_l + W_ha h1')
    alpha   = softmax(a)
    s_t     = tanh(c1') * sigmoid(W_x x1_t + W_h h1)     (OLD h1)
    z_s     = W_a^T tanh(W_s s_t + W_ha h1')
    beta    = softmax([a ; z_s])[-1]
    ctx     = sum_l alpha_l v_l
    c_hat   = beta s_t + (1-beta) ctx
    x2_t    = [c_hat, h1']
    h2',c2' = Lang-LSTM(x2_t, h2, c2)
    logit   = W_out (h2' + c_hat) + b_out

Parity note: the reference's numpy ``_forward_beam_search`` computes decode
logits from ``h2`` alone (explainers.py:1160) while its training graph and
``_forward_single`` use ``h2 + c_hat`` (model.py:817, explainers.py:1075); the
LRP backward also seeds from ``h2 + c_hat`` (explainers.py:1221). We follow
the training graph (h2 + c_hat) everywhere and note the deviation.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from .cells import LSTMState, attn_weight_init, dense, dense_init, lstm_init, lstm_step


class GridTDState(NamedTuple):
    h1: jnp.ndarray
    c1: jnp.ndarray
    h2: jnp.ndarray
    c2: jnp.ndarray


class GridTDConsts(NamedTuple):
    v_feat: jnp.ndarray       # (B, L, H)
    v_proj: jnp.ndarray       # (B, L, H) v_feat @ W_va
    global_feat: jnp.ndarray  # (B, E)
    v_pre: jnp.ndarray        # (B, L, H)
    global_pre: jnp.ndarray   # (B, E)
    feat_grid: jnp.ndarray    # (B, L, D)
    avg_feat: jnp.ndarray     # (B, D)


class GridTDStepCache(NamedTuple):
    x1_t: jnp.ndarray       # (B, H+2E)
    x2_t: jnp.ndarray       # (B, 2H)
    h1_prev: jnp.ndarray
    c1_prev: jnp.ndarray
    h2_prev: jnp.ndarray
    c2_prev: jnp.ndarray
    h1: jnp.ndarray
    c1: jnp.ndarray
    h2: jnp.ndarray
    c2: jnp.ndarray
    z1_pre: jnp.ndarray     # (B, 4H) TD-LSTM gates
    z2_pre: jnp.ndarray     # (B, 4H) language-LSTM gates
    attention: jnp.ndarray  # (B, L)
    st: jnp.ndarray
    beta: jnp.ndarray       # (B, 1)
    context: jnp.ndarray
    c_hat: jnp.ndarray
    logits: jnp.ndarray


def init_params(key, vocab_size: int, cfg):
    E, H, D = cfg.embedding_dim, cfg.hidden_dim, cfg.img_feature_dim
    keys = jax.random.split(key, 13)
    limit = float(jnp.sqrt(6.0 / (vocab_size + E)))
    return {
        "embedding": jax.random.uniform(keys[0], (vocab_size, E), jnp.float32, -limit, limit),
        "image_features": dense_init(keys[1], D, H),
        "global_img_feature": dense_init(keys[2], D, E),
        "td_lstm": lstm_init(keys[3], H + 2 * E, H),
        "lang_lstm": lstm_init(keys[4], 2 * H, H),
        "attn": {
            "W_va": attn_weight_init(keys[5], (H, H)),
            "W_ha": attn_weight_init(keys[6], (H, H)),
            "W_a": attn_weight_init(keys[7], (H, 1)),
            "W_x": attn_weight_init(keys[8], (H + 2 * E, H)),
            "W_h": attn_weight_init(keys[9], (H, H)),
            "W_s": attn_weight_init(keys[10], (H, H)),
        },
        "output": dense_init(keys[11], H, vocab_size),
    }


def prepare_consts(params, feat_grid: jnp.ndarray) -> GridTDConsts:
    v_pre = feat_grid @ params["image_features"]["kernel"] + params["image_features"]["bias"]
    v_feat = jax.nn.relu(v_pre)
    avg = feat_grid.mean(axis=1)
    g_pre = avg @ params["global_img_feature"]["kernel"] + params["global_img_feature"]["bias"]
    return GridTDConsts(
        v_feat=v_feat,
        v_proj=v_feat @ params["attn"]["W_va"],
        global_feat=jax.nn.relu(g_pre),
        v_pre=v_pre,
        global_pre=g_pre,
        feat_grid=feat_grid,
        avg_feat=avg,
    )


def step(params, consts: GridTDConsts, state: GridTDState, token_emb: jnp.ndarray, lstm_masks=None):
    """``lstm_masks`` = (td_masks, lang_masks) enables Keras LSTM dropout."""
    a = params["attn"]
    td_masks, lang_masks = lstm_masks if lstm_masks is not None else (None, None)
    h1, c1, h2, c2 = state
    x1_t = jnp.concatenate([h2, consts.global_feat, token_emb], axis=-1)
    td_state, td_cache = lstm_step(params["td_lstm"], x1_t, LSTMState(h1, c1), td_masks)
    h1_new, c1_new = td_state
    h_proj = h1_new @ a["W_ha"]
    att_pre = jnp.tanh(consts.v_proj + h_proj[:, None, :])
    att_logits = jnp.squeeze(att_pre @ a["W_a"], -1)  # (B, L)
    attention = jax.nn.softmax(att_logits, axis=-1)
    st = jnp.tanh(c1_new) * jax.nn.sigmoid(x1_t @ a["W_x"] + h1 @ a["W_h"])
    z_s = jnp.tanh(st @ a["W_s"] + h_proj) @ a["W_a"]
    beta = jax.nn.softmax(jnp.concatenate([att_logits, z_s], axis=-1), axis=-1)[:, -1:]
    context = jnp.einsum("bl,blh->bh", attention, consts.v_feat)
    c_hat = beta * st + (1.0 - beta) * context
    x2_t = jnp.concatenate([c_hat, h1_new], axis=-1)
    lang_state, lang_cache = lstm_step(params["lang_lstm"], x2_t, LSTMState(h2, c2), lang_masks)
    h2_new, c2_new = lang_state
    logits = dense(params["output"], h2_new + c_hat)
    new_state = GridTDState(h1_new, c1_new, h2_new, c2_new)
    cache = GridTDStepCache(
        x1_t=x1_t,
        x2_t=x2_t,
        h1_prev=h1,
        c1_prev=c1,
        h2_prev=h2,
        c2_prev=c2,
        h1=h1_new,
        c1=c1_new,
        h2=h2_new,
        c2=c2_new,
        z1_pre=td_cache.z_pre,
        z2_pre=lang_cache.z_pre,
        attention=attention,
        st=st,
        beta=beta,
        context=context,
        c_hat=c_hat,
        logits=logits,
    )
    return new_state, cache


def init_state(batch: int, hidden: int, dtype=jnp.float32) -> GridTDState:
    z = jnp.zeros((batch, hidden), dtype)
    return GridTDState(z, z, z, z)


def forward_train(params, feat_grid, captions_in, cfg, dropout_rng=None, drop_rate=0.0):
    """Teacher-forcing forward -> (B, T, V) logits (model.py:630-660)."""
    B, T = captions_in.shape
    consts = prepare_consts(params, feat_grid)
    if dropout_rng is not None and drop_rate > 0.0:
        from .cells import lstm_dropout_masks

        ks = jax.random.split(dropout_rng, 6)
        keep = 1.0 - drop_rate

        def drop(k, x):
            return x * jax.random.bernoulli(k, keep, x.shape) / keep

        consts = consts._replace(
            v_feat=drop(ks[0], consts.v_feat),
            global_feat=drop(ks[1], consts.global_feat),
        )
        consts = consts._replace(v_proj=consts.v_feat @ params["attn"]["W_va"])
        out_mask = jax.random.bernoulli(ks[2], keep, (B, params["output"]["kernel"].shape[0])) / keep
        logit_mask = jax.random.bernoulli(ks[3], keep, (B, params["output"]["kernel"].shape[1])) / keep
        E = params["embedding"].shape[-1]
        H = cfg.hidden_dim
        lstm_masks = (
            lstm_dropout_masks(ks[4], H + 2 * E, H, drop_rate, batch=B),
            lstm_dropout_masks(ks[5], 2 * H, H, drop_rate, batch=B),
        )
    else:
        out_mask = logit_mask = None
        lstm_masks = None

    embs = params["embedding"][captions_in]

    def scan_fn(state, emb_t):
        new_state, cache = step(params, consts, state, emb_t, lstm_masks)
        if out_mask is not None:
            logits = dense(params["output"], (cache.h2 + cache.c_hat) * out_mask) * logit_mask
        else:
            logits = cache.logits
        return new_state, logits

    _, logits = jax.lax.scan(scan_fn, init_state(B, cfg.hidden_dim), jnp.moveaxis(embs, 1, 0))
    return jnp.moveaxis(logits, 0, 1)


def forward_cached_from_inputs(params, consts: GridTDConsts, input_tokens_0based, hidden_dim: int):
    """Scan over 0-based input tokens keeping the full per-step cache
    (equivalent of explainers.py:1096-1190)."""
    B, T = input_tokens_0based.shape
    embs = params["embedding"][input_tokens_0based]

    def scan_fn(state, emb_t):
        new_state, cache = step(params, consts, state, emb_t)
        return new_state, cache

    _, caches = jax.lax.scan(scan_fn, init_state(B, hidden_dim), jnp.moveaxis(embs, 1, 0))
    return caches
