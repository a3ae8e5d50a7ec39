"""Adaptive-attention decoder (Lu et al. visual sentinel), TPU-native.

One pure ``step`` function reproduces the math of the reference's
ExternalAttentionRNNWrapperLocalAttentionV3.step (model.py:573-600) == the
numpy replica in explainers.py:370-437; it is reused by

* training:       ``forward_train`` = ``lax.scan`` over T (teacher forcing)
* decoding:       infer.greedy / infer.beam carry (h, c) and run the encoder
                  ONCE (unlike the reference's O(T^2) re-runs, inference.py:107)
* explanation:    ``forward_cached`` emits the full per-step state cache that
                  explain.decoder_lrp consumes in a reverse scan.

Step math (all batched over B):
    x_t   = [e_t, g]                      g = global image feature
    h',c' = LSTM(x_t, h, c)
    a_l   = V_a^T tanh(Wv v_l + Wg h')            (attention logits, L)
    alpha = softmax(a)
    s_t   = tanh(c') * sigmoid(Wx x_t + Wh_s h)   (sentinel; uses OLD h)
    z_s   = V_a^T tanh(Ws s_t + Wg h')
    beta  = softmax([a ; z_s])[-1]
    ctx   = sum_l alpha_l v_l
    c_hat = beta s_t + (1-beta) ctx
    logit = W_out (h' + c_hat) + b_out
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from .cells import LSTMState, attn_weight_init, dense, dense_init, lstm_init, lstm_step


class AdaptiveConsts(NamedTuple):
    """Per-image constants computed once per forward pass."""

    v_feat: jnp.ndarray        # (B, L, H) image_features after relu
    v_proj: jnp.ndarray        # (B, L, H) v_feat @ Wv
    global_feat: jnp.ndarray   # (B, E) relu'd global image feature
    # caches for the LRP backward through the encoder projections:
    v_pre: jnp.ndarray         # (B, L, H) image_features pre-relu
    global_pre: jnp.ndarray    # (B, E) global feature pre-relu
    feat_grid: jnp.ndarray     # (B, L, D) raw CNN features
    avg_feat: jnp.ndarray      # (B, D) mean over L


class AdaptiveStepCache(NamedTuple):
    """Per-step cache consumed by LRP / gradient backward (explainers.py:370-437)."""

    x_t: jnp.ndarray       # (B, 2E) LSTM input
    h_prev: jnp.ndarray    # (B, H)
    h: jnp.ndarray         # (B, H)
    c_prev: jnp.ndarray    # (B, H)
    c: jnp.ndarray         # (B, H)
    z_pre: jnp.ndarray     # (B, 4H) gate pre-activations
    attention: jnp.ndarray # (B, L)
    st: jnp.ndarray        # (B, H)
    beta: jnp.ndarray      # (B, 1)
    context: jnp.ndarray   # (B, H)
    c_hat: jnp.ndarray     # (B, H)
    logits: jnp.ndarray    # (B, V)


def init_params(key, vocab_size: int, cfg):
    E, H, D = cfg.embedding_dim, cfg.hidden_dim, cfg.img_feature_dim
    keys = jax.random.split(key, 12)
    limit = float(jnp.sqrt(6.0 / (vocab_size + E)))
    return {
        "embedding": jax.random.uniform(keys[0], (vocab_size, E), jnp.float32, -limit, limit),
        "image_features": dense_init(keys[1], D, H),
        "global_img_feature": dense_init(keys[2], D, E),
        "lstm": lstm_init(keys[3], 2 * E, H),
        "attn": {
            "Wv": attn_weight_init(keys[4], (H, H)),
            "Wg": attn_weight_init(keys[5], (H, H)),
            "Wx": attn_weight_init(keys[6], (2 * E, H)),
            "Wh": attn_weight_init(keys[7], (H, H)),
            "Ws": attn_weight_init(keys[8], (H, H)),
            "V": attn_weight_init(keys[9], (H, 1)),
        },
        "output": dense_init(keys[10], H, vocab_size),
    }


def prepare_consts(params, feat_grid: jnp.ndarray) -> AdaptiveConsts:
    """Encoder-side projections, run once per image (model.py:434-452).

    feat_grid: (B, L, D) CNN features (e.g. block5_conv3 reshaped).
    """
    v_pre = feat_grid @ params["image_features"]["kernel"] + params["image_features"]["bias"]
    v_feat = jax.nn.relu(v_pre)
    avg = feat_grid.mean(axis=1)
    g_pre = avg @ params["global_img_feature"]["kernel"] + params["global_img_feature"]["bias"]
    return AdaptiveConsts(
        v_feat=v_feat,
        v_proj=v_feat @ params["attn"]["Wv"],
        global_feat=jax.nn.relu(g_pre),
        v_pre=v_pre,
        global_pre=g_pre,
        feat_grid=feat_grid,
        avg_feat=avg,
    )


def step(params, consts: AdaptiveConsts, state: LSTMState, token_emb: jnp.ndarray, lstm_masks=None):
    """One decoder step; returns (new_state, AdaptiveStepCache).
    ``lstm_masks`` enables Keras-style LSTM dropout during training."""
    a = params["attn"]
    h_prev, c_prev = state
    x_t = jnp.concatenate([token_emb, consts.global_feat], axis=-1)  # (B, 2E)
    new_state, lstm_cache = lstm_step(params["lstm"], x_t, state, lstm_masks)
    h = new_state.h
    ht_proj = h @ a["Wg"]                                            # (B, H)
    att_pre = jnp.tanh(ht_proj[:, None, :] + consts.v_proj)          # (B, L, H)
    att_logits = jnp.squeeze(att_pre @ a["V"], -1)                   # (B, L)
    attention = jax.nn.softmax(att_logits, axis=-1)
    st = jnp.tanh(new_state.c) * jax.nn.sigmoid(x_t @ a["Wx"] + h_prev @ a["Wh"])
    z_s = jnp.tanh(st @ a["Ws"] + ht_proj) @ a["V"]                  # (B, 1)
    beta = jax.nn.softmax(jnp.concatenate([att_logits, z_s], axis=-1), axis=-1)[:, -1:]
    context = jnp.einsum("bl,blh->bh", attention, consts.v_feat)
    c_hat = beta * st + (1.0 - beta) * context
    logits = dense(params["output"], h + c_hat)
    cache = AdaptiveStepCache(
        x_t=x_t,
        h_prev=h_prev,
        h=h,
        c_prev=c_prev,
        c=new_state.c,
        z_pre=lstm_cache.z_pre,
        attention=attention,
        st=st,
        beta=beta,
        context=context,
        c_hat=c_hat,
        logits=logits,
    )
    return new_state, cache


def init_state(batch: int, hidden: int, dtype=jnp.float32) -> LSTMState:
    return LSTMState(jnp.zeros((batch, hidden), dtype), jnp.zeros((batch, hidden), dtype))


def forward_train(params, feat_grid, captions_in, cfg, dropout_rng=None, drop_rate=0.0):
    """Teacher-forcing forward: (B,L,D) feats + (B,T) 0-based ids -> (B,T,V) logits.

    Dropout placement mirrors the reference training graph (model.py:434-466):
    image_features, global feature, LSTM input/recurrent (per-sequence masks),
    decoder output, and logits.
    """
    B, T = captions_in.shape
    consts = prepare_consts(params, feat_grid)
    if dropout_rng is not None and drop_rate > 0.0:
        from .cells import lstm_dropout_masks

        ks = jax.random.split(dropout_rng, 5)
        keep = 1.0 - drop_rate

        def drop(k, x):
            return x * jax.random.bernoulli(k, keep, x.shape) / keep

        consts = consts._replace(
            v_feat=drop(ks[0], consts.v_feat),
            global_feat=drop(ks[1], consts.global_feat),
        )
        consts = consts._replace(v_proj=consts.v_feat @ params["attn"]["Wv"])
        out_mask = jax.random.bernoulli(ks[2], keep, (B, params["output"]["kernel"].shape[0])) / keep
        logit_mask = jax.random.bernoulli(ks[3], keep, (B, params["output"]["kernel"].shape[1])) / keep
        # Keras LSTM dropout/recurrent_dropout (model.py:455-460)
        E = params["embedding"].shape[-1]
        H = cfg.hidden_dim
        lstm_masks = lstm_dropout_masks(ks[4], 2 * E, H, drop_rate, batch=B)
    else:
        out_mask = logit_mask = None
        lstm_masks = None

    embs = params["embedding"][captions_in]  # (B, T, E)

    def scan_fn(state, emb_t):
        new_state, cache = step(params, consts, state, emb_t, lstm_masks)
        if out_mask is not None:
            logits = dense(params["output"], (cache.h + cache.c_hat) * out_mask) * logit_mask
        else:
            logits = cache.logits
        return new_state, logits

    _, logits = jax.lax.scan(scan_fn, init_state(B, cfg.hidden_dim), jnp.moveaxis(embs, 1, 0))
    return jnp.moveaxis(logits, 0, 1)  # (B, T, V)


def forward_cached_from_inputs(params, consts: AdaptiveConsts, input_tokens_0based, hidden_dim: int):
    """Scan the step fn over precomputed 0-based input tokens, keep all caches.

    input_tokens_0based: (B, T) where column 0 is SOS-1 and column i is
    caption[i-1]-1 — exactly the reference's embedding-lookup sequence
    (explainers.py:399-408).
    """
    B, T = input_tokens_0based.shape
    embs = params["embedding"][input_tokens_0based]

    def scan_fn(state, emb_t):
        new_state, cache = step(params, consts, state, emb_t)
        return new_state, cache

    _, caches = jax.lax.scan(scan_fn, init_state(B, hidden_dim), jnp.moveaxis(embs, 1, 0))
    return caches  # pytree of (T, B, ...)
