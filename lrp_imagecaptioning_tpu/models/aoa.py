"""AOA (Attention-on-Attention) captioning decoder.

The reference ships this model ENTIRELY COMMENTED OUT (model.py:828-1250) yet
still refers to it from TrainingAOA (train.py:403-516) and inference
(inference.py:334) — those paths are dead at v0. This module is a WORKING
implementation of the same architecture, following the commented design:

    x_t     = [e_t, g]                     g = mean of projected features
    h', c'  = LSTM(x_t, h, c)
    q       = h' Wq + bq                   (query projection)
    per head i: a_i = softmax(q_i K_i^T / sqrt(d_k)); hat_i = a_i V_i
    hat     = concat_i hat_i               (multi-head attended value)
    ctx     = sigmoid(q Wgq + hat Wgh + bg) * (q Wpq + hat Wph + bp)   (AOA GLU)
    out     = ctx + h'
    logit   = W_out out + b_out

K/V are per-image projections of the refined features, computed once
(get_constants, model.py:1240-1244). Optional encoder refinement stacks
``encoder_refine_num`` multi-head self-attention blocks over the feature grid
(model.py:990-996).

Documented deviation: the reference interleaves Keras BatchNormalization
layers (model.py:986, 998, 1237); stateful batch statistics do not fit a pure
param pytree, so layer normalization is used instead — the commented
reference code never ran, so there is no weight-parity obligation.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from .cells import LSTMState, attn_weight_init, dense, dense_init, lstm_init, lstm_step

NUM_HEADS = 8


class AOAConsts(NamedTuple):
    v_feat: jnp.ndarray       # (B, L, H) refined image features
    k_proj: jnp.ndarray       # (B, L, H)
    v_proj: jnp.ndarray       # (B, L, H)
    global_feat: jnp.ndarray  # (B, H) mean over L of v_feat
    feat_grid: jnp.ndarray    # (B, L, D)
    v_pre: jnp.ndarray        # (B, L, H) image_features pre-relu


class AOAStepCache(NamedTuple):
    x_t: jnp.ndarray        # (B, E+H)
    h_prev: jnp.ndarray
    c_prev: jnp.ndarray
    h: jnp.ndarray
    c: jnp.ndarray
    z_pre: jnp.ndarray      # (B, 4H)
    q: jnp.ndarray          # (B, H)
    attention: jnp.ndarray  # (B, L) head-mean attention
    hat: jnp.ndarray        # (B, H)
    gate: jnp.ndarray       # (B, H)
    proj_pre: jnp.ndarray   # (B, H) GLU projection pre-gate
    context: jnp.ndarray    # (B, H)
    logits: jnp.ndarray


def _layer_norm(x, scale, bias, eps=1e-5):
    mu = x.mean(-1, keepdims=True)
    var = ((x - mu) ** 2).mean(-1, keepdims=True)
    return (x - mu) * jax.lax.rsqrt(var + eps) * scale + bias


def init_params(key, vocab_size: int, cfg, encoder_refine_num: int = 0):
    E, H, D = cfg.embedding_dim, cfg.hidden_dim, cfg.img_feature_dim
    keys = iter(jax.random.split(key, 20 + 8 * encoder_refine_num))
    limit = float(jnp.sqrt(6.0 / (vocab_size + E)))
    params = {
        "embedding": jax.random.uniform(next(keys), (vocab_size, E), jnp.float32, -limit, limit),
        "image_features": dense_init(next(keys), D, H),
        "feat_ln": {"scale": jnp.ones((D,)), "bias": jnp.zeros((D,))},
        "lstm": lstm_init(next(keys), E + H, H),
        "k_proj": dense_init(next(keys), H, H),
        "v_proj": dense_init(next(keys), H, H),
        "q_proj": dense_init(next(keys), H, H),
        "glu": {
            "Wpq": attn_weight_init(next(keys), (H, H)),
            "Wph": attn_weight_init(next(keys), (H, H)),
            "bp": jnp.zeros((H,)),
            "Wgq": attn_weight_init(next(keys), (H, H)),
            "Wgh": attn_weight_init(next(keys), (H, H)),
            "bg": jnp.zeros((H,)),
        },
        "output": dense_init(next(keys), H, vocab_size),
        "refine": [],
    }
    for _ in range(encoder_refine_num):
        params["refine"].append({
            "q": dense_init(next(keys), H, H),
            "k": dense_init(next(keys), H, H),
            "v": dense_init(next(keys), H, H),
            "glu": {
                "Wpq": attn_weight_init(next(keys), (H, H)),
                "Wph": attn_weight_init(next(keys), (H, H)),
                "bp": jnp.zeros((H,)),
                "Wgq": attn_weight_init(next(keys), (H, H)),
                "Wgh": attn_weight_init(next(keys), (H, H)),
                "bg": jnp.zeros((H,)),
            },
            "ln": {"scale": jnp.ones((H,)), "bias": jnp.zeros((H,))},
        })
    return params


def _multi_head(q, k, v, num_heads=NUM_HEADS):
    """q (B, Lq, H), k/v (B, L, H) -> (attended (B, Lq, H), attn (B, Lq, L))."""
    B, Lq, H = q.shape
    L = k.shape[1]
    dk = H // num_heads
    qh = q.reshape(B, Lq, num_heads, dk).transpose(0, 2, 1, 3)
    kh = k.reshape(B, L, num_heads, dk).transpose(0, 2, 1, 3)
    vh = v.reshape(B, L, num_heads, dk).transpose(0, 2, 1, 3)
    sim = jnp.einsum("bhqd,bhkd->bhqk", qh, kh) / jnp.sqrt(float(dk))
    attn = jax.nn.softmax(sim, axis=-1)                       # (B, h, Lq, L)
    out = jnp.einsum("bhqk,bhkd->bhqd", attn, vh)
    out = out.transpose(0, 2, 1, 3).reshape(B, Lq, H)
    return out, attn.mean(axis=1)


def _refine_block(p, x):
    """Self-attention AOA refinement over the feature grid
    (MultiHeadAttention.call, model.py:885-952): residual + layer norm."""
    q = dense(p["q"], x)
    k = dense(p["k"], x)
    v = dense(p["v"], x)
    hat, _ = _multi_head(q, k, v)
    g = p["glu"]
    gate = jax.nn.sigmoid(x @ g["Wgq"] + hat @ g["Wgh"] + g["bg"])
    proj = x @ g["Wpq"] + hat @ g["Wph"] + g["bp"]
    out = gate * proj + x
    return _layer_norm(out, p["ln"]["scale"], p["ln"]["bias"])


def prepare_consts(params, feat_grid: jnp.ndarray) -> AOAConsts:
    x = _layer_norm(feat_grid, params["feat_ln"]["scale"], params["feat_ln"]["bias"])
    v_pre = x @ params["image_features"]["kernel"] + params["image_features"]["bias"]
    v_feat = jax.nn.relu(v_pre)
    for block in params["refine"]:
        v_feat = _refine_block(block, v_feat)
    return AOAConsts(
        v_feat=v_feat,
        k_proj=dense(params["k_proj"], v_feat),
        v_proj=dense(params["v_proj"], v_feat),
        global_feat=v_feat.mean(axis=1),
        feat_grid=feat_grid,
        v_pre=v_pre,
    )


def step(params, consts: AOAConsts, state: LSTMState, token_emb: jnp.ndarray, lstm_masks=None):
    h_prev, c_prev = state
    x_t = jnp.concatenate([token_emb, consts.global_feat], axis=-1)
    new_state, lstm_cache = lstm_step(params["lstm"], x_t, state, lstm_masks)
    h = new_state.h
    q = dense(params["q_proj"], h)                              # (B, H)
    hat, attn = _multi_head(q[:, None, :], consts.k_proj, consts.v_proj)
    hat = hat[:, 0]                                             # (B, H)
    attention = attn[:, 0]                                      # (B, L)
    g = params["glu"]
    gate = jax.nn.sigmoid(q @ g["Wgq"] + hat @ g["Wgh"] + g["bg"])
    proj = q @ g["Wpq"] + hat @ g["Wph"] + g["bp"]
    context = gate * proj
    logits = dense(params["output"], context + h)
    cache = AOAStepCache(
        x_t=x_t, h_prev=h_prev, c_prev=c_prev, h=h, c=new_state.c,
        z_pre=lstm_cache.z_pre, q=q, attention=attention, hat=hat,
        gate=gate, proj_pre=proj, context=context, logits=logits,
    )
    return new_state, cache


def init_state(batch: int, hidden: int, dtype=jnp.float32) -> LSTMState:
    return LSTMState(jnp.zeros((batch, hidden), dtype), jnp.zeros((batch, hidden), dtype))


def forward_train(params, feat_grid, captions_in, cfg, dropout_rng=None, drop_rate=0.0):
    B, T = captions_in.shape
    consts = prepare_consts(params, feat_grid)
    if dropout_rng is not None and drop_rate > 0.0:
        from .cells import lstm_dropout_masks

        ks = jax.random.split(dropout_rng, 4)
        keep = 1.0 - drop_rate

        def drop(k, x):
            return x * jax.random.bernoulli(k, keep, x.shape) / keep

        consts = consts._replace(v_feat=drop(ks[0], consts.v_feat))
        consts = consts._replace(
            k_proj=dense(params["k_proj"], consts.v_feat),
            v_proj=dense(params["v_proj"], consts.v_feat),
            global_feat=consts.v_feat.mean(axis=1),
        )
        out_mask = jax.random.bernoulli(ks[1], keep, (B, params["output"]["kernel"].shape[0])) / keep
        logit_mask = jax.random.bernoulli(ks[2], keep, (B, params["output"]["kernel"].shape[1])) / keep
        E = params["embedding"].shape[-1]
        H = cfg.hidden_dim
        lstm_masks = lstm_dropout_masks(ks[3], E + H, H, drop_rate, batch=B)
    else:
        out_mask = logit_mask = None
        lstm_masks = None

    embs = params["embedding"][captions_in]

    def scan_fn(state, emb_t):
        new_state, cache = step(params, consts, state, emb_t, lstm_masks)
        if out_mask is not None:
            logits = dense(params["output"], (cache.context + cache.h) * out_mask) * logit_mask
        else:
            logits = cache.logits
        return new_state, logits

    _, logits = jax.lax.scan(scan_fn, init_state(B, cfg.hidden_dim), jnp.moveaxis(embs, 1, 0))
    return jnp.moveaxis(logits, 0, 1)


def forward_cached_from_inputs(params, consts: AOAConsts, input_tokens_0based, hidden_dim: int):
    B, T = input_tokens_0based.shape
    embs = params["embedding"][input_tokens_0based]

    def scan_fn(state, emb_t):
        return step(params, consts, state, emb_t)

    _, caches = jax.lax.scan(scan_fn, init_state(B, hidden_dim), jnp.moveaxis(embs, 1, 0))
    return caches
