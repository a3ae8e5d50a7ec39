"""Decoder-side gradient backward (manual BPTT), reproducing the reference's
``_lstm_decoder_backward`` exactly — including its deliberate simplifications
(explainers.py:780-832 for adaptive, 1452-1532 for grid-TD):

* the attention weights are treated as constants (no gradient through the
  softmax / attention MLP);
* d_context = d_c_hat with the (1-beta) factor DROPPED, and the sentinel
  branch receives no gradient (explainers.py:797-800);
* d_V is relu-masked by ``image_features <= 0`` (explainers.py:803-804);
* d_global_img_feature relu-masked by its pre-activation sign
  (explainers.py:826);
* seed is d(logit of the explained word) = 1.

These are faithful-to-reference semantics, NOT jax.grad of the true forward —
that is exactly the point: explanation parity.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def grad_word_adaptive(params, consts, caches, t: jnp.ndarray, word_0based: jnp.ndarray, T: int):
    """Gradient of word-t logit wrt the CNN feature grid, reference semantics.

    Same calling convention as explain_word_adaptive; returns
    (d_feat (L, D), d_words (T,), attention (L,)).
    """
    H = caches.h.shape[-1]
    E = params["embedding"].shape[-1]
    wi, wh = params["lstm"]["wi"], params["lstm"]["wh"]

    def at(x, i):
        return jax.tree.map(lambda v: v[i], x)

    cache_t = at(caches, t)
    d_logits = jnp.zeros_like(cache_t.logits).at[word_0based].set(1.0)
    d_hc = d_logits @ params["output"]["kernel"].T       # (H,)
    d_chat = d_hc
    d_context = d_chat                                    # beta deliberately dropped
    d_ht_T = d_hc

    # d_V: context = sum_l alpha_l v_l, attention const; relu mask on v_feat
    d_V = cache_t.attention[:, None] * d_context[None, :]  # (L, H)
    d_V = jnp.where(consts.v_feat <= 0, 0.0, d_V)

    def body(carry, step_in):
        d_ht_next, d_ct_next = carry
        i, c_i = step_in
        active = i <= t
        is_seed = i == t
        d_ht_next = jnp.where(is_seed, d_ht_T, d_ht_next)
        d_ct_next = jnp.where(is_seed, jnp.zeros_like(d_ct_next), d_ct_next)
        zi = c_i["z_pre"][:H]
        zf = c_i["z_pre"][H : 2 * H]
        zg = c_i["z_pre"][2 * H : 3 * H]
        zo = c_i["z_pre"][3 * H :]
        i_act = jax.nn.sigmoid(zi)
        f_act = jax.nn.sigmoid(zf)
        g_act = jnp.tanh(zg)
        o_act = jax.nn.sigmoid(zo)
        tanh_c = jnp.tanh(c_i["c"])

        d_o_act = d_ht_next * tanh_c
        d_c = d_ct_next + d_ht_next * o_act * (1.0 - tanh_c ** 2)
        d_f_act = d_c * c_i["c_prev"]
        d_ct_prev = d_c * f_act
        d_i_act = d_c * g_act
        d_g_act = d_c * i_act
        d_zi = d_i_act * i_act * (1 - i_act)
        d_zf = d_f_act * f_act * (1 - f_act)
        d_zo = d_o_act * o_act * (1 - o_act)
        d_zg = d_g_act * (1 - g_act ** 2)
        d_gates = jnp.concatenate([d_zi, d_zf, d_zg, d_zo])  # (4H,)
        d_ht_prev = d_gates @ wh.T
        d_xt = d_gates @ wi.T                                # (2E,)
        d_glob_i = jnp.where(active, d_xt[E:], 0.0)
        d_word_i = jnp.where(active, d_xt[:E].sum(), 0.0)
        z = lambda v: jnp.where(active, v, jnp.zeros_like(v))
        return (z(d_ht_prev), z(d_ct_prev)), (d_glob_i, d_word_i)

    zero_h = jnp.zeros((H,), d_hc.dtype)
    used = {k: jnp.flip(getattr(caches, k), 0) for k in ("z_pre", "c", "c_prev")}
    _, (d_glob_steps, d_word_steps) = jax.lax.scan(
        body, (zero_h, zero_h), (jnp.arange(T - 1, -1, -1), used), unroll=4
    )
    d_global = d_glob_steps.sum(axis=0)
    d_words = jnp.flip(d_word_steps)

    d_global = jnp.where(consts.global_feat <= 0, 0.0, d_global)
    d_avg = d_global @ params["global_img_feature"]["kernel"].T  # (D,)
    L = consts.feat_grid.shape[0]
    d_feat = d_avg[None, :].repeat(L, 0) / L
    d_feat = d_feat + d_V @ params["image_features"]["kernel"].T
    return d_feat, d_words, cache_t.attention


def grad_word_gridtd(params, consts, caches, t: jnp.ndarray, word_0based: jnp.ndarray, T: int):
    """grid-TD reference gradient backward (explainers.py:1452-1532).

    Mirrors the reference quirks: seed flows to h2 only at step t (the decode
    logits there use h2, explainers.py:1160/1471); c_hat receives gradient
    only through the language-LSTM input; the context split keeps the
    (1-beta) factor (unlike adaptive's) but the beta*st sentinel branch gets
    no gradient (explainers.py:1506-1527); attention treated as constant;
    relu masks on v_feat and global feature.
    """
    H = caches.h1.shape[-1]
    E = params["embedding"].shape[-1]
    td_wi, td_wh = params["td_lstm"]["wi"], params["td_lstm"]["wh"]
    lg_wi, lg_wh = params["lang_lstm"]["wi"], params["lang_lstm"]["wh"]

    def at(x, i):
        return jax.tree.map(lambda v: v[i], x)

    cache_t = at(caches, t)
    d_logits = jnp.zeros_like(cache_t.logits).at[word_0based].set(1.0)
    d_h2_T = d_logits @ params["output"]["kernel"].T

    def lstm_bwd(z_pre, c, c_prev, d_h_next, d_c_next, wi, wh):
        zi, zf, zg, zo = jnp.split(z_pre, 4)
        i_act = jax.nn.sigmoid(zi)
        f_act = jax.nn.sigmoid(zf)
        g_act = jnp.tanh(zg)
        o_act = jax.nn.sigmoid(zo)
        tanh_c = jnp.tanh(c)
        d_o = d_h_next * tanh_c
        d_c = d_c_next + d_h_next * o_act * (1 - tanh_c ** 2)
        d_gates = jnp.concatenate(
            [
                d_c * g_act * i_act * (1 - i_act),
                d_c * c_prev * f_act * (1 - f_act),
                d_c * i_act * (1 - g_act ** 2),
                d_o * o_act * (1 - o_act),
            ]
        )
        return d_gates @ wh.T, d_c * f_act, d_gates @ wi.T

    d_V_accum0 = jnp.zeros_like(consts.v_feat)  # (L, H)

    def body(carry, step_in):
        d_h2_next, d_c2_next, d_h1_next, d_c1_next, d_V_acc = carry
        i, c_i = step_in
        active = i <= t
        is_seed = i == t
        d_h2_next = jnp.where(is_seed, d_h2_T, d_h2_next)
        d_c2_next = jnp.where(is_seed, jnp.zeros_like(d_c2_next), d_c2_next)

        d_h2_prev, d_c2_prev, d_x2 = lstm_bwd(
            c_i["z2_pre"], c_i["c2"], c_i["c2_prev"], d_h2_next, d_c2_next, lg_wi, lg_wh
        )
        d_chat = d_x2[:H]
        d_h1_in = d_x2[H:]
        beta = c_i["beta"][0]
        d_context = d_chat * (1.0 - beta)
        # the beta*st sentinel branch receives NO gradient — the reference's
        # backward computes d_context = d_chat*(1-beta) and never propagates
        # d_chat*beta into c1 (explainers.py:1506-1527: d_c1t only accumulates
        # the h1 tanh path), same deliberate simplification as adaptive's

        d_V_i = c_i["attention"][:, None] * d_context[None, :]
        d_V_i = jnp.where(consts.v_feat <= 0, 0.0, d_V_i)
        d_V_acc = d_V_acc + jnp.where(active, d_V_i, 0.0)

        d_h1_prev, d_c1_prev, d_x1 = lstm_bwd(
            c_i["z1_pre"],
            c_i["c1"],
            c_i["c1_prev"],
            d_h1_next + d_h1_in,
            d_c1_next,
            td_wi,
            td_wh,
        )
        d_h2_from_x1 = d_x1[:H]
        d_glob_i = jnp.where(active, d_x1[H : H + E], 0.0)
        d_word_i = jnp.where(active, d_x1[H + E : H + 2 * E].sum(), 0.0)
        z = lambda v: jnp.where(active, v, jnp.zeros_like(v))
        return (
            (z(d_h2_prev + d_h2_from_x1), z(d_c2_prev), z(d_h1_prev), z(d_c1_prev), d_V_acc),
            (d_glob_i, d_word_i),
        )

    zero = jnp.zeros((H,), d_h2_T.dtype)
    used = {k: jnp.flip(getattr(caches, k), 0)
            for k in ("z1_pre", "z2_pre", "c1", "c1_prev", "c2", "c2_prev",
                      "beta", "attention")}
    (carry_out, (d_glob_steps, d_word_steps)) = jax.lax.scan(
        body, (zero, zero, zero, zero, d_V_accum0), (jnp.arange(T - 1, -1, -1), used), unroll=4
    )
    d_V = carry_out[4]
    d_global = d_glob_steps.sum(axis=0)
    d_words = jnp.flip(d_word_steps)

    d_global = jnp.where(consts.global_feat <= 0, 0.0, d_global)
    d_avg = d_global @ params["global_img_feature"]["kernel"].T
    L = consts.feat_grid.shape[0]
    d_feat = d_avg[None, :].repeat(L, 0) / L + d_V @ params["image_features"]["kernel"].T
    return d_feat, d_words, cache_t.attention
