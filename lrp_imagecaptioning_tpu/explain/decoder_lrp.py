"""Decoder-side LRP backward passes as reverse scans.

Reproduces the math of the reference's numpy BPTT relevance loops —
``_explain_lstm_single_word_sequence`` for the adaptive model
(explainers.py:537-666) and for grid-TD (explainers.py:1190-1321) — as pure
JAX functions over the per-step caches emitted by the decoders'
``forward_cached_from_inputs``. The per-word computation is fully fused; the
per-L Python loops of the reference become batched elementwise/matmul ops:

    r_V[l]   = (alpha_l * v_l / stab(ctx)) * r_ctx       -> (L,H) elementwise
    r_feat   = v * ((r_V / stab(v_pre)) @ W_img^T)       -> one MXU matmul
    r_avg    = lrp_linear over W_glob                    -> one MXU matmul

Identity-weight lrp_linear calls of the reference reduce to ``lrp_identity``.
``bias_factor = 0`` throughout; stabilizer eps = K.epsilon() = 1e-7.

All functions operate on a single sample (no batch dim) and are designed to be
``vmap``-ed over words and samples by the engine.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..ops.lrp_core import lrp_identity, lrp_linear


def _gate_slices(z_pre, H):
    """z_pre (..., 4H) -> (i_act, f_act, g_pre) used by the LRP backward."""
    zi = z_pre[..., :H]
    zf = z_pre[..., H : 2 * H]
    zg = z_pre[..., 2 * H : 3 * H]
    return jax.nn.sigmoid(zi), jax.nn.sigmoid(zf), zg


def explain_word_adaptive(params, consts, caches, t: jnp.ndarray, word_0based: jnp.ndarray, T: int):
    """LRP for the word predicted at step ``t`` (0-based step index).

    Args:
      params: adaptive decoder params (single tree).
      consts: AdaptiveConsts WITHOUT batch dim (vmap strips it).
      caches: AdaptiveStepCache pytree with leading time dim (T,) and no batch
        dim (the engine vmaps over batch).
      t: scalar int32 — explain the word emitted at step t (reference t-1,
        since the reference indexes states 1-based, explainers.py:540-550).
      word_0based: the predicted word id in model space.
      T: static scan length.

    Returns:
      (r_feat (L, D), r_words (T,), attention (L,)):
        relevance of the CNN feature grid, per-input-word relevance
        (explainers.py:660-665 normalization applied by the caller), and the
        attention at step t.
    """
    H = caches.h.shape[-1]
    E = params["embedding"].shape[-1]
    a = params["attn"]
    wi, wh = params["lstm"]["wi"], params["lstm"]["wh"]
    # gate-g weight block: rows [x; h], columns g (explainers.py:551-555)
    w_g = jnp.concatenate([wi[:, 2 * H : 3 * H], wh[:, 2 * H : 3 * H]], axis=0)

    def at(x, i):
        return jax.tree.map(lambda v: v[i], x)

    cache_t = at(caches, t)
    logits_t = cache_t.logits
    seed = jnp.zeros_like(logits_t).at[word_0based].set(logits_t[word_0based])

    # output layer: z = W_out (h + c_hat) + b (explainers.py:570-576)
    r_hc = lrp_linear(seed, cache_t.h + cache_t.c_hat, logits_t, params["output"]["kernel"])
    hc = cache_t.h + cache_t.c_hat
    r_ht_T = lrp_identity(r_hc, cache_t.h, hc)
    r_chat = lrp_identity(r_hc, cache_t.c_hat, hc)
    beta = cache_t.beta[0]
    r_context = lrp_identity(r_chat, (1.0 - beta) * cache_t.context, cache_t.c_hat)
    r_st = lrp_identity(r_chat, beta * cache_t.st, cache_t.c_hat)

    # BPTT: reverse scan i = T-1 .. 0; the seed relevance (r_st, r_ht_T) is
    # injected at i == t, steps with i > t are masked out, so one fixed-length
    # scan serves every word position (static shapes for XLA). The per-step
    # caches ride as scan xs (native slicing) rather than dynamic-slice
    # gathers — under vmap over words the gathers would otherwise dominate.
    def body(carry, step_in):
        r_ct_next, r_ht_next = carry
        i, c_i = step_in
        active = i <= t
        is_seed = i == t
        r_ct_next = jnp.where(is_seed, r_st, r_ct_next)
        r_ht_next = jnp.where(is_seed, r_ht_T, r_ht_next)
        i_act, f_act, g_pre = _gate_slices(c_i["z_pre"], H)
        r_c = r_ct_next + r_ht_next                       # r_ct[i+1] += r_ht[i+1]
        r_gt = lrp_identity(r_c, i_act * jnp.tanh(g_pre), c_i["c"])
        r_ct_prev = lrp_identity(r_c, f_act * c_i["c_prev"], c_i["c"])
        xht = jnp.concatenate([c_i["x_t"], c_i["h_prev"]], axis=-1)
        r_xht = lrp_linear(r_gt, xht, g_pre, w_g)
        r_ht_prev = r_xht[2 * E :]
        r_glob_i = jnp.where(active, r_xht[E : 2 * E], 0.0)
        r_word_i = jnp.where(active, r_xht[:E].sum(), 0.0)
        r_ct_prev = jnp.where(active, r_ct_prev, 0.0)
        r_ht_prev = jnp.where(active, r_ht_prev, 0.0)
        return (r_ct_prev, r_ht_prev), (r_glob_i, r_word_i)

    zero_h = jnp.zeros((H,), r_hc.dtype)
    used = {k: jnp.flip(getattr(caches, k), 0)
            for k in ("z_pre", "c", "c_prev", "x_t", "h_prev")}
    (_, _), (r_glob_steps, r_word_steps) = jax.lax.scan(
        body, (zero_h, zero_h), (jnp.arange(T - 1, -1, -1), used), unroll=4
    )
    r_global = r_glob_steps.sum(axis=0)          # (E,)
    # r_word_steps came out in reverse time order; flip to forward order
    r_words = jnp.flip(r_word_steps)             # (T,) sum over embedding dims

    # global image feature -> average feature -> grid (explainers.py:634-645)
    r_avg = lrp_linear(r_global, consts.avg_feat, consts.global_pre, params["global_img_feature"]["kernel"])
    L = consts.feat_grid.shape[0]
    r_feat_from_avg = lrp_identity(
        r_avg[None, :].repeat(L, 0), consts.feat_grid / L, consts.avg_feat[None, :]
    )
    # context -> attention-weighted V (explainers.py:646-652), batched over L
    r_V = lrp_identity(
        r_context[None, :], cache_t.attention[:, None] * consts.v_feat, cache_t.context[None, :]
    )  # (L, H)
    r_feat_from_V = lrp_linear(r_V, consts.feat_grid, consts.v_pre, params["image_features"]["kernel"])
    r_feat = r_feat_from_avg + r_feat_from_V     # (L, D)
    return r_feat, r_words, cache_t.attention


def explain_word_gridtd(params, consts, caches, t: jnp.ndarray, word_0based: jnp.ndarray, T: int):
    """grid-TD LRP for the word at step ``t`` (explainers.py:1190-1321).

    Distinctive structure vs adaptive: relevance threads h2 -> c_hat ->
    {sentinel -> c1, context -> V}, through the language-LSTM gate then the
    TD-LSTM gate per timestep; context relevance is emitted at EVERY timestep
    and the per-location V relevance accumulates across time
    (explainers.py:1292-1299).
    """
    H = caches.h1.shape[-1]
    E = params["embedding"].shape[-1]
    w_g1 = jnp.concatenate(
        [params["td_lstm"]["wi"][:, 2 * H : 3 * H], params["td_lstm"]["wh"][:, 2 * H : 3 * H]], axis=0
    )
    w_g2 = jnp.concatenate(
        [params["lang_lstm"]["wi"][:, 2 * H : 3 * H], params["lang_lstm"]["wh"][:, 2 * H : 3 * H]], axis=0
    )

    def at(x, i):
        return jax.tree.map(lambda v: v[i], x)

    cache_t = at(caches, t)
    logits_t = cache_t.logits
    seed = jnp.zeros_like(logits_t).at[word_0based].set(logits_t[word_0based])

    hc = cache_t.h2 + cache_t.c_hat
    r_hc = lrp_linear(seed, hc, logits_t, params["output"]["kernel"])
    r_h2_T = lrp_identity(r_hc, cache_t.h2, hc)
    r_chat_T = lrp_identity(r_hc, cache_t.c_hat, hc)

    # carry: relevance flowing backward — r_c2, r_h2, r_c1, r_h1, r_chat.
    # Seeds (r_h2_T, r_chat_T) are injected at i == t; i > t is masked out.
    # Per-step caches ride as scan xs (native slicing, no gathers).
    def body(carry, step_in):
        r_c2_next, r_h2_next, r_c1_next, r_h1_next, r_chat_i = carry
        i, c_i = step_in
        active = i <= t
        is_seed = i == t
        r_h2_next = jnp.where(is_seed, r_h2_T, r_h2_next)
        r_chat_i = jnp.where(is_seed, r_chat_T, r_chat_i)
        i2, f2, g2 = _gate_slices(c_i["z2_pre"], H)
        i1, f1, g1 = _gate_slices(c_i["z1_pre"], H)

        # language LSTM backward (explainers.py:1240-1262)
        r_c2 = r_c2_next + r_h2_next
        r_g2 = lrp_identity(r_c2, i2 * jnp.tanh(g2), c_i["c2"])
        r_c2_prev = lrp_identity(r_c2, f2 * c_i["c2_prev"], c_i["c2"])
        xht2 = jnp.concatenate([c_i["x2_t"], c_i["h2_prev"]], axis=-1)  # (3H,)
        r_xht2 = lrp_linear(r_g2, xht2, g2, w_g2)
        r_h1_in = r_xht2[H : 2 * H]                 # r_h1t[i+1] += ...
        r_h2_prev = r_xht2[2 * H :]
        r_chat = r_chat_i + r_xht2[:H]              # r_context_hat[i] += ...

        # adaptive split (explainers.py:1263-1277)
        beta = c_i["beta"][0]
        r_st = lrp_identity(r_chat, beta * c_i["st"], c_i["c_hat"])
        r_ctx = lrp_identity(r_chat, (1.0 - beta) * c_i["context"], c_i["c_hat"])

        # TD LSTM backward (explainers.py:1279-1299)
        r_c1 = r_c1_next + r_st + r_h1_next + r_h1_in
        r_g1 = lrp_identity(r_c1, i1 * jnp.tanh(g1), c_i["c1"])
        r_c1_prev = lrp_identity(r_c1, f1 * c_i["c1_prev"], c_i["c1"])
        xht1 = jnp.concatenate([c_i["x1_t"], c_i["h1_prev"]], axis=-1)
        r_xht1 = lrp_linear(r_g1, xht1, g1, w_g1)
        r_h2_from_x1 = r_xht1[:H]
        r_glob_i = r_xht1[H : H + E]
        r_word_i = r_xht1[H + E : H + 2 * E].sum()
        r_h1_prev = r_xht1[H + 2 * E :]

        # per-location V relevance emitted this step (accumulated over time)
        r_V_i = lrp_identity(
            r_ctx[None, :], c_i["attention"][:, None] * consts.v_feat, c_i["context"][None, :]
        )

        z = lambda v: jnp.where(active, v, jnp.zeros_like(v))
        new_carry = (
            z(r_c2_prev),
            z(r_h2_prev + r_h2_from_x1),
            z(r_c1_prev),
            z(r_h1_prev),
            jnp.zeros_like(r_chat),
        )
        return new_carry, (z(r_V_i), z(r_glob_i), z(r_word_i))

    zero = jnp.zeros((H,), r_hc.dtype)
    carry0 = (zero, zero, zero, zero, zero)
    used = {k: jnp.flip(getattr(caches, k), 0)
            for k in ("z1_pre", "z2_pre", "c1", "c1_prev", "c2", "c2_prev",
                      "x1_t", "x2_t", "h1_prev", "h2_prev", "beta", "st",
                      "context", "c_hat", "attention")}
    _, (r_V_steps, r_glob_steps, r_word_steps) = jax.lax.scan(
        body, carry0, (jnp.arange(T - 1, -1, -1), used), unroll=4
    )
    r_V = r_V_steps.sum(axis=0)                  # (L, H)
    r_global = r_glob_steps.sum(axis=0)          # (E,)
    r_words = jnp.flip(r_word_steps)             # (T,)

    r_avg = lrp_linear(r_global, consts.avg_feat, consts.global_pre, params["global_img_feature"]["kernel"])
    L = consts.feat_grid.shape[0]
    r_feat_from_avg = lrp_identity(
        r_avg[None, :].repeat(L, 0), consts.feat_grid / L, consts.avg_feat[None, :]
    )
    r_feat_from_V = lrp_linear(r_V, consts.feat_grid, consts.v_pre, params["image_features"]["kernel"])
    return r_feat_from_avg + r_feat_from_V, r_words, cache_t.attention
