"""Explanation backward passes for the AOA decoder.

The reference has NO explainer for its (dead, commented-out) AOA model — this
extends the explanation engine to the family using the same conventions its
other decoders use (models/explainers.py):

* ``explain_word_aoa`` — epsilon-LRP where softmax attention weights and the
  AOA GLU gate are treated as constants (the reference treats attention as
  constant in both its LRP and gradient backward passes; the GLU gate is the
  analogous multiplicative gate, handled like the sentinel/LSTM gates).
  LayerNorm and the optional refinement blocks pass relevance unchanged
  (identity), mirroring iNNvestigate's BatchNorm treatment.
* ``grad_word_aoa`` — TRUE autodiff gradient d(logit_word)/d(feat_grid) via
  jax.grad over a recomputed forward (no reference quirks to reproduce).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..models import aoa
from ..ops.lrp_core import lrp_identity, lrp_linear


def explain_word_aoa(params, consts, caches, t: jnp.ndarray, word_0based: jnp.ndarray, T: int):
    """Same calling convention as explain_word_adaptive: single sample
    (consts without batch dim; caches with leading (T,) dim). Returns
    (r_feat (L, D), r_words (T,), attention (L,))."""
    H = caches.h.shape[-1]
    E = params["embedding"].shape[-1]
    heads = aoa.NUM_HEADS
    dk = H // heads
    wi, wh = params["lstm"]["wi"], params["lstm"]["wh"]
    w_g = jnp.concatenate([wi[:, 2 * H : 3 * H], wh[:, 2 * H : 3 * H]], axis=0)
    g = params["glu"]

    def at(x, i):
        return jax.tree.map(lambda v: v[i], x)

    cache_t = at(caches, t)
    logits_t = cache_t.logits
    seed = jnp.zeros_like(logits_t).at[word_0based].set(logits_t[word_0based])

    out = cache_t.context + cache_t.h
    r_out = lrp_linear(seed, out, logits_t, params["output"]["kernel"])
    r_ctx = lrp_identity(r_out, cache_t.context, out)
    r_h_seed = lrp_identity(r_out, cache_t.h, out)

    # GLU: context = gate * proj, gate constant -> relevance flows to proj,
    # then proj = q Wpq + hat Wph + bp as one linear over [q ; hat]
    qh = jnp.concatenate([cache_t.q, cache_t.hat])
    w_proj = jnp.concatenate([g["Wpq"], g["Wph"]], axis=0)   # (2H, H)
    r_qh = lrp_linear(r_ctx, qh, cache_t.proj_pre, w_proj)
    r_q = r_qh[:H]
    r_hat = r_qh[H:]

    # multi-head attended value: per head i, hat_i = sum_l a_il vproj[l, i]
    # attention constant -> identity split over the L contributions
    L = consts.v_feat.shape[0]
    vproj = consts.v_proj                                     # (L, H)
    # head-resolved attention is not cached; the head-mean attention is the
    # engine's rendering surface. Distribute r_hat over L by the head-mean
    # attention-weighted contributions (exact when heads agree).
    contrib = cache_t.attention[:, None] * vproj              # (L, H)
    r_vproj = lrp_identity(
        r_hat[None, :].repeat(L, 0), contrib, cache_t.hat[None, :].repeat(L, 0)
    )                                                          # (L, H)
    vproj_z = vproj + 0.0
    r_vfeat_from_hat = lrp_linear(r_vproj, consts.v_feat, vproj_z, params["v_proj"]["kernel"])

    # q = h Wq + bq -> extra relevance into h at step t
    r_h_from_q = lrp_linear(r_q, cache_t.h, cache_t.q, params["q_proj"]["kernel"])
    r_h_T = r_h_seed + r_h_from_q

    # LSTM BPTT (gate-g path only, as in the reference decoders); caches as
    # scan xs (native slicing, no per-step gathers)
    def body(carry, step_in):
        r_ct_next, r_ht_next = carry
        i, c_i = step_in
        active = i <= t
        is_seed = i == t
        r_ht_next = jnp.where(is_seed, r_h_T, r_ht_next)
        r_ct_next = jnp.where(is_seed, jnp.zeros_like(r_ct_next), r_ct_next)
        zi = c_i["z_pre"][:H]
        zf = c_i["z_pre"][H : 2 * H]
        zg = c_i["z_pre"][2 * H : 3 * H]
        i_act = jax.nn.sigmoid(zi)
        f_act = jax.nn.sigmoid(zf)
        r_c = r_ct_next + r_ht_next
        r_gt = lrp_identity(r_c, i_act * jnp.tanh(zg), c_i["c"])
        r_ct_prev = lrp_identity(r_c, f_act * c_i["c_prev"], c_i["c"])
        xht = jnp.concatenate([c_i["x_t"], c_i["h_prev"]], axis=-1)
        r_xht = lrp_linear(r_gt, xht, zg, w_g)
        r_ht_prev = r_xht[E + H :]
        r_glob_i = jnp.where(active, r_xht[E : E + H], 0.0)
        r_word_i = jnp.where(active, r_xht[:E].sum(), 0.0)
        z = lambda v: jnp.where(active, v, jnp.zeros_like(v))
        return (z(r_ct_prev), z(r_ht_prev)), (r_glob_i, r_word_i)

    zero_h = jnp.zeros((H,), r_out.dtype)
    used = {k: jnp.flip(getattr(caches, k), 0)
            for k in ("z_pre", "c", "c_prev", "x_t", "h_prev")}
    _, (r_glob_steps, r_word_steps) = jax.lax.scan(
        body, (zero_h, zero_h), (jnp.arange(T - 1, -1, -1), used), unroll=4
    )
    r_global = r_glob_steps.sum(axis=0)                       # (H,)
    r_words = jnp.flip(r_word_steps)

    # global feature = mean over L of v_feat -> identity split over L
    r_vfeat_from_glob = lrp_identity(
        r_global[None, :].repeat(L, 0), consts.v_feat / L, consts.global_feat[None, :].repeat(L, 0)
    )
    r_vfeat = r_vfeat_from_hat + r_vfeat_from_glob            # (L, H)
    # image_features dense: its INPUT is the layer-normed grid
    # (aoa.prepare_consts computes v_pre = LN(feat_grid) @ W + b), so the
    # epsilon rule must re-weight by that same LN'd x — using the raw grid
    # would pair an inconsistent (x, z) and break conservation per location.
    # The LayerNorm itself then passes relevance identically to feat_grid
    # (iNNvestigate's BatchNorm treatment, module docstring).
    x_ln = aoa._layer_norm(consts.feat_grid, params["feat_ln"]["scale"],
                           params["feat_ln"]["bias"])
    r_feat = lrp_linear(r_vfeat, x_ln, consts.v_pre, params["image_features"]["kernel"])
    return r_feat, r_words, cache_t.attention


def grad_word_aoa(params, consts, caches, t: jnp.ndarray, word_0based: jnp.ndarray, T: int):
    """True gradient of the word-t logit wrt the feature grid (autodiff;
    no reference semantics exist for AOA)."""
    H = caches.h.shape[-1]
    inputs = caches.x_t[:, : params["embedding"].shape[-1]]   # (T, E) token embeddings

    def logit_of(feat_grid):
        c = aoa.prepare_consts(params, feat_grid[None])

        def scan_fn(state, emb_t):
            new_state, cache = aoa.step(params, c, state, emb_t[None])
            return new_state, cache.logits[0]

        _, logits = jax.lax.scan(scan_fn, aoa.init_state(1, H), inputs)
        return logits[t, word_0based]

    d_feat = jax.grad(logit_of)(consts.feat_grid)
    r_words = jnp.zeros((T,), d_feat.dtype)
    return d_feat, r_words, jax.tree.map(lambda v: v[t], caches).attention
