"""Decoder-LRP parity: the fused reverse-scan implementation must reproduce
the reference's per-timestep numpy relevance recursion
(_explain_lstm_single_word_sequence, explainers.py:537-666) — re-derived here
independently in plain numpy from the published equations."""

import numpy as np
import jax
import jax.numpy as jnp

from lrp_imagecaptioning_tpu.config import FlickrConfig
from lrp_imagecaptioning_tpu.explain.decoder_lrp import explain_word_adaptive
from lrp_imagecaptioning_tpu.models import adaptive

CFG = FlickrConfig(embedding_dim=6, hidden_dim=5, img_feature_length=4, img_feature_dim=7, sentence_length=4)
VOCAB = 11
EPS = 1e-7


def _sig(x):
    return 1.0 / (1.0 + np.exp(-x))


def _stab(z):
    return z + np.where(z >= 0, EPS, -EPS)


def _rule(r_in, fwd_in, fwd_out, weight):
    """epsilon rule, bias_factor=0: rel_j = sum_k W_jk x_j / stab(z_k) r_k."""
    return fwd_in * ((r_in / _stab(fwd_out)) @ weight.T)


def _rule_id(r_in, fwd_in, fwd_out):
    return fwd_in * r_in / _stab(fwd_out)


def test_adaptive_lrp_matches_reference_recursion(rng):
    H, E, L, D, T = CFG.hidden_dim, CFG.embedding_dim, CFG.img_feature_length, CFG.img_feature_dim, CFG.sentence_length
    params = adaptive.init_params(jax.random.PRNGKey(0), VOCAB, CFG)
    feat = jnp.asarray(rng.normal(size=(1, L, D)).astype(np.float32))
    consts_b = adaptive.prepare_consts(params, feat)
    tokens0 = jnp.asarray(rng.integers(0, VOCAB, size=(1, T)).astype(np.int32))
    caches_b = adaptive.forward_cached_from_inputs(params, consts_b, tokens0, H)

    consts = jax.tree.map(lambda x: np.asarray(x[0], np.float64), consts_b)
    caches = jax.tree.map(lambda x: np.asarray(x[:, 0], np.float64), caches_b)
    p = jax.tree.map(lambda x: np.asarray(x, np.float64), params)

    t_explain = 2          # explain the word emitted at step 2
    word = 7               # model-space id

    # ---- independent numpy recursion (reference equations) ---------------
    logits_t = caches.logits[t_explain]
    seed = np.zeros(VOCAB)
    seed[word] = logits_t[word]
    hc = caches.h[t_explain] + caches.c_hat[t_explain]
    r_ht_ctx = _rule(seed, hc, logits_t, p["output"]["kernel"])  # (H, V) = (Din, Dout)

    r_ht = np.zeros((T + 1, H))
    r_ct = np.zeros((T + 1, H))
    r_ht[t_explain + 1] = _rule_id(r_ht_ctx, caches.h[t_explain], hc)
    r_chat = _rule_id(r_ht_ctx, caches.c_hat[t_explain], hc)
    beta = caches.beta[t_explain][0]
    r_context = _rule_id(r_chat, (1 - beta) * caches.context[t_explain], caches.c_hat[t_explain])
    r_st = _rule_id(r_chat, beta * caches.st[t_explain], caches.c_hat[t_explain])
    r_ct[t_explain + 1] = r_st

    wi, wh = p["lstm"]["wi"], p["lstm"]["wh"]
    w_g = np.vstack([wi[:, 2 * H : 3 * H], wh[:, 2 * H : 3 * H]])  # (2E+H, H)
    r_glob = np.zeros(E)
    r_word_emb = np.zeros((T,))
    # states at recursion index i+1 == my cache row i
    for i in range(t_explain, -1, -1):
        r_c = r_ct[i + 1] + r_ht[i + 1]
        i_act = _sig(caches.z_pre[i][:H])
        f_act = _sig(caches.z_pre[i][H : 2 * H])
        g_pre = caches.z_pre[i][2 * H : 3 * H]
        c_prev = caches.c_prev[i]
        r_g = _rule_id(r_c, i_act * np.tanh(g_pre), caches.c[i])
        r_ct[i] = _rule_id(r_c, f_act * c_prev, caches.c[i])
        xht = np.concatenate([caches.x_t[i], caches.h_prev[i]])
        r_xht = _rule(r_g, xht, g_pre, w_g)
        r_ht[i] = r_xht[2 * E :]
        r_glob += r_xht[E : 2 * E]
        r_word_emb[i] = r_xht[:E].sum()

    r_avg = _rule(r_glob, consts.avg_feat, consts.global_pre, p["global_img_feature"]["kernel"])
    r_feat_np = np.zeros((L, D))
    for l in range(L):
        r_feat_np[l] = _rule_id(r_avg, consts.feat_grid[l] / L, consts.avg_feat)
        r_V_l = _rule_id(r_context, consts.v_feat[l] * caches.attention[t_explain][l],
                         caches.context[t_explain])
        r_feat_np[l] += _rule(r_V_l, consts.feat_grid[l], consts.v_pre[l],
                              p["image_features"]["kernel"])

    # ---- fused implementation -------------------------------------------
    consts_f = jax.tree.map(lambda x: x[0], consts_b)
    caches_f = jax.tree.map(lambda x: x[:, 0], caches_b)
    r_feat, r_words, att = explain_word_adaptive(
        params, consts_f, caches_f, jnp.asarray(t_explain), jnp.asarray(word), T
    )

    np.testing.assert_allclose(np.asarray(r_feat), r_feat_np, rtol=2e-3, atol=1e-5)
    np.testing.assert_allclose(np.asarray(att), caches.attention[t_explain], rtol=1e-5)
    np.testing.assert_allclose(np.asarray(r_words)[: t_explain + 1], r_word_emb[: t_explain + 1],
                               rtol=2e-3, atol=1e-5)
    # conservation sanity: input relevance is finite and nonzero
    assert np.abs(r_feat_np).sum() > 0


def test_gridtd_lrp_matches_reference_recursion(rng):
    """Same check for the two-LSTM grid-TD recursion (explainers.py:1190-1321)."""
    from lrp_imagecaptioning_tpu.explain.decoder_lrp import explain_word_gridtd
    from lrp_imagecaptioning_tpu.models import gridtd

    H, E, L, D, T = CFG.hidden_dim, CFG.embedding_dim, CFG.img_feature_length, CFG.img_feature_dim, CFG.sentence_length
    params = gridtd.init_params(jax.random.PRNGKey(1), VOCAB, CFG)
    feat = jnp.asarray(rng.normal(size=(1, L, D)).astype(np.float32))
    consts_b = gridtd.prepare_consts(params, feat)
    tokens0 = jnp.asarray(rng.integers(0, VOCAB, size=(1, T)).astype(np.int32))
    caches_b = gridtd.forward_cached_from_inputs(params, consts_b, tokens0, H)

    consts = jax.tree.map(lambda x: np.asarray(x[0], np.float64), consts_b)
    c = jax.tree.map(lambda x: np.asarray(x[:, 0], np.float64), caches_b)
    p = jax.tree.map(lambda x: np.asarray(x, np.float64), params)

    t_ex = 2
    word = 4

    logits_t = c.logits[t_ex]
    seed = np.zeros(VOCAB)
    seed[word] = logits_t[word]
    hc = c.h2[t_ex] + c.c_hat[t_ex]
    r_hc = _rule(seed, hc, logits_t, p["output"]["kernel"])

    r_h2 = np.zeros((T + 1, H))
    r_h1 = np.zeros((T + 1, H))
    r_c1 = np.zeros((T + 1, H))
    r_c2 = np.zeros((T + 1, H))
    r_chat = np.zeros((T + 1, H))
    r_h2[t_ex + 1] = _rule_id(r_hc, c.h2[t_ex], hc)
    r_chat[t_ex] = _rule_id(r_hc, c.c_hat[t_ex], hc)

    w_g1 = np.vstack([p["td_lstm"]["wi"][:, 2 * H : 3 * H], p["td_lstm"]["wh"][:, 2 * H : 3 * H]])
    w_g2 = np.vstack([p["lang_lstm"]["wi"][:, 2 * H : 3 * H], p["lang_lstm"]["wh"][:, 2 * H : 3 * H]])
    r_glob = np.zeros(E)
    r_words_np = np.zeros((T,))
    r_V = np.zeros((L, H))
    for i in range(t_ex, -1, -1):
        rc2 = r_c2[i + 1] + r_h2[i + 1]
        i2 = _sig(c.z2_pre[i][:H]); f2 = _sig(c.z2_pre[i][H:2*H]); g2 = c.z2_pre[i][2*H:3*H]
        r_g2 = _rule_id(rc2, i2 * np.tanh(g2), c.c2[i])
        r_c2[i] = _rule_id(rc2, f2 * c.c2_prev[i], c.c2[i])
        xht2 = np.concatenate([c.x2_t[i], c.h2_prev[i]])
        r_x2 = _rule(r_g2, xht2, g2, w_g2)
        r_h1[i + 1] += r_x2[H : 2 * H]
        r_h2[i] += r_x2[2 * H :]
        r_chat[i] += r_x2[:H]

        beta = c.beta[i][0]
        r_st = _rule_id(r_chat[i], beta * c.st[i], c.c_hat[i])
        r_ctx = _rule_id(r_chat[i], (1 - beta) * c.context[i], c.c_hat[i])
        for k in range(L):
            r_V[k] += _rule_id(r_ctx, consts.v_feat[k] * c.attention[i][k], c.context[i])

        rc1 = r_c1[i + 1] + r_st + r_h1[i + 1]
        i1 = _sig(c.z1_pre[i][:H]); f1 = _sig(c.z1_pre[i][H:2*H]); g1 = c.z1_pre[i][2*H:3*H]
        r_g1 = _rule_id(rc1, i1 * np.tanh(g1), c.c1[i])
        r_c1[i] = _rule_id(rc1, f1 * c.c1_prev[i], c.c1[i])
        xht1 = np.concatenate([c.x1_t[i], c.h1_prev[i]])
        r_x1 = _rule(r_g1, xht1, g1, w_g1)
        r_h2[i] += r_x1[:H]
        r_glob += r_x1[H : H + E]
        r_words_np[i] = r_x1[H + E : H + 2 * E].sum()
        r_h1[i] += r_x1[H + 2 * E :]

    r_avg = _rule(r_glob, consts.avg_feat, consts.global_pre, p["global_img_feature"]["kernel"])
    r_feat_np = np.zeros((L, D))
    for k in range(L):
        r_feat_np[k] = _rule_id(r_avg, consts.feat_grid[k] / L, consts.avg_feat)
        r_feat_np[k] += _rule(r_V[k], consts.feat_grid[k], consts.v_pre[k], p["image_features"]["kernel"])

    consts_f = jax.tree.map(lambda x: x[0], consts_b)
    caches_f = jax.tree.map(lambda x: x[:, 0], caches_b)
    r_feat, r_words, att = explain_word_gridtd(
        params, consts_f, caches_f, jnp.asarray(t_ex), jnp.asarray(word), T
    )
    np.testing.assert_allclose(np.asarray(r_feat), r_feat_np, rtol=2e-3, atol=1e-5)
    np.testing.assert_allclose(np.asarray(att), c.attention[t_ex], rtol=1e-5)
    np.testing.assert_allclose(np.asarray(r_words)[: t_ex + 1], r_words_np[: t_ex + 1],
                               rtol=2e-3, atol=1e-5)


def test_lrp_linear_in_seed(rng):
    """LRP relevance is LINEAR in the output seed for fixed forward state —
    an invariant of every rule here (the backward is a linear operator).
    Checked through the full engine (decoder + CNN) for all three decoders."""
    import pytest

    from lrp_imagecaptioning_tpu.explain.engine import Explainer
    from lrp_imagecaptioning_tpu.models.captioner import build_captioner

    class PP:
        SOS_TOKEN = "szeros"
        EOS_TOKEN = "zeros"
        SOS_TOKEN_LABEL_ENCODED = 1
        EOS_TOKEN_LABEL_ENCODED = 2
        word_of = {i: f"w{i}" for i in range(1, VOCAB + 1)}

    cfg = CFG.replace(layer_name="block2_conv1", img_feature_length=16,
                      img_feature_dim=128, sentence_length=4,
                      embedding_dim=16, hidden_dim=16)  # AOA needs H % 8 == 0
    for model_type in ("adaptiveattention", "gridTD", "aoa"):
        cap = build_captioner(model_type, cfg, VOCAB)
        params = jax.tree.map(lambda x: x, cap.init_params(jax.random.PRNGKey(0)))
        ex = Explainer(cap, params, PP(), method="lrp", beam_size=2)
        image = jnp.asarray(rng.normal(size=(8, 8, 3)).astype(np.float32))
        tokens = np.array([5, 7, 2, 0], np.int32)
        base = ex.analyze(image, tokens_1based=tokens)
        # scale the output layer: logits scale, seeds (logit-valued) scale,
        # and every identity/linear split is 1-homogeneous in the seed
        p2 = jax.tree.map(lambda x: x, params)
        p2["decoder"] = dict(p2["decoder"])
        p2["decoder"]["output"] = {
            "kernel": params["decoder"]["output"]["kernel"] * 2.0,
            "bias": params["decoder"]["output"]["bias"] * 2.0,
        }
        ex2 = Explainer(cap, p2, PP(), method="lrp", beam_size=2)
        scaled = ex2.analyze(image, tokens_1based=tokens)
        # doubled logits -> doubled seed; identical forward ratios elsewhere
        # except the output rule divides by the doubled logits too: the first
        # lrp_linear is seed * (w x / z) with seed=z[word] -> scales by 2
        np.testing.assert_allclose(
            scaled.relevance_maps, base.relevance_maps * 2.0,
            rtol=5e-3, atol=1e-5,
        )


def test_gridtd_gradient_sentinel_branch_inert(rng):
    """The reference's grid-TD gradient backward never propagates the
    beta*st branch into c1 (explainers.py:1506-1527: d_c1t accumulates only
    the h1 tanh path) — so perturbing the cached sentinel values must not
    change the gradient map."""
    from lrp_imagecaptioning_tpu.explain.decoder_grad import grad_word_gridtd
    from lrp_imagecaptioning_tpu.models import gridtd

    H, L, D, T = CFG.hidden_dim, CFG.img_feature_length, CFG.img_feature_dim, CFG.sentence_length
    params = gridtd.init_params(jax.random.PRNGKey(1), VOCAB, CFG)
    feat = jnp.asarray(rng.normal(size=(1, L, D)).astype(np.float32))
    consts_b = gridtd.prepare_consts(params, feat)
    tokens0 = jnp.asarray(rng.integers(0, VOCAB, size=(1, T)).astype(np.int32))
    caches_b = gridtd.forward_cached_from_inputs(params, consts_b, tokens0, H)

    consts = jax.tree.map(lambda x: x[0], consts_b)
    caches = jax.tree.map(lambda x: x[:, 0], caches_b)
    t_ex, word = jnp.asarray(2), jnp.asarray(4)

    d1, _, _ = grad_word_gridtd(params, consts, caches, t_ex, word, T)
    poked = caches._replace(st=caches.st + 3.14)
    d2, _, _ = grad_word_gridtd(params, consts, poked, t_ex, word, T)
    np.testing.assert_array_equal(np.asarray(d1), np.asarray(d2))
    assert np.abs(np.asarray(d1)).sum() > 0
