"""Decoder step / scan / decode consistency tests.

The key invariant (the reference checks it manually, explainers.py:146-149):
the same step function must drive training scan, greedy decode, and the
cached explanation forward identically. We additionally cross-check the step
math against an independent numpy replica of the reference equations."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lrp_imagecaptioning_tpu.config import FlickrConfig
from lrp_imagecaptioning_tpu.models import adaptive, gridtd
from lrp_imagecaptioning_tpu.models.captioner import (
    build_captioner,
    keras_categorical_ce,
    masked_accuracy,
    masked_ce_from_logits,
)
from lrp_imagecaptioning_tpu.infer.greedy import greedy_decode
from lrp_imagecaptioning_tpu.infer.beam import beam_search

CFG = FlickrConfig(embedding_dim=16, hidden_dim=16, img_feature_length=9, img_feature_dim=12, sentence_length=8)
VOCAB = 23


def _sigmoid(x):
    return 1.0 / (1.0 + np.exp(-x))


def _np_lstm(x, h, c, wi, wh, b, H):
    z = x @ wi + h @ wh + b
    i = _sigmoid(z[:, :H])
    f = _sigmoid(z[:, H : 2 * H])
    g = np.tanh(z[:, 2 * H : 3 * H])
    o = _sigmoid(z[:, 3 * H :])
    c_new = f * c + i * g
    return o * np.tanh(c_new), c_new


def _np_softmax(x, axis):
    x = x - x.max(axis=axis, keepdims=True)
    e = np.exp(x)
    return e / e.sum(axis=axis, keepdims=True)


def test_adaptive_step_matches_numpy_replica(rng):
    """Step fn == the reference equations (explainers.py:406-428) in numpy."""
    key = jax.random.PRNGKey(0)
    params = adaptive.init_params(key, VOCAB, CFG)
    B, L, D, H, E = 2, CFG.img_feature_length, CFG.img_feature_dim, CFG.hidden_dim, CFG.embedding_dim
    feat = jnp.asarray(rng.normal(size=(B, L, D)).astype(np.float32))
    consts = adaptive.prepare_consts(params, feat)
    state = adaptive.init_state(B, H)
    emb = jnp.asarray(rng.normal(size=(B, E)).astype(np.float32))
    state2, cache = adaptive.step(params, consts, state, emb)

    # numpy replica
    p = jax.tree.map(np.asarray, params)
    vf = np.asarray(consts.v_feat)
    vp = np.asarray(consts.v_proj)
    g = np.asarray(consts.global_feat)
    h0 = np.zeros((B, H), np.float32)
    c0 = np.zeros((B, H), np.float32)
    x_t = np.concatenate([np.asarray(emb), g], -1)
    h1, c1 = _np_lstm(x_t, h0, c0, p["lstm"]["wi"], p["lstm"]["wh"], p["lstm"]["b"], H)
    ht_proj = h1 @ p["attn"]["Wg"]
    att_pre = np.dot(np.tanh(ht_proj[:, None, :] + vp), p["attn"]["V"])[..., 0]  # (B, L)
    att = _np_softmax(att_pre, -1)
    st = np.tanh(c1) * _sigmoid(x_t @ p["attn"]["Wx"] + h0 @ p["attn"]["Wh"])
    zs = np.tanh(st @ p["attn"]["Ws"] + ht_proj) @ p["attn"]["V"]
    beta = _np_softmax(np.concatenate([att_pre, zs], -1), -1)[:, -1:]
    ctx = (att[:, :, None] * vf).sum(1)
    c_hat = beta * st + (1 - beta) * ctx
    logits = (h1 + c_hat) @ p["output"]["kernel"] + p["output"]["bias"]

    np.testing.assert_allclose(np.asarray(cache.h), h1, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(cache.attention), att, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(cache.beta), beta, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(cache.c_hat), c_hat, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(cache.logits), logits, rtol=1e-4, atol=1e-4)


def test_gridtd_step_matches_numpy_replica(rng):
    key = jax.random.PRNGKey(1)
    params = gridtd.init_params(key, VOCAB, CFG)
    B, L, D, H, E = 2, CFG.img_feature_length, CFG.img_feature_dim, CFG.hidden_dim, CFG.embedding_dim
    feat = jnp.asarray(rng.normal(size=(B, L, D)).astype(np.float32))
    consts = gridtd.prepare_consts(params, feat)
    state = gridtd.init_state(B, H)
    emb = jnp.asarray(rng.normal(size=(B, E)).astype(np.float32))
    _, cache = gridtd.step(params, consts, state, emb)

    p = jax.tree.map(np.asarray, params)
    vf, vp, g = np.asarray(consts.v_feat), np.asarray(consts.v_proj), np.asarray(consts.global_feat)
    h1 = c1 = h2 = c2 = np.zeros((B, H), np.float32)
    x1 = np.concatenate([h2, g, np.asarray(emb)], -1)
    h1n, c1n = _np_lstm(x1, h1, c1, p["td_lstm"]["wi"], p["td_lstm"]["wh"], p["td_lstm"]["b"], H)
    hproj = h1n @ p["attn"]["W_ha"]
    att_pre = np.dot(np.tanh(vp + hproj[:, None, :]), p["attn"]["W_a"])[..., 0]
    att = _np_softmax(att_pre, -1)
    st = np.tanh(c1n) * _sigmoid(x1 @ p["attn"]["W_x"] + h1 @ p["attn"]["W_h"])
    zs = np.tanh(st @ p["attn"]["W_s"] + hproj) @ p["attn"]["W_a"]
    beta = _np_softmax(np.concatenate([att_pre, zs], -1), -1)[:, -1:]
    ctx = (att[:, :, None] * vf).sum(1)
    c_hat = beta * st + (1 - beta) * ctx
    x2 = np.concatenate([c_hat, h1n], -1)
    h2n, c2n = _np_lstm(x2, h2, c2, p["lang_lstm"]["wi"], p["lang_lstm"]["wh"], p["lang_lstm"]["b"], H)
    logits = (h2n + c_hat) @ p["output"]["kernel"] + p["output"]["bias"]

    np.testing.assert_allclose(np.asarray(cache.h1), h1n, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(cache.h2), h2n, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(cache.logits), logits, rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("module", [adaptive, gridtd])
def test_scan_forward_equals_step_loop(module, rng):
    key = jax.random.PRNGKey(2)
    params = module.init_params(key, VOCAB, CFG)
    B, T = 2, 5
    feat = jnp.asarray(rng.normal(size=(B, CFG.img_feature_length, CFG.img_feature_dim)).astype(np.float32))
    caps = jnp.asarray(rng.integers(0, VOCAB, size=(B, T)).astype(np.int32))
    logits_scan = module.forward_train(params, feat, caps, CFG)

    consts = module.prepare_consts(params, feat)
    state = module.init_state(B, CFG.hidden_dim)
    outs = []
    for t in range(T):
        state, cache = module.step(params, consts, state, params["embedding"][caps[:, t]])
        outs.append(cache.logits)
    logits_loop = jnp.stack(outs, axis=1)
    np.testing.assert_allclose(np.asarray(logits_scan), np.asarray(logits_loop), rtol=1e-5, atol=1e-5)


def test_greedy_decode_consistent_with_forward():
    """Greedy tokens re-fed through the training forward reproduce themselves."""
    cfg = CFG
    cap = build_captioner("adaptiveattention", cfg, VOCAB)
    params = {"decoder": adaptive.init_params(jax.random.PRNGKey(3), VOCAB, cfg)}
    feat = jax.random.normal(jax.random.PRNGKey(4), (2, cfg.img_feature_length, cfg.img_feature_dim))
    sos, eos = 2, 3
    tokens, logits = greedy_decode(cap, params, feat, sos, eos, max_len=6)
    tokens = np.asarray(tokens)
    # teacher-force the decoded prefix: input = [sos-1, tok0-1, tok1-1, ...]
    for b in range(2):
        toks = [t for t in tokens[b] if t != 0]
        inputs = np.array([[sos - 1] + [t - 1 for t in toks[:-1]]], np.int32)
        tf_logits = adaptive.forward_train(params["decoder"], feat[b : b + 1], jnp.asarray(inputs), cfg)
        pred = np.argmax(np.asarray(tf_logits[0]), -1) + 1
        np.testing.assert_array_equal(pred[: len(toks)], toks)


def test_beam1_equals_greedy():
    cfg = CFG
    cap = build_captioner("gridTD", cfg, VOCAB)
    params = {"decoder": gridtd.init_params(jax.random.PRNGKey(5), VOCAB, cfg)}
    feat = jax.random.normal(jax.random.PRNGKey(6), (3, cfg.img_feature_length, cfg.img_feature_dim))
    sos, eos = 2, 3
    g_tokens, _ = greedy_decode(cap, params, feat, sos, eos, max_len=7)
    b_tokens, _ = beam_search(cap, params, feat, sos, eos, beam_size=1, max_len=7)
    np.testing.assert_array_equal(np.asarray(g_tokens), np.asarray(b_tokens))


def test_losses(rng):
    logits = jnp.asarray(rng.normal(size=(2, 4, 6)).astype(np.float32))
    y = np.zeros((2, 4, 6), np.int32)
    y[0, 0, 1] = 1
    y[0, 1, 2] = 1
    y[1, 0, 3] = 1
    y = jnp.asarray(y)
    l1 = masked_ce_from_logits(logits, y)
    assert np.isfinite(float(l1))
    # all-zero rows contribute zero CE
    y_zero = jnp.zeros_like(y)
    assert float(masked_ce_from_logits(logits, y_zero)) == 0.0
    l2 = keras_categorical_ce(jnp.abs(logits), y)
    assert np.isfinite(float(l2))
    acc = masked_accuracy(logits, y)
    assert 0.0 <= float(acc) <= 1.0


def test_keras_categorical_ce_negative_sum_matches_keras():
    """Raw-logit renormalization must follow Keras' unguarded division:
    timesteps whose logits sum NEGATIVE renormalize to negative probs whose
    target slot clips to eps (loss ~ -log(eps) ~ 16.1, strong gradient).
    A max(sum, eps) guard instead exploded p and clipped to 1-eps (loss ~ 0)
    exactly in the regime that drives the grid-TD quirk loss.

    Self-seeded (the shared session rng's state depends on test order) and
    with sums pushed away from 0, where the implementation's sign-preserving
    denominator stabilizer legitimately deviates from the raw division."""
    rng = np.random.default_rng(123)
    logits = rng.normal(size=(3, 4, 6)).astype(np.float32) - 0.5  # sums often < 0
    s = logits.sum(-1, keepdims=True)
    logits = np.where(np.abs(s) < 0.2, logits - 0.2, logits)  # keep |sum| >> eps
    assert (logits.sum(-1) < 0).any(), "fixture must exercise negative sums"
    y = np.zeros((3, 4, 6), np.float32)
    y[:, :, 1] = 1.0
    eps = 1e-7

    p = logits / logits.sum(-1, keepdims=True)  # Keras: output /= sum
    p = np.clip(p, eps, 1 - eps)
    keras_loss = (-(y * np.log(p)).sum(-1)).mean()

    ours = float(keras_categorical_ce(jnp.asarray(logits), jnp.asarray(y)))
    np.testing.assert_allclose(ours, keras_loss, rtol=1e-4)
    # and the clipped-negative regime really produces the -log(eps) plateau
    neg = logits.sum(-1) < 0
    assert (np.abs((-(y * np.log(p)).sum(-1))[neg] - (-np.log(eps))) < 1.0).any()


def test_lstm_dropout_masks_train_only(rng):
    """LSTM dropout: no-mask == all-ones masks; real masks change outputs but
    keep expectation roughly centered (inverted dropout)."""
    import jax.numpy as jnp

    from lrp_imagecaptioning_tpu.models.cells import (
        LSTMState,
        lstm_dropout_masks,
        lstm_init,
        lstm_step,
    )

    B, In, H = 3, 10, 8
    params = lstm_init(jax.random.PRNGKey(0), In, H)
    x = jnp.asarray(rng.normal(size=(B, In)).astype(np.float32))
    state = LSTMState(jnp.zeros((B, H)), jnp.zeros((B, H)))
    base, _ = lstm_step(params, x, state)
    ones = (jnp.ones((4, B, In)), jnp.ones((4, B, H)))
    same, _ = lstm_step(params, x, state, ones)
    np.testing.assert_allclose(np.asarray(same.h), np.asarray(base.h), rtol=1e-5, atol=1e-6)
    masks = lstm_dropout_masks(jax.random.PRNGKey(1), In, H, 0.5, batch=B)
    dropped, _ = lstm_step(params, x, state, masks)
    assert np.abs(np.asarray(dropped.h) - np.asarray(base.h)).max() > 1e-4


def test_forward_train_dropout_stochastic(rng):
    """With a dropout rng the forward is stochastic across keys and differs
    from the deterministic eval forward."""
    cfg = CFG.replace(drop_rate=0.5)
    params = adaptive.init_params(jax.random.PRNGKey(0), VOCAB, cfg)
    feat = jnp.asarray(rng.normal(size=(2, cfg.img_feature_length, cfg.img_feature_dim)).astype(np.float32))
    caps = jnp.asarray(rng.integers(0, VOCAB, size=(2, 4)).astype(np.int32))
    det = adaptive.forward_train(params, feat, caps, cfg)
    d1 = adaptive.forward_train(params, feat, caps, cfg, jax.random.PRNGKey(1), 0.5)
    d2 = adaptive.forward_train(params, feat, caps, cfg, jax.random.PRNGKey(2), 0.5)
    assert np.abs(np.asarray(d1) - np.asarray(det)).max() > 1e-4
    assert np.abs(np.asarray(d1) - np.asarray(d2)).max() > 1e-4
