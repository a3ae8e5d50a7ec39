"""Beam-search semantics: the jitted scan must reproduce a straightforward
Python implementation of the reference's heap algorithm
(inference.py:178-264): pooled top-k over beam x vocab candidates with
cumulative log-softmax scores, complete captions harvested when EOS enters a
beam's per-step top-k, best complete preferred over best partial."""

import heapq

import numpy as np
import jax
import jax.numpy as jnp

from lrp_imagecaptioning_tpu.config import FlickrConfig
from lrp_imagecaptioning_tpu.infer.beam import beam_search
from lrp_imagecaptioning_tpu.models.captioner import build_captioner

CFG = FlickrConfig(embedding_dim=8, hidden_dim=8, img_feature_length=4,
                   img_feature_dim=12, sentence_length=6, drop_rate=0.0)
VOCAB = 10
SOS, EOS = 1, 2


def _python_beam(step_logits_fn, beam_size, max_len):
    """Reference-style beam over an oracle step function.

    step_logits_fn(prefix_0based: tuple) -> logits (V,) for the next step.
    Returns the best caption (1-based, EOS-terminated if complete)."""
    partial = [(0.0, (SOS - 1,))]  # (score, prefix incl. SOS)
    complete = []
    for t in range(max_len):
        candidates = []
        for score, prefix in partial:
            logits = step_logits_fn(prefix)
            logp = logits - np.log(np.exp(logits - logits.max()).sum()) - logits.max()
            top = np.argsort(logp)[::-1][:beam_size]
            for w in top:
                cand_score = score + logp[w]
                if w + 1 == EOS:
                    heapq.heappush(complete, (cand_score, prefix[1:] + (w,)))
                    if len(complete) > beam_size:
                        heapq.heappop(complete)
                candidates.append((cand_score, prefix + (w,)))
        # pooled top-k over all candidates
        candidates.sort(key=lambda c: -c[0])
        partial = candidates[:beam_size]
    if complete:
        best_score, best = max(complete)
        return [w + 1 for w in best], best_score
    best_score, best = partial[0]
    return [w + 1 for w in best[1:]], best_score


import pytest


@pytest.mark.parametrize("model_type", ["adaptiveattention", "gridTD", "aoa"])
def test_beam_matches_python_reference_heap(model_type, rng):
    cap = build_captioner(model_type, CFG, VOCAB)
    params = cap.init_params(jax.random.PRNGKey(3))
    feat = jnp.asarray(rng.normal(size=(1, CFG.img_feature_length, CFG.img_feature_dim)).astype(np.float32))

    # oracle step: replay the decoder on a prefix
    consts = cap.prepare_consts(params, feat)
    emb = params["decoder"]["embedding"]

    def step_logits(prefix):
        state = cap.decoder.init_state(1, CFG.hidden_dim)
        cache = None
        for tok in prefix:
            state, cache = cap.decoder.step(params["decoder"], consts, state, emb[jnp.asarray([tok])])
        return np.asarray(cache.logits[0], np.float64)

    expected_tokens, expected_score = _python_beam(step_logits, beam_size=3, max_len=CFG.sentence_length)

    tokens, score = beam_search(cap, params, feat, SOS, EOS, 3, CFG.sentence_length)
    got = [int(t) for t in np.asarray(tokens)[0] if t != 0]
    assert got == expected_tokens
    np.testing.assert_allclose(float(score[0]), expected_score, rtol=1e-4)


def test_beam_matches_python_reference_multiple_seeds(rng):
    """Sweep several weight seeds to cover complete-vs-partial outcomes.
    (3 seeds in the smoke tier; the beam program compiles once — the sweep
    cost is the eager-mode python oracle.)"""
    for seed in range(4, 7):
        cap = build_captioner("adaptiveattention", CFG, VOCAB)
        params = cap.init_params(jax.random.PRNGKey(seed))
        feat = jnp.asarray(rng.normal(size=(1, CFG.img_feature_length, CFG.img_feature_dim)).astype(np.float32))
        consts = cap.prepare_consts(params, feat)
        emb = params["decoder"]["embedding"]

        def step_logits(prefix):
            state = cap.decoder.init_state(1, CFG.hidden_dim)
            cache = None
            for tok in prefix:
                state, cache = cap.decoder.step(params["decoder"], consts, state, emb[jnp.asarray([tok])])
            return np.asarray(cache.logits[0], np.float64)

        exp_tokens, exp_score = _python_beam(step_logits, 3, CFG.sentence_length)
        tokens, score = beam_search(cap, params, feat, SOS, EOS, 3, CFG.sentence_length)
        got = [int(t) for t in np.asarray(tokens)[0] if t != 0]
        assert got == exp_tokens, f"seed {seed}: {got} != {exp_tokens}"
        np.testing.assert_allclose(float(score[0]), exp_score, rtol=1e-3)


@pytest.mark.parametrize("beam_size", [1, 5, 8])  # greedy-equivalent, beam > pooled-top-k interior, beam ~ vocab edge
def test_beam_matches_python_reference_wide_widths(beam_size, rng):
    """Widths beyond the reference's fixed beam=3 (incl. beam > top-k edge
    cases near vocab size) must still match the heap oracle."""
    cap = build_captioner("adaptiveattention", CFG, VOCAB)
    params = cap.init_params(jax.random.PRNGKey(11))
    feat = jnp.asarray(rng.normal(size=(1, CFG.img_feature_length, CFG.img_feature_dim)).astype(np.float32))
    consts = cap.prepare_consts(params, feat)
    emb = params["decoder"]["embedding"]

    def step_logits(prefix):
        state = cap.decoder.init_state(1, CFG.hidden_dim)
        cache = None
        for tok in prefix:
            state, cache = cap.decoder.step(params["decoder"], consts, state, emb[jnp.asarray([tok])])
        return np.asarray(cache.logits[0], np.float64)

    exp_tokens, exp_score = _python_beam(step_logits, beam_size, CFG.sentence_length)
    tokens, score = beam_search(cap, params, feat, SOS, EOS, beam_size, CFG.sentence_length)
    got = [int(t) for t in np.asarray(tokens)[0] if t != 0]
    assert got == exp_tokens, f"beam {beam_size}: {got} != {exp_tokens}"
    np.testing.assert_allclose(float(score[0]), exp_score, rtol=1e-3)


def test_topk_small_matches_lax_topk():
    """The unrolled argmax top-k must match lax.top_k exactly, including
    lowest-index tie-breaking and rows saturated at NEG_INF."""
    import jax
    import jax.numpy as jnp

    from lrp_imagecaptioning_tpu.infer.beam import NEG_INF, _top_k

    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.normal(size=(6, 97)).astype(np.float32))
    # inject ties, NEG_INF saturation, and true -inf rows (the mask value)
    x = x.at[1, 10].set(x[1, 50])
    x = x.at[2].set(NEG_INF)
    x = x.at[3, ::7].set(3.25)
    x = x.at[4].set(-np.inf)
    x = x.at[4, 13].set(1.0)
    x = x.at[5, 1:].set(-np.inf)
    for k in (1, 3, 5):
        v_ref, i_ref = jax.lax.top_k(x, k)
        v_new, i_new = _top_k(x, k)
        np.testing.assert_array_equal(np.asarray(v_ref), np.asarray(v_new))
        np.testing.assert_array_equal(np.asarray(i_ref), np.asarray(i_new))
    # large-k fallback path
    v_ref, i_ref = jax.lax.top_k(x, 16)
    v_new, i_new = _top_k(x, 16)
    np.testing.assert_array_equal(np.asarray(v_ref), np.asarray(v_new))


def test_topk_finfo_min_corner_pinned():
    """Property test for the documented _top_k corner (infer/beam.py): inputs
    EXACTLY equal to float32 finfo.min tie with masked winners in selection
    order. Pins the contract: (a) no index is ever selected twice, (b) the
    returned VALUES are the true top-k multiset whenever fewer than k entries
    sit at finfo.min, and (c) with -inf padding (the beam's actual masking,
    which produces NEG_INF not finfo.min) selection matches lax.top_k."""
    import numpy as np

    from lrp_imagecaptioning_tpu.infer.beam import NEG_INF, _top_k

    fmin = np.finfo(np.float32).min
    rng = np.random.default_rng(7)
    for trial in range(20):
        x = rng.normal(size=(3, 11)).astype(np.float32)
        # scatter pathological values: some -inf, some exactly finfo.min
        n_inf, n_min = rng.integers(0, 4), rng.integers(0, 4)
        for row in range(x.shape[0]):
            pos = rng.permutation(x.shape[1])
            x[row, pos[:n_inf]] = -np.inf
            x[row, pos[n_inf:n_inf + n_min]] = fmin
        k = 4
        v, i = _top_k(jnp.asarray(x), k)
        v, i = np.asarray(v), np.asarray(i)
        # (a) distinct indices per row, always
        for row in range(x.shape[0]):
            assert len(set(i[row].tolist())) == k, (trial, i[row])
            # values are consistent with the indices
            np.testing.assert_array_equal(v[row], x[row, i[row]])
            # (b) true top-k multiset when < k entries are at finfo.min
            if n_min < k - n_inf:
                expect = np.sort(x[row])[::-1][:k]
                np.testing.assert_array_equal(np.sort(v[row])[::-1], expect)

    # (c) NEG_INF-masked rows (the beam's masking value) match lax.top_k
    x = rng.normal(size=(5, 9)).astype(np.float32)
    x[:, ::2] = NEG_INF
    v, i = _top_k(jnp.asarray(x), 3)
    vr, ir = jax.lax.top_k(jnp.asarray(x), 3)
    np.testing.assert_array_equal(np.asarray(v), np.asarray(vr))
    np.testing.assert_array_equal(np.asarray(i), np.asarray(ir))


def test_top_k_saturated_rows_never_select_twice():
    """Regression for _top_k's documented corner (infer/beam.py:26-54):
    rows saturated at float32 finfo.min and/or -inf. Masked winners are set
    to -inf on the CLAMPED copy, so even when every candidate ties at the
    clamp floor no index may be selected twice, and values must come from
    the original input."""
    import itertools

    from lrp_imagecaptioning_tpu.infer.beam import _top_k

    fmin = float(jnp.finfo(jnp.float32).min)
    rows = [
        [fmin] * 6,                              # all exactly finfo.min
        [-np.inf] * 6,                           # all -inf
        [fmin, -np.inf] * 3,                     # interleaved ties
        [-np.inf, fmin, -np.inf, fmin, fmin, -np.inf],
        [0.5, fmin, -np.inf, fmin, -np.inf, 0.25],  # mixed with finite
    ]
    x = jnp.asarray(np.array(rows, np.float32))
    for k in (1, 2, 3, 4, 6):
        vals, idxs = _top_k(x, k)
        vals, idxs = np.asarray(vals), np.asarray(idxs)
        assert idxs.shape == vals.shape == (len(rows), k)
        for b in range(len(rows)):
            assert len(set(idxs[b].tolist())) == k, (b, k, idxs[b])
            # returned values are the ORIGINAL inputs at those indices
            np.testing.assert_array_equal(
                vals[b], np.array(rows[b], np.float32)[idxs[b]])
        # finite entries must win before any saturated ones
        assert idxs[4, 0] == 0
        if k >= 2:
            assert idxs[4, 1] == 5
