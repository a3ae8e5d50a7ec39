"""Batched beam search as one jitted scan, reproducing the reference's
selection semantics (inference.py:159-264, explainers.py:51-120):

* beams are pooled per step and the global top-k kept (the BatchNLargest of
  all beam x top-k candidates == top-k over all beam x vocab candidates);
* scores are cumulative log-softmax, never length-normalized;
* when a candidate extends with EOS, its PARENT sentence + the candidate's
  score is recorded as a complete caption; partial beams keep expanding past
  EOS exactly as the reference's heaps do;
* the final answer is the best complete caption if any exists, else the best
  partial (inference.py:236-251).

Unlike the reference — which re-runs the whole teacher-forcing graph (VGG
included) per step per beam — the encoder runs once and beam state (h, c per
beam) is carried through a single ``lax.scan``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

NEG_INF = -1e30


def _top_k(x, k):
    """Exact top-k (values, indices) with lax.top_k's lowest-index
    tie-breaking, unrolled as k argmax+mask passes for small k.

    On TPU ``lax.top_k`` lowers to sort-based code; at bench shapes
    (B=56, beam 3, V=7003) the two per-step top-k calls made the beam scan
    top_k-bound — swapping in this unrolled form drops the whole scan
    92.5 -> 27.5 ms/batch with token-identical output. Selection runs on a
    finfo.min-clamped copy so that -inf inputs stay selectable in index
    order while masked winners (set to -inf) are strictly below every
    remaining candidate — no index can be selected twice even for rows
    saturated at -inf. Returned values come from the original ``x``. Falls
    back to lax.top_k for larger k where k full passes would exceed the
    sort cost. (Sole corner: inputs EXACTLY equal to float32 finfo.min tie
    with clamped -inf entries in selection order.)
    """
    if k > 8:
        return jax.lax.top_k(x, k)
    vals, idxs = [], []
    cur = jnp.maximum(x, jnp.finfo(x.dtype).min)   # -inf -> finite floor
    ar = jnp.arange(x.shape[-1])
    for _ in range(k):
        i = jnp.argmax(cur, axis=-1)
        v = jnp.take_along_axis(x, i[..., None], -1)[..., 0]
        vals.append(v)
        idxs.append(i.astype(jnp.int32))
        cur = jnp.where(ar == i[..., None], -jnp.inf, cur)
    return jnp.stack(vals, -1), jnp.stack(idxs, -1)


def beam_search(
    captioner,
    params,
    feat_grid,
    sos_id_1based: int,
    eos_id_1based: int,
    beam_size: int = 3,
    max_len: int = 20,
):
    """feat_grid (B,L,D) -> tokens_1based (B, max_len), best-scoring caption.

    Output includes the trailing EOS (reference results end with the EOS
    sentinel, inference.py:243-251); positions after EOS are 0.
    """
    dec = captioner.decoder
    K = beam_size
    B = feat_grid.shape[0]
    H = captioner.cfg.hidden_dim
    eos0 = eos_id_1based - 1  # model space
    emb = params["decoder"]["embedding"]

    consts = captioner.prepare_consts(params, feat_grid)
    # tile consts to (B*K, ...) once
    consts_k = jax.tree.map(lambda x: jnp.repeat(x, K, axis=0), consts)

    state0 = dec.init_state(B * K, H)
    tokens0 = jnp.full((B, K), sos_id_1based - 1, jnp.int32)
    # only beam 0 is live at step 0 (reference seeds ONE partial caption)
    scores0 = jnp.where(jnp.arange(K)[None, :] == 0, 0.0, NEG_INF) * jnp.ones((B, 1))
    seqs0 = jnp.zeros((B, K, max_len), jnp.int32)
    best_complete_score0 = jnp.full((B,), NEG_INF)
    best_complete_seq0 = jnp.zeros((B, max_len), jnp.int32)
    best_complete_len0 = jnp.zeros((B,), jnp.int32)

    def scan_fn(carry, t):
        state, tokens, scores, seqs, bc_score, bc_seq, bc_len = carry
        flat_tok = tokens.reshape(B * K)
        new_state, cache = dec.step(params["decoder"], consts_k, state, emb[flat_tok])
        logp = jax.nn.log_softmax(cache.logits, axis=-1).reshape(B, K, -1)
        V = logp.shape[-1]
        cand = scores[:, :, None] + logp                     # (B, K, V)
        flat = cand.reshape(B, K * V)
        top_scores, top_idx = _top_k(flat, K)                # (B, K)
        parent = top_idx // V                                # (B, K)
        word0 = top_idx % V                                  # model space

        # complete-caption harvest: candidates whose word is EOS. The reference
        # only sees EOS when it is among a beam's top-K words
        # (inference.py:204-229); replicate with a per-beam threshold. The
        # complete sentence is the PARENT's sequence + EOS, at candidate score.
        kth = _top_k(logp, K)[0][:, :, K - 1]                # (B, K) per-beam k-th best
        in_topk = logp[:, :, eos0] >= kth
        eos_cand = jnp.where(in_topk, cand[:, :, eos0], NEG_INF)  # (B, K)
        best_k = jnp.argmax(eos_cand, axis=1)
        best_eos_score = jnp.take_along_axis(eos_cand, best_k[:, None], 1)[:, 0]
        parent_seq = jnp.take_along_axis(seqs, best_k[:, None, None], 1)[:, 0]  # (B, max_len)
        parent_seq = parent_seq.at[:, t].set(eos_id_1based)
        improved = best_eos_score > bc_score
        bc_score = jnp.where(improved, best_eos_score, bc_score)
        bc_seq = jnp.where(improved[:, None], parent_seq, bc_seq)
        bc_len = jnp.where(improved, t + 1, bc_len)

        # gather beam state
        def gather_bk(x):
            xk = x.reshape(B, K, *x.shape[1:])
            return jnp.take_along_axis(
                xk, parent.reshape(B, K, *([1] * (x.ndim - 1))), axis=1
            ).reshape(B * K, *x.shape[1:])

        new_state = jax.tree.map(gather_bk, new_state)
        new_seqs = jnp.take_along_axis(seqs, parent[:, :, None], 1)
        new_seqs = new_seqs.at[:, :, t].set(word0 + 1)        # store 1-based
        return (new_state, word0, top_scores, new_seqs, bc_score, bc_seq, bc_len), None

    carry = (state0, tokens0, scores0, seqs0, best_complete_score0, best_complete_seq0, best_complete_len0)
    (state, tokens, scores, seqs, bc_score, bc_seq, bc_len), _ = jax.lax.scan(
        scan_fn, carry, jnp.arange(max_len)
    )

    # best partial (beam with max score); fall back when no complete found
    best_b = jnp.argmax(scores, axis=1)
    best_partial = jnp.take_along_axis(seqs, best_b[:, None, None], 1)[:, 0]
    has_complete = bc_score > NEG_INF / 2
    result = jnp.where(has_complete[:, None], bc_seq, best_partial)
    # zero out positions after the complete length
    pos = jnp.arange(max_len)[None, :]
    mask = jnp.where(has_complete[:, None], pos < bc_len[:, None], jnp.ones_like(result, bool))
    return result * mask, jnp.where(has_complete, bc_score, jnp.max(scores, axis=1))
