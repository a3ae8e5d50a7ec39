"""LRP-inference finetuning: relevance-weighted dual-loss training to reduce
object hallucination.

Reference pipeline (train.py:519-673 + model.py:1379-2062) per batch:
  1. y_pred = teacher-forced forward (no dropout), argmax -> predicted words
  2. per sample, per predicted word that is neither a stop word nor EOS
     (stop words skipped, EOS breaks — model.py:1666-1671): decoder LRP for
     that word -> CNN LRP -> channel-mean heatmap -> project to [-1,1] by
     absmax -> scalar score by mode 'mean'|'pos_mean'|'quantile'(0.9)
     (model.py:2050-2058)
  3. lrp_weight = 1 + score scattered at [t, word] (model.py:1689-1690)
  4. dual loss: 0.5*CE(y, logits) + 0.5*CE(y, logits*lrp_weight), both
     softmax-CE-from-logits (model.py:1304-1313)

The reference rebuilds the whole numpy LRP engine EVERY batch and round-trips
CPU<->GPU per word. Here steps 1-4 are ONE jitted program: the decoder LRP
vmaps over (batch x words) and the CNN LRP batches all words of a sample in a
single conv-transpose chain (lax.map over samples bounds VMEM/HBM pressure).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..explain.cnn_lrp import vgg_lrp_preset_a_wordbatched
from ..explain.decoder_lrp import explain_word_adaptive, explain_word_gridtd
from ..models.captioner import masked_accuracy, masked_ce_from_logits

# NLTK english stop words (reference model.py:22 pulls these from
# nltk.corpus.stopwords; frozen here so no corpus download is needed)
STOP_WORDS = frozenset("""a about above after again against ain all am an and any are aren aren't as at be
because been before being below between both but by can couldn couldn't d did didn didn't do does doesn
doesn't doing don don't down during each few for from further had hadn hadn't has hasn hasn't have haven
haven't having he her here hers herself him himself his how i if in into is isn isn't it it's its itself
just ll m ma me mightn mightn't more most mustn mustn't my myself needn needn't no nor not now o of off on
once only or other our ours ourselves out over own re s same shan shan't she she's should should've shouldn
shouldn't so some such t than that that'll the their theirs them themselves then there these they this those
through to too under until up ve very was wasn wasn't we were weren weren't what when where which while who
whom why will with won won't wouldn wouldn't y you you'd you'll you're you've your yours yourself
yourselves""".split())


def stop_word_table(caption_pp) -> np.ndarray:
    """(vocab_size+1,) bool over 1-based token ids; True = skip this word.

    Index 0 (padding) and EOS are handled separately in the mask logic."""
    V = caption_pp.vocab_size
    table = np.zeros(V + 1, bool)
    for tok in range(1, V + 1):
        if caption_pp.word_of[tok] in STOP_WORDS:
            table[tok] = True
    return table


def _project(hp):
    """x / max|x| with all-zero guard (model.py:1643-1648)."""
    absmax = jnp.max(jnp.abs(hp))
    return jnp.where(absmax == 0, jnp.zeros_like(hp), hp / jnp.where(absmax == 0, 1.0, absmax))


def _score(hp, mode: str):
    if mode == "mean":
        return jnp.mean(hp)
    if mode == "pos_mean":
        return jnp.mean(jnp.maximum(hp, 0))
    if mode == "quantile":
        return jnp.quantile(hp, 0.9)
    raise NotImplementedError(f"lrp_inference_mode {mode!r}")


def lrp_weights(captioner, params, images, y_pred_logits, stop_table, sos_1based: int,
                eos_1based: int, mode: str = "mean", max_words: int | None = None):
    """(B,T,V) relevance weights, fully on device.

    images: (B,224,224,3) preprocessed; y_pred_logits: (B,T,V) teacher-forced
    predictions; stop_table: (V+1,) bool (True = stop word).

    ``max_words``: explain at most this many positions per sample. The
    reference only runs LRP for non-stop, pre-EOS predicted words
    (model.py:2035-2049 skips STOP_WORDS and breaks at EOS) — typically
    5-8 of the padded T=20 — while the all-positions program pays the CNN
    backward (the dominant cost) for every position and masks afterwards.
    With ``max_words=W`` the first W valid positions are gathered and only
    those W seeds run the decoder+CNN backward; any valid word beyond W
    keeps weight 1.0 (no relevance bonus). Exact vs the default whenever a
    sample has <= W valid words. ``None`` = all T positions (round-1
    behavior, always exact).
    """
    cap = captioner
    cfg = cap.cfg
    B, T, V = y_pred_logits.shape
    caption1 = jnp.argmax(y_pred_logits, axis=-1) + 1                 # (B,T) 1-based
    # decoder inputs: SOS then the predicted words (model.py:1764-1790)
    prev = jnp.concatenate(
        [jnp.full((B, 1), sos_1based, jnp.int32), caption1[:, :-1].astype(jnp.int32)], axis=1
    )
    inputs0 = jnp.maximum(prev - 1, 0)

    feat_grid = cap.encode(params, images)                            # (B,L,D)
    consts_b = cap.prepare_consts(params, feat_grid)
    caches_b = cap.decoder.forward_cached_from_inputs(
        params["decoder"], consts_b, inputs0, cfg.hidden_dim
    )
    if cap.model_type == "adaptiveattention":
        backward = explain_word_adaptive
    elif cap.model_type == "aoa":
        from ..explain.aoa_backward import explain_word_aoa as backward
    else:
        backward = explain_word_gridtd

    g = int(round(float(np.sqrt(cfg.img_feature_length))))

    # masks: stop words skipped; EOS and everything after it skipped
    is_stop = stop_table[caption1]
    is_eos = caption1 == eos_1based
    seen_eos = jnp.cumsum(is_eos.astype(jnp.int32), axis=1) > 0       # True at and after EOS
    valid = (~is_stop) & (~seen_eos)                                  # (B,T)

    words0_bt = jnp.maximum(caption1 - 1, 0).astype(jnp.int32)
    caches_tb = jax.tree.map(lambda x: jnp.moveaxis(x, 1, 0), caches_b)  # (B,T,...)

    if max_words is not None and max_words < T:
        # gather the first `max_words` VALID positions per sample (stable
        # argsort keeps time order); only those seeds run the backward
        W = max_words
        pos = jnp.argsort(~valid, axis=1, stable=True)[:, :W]         # (B,W)
        pos_valid = jnp.take_along_axis(valid, pos, axis=1)           # (B,W)
    else:
        W = T
        pos = jnp.broadcast_to(jnp.arange(T)[None, :], (B, T))
        pos_valid = valid
    words_sel = jnp.take_along_axis(words0_bt, pos, axis=1)           # (B,W)

    # decoder backward vmapped over (B, W) in one shot — it is tiny
    def per_b(consts, caches, pos_row, words_row):
        def dec_word(t, w0):
            r_feat, _, _ = backward(params["decoder"], consts, caches, t, w0, T)
            return r_feat

        return jax.vmap(dec_word)(pos_row, words_row)

    r_feat_bw = jax.vmap(per_b)(consts_b, caches_tb, pos, words_sel)  # (B,W,L,D)

    # CNN LRP: per sample, the selected words batched against one shared
    # forward; lax.map over samples keeps peak memory ~ one image's backward.
    def cnn_one(args):
        image, seeds = args
        maps = vgg_lrp_preset_a_wordbatched(
            params["vgg"], image[None], seeds, cfg.img_encoder, cfg.layer_name
        )  # (W,224,224,3)
        hp = maps.mean(axis=-1)                                       # channel mean (model.py:1679)
        hp = jax.vmap(_project)(hp)
        return jax.vmap(lambda h: _score(h, mode))(hp)                # (W,)

    seeds_bw = r_feat_bw.reshape(B, W, g, g, cfg.img_feature_dim)
    scores_w = jax.lax.map(cnn_one, (images, seeds_bw))               # (B,W)
    scores_w = jnp.where(pos_valid, scores_w, 0.0)

    # scatter back onto the (B,T) timeline (positions are unique per row)
    scores = jnp.zeros((B, T), scores_w.dtype).at[
        jnp.arange(B)[:, None], pos].add(scores_w)

    onehot = jax.nn.one_hot(words0_bt, V, dtype=scores.dtype)         # (B,T,V)
    return 1.0 + onehot * scores[:, :, None]


def dual_loss(logits, lrp_weight, y_onehot):
    """0.5 * CE(y, logits) + 0.5 * CE(y, logits * lrp_weight)
    (model.py:1308-1312); both heads use softmax-CE-from-logits with the
    last timestep discarded."""
    return 0.5 * masked_ce_from_logits(logits, y_onehot) + 0.5 * masked_ce_from_logits(
        logits * lrp_weight, y_onehot
    )


def _finetune_body(captioner, optimizer, stop_table, sos_1based: int, eos_1based: int,
                   mode: str, max_words: int | None = None):
    """The ONE finetune-step body shared by the single, multi (scan) and
    sharded factories: predict -> LRP weights -> dual-loss grad step."""
    stop_t = jnp.asarray(stop_table)

    def one(carry, batch):
        params, opt_state = carry
        images, captions_in, y_onehot, rng = batch
        # step 1: inference-mode prediction (predict_on_batch, train.py:651)
        y_pred = captioner.forward_train(params, images, captions_in, None)
        # step 2+3: relevance weights, no gradient flow
        w = jax.lax.stop_gradient(
            lrp_weights(captioner, params, images, y_pred, stop_t, sos_1based,
                        eos_1based, mode, max_words=max_words)
        )

        def loss(p):
            logits = captioner.forward_train(p, images, captions_in, rng)
            return dual_loss(logits, w, y_onehot), logits

        (l, logits), grads = jax.value_and_grad(loss, has_aux=True)(params)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return (params, opt_state), {"loss": l, "accuracy": masked_accuracy(logits, y_onehot)}

    return one


def make_lrp_finetune_step(captioner, optimizer, stop_table, sos_1based: int, eos_1based: int,
                           mode: str = "mean", donate: bool = True,
                           max_words: int | None = None):
    """One jitted program: predict -> LRP weights -> dual-loss grad step."""
    one = _finetune_body(captioner, optimizer, stop_table, sos_1based, eos_1based, mode,
                         max_words=max_words)

    def step(params, opt_state, images, captions_in, y_onehot, rng):
        (params, opt_state), m = one((params, opt_state), (images, captions_in, y_onehot, rng))
        return params, opt_state, m

    kw = {"donate_argnums": (0, 1)} if donate else {}
    return jax.jit(step, **kw)


def make_multi_lrp_finetune_step(captioner, optimizer, stop_table, sos_1based: int,
                                 eos_1based: int, mode: str = "mean", donate: bool = True,
                                 max_words: int | None = None):
    """K finetune steps in ONE dispatch (``lax.scan`` over K stacked batches).

    Same dispatch-amortization rationale as ``train/step.py::
    make_multi_train_step``: on relay-attached TPUs chained dependent
    dispatches pay a full host round trip per step; scanning K batches pays
    it once per K. Semantically identical to K chained single steps.
    -> (params, opt_state, metrics with (K,)-stacked values)."""
    one = _finetune_body(captioner, optimizer, stop_table, sos_1based, eos_1based, mode,
                         max_words=max_words)

    def multi_step(params, opt_state, images, captions_in, y_onehot, rngs):
        (params, opt_state), metrics = jax.lax.scan(
            one, (params, opt_state), (images, captions_in, y_onehot, rngs)
        )
        return params, opt_state, metrics

    kw = {"donate_argnums": (0, 1)} if donate else {}
    return jax.jit(multi_step, **kw)


def make_sharded_lrp_finetune_step(captioner, optimizer, mesh, stop_table, sos_1based: int,
                                   eos_1based: int, mode: str = "mean", donate: bool = True,
                                   max_words: int | None = None):
    """Data-parallel LRP-inference finetuning over a device mesh — the
    north-star config (BASELINE.json): the batch (images/captions/labels)
    shards over the data axis, so each device runs forward-predict +
    per-word LRP + the dual-loss grad for its shard and XLA inserts one
    ICI psum for the gradients."""
    from ..parallel import batch_sharding, replicated

    one = _finetune_body(captioner, optimizer, stop_table, sos_1based, eos_1based, mode,
                         max_words=max_words)
    data_s = batch_sharding(mesh)
    rep = replicated(mesh)

    def step(params, opt_state, images, captions_in, y_onehot, rng):
        (params, opt_state), m = one((params, opt_state), (images, captions_in, y_onehot, rng))
        return params, opt_state, m

    kw = {"donate_argnums": (0, 1)} if donate else {}
    return jax.jit(
        step,
        in_shardings=(rep, rep, data_s, data_s, data_s, rep),
        out_shardings=(rep, rep, rep),
        **kw,
    )


def make_sharded_multi_lrp_finetune_step(captioner, optimizer, mesh, stop_table,
                                         sos_1based: int, eos_1based: int,
                                         mode: str = "mean", donate: bool = True,
                                         max_words: int | None = None):
    """K sharded finetune steps in ONE dispatch: ``lax.scan`` over (K, B, ...)
    stacks with the batch axis sharded over data — dispatch amortization and
    data parallelism combined. Semantically identical to K chained sharded
    single steps."""
    from ..parallel import replicated, stacked_batch_sharding

    one = _finetune_body(captioner, optimizer, stop_table, sos_1based, eos_1based, mode,
                         max_words=max_words)
    stack_s = stacked_batch_sharding(mesh)
    rep = replicated(mesh)

    def multi_step(params, opt_state, images, captions_in, y_onehot, rngs):
        (params, opt_state), metrics = jax.lax.scan(
            one, (params, opt_state), (images, captions_in, y_onehot, rngs)
        )
        return params, opt_state, metrics

    kw = {"donate_argnums": (0, 1)} if donate else {}
    return jax.jit(
        multi_step,
        in_shardings=(rep, rep, stack_s, stack_s, stack_s, rep),
        out_shardings=(rep, rep, rep),
        **kw,
    )


class LRPFinetuner:
    """TrainingLRPInference* equivalent (train.py:519-673): chunked finetune
    loop with periodic weight saves; resumable by save_idx.

    With ``mesh`` the step runs data-parallel over the device mesh
    (make_sharded_lrp_finetune_step); this composes with
    ``steps_per_call > 1`` via the sharded scan variant."""

    def __init__(self, captioner, params, provider, mode: str = "mean",
                 learning_rate: float = 1e-6, seed: int = 0,
                 steps_per_call: int = 1, mesh=None,
                 max_explained_words: int | None = None):
        from .optimizer import make_optimizer

        self.captioner = captioner
        self.params = params
        self.provider = provider
        self.mesh = mesh
        pp = provider.caption_preprocessor
        self.optimizer = make_optimizer(captioner.model_type, learning_rate)
        self.opt_state = self.optimizer.init(params)
        stop_table = stop_word_table(pp)
        step_args = (captioner, self.optimizer, stop_table,
                     pp.SOS_TOKEN_LABEL_ENCODED, pp.EOS_TOKEN_LABEL_ENCODED, mode)
        step_kw = {"max_words": max_explained_words}
        # steps_per_call > 1: scan K batches per dispatch (dispatch-latency
        # amortization, see make_multi_lrp_finetune_step)
        self._steps_per_call = max(int(steps_per_call), 1)
        if mesh is not None:
            from ..parallel import replicated

            self._step = make_sharded_lrp_finetune_step(
                captioner, self.optimizer, mesh, stop_table,
                pp.SOS_TOKEN_LABEL_ENCODED, pp.EOS_TOKEN_LABEL_ENCODED, mode,
                **step_kw
            )
            self._multi_step = (
                make_sharded_multi_lrp_finetune_step(
                    captioner, self.optimizer, mesh, stop_table,
                    pp.SOS_TOKEN_LABEL_ENCODED, pp.EOS_TOKEN_LABEL_ENCODED, mode,
                    **step_kw
                ) if self._steps_per_call > 1 else None
            )
            rep = replicated(mesh)
            self.params = jax.device_put(self.params, rep)
            self.opt_state = jax.device_put(self.opt_state, rep)
        else:
            self._step = make_lrp_finetune_step(*step_args, **step_kw)
            self._multi_step = (
                make_multi_lrp_finetune_step(*step_args, **step_kw)
                if self._steps_per_call > 1 else None
            )
        self._base_rng = jax.random.PRNGKey(seed)
        self._rng = self._base_rng
        self._T = captioner.cfg.sentence_length + 1

    def _place(self, arr):
        if self.mesh is not None:
            from ..parallel import batch_sharding

            data_size = self.mesh.shape.get("data", 1)
            if arr.shape[0] % data_size == 0:
                return jax.device_put(arr, batch_sharding(self.mesh))
            # ragged batch: device_put with an uneven NamedSharding raises;
            # leave uncommitted (run() also drops epoch-tail batches on a
            # mesh, so this is defense in depth)
        return jnp.asarray(arr)

    def _place_stacked(self, arr):
        if self.mesh is not None:
            from ..parallel import stacked_batch_sharding

            return jax.device_put(arr, stacked_batch_sharding(self.mesh))
        return jnp.asarray(arr)

    def run(self, save_idx: int, epoch_length: int, result_dir: str = "results/lrp-finetune"):
        """Run ``epoch_length`` iterations, fast-forwarding the generator by
        save_idx*epoch_length batches like the reference resume
        (train.py:563-564) — but WITHOUT preprocessing the skipped batches
        (the provider advances its datum cursor; decoding thousands of images
        only to discard them would cost hours at reference scale). The
        dropout stream is keyed by the chunk index so resumed chunks do not
        replay chunk 0's RNG sequence."""
        from ..data.prefetch import prefetch
        from .checkpoint import save_checkpoint

        from .step import run_stepped_steps

        from .step import metric_accumulator

        self._rng = jax.random.fold_in(self._base_rng, save_idx)
        # mesh runs drop ragged epoch-tail batches (sharded in_shardings
        # reject batch dims not divisible by the data axis)
        gen = prefetch(self.provider.training_set(
            pad_to_length=self._T, skip_batches=save_idx * epoch_length,
            drop_remainder=(self.mesh is not None)))
        # metrics stay device-side until the chunk ends (no per-step sync)
        record, finalize = metric_accumulator()

        def split_rng(n):
            self._rng, sub = jax.random.split(self._rng)
            return jax.random.split(sub, n)

        try:
            self.params, self.opt_state = run_stepped_steps(
                gen, epoch_length, self._steps_per_call, self._place, split_rng,
                self._multi_step, self._step, self.params, self.opt_state, record,
                place_stacked=self._place_stacked,
            )
        finally:
            # each chunk creates its own producer thread; an abandoned one
            # busy-polls forever while pinning ~10 decoded image batches
            # (50 chunks = 50 spinning threads without this)
            gen.stop()
        metrics = finalize(epoch_length)
        save_checkpoint(result_dir, save_idx, self.params, self.opt_state, metric=metrics["accuracy"])
        return metrics
