"""User-facing inference API: greedy / beam evaluation over dataset splits.

Equivalent of BasicInference / BeamSearchInference (inference.py:18-264) with
the TPU pipeline underneath: one jitted program per (batch_size, T) encodes
the batch once and decodes in a scan.

Quirk preserved for metric parity: reference predictions carry the trailing
EOS word ('zeros') and references get EOS appended via normalize_captions
before scoring (inference.py:132-156) — we do the same.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .beam import beam_search
from .greedy import greedy_decode


class BasicInference:
    """Greedy decoding + test-set evaluation (inference.py:18-130)."""

    def __init__(self, captioner, params, dataset_provider, test_dataset_provider=None, metrics=None, max_caption_length: int = 20):
        self.captioner = captioner
        self.params = params
        self._provider = dataset_provider
        self._test_provider = test_dataset_provider or dataset_provider
        self._pp = dataset_provider.caption_preprocessor
        self._max_len = max_caption_length
        if metrics is None:
            from ..evalx.metrics import default_metrics

            metrics = default_metrics()
        self._metrics = metrics
        self._decode_jit = jax.jit(self._decode_batch_tokens)

    # -- decoding ---------------------------------------------------------

    def _decode_batch_tokens(self, params, images):
        feat_grid = self.captioner.encode(params, images)
        tokens, _ = greedy_decode(
            self.captioner,
            params,
            feat_grid,
            self._pp.SOS_TOKEN_LABEL_ENCODED,
            self._pp.EOS_TOKEN_LABEL_ENCODED,
            self._max_len,
        )
        return tokens

    def predict_batch(self, images) -> list[str]:
        tokens = np.asarray(self._decode_jit(self.params, jnp.asarray(images)))
        return self._tokens_to_strings(tokens)

    def _tokens_to_strings(self, tokens) -> list[str]:
        eos = self._pp.EOS_TOKEN_LABEL_ENCODED
        out = []
        for row in tokens:
            words = []
            for tok in row:
                if tok == 0:
                    break
                words.append(self._pp.word_of[int(tok)])
                if tok == eos:
                    break
            # reference predictions end with the EOS word (see module docstring)
            if not words or words[-1] != self._pp.EOS_TOKEN:
                words.append(self._pp.EOS_TOKEN)
            out.append(" ".join(words))
        return out

    # -- evaluation ---------------------------------------------------------

    def _predict_split(self, gen_fn, steps):
        from ..data.prefetch import prefetch

        results = []
        data = []
        # background producer overlaps host image decode with device decode
        # (GeneratorEnqueuer equivalent, inference.py:63-92)
        gen = prefetch(gen_fn(include_datum=True))
        try:
            for _ in range(steps):
                (cap_in, imgs), y, datum_batch = next(gen)
                results += self.predict_batch(imgs)
                data += list(datum_batch)
        finally:
            gen.stop()  # don't leak the producer thread when decoding raises
        return list(zip(results, data))

    def predict_test_set(self):
        return self._predict_split(self._test_provider.test_set, self._test_provider.test_steps)

    def predict_validation_set(self):
        return self._predict_split(self._provider.validation_set, self._provider.validation_steps)

    def evaluate_test_set(self, include_prediction: bool = False):
        return self._evaluate(self.predict_test_set(), include_prediction)

    def evaluate_validation_set(self, include_prediction: bool = False):
        return self._evaluate(self.predict_validation_set(), include_prediction)

    def _evaluate(self, caption_datum_pairs, include_prediction=False):
        """Assemble id->prediction / id->references, dedup by image id, score
        (inference.py:132-156)."""
        id_to_prediction = {}
        id_to_references = {}
        seen = set()
        for caption_pred, datum in caption_datum_pairs:
            img_id = datum.img_filename
            if img_id in seen:
                continue
            seen.add(img_id)
            refs = self._pp.normalize_captions(list(datum.all_captions_txt))
            id_to_references[img_id] = [{"caption": c} for c in refs]
            id_to_prediction[img_id] = [{"caption": caption_pred}]
        metrics = {}
        for metric in self._metrics:
            metrics.update(metric.calculate(id_to_prediction, id_to_references))
        return (metrics, id_to_prediction, id_to_references) if include_prediction else metrics


class BeamSearchInference(BasicInference):
    """Beam-search decoding (inference.py:159-264)."""

    def __init__(self, *args, beam_size: int = 3, **kw):
        super().__init__(*args, **kw)
        self._beam_size = beam_size
        self._decode_jit = jax.jit(self._decode_batch_tokens_beam)

    def _decode_batch_tokens_beam(self, params, images):
        feat_grid = self.captioner.encode(params, images)
        tokens, _ = beam_search(
            self.captioner,
            params,
            feat_grid,
            self._pp.SOS_TOKEN_LABEL_ENCODED,
            self._pp.EOS_TOKEN_LABEL_ENCODED,
            self._beam_size,
            self._max_len,
        )
        return tokens
