"""Caption metrics: BLEU-1..4, CIDEr(-D), ROUGE-L, METEOR, SPICE, BERTScore.

Equivalent of models/metrics.py:10-89, which wraps the external pycocoevalcap
package. That package shells out to Java jars for PTBTokenizer/METEOR/SPICE
(reference metrics.py:62-73 silently degrades METEOR to 0 when the jar is
missing). Here the scorers are pure Python:

* BLEU  — corpus-level with clipped n-gram counts and 'closest' effective
  reference length (pycocoevalcap bleu semantics).
* CIDEr — CIDEr-D: tf-idf 1..4-gram cosine with length gaussian (sigma=6),
  clipping, x10 (pycocoevalcap cider semantics).
* ROUGE — ROUGE-L F-measure, beta=1.2, max over references.
* METEOR — Python approximation (exact + Porter-stem matching stages,
  alpha=.9 beta=3 gamma=.5); the reference requires meteor-1.5.jar. Scores
  correlate but are not bit-identical to the jar — documented deviation.
* SPICE — requires a Java scene-graph parser; returns 0 with a warning, the
  same degradation the reference exhibits without its jar.
* BERT  — BERTScore via transformers when a local model is available; else 0
  (zero-egress environments cannot download weights).

All calculators share the reference's calling convention:
``calculate(id_to_prediction, id_to_references) -> {name: value}`` where the
dict values are ``[{'caption': str}, ...]``.
"""

from __future__ import annotations

import math
import warnings
from collections import Counter, defaultdict


def _tokenize(s: str) -> list[str]:
    """PTB-lite tokenization: lowercase, strip punctuation, whitespace split.

    The corpora flowing through this framework are already lowercased with
    punctuation removed by the caption pipeline, so this matches PTBTokenizer
    output on them.
    """
    out = []
    for w in s.lower().split():
        w = w.strip(".,!?;:'\"()[]")
        if w:
            out.append(w)
    return out


def _pairs(id_to_prediction, id_to_references):
    keys = sorted(id_to_prediction)
    hyps = [_tokenize(id_to_prediction[k][0]["caption"]) for k in keys]
    refs = [[_tokenize(r["caption"]) for r in id_to_references[k]] for k in keys]
    return hyps, refs


def _ngrams(tokens, n):
    return Counter(tuple(tokens[i : i + n]) for i in range(len(tokens) - n + 1))


class BLEU:
    def __init__(self, n: int = 4):
        self._n = n

    def calculate(self, id_to_prediction, id_to_references):
        hyps, refs = _pairs(id_to_prediction, id_to_references)
        small = 1e-9
        tiny = 1e-15
        correct = [0.0] * self._n
        total = [0.0] * self._n
        hyp_len = 0
        ref_len = 0
        for hyp, refset in zip(hyps, refs):
            hyp_len += len(hyp)
            # closest reference length
            ref_len += min((abs(len(r) - len(hyp)), len(r)) for r in refset)[1]
            for n in range(1, self._n + 1):
                hc = _ngrams(hyp, n)
                maxref = Counter()
                for r in refset:
                    for g, c in _ngrams(r, n).items():
                        maxref[g] = max(maxref[g], c)
                correct[n - 1] += sum(min(c, maxref[g]) for g, c in hc.items())
                total[n - 1] += max(len(hyp) - n + 1, 0)
        bp = 1.0 if hyp_len > ref_len else math.exp(1 - ref_len / (hyp_len + tiny))
        out = {}
        logsum = 0.0
        for n in range(1, self._n + 1):
            p = (correct[n - 1] + tiny) / (total[n - 1] + small)
            logsum += math.log(p)
            out[f"Bleu_{n}"] = bp * math.exp(logsum / n)
        return out


class CIDEr:
    """CIDEr-D, n=1..4, sigma=6, x10."""

    def __init__(self, n: int = 4, sigma: float = 6.0):
        self._n = n
        self._sigma = sigma

    def calculate(self, id_to_prediction, id_to_references):
        hyps, refs = _pairs(id_to_prediction, id_to_references)
        # document frequency over reference sets
        doc_freq = [defaultdict(float) for _ in range(self._n)]
        for refset in refs:
            for n in range(self._n):
                seen = set()
                for r in refset:
                    seen |= set(_ngrams(r, n + 1))
                for g in seen:
                    doc_freq[n][g] += 1
        n_docs = max(len(refs), 1)
        log_ndocs = math.log(max(n_docs, 1))

        def vec(tokens):
            vs, norms = [], []
            for n in range(self._n):
                cnt = _ngrams(tokens, n + 1)
                v = {}
                norm = 0.0
                for g, c in cnt.items():
                    df = math.log(max(doc_freq[n][g], 1.0))
                    w = c * max(log_ndocs - df, 0.0)
                    v[g] = w
                    norm += w * w
                vs.append(v)
                norms.append(math.sqrt(norm))
            return vs, norms

        scores = []
        for hyp, refset in zip(hyps, refs):
            hv, hn = vec(hyp)
            score = 0.0
            for r in refset:
                rv, rn = vec(r)
                delta = len(hyp) - len(r)
                for n in range(self._n):
                    num = sum(min(hv[n].get(g, 0.0), rv[n].get(g, 0.0)) * rv[n].get(g, 0.0) for g in hv[n])
                    if hn[n] > 0 and rn[n] > 0:
                        s = num / (hn[n] * rn[n])
                    else:
                        s = 0.0
                    s *= math.exp(-(delta ** 2) / (2 * self._sigma ** 2))
                    score += s
            scores.append(score * 10.0 / (self._n * max(len(refset), 1)))
        return {"CIDEr": sum(scores) / max(len(scores), 1)}


class ROUGE:
    """ROUGE-L F-measure, beta=1.2, max over references."""

    BETA = 1.2

    @staticmethod
    def _lcs(a, b):
        m, n = len(a), len(b)
        if m == 0 or n == 0:
            return 0
        dp = [0] * (n + 1)
        for i in range(1, m + 1):
            prev = 0
            for j in range(1, n + 1):
                cur = dp[j]
                dp[j] = prev + 1 if a[i - 1] == b[j - 1] else max(dp[j], dp[j - 1])
                prev = cur
        return dp[n]

    def calculate(self, id_to_prediction, id_to_references):
        hyps, refs = _pairs(id_to_prediction, id_to_references)
        scores = []
        for hyp, refset in zip(hyps, refs):
            best = 0.0
            for r in refset:
                lcs = self._lcs(hyp, r)
                if lcs == 0:
                    continue
                prec = lcs / len(hyp) if hyp else 0.0
                rec = lcs / len(r) if r else 0.0
                if prec and rec:
                    b2 = self.BETA ** 2
                    best = max(best, (1 + b2) * prec * rec / (rec + b2 * prec))
            scores.append(best)
        return {"ROUGE_L": sum(scores) / max(len(scores), 1)}


class METEOR:
    """Python METEOR approximation (exact + Porter-stem stages).

    The reference uses meteor-1.5.jar via subprocess and returns 0 when the
    jar is missing (metrics.py:62-73). This implementation computes the
    standard METEOR formula (alpha=0.9, beta=3.0, gamma=0.5) with exact and
    stem matchers; synonym/paraphrase stages need WordNet data and are
    omitted. Values track but do not equal the jar's.
    """

    ALPHA, BETA_P, GAMMA = 0.9, 3.0, 0.5

    def __init__(self):
        try:
            from nltk.stem.porter import PorterStemmer

            self._stem = PorterStemmer().stem
        except Exception:  # pragma: no cover
            self._stem = lambda w: w

    def _align(self, hyp, ref):
        """Greedy stage-wise alignment; returns (matches, chunks)."""
        m = len(hyp)
        match_of = [-1] * m
        used_ref = [False] * len(ref)
        for stage in (lambda w: w, self._stem):
            hkey = [stage(w) for w in hyp]
            rkey = [stage(w) for w in ref]
            for i in range(m):
                if match_of[i] >= 0:
                    continue
                for j in range(len(ref)):
                    if not used_ref[j] and hkey[i] == rkey[j]:
                        match_of[i] = j
                        used_ref[j] = True
                        break
        pairs = [(i, j) for i, j in enumerate(match_of) if j >= 0]
        matches = len(pairs)
        chunks = 0
        prev = None
        for i, j in pairs:
            if prev is None or j != prev + 1:
                chunks += 1
            prev = j
        return matches, chunks

    def calculate(self, id_to_prediction, id_to_references):
        hyps, refs = _pairs(id_to_prediction, id_to_references)
        scores = []
        for hyp, refset in zip(hyps, refs):
            best = 0.0
            for r in refset:
                matches, chunks = self._align(hyp, r)
                if matches == 0:
                    continue
                p = matches / len(hyp)
                q = matches / len(r)
                fmean = p * q / (self.ALPHA * p + (1 - self.ALPHA) * q)
                frag = chunks / matches
                pen = self.GAMMA * (frag ** self.BETA_P)
                best = max(best, fmean * (1 - pen))
            scores.append(best)
        return {"METEOR": sum(scores) / max(len(scores), 1)}


class SPICE:
    """Requires a Java scene-graph parser; degrades to 0 like the reference
    does without its jar (metrics.py:62-73)."""

    _warned = False

    def calculate(self, id_to_prediction, id_to_references):
        if not SPICE._warned:
            warnings.warn("SPICE requires the external Java scene-graph parser; returning 0.")
            SPICE._warned = True
        return {"SPICE": 0.0}


class BERT:
    """BERTScore when a local transformers model is available, else 0
    (pycocoevalcap/bert/bert.py:3-50)."""

    def __init__(self, model_path: str | None = None):
        self._model_path = model_path

    def calculate(self, id_to_prediction, id_to_references):
        if self._model_path is None:
            return {"BERTScore": 0.0}
        try:
            from bert_score import score as bert_score  # type: ignore

            keys = sorted(id_to_prediction)
            cands = [id_to_prediction[k][0]["caption"] for k in keys]
            refs = [[r["caption"] for r in id_to_references[k]] for k in keys]
            _, _, f1 = bert_score(cands, refs, model_type=self._model_path, lang="en")
            return {"BERTScore": float(f1.mean())}
        except Exception:
            return {"BERTScore": 0.0}


def default_metrics():
    """The reference's metric list (inference.py:31): BLEU(4), METEOR, CIDEr,
    ROUGE, SPICE."""
    return [BLEU(4), METEOR(), CIDEr(), ROUGE(), SPICE()]
