"""PTB tokenization matching pycocoevalcap's PTBTokenizer protocol.

The reference tokenizes BOTH hypotheses and references with
pycocoevalcap/tokenizer/ptbtokenizer.py before every scorer
(/root/reference/models/metrics.py:22-23). That tokenizer shells out to
Stanford CoreNLP's ``edu.stanford.nlp.process.PTBTokenizer`` with
``-preserveLines -lowerCase`` and then drops a fixed punctuation list.

This module reproduces that pipeline:

* **Jar path** — when a Stanford CoreNLP jar is available (env var
  ``LRPIC_CORENLP_JAR`` or ``jars/stanford-corenlp-3.4.1.jar`` next to this
  file), run the exact same subprocess command as pycocoevalcap, so output is
  bit-identical to the reference protocol.
* **Python path** (default) — NLTK's ``TreebankWordTokenizer``, which
  implements the same Penn-Treebank ``tokenizer.sed`` rules (contraction
  splitting ``don't -> do n't``, possessives ``dog's -> dog 's``,
  ``-LRB-``/``-RRB-`` bracket escapes), followed by the identical
  lowercase + punctuation-drop steps.

Both paths share pycocoevalcap's PUNCTUATIONS list verbatim (it is protocol
data, not code). Note the faithful artifact: the jar lowercases BEFORE the
Python-side punctuation filter, so bracket escapes arrive as ``-lrb-`` /
``-rrb-`` and are NOT filtered (PUNCTUATIONS holds the uppercase forms) —
pycocoevalcap-tokenized corpora visibly contain ``-lrb-`` tokens. We
reproduce that ordering.
"""

from __future__ import annotations

import os
import subprocess
import tempfile

# pycocoevalcap/tokenizer/ptbtokenizer.py PUNCTUATIONS — protocol constant
PUNCTUATIONS = frozenset(
    ["''", "'", "``", "`", "-LRB-", "-RRB-", "-LCB-", "-RCB-",
     ".", "?", "!", ",", ":", "-", "--", "...", ";"]
)

_JAR_ENV = "LRPIC_CORENLP_JAR"


def _java_bin() -> str:
    """Java launcher for the jar paths; ``LRPIC_JAVA`` overrides so tests can
    substitute a protocol stub (no JRE ships in this environment)."""
    return os.environ.get("LRPIC_JAVA", "java")


def _find_corenlp_jar() -> str | None:
    p = os.environ.get(_JAR_ENV)
    if p and os.path.isfile(p):
        return p
    here = os.path.dirname(os.path.abspath(__file__))
    cand = os.path.join(here, "jars", "stanford-corenlp-3.4.1.jar")
    return cand if os.path.isfile(cand) else None


_nltk_tok = None


def _python_tokenize_line(line: str) -> list[str]:
    global _nltk_tok
    if _nltk_tok is None:
        from nltk.tokenize import TreebankWordTokenizer

        _nltk_tok = TreebankWordTokenizer()
    toks = _nltk_tok.tokenize(line, convert_parentheses=True)
    return [t for t in (tok.lower() for tok in toks) if t not in PUNCTUATIONS]


def _jar_tokenize_lines(jar: str, lines: list[str]) -> list[list[str]]:
    """Run Stanford PTBTokenizer exactly as pycocoevalcap does."""
    payload = "\n".join(s.replace("\n", " ") for s in lines)
    with tempfile.NamedTemporaryFile("w", suffix=".txt", delete=False) as f:
        f.write(payload)
        path = f.name
    try:
        cmd = [
            _java_bin(), "-cp", jar, "edu.stanford.nlp.process.PTBTokenizer",
            "-preserveLines", "-lowerCase", path,
        ]
        out = subprocess.run(cmd, capture_output=True, text=True, check=True).stdout
    finally:
        os.unlink(path)
    rows = out.split("\n")
    return [
        [w for w in rows[i].split() if w not in PUNCTUATIONS]
        for i in range(len(lines))
    ]


def ptb_tokenize(s: str) -> list[str]:
    """Tokenize one caption with the reference's PTB protocol (Python path)."""
    return _python_tokenize_line(s)


class PTBTokenizer:
    """pycocoevalcap-compatible interface:
    ``tokenize({id: [{'caption': str}, ...]}) -> {id: [str, ...]}`` where each
    output string is the space-joined token list."""

    def __init__(self, jar: str | None = None):
        self._jar = jar if jar is not None else _find_corenlp_jar()

    def tokenize(self, captions_for_image: dict) -> dict:
        keys = list(captions_for_image)
        lines, index = [], []
        for k in keys:
            for c in captions_for_image[k]:
                lines.append(c["caption"])
                index.append(k)
        if self._jar is not None:
            token_lists = _jar_tokenize_lines(self._jar, lines)
        else:
            token_lists = [_python_tokenize_line(s) for s in lines]
        out: dict = {k: [] for k in keys}
        for k, toks in zip(index, token_lists):
            out[k].append(" ".join(toks))
        return out
