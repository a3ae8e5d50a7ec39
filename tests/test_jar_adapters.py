"""Jar-subprocess adapter protocol tests.

The reference scores METEOR/SPICE by shelling out to Java jars when present
(/root/reference/models/metrics.py:62-89) and tokenizes through the Stanford
CoreNLP PTBTokenizer jar (pycocoevalcap/tokenizer/ptbtokenizer.py). Our
adapters reproduce those subprocess protocols; with no JRE in this image they
are exercised here against ``tests/fake_java.py`` (selected via the
``LRPIC_JAVA`` override), which implements each jar's stdio/file protocol and
returns sentinel scores — so a silent fall-back to the Python approximation
would fail these assertions.
"""

import gzip
import os

import pytest

from lrp_imagecaptioning_tpu.evalx.metrics import METEOR, SPICE
from lrp_imagecaptioning_tpu.evalx.ptb import PTBTokenizer

FAKE_JAVA = os.path.join(os.path.dirname(os.path.abspath(__file__)), "fake_java.py")

PREDS = {
    "im1": [{"caption": "a dog runs on grass"}],
    "im2": [{"caption": "two people ride a horse"}],
}
REFS = {
    "im1": [{"caption": "a dog is running"}, {"caption": "the dog runs"}],
    "im2": [{"caption": "people riding a horse"}],
}


@pytest.fixture()
def fake_java(monkeypatch):
    assert os.access(FAKE_JAVA, os.X_OK), "tests/fake_java.py must be executable"
    monkeypatch.setenv("LRPIC_JAVA", FAKE_JAVA)


def test_meteor_jar_protocol(tmp_path, fake_java, monkeypatch):
    jar = tmp_path / "meteor-1.5.jar"
    jar.write_bytes(b"")
    data = tmp_path / "data"
    data.mkdir()
    with gzip.open(data / "paraphrase-en.gz", "wb") as f:
        f.write(b"")
    log = tmp_path / "meteor_log.txt"
    monkeypatch.setenv("FAKE_METEOR_LOG", str(log))

    m = METEOR(jar=str(jar))
    assert m._jar == str(jar)  # presence check passed (jar + paraphrase data)
    out = m.calculate(PREDS, REFS)
    # sentinel aggregate from the fake jar — the Python fallback cannot
    # produce exactly this value
    assert out == {"METEOR": pytest.approx(0.314159)}

    lines = log.read_text().strip().split("\n")
    # one SCORE line per image (sorted id order), then one EVAL line
    assert len(lines) == 3
    assert lines[0].startswith("SCORE |||")
    # im1 has two references: SCORE ||| ref1 ||| ref2 ||| hyp
    assert lines[0].count("|||") == 3
    assert lines[0].endswith("a dog runs on grass")
    assert lines[1].count("|||") == 2
    assert lines[1].endswith("two people ride a horse")
    assert lines[2].startswith("EVAL |||") and lines[2].count("|||") == 2


def test_meteor_without_paraphrase_data_falls_back(tmp_path):
    jar = tmp_path / "meteor-1.5.jar"
    jar.write_bytes(b"")
    # reference checks for the jar's data directory too; without it the
    # adapter must select the Python path
    m = METEOR(jar=str(jar))
    assert m._jar is None


def test_spice_jar_protocol(tmp_path, fake_java):
    jar = tmp_path / "spice-1.0.jar"
    jar.write_bytes(b"")
    s = SPICE(jar=str(jar))
    out = s.calculate(PREDS, REFS)
    # fake emits f = 0.25, 0.35 over the two images -> mean 0.30
    assert out == {"SPICE": pytest.approx(0.30)}


def test_ptb_jar_protocol(tmp_path, fake_java):
    jar = tmp_path / "stanford-corenlp-3.4.1.jar"
    jar.write_bytes(b"")
    tok = PTBTokenizer(jar=str(jar))
    out = tok.tokenize({
        "a": [{"caption": "A dog runs."}, {"caption": "The Dog, running"}],
        "b": [{"caption": "Hello World!"}],
    })
    # fake jar lowercases and splits trailing punctuation; the adapter then
    # drops PUNCTUATIONS and regroups by id preserving caption order
    assert out == {
        "a": ["a dog runs", "the dog running"],
        "b": ["hello world"],
    }


def test_spice_jar_detailed_categories_and_nan_skip(tmp_path, fake_java):
    """detailed=True surfaces the jar's per-category f values; a NaN entry
    (the jar's no-signal marker) is skipped from the category mean, not
    averaged as 0."""
    jar = tmp_path / "spice-1.0.jar"
    jar.write_text("")
    s = SPICE(jar=str(jar), detailed=True)
    out = s.calculate({"1": [{"caption": "a cat"}], "2": [{"caption": "a dog"}]},
                      {"1": [{"caption": "a cat"}], "2": [{"caption": "a dog"}]})
    assert out["SPICE"] == pytest.approx(0.30)
    assert out["SPICE_Object"] == pytest.approx(0.55)  # (0.5 + 0.6) / 2
    assert out["SPICE_Color"] == pytest.approx(0.8)    # NaN on image 0 skipped
    assert out["SPICE_Size"] == 0.0                    # never emitted
