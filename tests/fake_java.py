#!/usr/bin/env python3
"""Stand-in ``java`` for the jar-adapter protocol tests.

No JRE ships in this environment, so the METEOR / SPICE / CoreNLP-PTB
subprocess adapters (evalx/metrics.py, evalx/ptb.py) would otherwise be
unexecuted wiring until deployment. Pointing ``LRPIC_JAVA`` at this script
exercises each adapter's full subprocess round-trip: argv construction,
stdin/stdout framing, temp-file handling, and result parsing.

Dispatch mirrors the real invocations:

* ``-stdio`` in argv        -> meteor-1.5.jar stdio scorer protocol
  (pycocoevalcap meteor.py: ``SCORE ||| refs... ||| hyp`` lines answered by
  stat strings; ``EVAL ||| stats...`` answered by per-segment scores then the
  aggregate).
* ``edu.stanford.nlp.process.PTBTokenizer`` in argv -> CoreNLP tokenizer
  (reads the file named by the last arg, emits one tokenized line per input
  line, ``-lowerCase`` semantics).
* ``-out`` in argv          -> SPICE jar (reads input json, writes scored
  output json).

Scores emitted are deterministic sentinels so tests can tell the jar path
from the Python fallback.
"""
import json
import os
import sys

METEOR_FINAL = 0.314159
SPICE_F = 0.25


def meteor(argv):
    log_path = os.environ.get("FAKE_METEOR_LOG")
    log = open(log_path, "a") if log_path else None
    n_segments = 0
    for line in sys.stdin:
        line = line.rstrip("\n")
        if log:
            log.write(line + "\n")
            log.flush()
        if line.startswith("SCORE |||"):
            n_segments += 1
            # stat string: real meteor emits space-separated counts
            sys.stdout.write(f"{len(line.split())} 1 0 0\n")
            sys.stdout.flush()
        elif line.startswith("EVAL |||"):
            n_stats = line.count("|||")
            assert n_stats == n_segments, (n_stats, n_segments)
            for i in range(n_segments):
                sys.stdout.write(f"{0.5 + 0.01 * i}\n")
            sys.stdout.write(f"{METEOR_FINAL}\n")
            sys.stdout.flush()
            break
    if log:
        log.close()


def ptb(argv):
    path = argv[-1]
    with open(path) as f:
        text = f.read()
    out_lines = []
    for line in text.split("\n"):
        toks = []
        for raw in line.split():
            # crude Stanford-ish behavior: strip one trailing . , ! ? into
            # its own token, lowercase everything (-lowerCase)
            w = raw.lower()
            if len(w) > 1 and w[-1] in ".,!?":
                toks.extend([w[:-1], w[-1]])
            else:
                toks.append(w)
        out_lines.append(" ".join(toks))
    sys.stdout.write("\n".join(out_lines) + "\n")


def spice(argv):
    in_path = None
    out_path = None
    for i, a in enumerate(argv):
        if a == "-out":
            out_path = argv[i + 1]
        elif a.endswith(".json") and in_path is None and not a.startswith("-"):
            in_path = a
    with open(in_path) as f:
        payload = json.load(f)
    results = [
        {"image_id": item["image_id"],
         "scores": {"All": {"f": SPICE_F + 0.1 * i, "pr": 0.5, "re": 0.5}}}
        for i, item in enumerate(payload)
    ]
    with open(out_path, "w") as f:
        json.dump(results, f)


def main():
    argv = sys.argv[1:]
    if "-stdio" in argv:
        meteor(argv)
    elif "edu.stanford.nlp.process.PTBTokenizer" in argv:
        ptb(argv)
    elif "-out" in argv:
        spice(argv)
    else:
        sys.stderr.write(f"fake_java: unrecognized argv {argv}\n")
        sys.exit(2)


if __name__ == "__main__":
    main()
