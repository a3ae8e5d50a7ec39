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
    stats_emitted = []
    for line in sys.stdin:
        line = line.rstrip("\n")
        if log:
            log.write(line + "\n")
            log.flush()
        if line.startswith("SCORE |||"):
            # stat string shaped like MeteorStats.toString(): a flat vector
            # of space-separated numbers (tstLen refLen matches ... chunks).
            # Embed the segment index + a content checksum so EVAL can verify
            # the adapter passed every stat back VERBATIM and IN ORDER.
            seg = len(stats_emitted)
            stat = f"{seg} {len(line.split())} {sum(map(ord, line)) % 9973} 1 0 0"
            stats_emitted.append(stat)
            sys.stdout.write(stat + "\n")
            sys.stdout.flush()
        elif line.startswith("EVAL |||"):
            got = [s.strip() for s in line.split("|||")[1:]]
            # transcript round-trip integrity: pycocoevalcap's protocol treats
            # stats as opaque — any reordering/mutation by the adapter breaks
            # the real jar, so the fake enforces byte-identity here
            assert got == stats_emitted, (got, stats_emitted)
            for i in range(len(stats_emitted)):
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
         "scores": {"All": {"f": SPICE_F + 0.1 * i, "pr": 0.5, "re": 0.5},
                    # per-category entries as the real jar emits them:
                    # a number where the category occurs, NaN elsewhere
                    # (JSON NaN, which the jar's gson serializer produces)
                    "Object": {"f": 0.5 + 0.1 * i, "pr": 0.5, "re": 0.5},
                    "Color": {"f": float("nan") if i == 0 else 0.8,
                              "pr": 0.5, "re": 0.5}}}
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
