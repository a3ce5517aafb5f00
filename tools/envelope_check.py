#!/usr/bin/env python3
"""Compare graft.Bench output against the anchored 2x envelopes.

Usage: python3 tools/envelope_check.py BENCH_LOG_OR_JSON...

Each argument is a file containing (anywhere in it, e.g. raw sbt
stdout) the one-line Bench JSON contract ({"metric":...}); the LAST
such line in each file is used. Prints a per-query table when a file
contains breaches, and a one-line verdict per file. Exit code 1 iff
any file breaches.

Anchors live in tools/anchors.json — the operational mirror of
BASELINE.md (which stays the adjudication record: before treating a
breach as a regression, read the host-generation and contention notes
there and check the per-pass samples in bench_detail.json for
flatness). Headline queries missing from anchors.json are reported as
UNANCHORED — add an anchor from >=2 cold driver-identical runs.
"""
import json
import os
import sys


def load_bench(path):
    line = None
    with open(path) as f:
        for l in f:
            # sbt prefixes program stdout with '[info] ' — find the
            # contract line anywhere in the line, not just at the start
            idx = l.find('{"metric"')
            if idx >= 0:
                line = l[idx:].strip()
    if line is None:
        raise SystemExit(f"{path}: no Bench contract line found")
    return json.loads(line)


def main(argv):
    here = os.path.dirname(os.path.abspath(__file__))
    with open(os.path.join(here, "anchors.json")) as f:
        anchors = {k: v for k, v in json.load(f).items()
                   if not k.startswith("_")}
    any_breach = False
    for path in argv:
        bench = load_bench(path)
        queries = bench.get("queries", {})
        breaches, unanchored = [], []
        for q, sec in queries.items():
            a = anchors.get(q)
            if a is None:
                unanchored.append(q)
            elif sec > 2 * a:
                breaches.append((q, sec, a))
        total = bench.get("value")
        anchored_sum = sum(anchors[q] for q in queries if q in anchors)
        ratio = (sum(s for q, s in queries.items() if q in anchors)
                 / anchored_sum) if anchored_sum else float("nan")
        verdict = "BREACH" if breaches else "ok"
        print(f"{path}: {len(queries)} queries, total {total}s, "
              f"aggregate {ratio:.2f}x of anchored sum -> {verdict}")
        for q, sec, a in sorted(breaches, key=lambda x: -x[1] / x[2]):
            print(f"  BREACH {q}: {sec:.3f}s vs anchor {a:.3f} "
                  f"(envelope {2*a:.3f}, {sec/a:.1f}x)")
        for q in unanchored:
            print(f"  UNANCHORED {q}: {queries[q]:.3f}s — add to tools/anchors.json")
        if bench.get("error"):
            print(f"  error field: {bench['error']}")
        any_breach |= bool(breaches)
    return 1 if any_breach else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
