#!/usr/bin/env python3
"""Executable form of the round-9 measurement invariant: no query's
in-suite bench time may exceed its committed solo repeat-band by >30%
(suite-position noise must never read as a plan regression — r8 had three
phantom regressions adjudicated by hand; this makes the adjudication a
one-command check).

Usage: tools/band_check.py [BENCH_LOCAL jsonl] [SOLO_BANDS jsonl]
Exit 1 if any banded query is over; prints a per-query verdict either way.

Under SPARK_GRAFT_REPEAT>1 the bench emits one line per repeat as
"name#i" — ALL repeats are collected and the MIN is adjudicated against
the band (a single tail-latency repeat is exactly the suite-position
noise the band exists to absorb; the min is the query's demonstrated
in-suite capability).
"""
import json, sys, glob


def newest(pattern, what):
    hits = sorted(glob.glob(pattern))
    if not hits:
        sys.exit(f"usage: tools/band_check.py [BENCH_LOCAL jsonl] [SOLO_BANDS jsonl]\n"
                 f"no {what} file matches {pattern!r} in the current directory")
    return hits[-1]


bench = sys.argv[1] if len(sys.argv) > 1 else newest("BENCH_LOCAL_r*.jsonl", "bench")
bands = sys.argv[2] if len(sys.argv) > 2 else newest("SOLO_BANDS_r*.jsonl", "bands")

qs = {}  # base query name -> list of repeat times
for line in open(bench):
    r = json.loads(line)
    if "q" in r and not r["q"].startswith("_warm"):
        qs.setdefault(r["q"].split("#")[0], []).append(r["sec"])

bad = 0
for line in open(bands):
    b = json.loads(line)
    reps = qs.get(b["q"])
    if not reps:
        print(f"SKIP {b['q']}: not in {bench}")
        continue
    insec = min(reps)
    limit = b["max"] * 1.3
    verdict = "OVER" if insec > limit else "ok"
    if verdict == "OVER":
        bad += 1
    rep = f" (min of {len(reps)})" if len(reps) > 1 else ""
    print(f"{verdict:4s} {b['q']:26s} in-suite={insec:6.2f}s{rep} "
          f"band=[{b['min']:.2f},{b['max']:.2f}] limit={limit:.2f}")
print(f"\n{bad} violation(s) — {bench} vs {bands}")
sys.exit(1 if bad else 0)
