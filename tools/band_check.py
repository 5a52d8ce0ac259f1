#!/usr/bin/env python3
"""Executable form of the round-9 measurement invariant: no query's
in-suite bench time may exceed its committed solo repeat-band by >30%
(suite-position noise must never read as a plan regression — r8 had three
phantom regressions adjudicated by hand; this makes the adjudication a
one-command check).

Usage: tools/band_check.py [BENCH_LOCAL jsonl] [SOLO_BANDS jsonl]
Exit 1 if any banded query is over; prints a per-query verdict either way.
"""
import json, sys, glob

bench = sys.argv[1] if len(sys.argv) > 1 else sorted(glob.glob("BENCH_LOCAL_r*.jsonl"))[-1]
bands = sys.argv[2] if len(sys.argv) > 2 else sorted(glob.glob("SOLO_BANDS_r*.jsonl"))[-1]

qs = {}
for line in open(bench):
    r = json.loads(line)
    if "q" in r and not r["q"].startswith("_warm"):
        qs[r["q"]] = r["sec"]

bad = 0
for line in open(bands):
    b = json.loads(line)
    insec = qs.get(b["q"])
    if insec is None:
        print(f"SKIP {b['q']}: not in {bench}")
        continue
    limit = b["max"] * 1.3
    verdict = "OVER" if insec > limit else "ok"
    if verdict == "OVER":
        bad += 1
    print(f"{verdict:4s} {b['q']:26s} in-suite={insec:6.2f}s "
          f"band=[{b['min']:.2f},{b['max']:.2f}] limit={limit:.2f}")
print(f"\n{bad} violation(s) — {bench} vs {bands}")
sys.exit(1 if bad else 0)
