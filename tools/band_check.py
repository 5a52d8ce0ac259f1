#!/usr/bin/env python3
"""Executable form of the round-9 measurement invariant: no query's
in-suite bench time may exceed its committed solo repeat-band by >30%
(suite-position noise must never read as a plan regression — r8 had three
phantom regressions adjudicated by hand; this makes the adjudication a
one-command check).

Usage: tools/band_check.py [BENCH_LOCAL jsonl] [SOLO_BANDS jsonl]
       tools/band_check.py --stale-only [...]   # print stale query names
Exit 1 if any banded query is over; exit 2 if none is over but some band
is STALE; prints a per-query verdict either way.

Under SPARK_GRAFT_REPEAT>1 the bench emits one line per repeat as
"name#i" — ALL repeats are collected and the MEDIAN is adjudicated
against the band (the min grew monotonically weaker as repeats rose — a
real regression passed if one repeat got lucky; the median still absorbs
single-repeat tail noise without becoming more permissive with more
repeats).

STALE detection (r10 verdict #5): a band is a regression detector only
while the code it measured is current. An in-suite median far BELOW the
band's solo floor means the query got faster after banding (tx_bpe_apply
read 1.34s against a [1.57, 1.80] band in r10) — the band max is then
meaningless as a ceiling. Stale bands are flagged for re-banding
(tools/reband.sh wires this into round_gate.sh).

The stale floor carries a 1/3 margin (vs the ceiling's 30%): in-suite
medians systematically run BELOW fresh solo floors (the suite's
long-lived JVM is C2-warmed across hundreds of queries; a fresh solo JVM
gets one sf0.001 pass + the IO preamble — measured r11: fn_json −25%,
tx_bpe_apply −31% against bands re-measured the SAME DAY), so only a
breach past the worst observed bias indicates a stale band rather than
measurement-context noise; an unmargined floor re-flags the
biggest-bias queries forever and loops the gate's reband step.
"""
import json, sys, glob

stale_only = "--stale-only" in sys.argv
argv = [a for a in sys.argv if a != "--stale-only"]


def newest(pattern, what):
    hits = sorted(glob.glob(pattern))
    if not hits:
        sys.exit(f"usage: tools/band_check.py [BENCH_LOCAL jsonl] [SOLO_BANDS jsonl]\n"
                 f"no {what} file matches {pattern!r} in the current directory")
    return hits[-1]


bench = argv[1] if len(argv) > 1 else newest("BENCH_LOCAL_r*.jsonl", "bench")
bands = argv[2] if len(argv) > 2 else newest("SOLO_BANDS_r*.jsonl", "bands")

qs = {}  # base query name -> list of repeat times
for line in open(bench):
    r = json.loads(line)
    if "q" in r and not r["q"].startswith("_warm"):
        qs.setdefault(r["q"].split("#")[0], []).append(r["sec"])

bad, stale = 0, []
for line in open(bands):
    b = json.loads(line)
    reps = qs.get(b["q"])
    if not reps:
        if not stale_only:
            print(f"SKIP {b['q']}: not in {bench}")
        continue
    insec = sorted(reps)[len(reps) // 2]
    limit = b["max"] * 1.3
    if insec > limit:
        verdict = "OVER"
        bad += 1
    elif insec < b["min"] * 2 / 3:
        verdict = "STALE"
        stale.append(b["q"])
    else:
        verdict = "ok"
    if stale_only:
        continue
    rep = f" (med of {len(reps)})" if len(reps) > 1 else ""
    print(f"{verdict:5s} {b['q']:26s} in-suite={insec:6.2f}s{rep} "
          f"band=[{b['min']:.2f},{b['max']:.2f}] limit={limit:.2f}")

if stale_only:
    print("\n".join(stale))
    sys.exit(0)
print(f"\n{bad} violation(s), {len(stale)} stale band(s) — {bench} vs {bands}")
sys.exit(1 if bad else (2 if stale else 0))
