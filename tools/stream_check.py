#!/usr/bin/env python3
"""Streaming throughput regression gate: every tag in the NEWEST
STREAM_METRICS jsonl must hold >= 50% of the rows/sec it recorded in the
PREVIOUS round's committed artifact (micro-batch throughput is noisy
run-to-run — r9 recorded 48.8k-145.3k rows/sec across tags — so the gate
catches a halving, i.e. a real state/shuffle regression in a stateful
operator, not scheduler jitter).

Usage: tools/stream_check.py [current jsonl] [previous jsonl]
With no args: the two newest STREAM_METRICS_r*.jsonl by round number.
Exit 1 on any regression; exit 0 (with a note) when only one file exists
yet (first round with the artifact).
"""
import json, sys, glob, re


def load(path):
    out = {}
    for line in open(path):
        line = line.strip()
        if line:
            r = json.loads(line)
            out[r["tag"]] = r["rows_per_sec"]
    return out


if len(sys.argv) > 2:
    cur_f, prev_f = sys.argv[1], sys.argv[2]
else:
    files = sorted(glob.glob("STREAM_METRICS_r*.jsonl"),
                   key=lambda f: int(re.search(r"_r(\d+)", f).group(1)))
    if not files:
        sys.exit("usage: tools/stream_check.py [current jsonl] [previous jsonl]\n"
                 "no STREAM_METRICS_r*.jsonl in the current directory")
    if len(files) == 1:
        print(f"stream_check: only {files[0]} exists — nothing to compare, pass")
        sys.exit(0)
    cur_f, prev_f = files[-1], files[-2]

cur, prev = load(cur_f), load(prev_f)
bad = 0
for tag in sorted(prev):
    if tag not in cur:
        print(f"SKIP {tag}: not in {cur_f}")
        continue
    floor = prev[tag] * 0.5
    verdict = "OVER" if cur[tag] < floor else "ok"
    if verdict == "OVER":
        bad += 1
    print(f"{verdict:4s} {tag:22s} now={cur[tag]:10.1f} rows/s "
          f"prev={prev[tag]:10.1f} floor={floor:10.1f}")
print(f"\n{bad} regression(s) — {cur_f} vs {prev_f}")
sys.exit(1 if bad else 0)
