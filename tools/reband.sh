#!/bin/bash
# Auto-refresh stale solo bands (r10 verdict #4): band_check exit 2 means
# some query's in-suite time fell BELOW its band's solo minimum — the code
# got faster after banding and the band max no longer detects regressions.
# This re-runs SoloBands for exactly the stale queries and writes a merged
# band file (fresh entries replace stale ones, everything else carried
# over) as SOLO_BANDS_r<N>.jsonl for the CURRENT round.
#
# Usage: tools/reband.sh OUT [bench_jsonl] [bands_jsonl]
#   env: same as tools/solo_bands.sh
set -euo pipefail
cd "$(dirname "$0")/.."
out=$1; shift || true

stale=$(python3 tools/band_check.py --stale-only "$@")
if [ -z "$stale" ]; then
  echo "reband: no stale bands"
  exit 0
fi
echo "reband: refreshing stale bands:" $stale
tools/solo_bands.sh /tmp/reband_fresh.jsonl $stale

# merge: freshest entry per query wins; order = old file order + new names
python3 - "$out" /tmp/reband_fresh.jsonl <<'EOF'
import json, sys, glob
out, fresh_f = sys.argv[1], sys.argv[2]
old_f = sorted(glob.glob("SOLO_BANDS_r*.jsonl"))[-1]
fresh = {json.loads(l)["q"]: l.strip() for l in open(fresh_f) if l.strip()}
lines = []
for l in open(old_f):
    q = json.loads(l)["q"]
    lines.append(fresh.pop(q, l.strip()))
lines += list(fresh.values())
with open(out, "w") as w:
    w.write("\n".join(lines) + "\n")
print(f"reband: wrote {out} ({len(lines)} bands, base {old_f})")
EOF
