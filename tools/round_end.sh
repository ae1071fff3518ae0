#!/bin/bash
# Round-end artifact regeneration (VERDICT r12 #4): the driver's
# regenerated artifacts have repeatedly shipped with self-evidencing
# fields stripped (no commit/UTC stamps, BENCH parsed:null + truncated
# tail). This writes the BUILDER editions — full parsed data, stamped —
# so the committed tree carries them regardless of what the driver
# overwrites afterwards.
#
#   LEAKCHECK.json        — tools/leakcheck.py (stamped, round derived)
#   BENCH_r<N>.json       — the sf0_1 tier of BENCH_LADDER_r<N>.json,
#                           full per-query map + provenance
#   CORRECTNESS_r<N>.json — fresh sf0.01 Verify + DuckDB compare via
#                           tools/check.py --json (stamped)
#
# Usage: tools/round_end.sh [N]   (default: newest ladder round)
set -e
cd /root/repo
N=${1:-$(ls BENCH_LADDER_r*.json | sed 's/.*_r0*\([0-9]*\).json/\1/' | sort -n | tail -1)}
python3 tools/leakcheck.py
python3 - "$N" <<'EOF'
import json, sys
n = int(sys.argv[1])
lad = json.load(open(f"BENCH_LADDER_r{n:02d}.json"))
t = lad["sf0_1"]
out = {"n": n, "cpus": 32, "sf": 0.1,
       "metric": "total", "value": t["value"], "unit": "sec",
       "queries": t["queries"],
       "commit": t["commit"], "measured_utc": t["measured_utc"],
       "loadavg": t["loadavg"], "writer": "tools/round_end.sh"}
if "streaming" in t:
    out["streaming"] = t["streaming"]
if "noise" in t:
    out["noise"] = t["noise"]
json.dump(out, open(f"BENCH_r{n:02d}.json", "w"), indent=1)
print(f"wrote BENCH_r{n:02d}.json from ladder sf0_1 ({t['value']}s)")
EOF
rm -rf /tmp/verify_round_end
SKIP_BUILD=${SKIP_BUILD:-0} tools/run.sh graft.Verify \
  /root/testdata/sf0.01 /tmp/verify_round_end \
  > /tmp/verify_round_end.log 2>&1 \
  || { tail -20 /tmp/verify_round_end.log; exit 1; }
python3 tools/check.py /root/testdata/sf0.01 /tmp/verify_round_end \
  --json "CORRECTNESS_r$(printf %02d "$N").json" | tail -2
