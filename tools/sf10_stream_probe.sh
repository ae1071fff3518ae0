#!/bin/bash
# Quiet-box sf10 streaming attribution (VERDICT r13 #3): replay each of
# the four streaming ops over /tmp/sf10 events as a single-op
# AvailableNow query via graft.StreamProbe — one fresh JVM per op, no
# batch board warm in the session — and record rows/s + loadavg into
# /tmp/sf10_probe_rates.json (merged into BENCH_PROBES_r14.json by
# tools/probes_update.py).
#
# Usage: tools/sf10_stream_probe.sh [sfDir] [outJson]
set -e
cd /root/repo
SF=${1:-/tmp/sf10}
OUT=${2:-/tmp/sf10_probe_rates.json}
echo "{\"method\": \"tools/run.sh graft.StreamProbe $SF <op> 1 1 - one fresh JVM per op, single AvailableNow batch, noop sink\", \"sf_dir\": \"$SF\", \"loadavg_at_start\": [$(cut -d' ' -f1-3 /proc/loadavg | tr ' ' ',')], \"utc\": \"$(date -u +%FT%TZ)\", \"commit\": \"$(git rev-parse HEAD)\", \"rates\": {" > "$OUT.tmp"
first=1
for op in cdc_pipeline snapshot_state txn_match range_join; do
  log=/tmp/sf10_probe_${op}.log
  SKIP_BUILD=1 SPARK_GRAFT_CPUS=32 SPARK_DRIVER_MEM=48g \
    tools/run.sh graft.StreamProbe "$SF" "$op" 1 1 > "$log" 2>&1 || true
  line=$(grep -oE "[0-9]+ rows in [0-9.]+ s = [0-9]+ rows/s" "$log" | tail -1)
  rows=$(echo "$line" | awk '{print $1}')
  sec=$(echo "$line" | awk '{print $4}')
  rps=$(echo "$line" | awk '{print $7}')
  [ -z "$rps" ] && { rows=0; sec=-1; rps=-1; }
  [ $first = 0 ] && echo "," >> "$OUT.tmp"
  first=0
  echo -n "\"stream_${op}\": {\"rows\": $rows, \"sec\": $sec, \"rows_per_sec\": $rps}" >> "$OUT.tmp"
  echo "[probe] $op: $rps rows/s"
done
echo "}, \"loadavg_at_end\": [$(cut -d' ' -f1-3 /proc/loadavg | tr ' ' ',')]}" >> "$OUT.tmp"
python3 -c "import json,sys; json.dump(json.load(open('$OUT.tmp')), open('$OUT','w'), indent=1)" && rm "$OUT.tmp"
echo "wrote $OUT"
