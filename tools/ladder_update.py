#!/usr/bin/env python3
"""Merge a fresh graft.Bench JSON line into BENCH_LADDER_r10.json.

Usage: ladder_update.py <tier-key> <bench-json-file-or-log>

Picks the LAST {"metric":"total"...} line from the input (the bench
prints it twice), replaces the tier's queries/value wholesale, and
recomputes the 100x growth audit when both sf0_1 and sf10 exist.
"""
import json
import re
import sys

LADDER = "BENCH_LADDER_r10.json"


def last_json_line(path):
    line = None
    with open(path) as f:
        for ln in f:
            if ln.startswith('{"metric":"total"'):
                line = ln
    if line is None:
        raise SystemExit(f"no bench JSON line in {path}")
    return json.loads(line)


def main():
    tier, src = sys.argv[1], sys.argv[2]
    bench = last_json_line(src)
    with open(LADDER) as f:
        d = json.load(f)
    entry = {"value": bench["value"], "unit": "sec",
             "queries": bench["queries"]}
    if "streaming" in bench:
        entry["streaming"] = bench["streaming"]
    d[tier] = entry
    if "sf0_1" in d and "sf10" in d:
        lo, hi = d["sf0_1"]["queries"], d["sf10"]["queries"]
        shared = [q for q in hi if q in lo and lo[q] > 0 and hi[q] > 0]
        growth = sorted(((q, round(hi[q] / lo[q], 1)) for q in shared),
                        key=lambda kv: -kv[1])
        d["growth_audit_100x"] = {
            "total_growth": round(d["sf10"]["value"] / d["sf0_1"]["value"], 2),
            "worst": [{"query": q, "growth": g} for q, g in growth[:10]],
            "rule_10x_per_10x_violations":
                [q for q, g in growth if g > 100],
        }
    with open(LADDER, "w") as f:
        json.dump(d, f, indent=1)
    print(f"{tier}: total={bench['value']}s, {len(bench['queries'])} queries")


if __name__ == "__main__":
    main()
