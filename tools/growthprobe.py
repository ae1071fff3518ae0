#!/usr/bin/env python3
"""Scaling-exponent probes (VERDICT r11 mandate #8): make the three
most load-bearing SURVEY §5 scale claims RUNNABLE by fitting a growth
exponent per family from measured wall times across data tiers.

  families (claim -> representative queries -> tiers):
    dedup-shuffle   "banded/prefix-filtered near-dup never goes
                    quadratic; pair volume scales ~linearly with docs"
                    -> dedup_minhash_lsh, dedup_ngram_jaccard,
                       dedup_containment, dedup_lines
                    -> docs tiers: sf0.1 (1x docs) vs docs10 (10x,
                       token-salted so cross-replica pairs are zero)
    codec-fusion    "the codec family is row-local fused stages -
                    linear in rows, no shuffle beyond the scan"
                    -> codec_canal_json, codec_canal_decode,
                       codec_debezium, codec_open_wire_bytes
                    -> fact tiers: sf0.1 (100k events) vs sf1x (1M)
                       vs sf10 (10M)
    eventstore-sort "the A2 keyed-sort class is n log n in events
                    with a fixed shuffle count"
                    -> cdc_eventstore_key, cdc_event_sort,
                       cdc_event_seq_check
                    -> fact tiers as above

  exponent = log(t_hi / t_lo) / log(scale_hi / scale_lo), fitted by
  least squares over all recorded tiers. exponent <= ~1.15 reads as
  linear (constant factors + n log n sort terms land ~1.0-1.1);
  >= 1.5 at 10-100x means the plan will not survive the next 10x.

Each family runs as ONE graft.Bench invocation per tier (interleaved
passes, min-of-passes — the bench's own noise discipline) on an
otherwise idle box. Usage:

  tools/growthprobe.py run <outJson>
"""
import json
import math
import os
import subprocess
import sys
import time

FAMILIES = {
    "dedup_shuffle": {
        "claim": ("banded near-dup stays ~linear in docs: LSH bucket "
                  "joins + two-regime containment, never all-pairs"),
        "queries": ["dedup_minhash_lsh", "dedup_ngram_jaccard",
                    "dedup_containment", "dedup_lines"],
        "tiers": [("/root/testdata/sf0.1", 1.0), ("/tmp/docs10", 10.0)],
    },
    "codec_fusion": {
        "claim": ("the codec family is row-local fused codegen - "
                  "linear in rows, zero shuffle beyond the scan"),
        "queries": ["codec_canal_json", "codec_canal_decode",
                    "codec_debezium", "codec_open_wire_bytes"],
        "tiers": [("/root/testdata/sf0.1", 1.0), ("/tmp/sf1x", 10.0),
                  ("/tmp/sf10", 100.0)],
    },
    "eventstore_sort": {
        "claim": ("the A2 keyed-sort class (eventstore key render + "
                  "sort, seq check) is n log n with a fixed shuffle "
                  "count"),
        "queries": ["cdc_eventstore_key", "cdc_event_sort",
                    "cdc_event_seq_check"],
        "tiers": [("/root/testdata/sf0.1", 1.0), ("/tmp/sf1x", 10.0),
                  ("/tmp/sf10", 100.0)],
    },
}


def bench(tier_dir, queries):
    env = dict(os.environ, SKIP_BUILD="1", SPARK_GRAFT_SF_DIR=tier_dir,
               SPARK_GRAFT_CPUS="32", SPARK_DRIVER_MEM="48g",
               SPARK_GRAFT_BENCH_STREAMING="0")
    r = subprocess.run(["tools/run.sh", "graft.Bench"] + queries,
                       cwd="/root/repo", env=env,
                       capture_output=True, text=True)
    line = next((l for l in reversed(r.stdout.splitlines())
                 if l.startswith('{"metric"')), None)
    if line is None:
        raise SystemExit(f"no bench line for {tier_dir}:\n{r.stderr[-2000:]}")
    return json.loads(line)["queries"]


def fit_exponent(points):
    """least-squares slope of log t vs log scale."""
    xs = [math.log(s) for s, _ in points]
    ys = [math.log(t) for _, t in points]
    n = len(xs)
    mx, my = sum(xs) / n, sum(ys) / n
    denom = sum((x - mx) ** 2 for x in xs)
    if denom == 0:
        return None
    return sum((x - mx) * (y - my) for x, y in zip(xs, ys)) / denom


def main():
    out_json = sys.argv[2] if len(sys.argv) > 2 else "GROWTH_PROBES.json"
    commit = subprocess.check_output(
        ["git", "rev-parse", "HEAD"]).decode().strip()
    doc = {"round": 12, "commit": commit,
           "measured_utc": time.strftime("%Y-%m-%dT%H:%M:%SZ",
                                         time.gmtime()),
           "loadavg_at_start": [round(x, 2) for x in os.getloadavg()],
           "method": ("per family: one graft.Bench run per tier "
                      "(interleaved passes, min), exponent = "
                      "least-squares slope of log(sec) vs log(scale); "
                      "docs tiers are token-salted so cross-replica "
                      "near-dup pairs are structurally zero"),
           "families": {}}
    for fam, spec in FAMILIES.items():
        tiers = {}
        for tier_dir, scale in spec["tiers"]:
            print(f"[growth] {fam}: {tier_dir} (scale {scale}x)")
            sys.stdout.flush()
            tiers[tier_dir] = {"scale": scale,
                               "queries": bench(tier_dir, spec["queries"])}
        per_q = {}
        for q in spec["queries"]:
            pts = [(t["scale"], t["queries"][q]) for t in tiers.values()
                   if t["queries"].get(q, -1) > 0]
            per_q[q] = {
                "seconds_by_scale": {str(s): round(v, 3) for s, v in pts},
                "exponent": (round(fit_exponent(pts), 3)
                             if len(pts) >= 2 else None)}
        doc["families"][fam] = {"claim": spec["claim"], "tiers_run":
                                {d: t["scale"] for d, t in tiers.items()},
                                "queries": per_q}
        with open(out_json, "w") as f:
            json.dump(doc, f, indent=1)
    doc["loadavg_at_end"] = [round(x, 2) for x in os.getloadavg()]
    with open(out_json, "w") as f:
        json.dump(doc, f, indent=1)
    print(f"wrote {out_json}")


if __name__ == "__main__":
    main()
