#!/usr/bin/env python3
"""Generate BENCH_PROBES_r14.json FROM recorded data (the ladders) —
the ladder_update.py note-from-data discipline applied to the probe
artifact.

Sections:
  growth_exponents       fitted scaling exponents for the SURVEY §5
                         claim families, computed from the r14 ladder's
                         own tiers: exponent = log(t_hi/t_lo) /
                         log(scale_hi/lo), least squares over all
                         recorded tiers.
  streaming_smoke        sf0.1 + sf10 streaming rates at HEAD vs the
                         r10/r13 recorded rates, the *_mb multi-batch
                         smoke, and the r14 quiet-box StreamProbe runs
                         that attribute the r13 sf10 rate regression
                         (VERDICT r13 #3).
  mb_range_join          the r14 state-store attribution of the
                         multi-batch range-join cliff (VERDICT r13 #4):
                         per-batch state curve + the shuffle-partitions
                         A/B, hand-recorded from StreamProbe output.
  fix_evidence           r14 per-query ladder deltas + the emb25
                         signed-zero correctness catch.

Usage: tools/probes_update.py
"""
import json
import math
import os
import subprocess
import time

L14 = json.load(open("BENCH_LADDER_r14.json"))
L13 = json.load(open("BENCH_LADDER_r13.json"))
L12 = json.load(open("BENCH_LADDER_r12.json"))
L10 = json.load(open("BENCH_LADDER_r10.json"))

# Hand-recorded probe runs (graft.StreamProbe / quiet box), labeled as
# such in the artifact. Every number is pasted verbatim from a probe
# stdout; the probe command is recorded next to each block.
HAND_RECORDED = {
    "mb_range_join": {
        "method": ("tools/run.sh graft.StreamProbe /tmp/stream_sf0_1 "
                   "range_join 1 2 [parts] — the bench *_mb shape "
                   "batch-for-batch (8 ts-ordered slices, "
                   "maxFilesPerTrigger=2 -> 4 batches of 50k)"),
        "state_curve_parts32": [
            {"batch": 0, "rows": 50000, "state_rows_total": 9903,
             "updated": 9903, "removed": 0, "commit_ms_sum": 67802,
             "trigger_ms": 8998},
            {"batch": 1, "rows": 50000, "state_rows_total": 10686,
             "updated": 9982, "removed": 9199, "commit_ms_sum": 104104,
             "trigger_ms": 5289},
            {"batch": 2, "rows": 50000, "state_rows_total": 10715,
             "updated": 10055, "removed": 10026, "commit_ms_sum": 79812,
             "trigger_ms": 4572},
            {"batch": 3, "rows": 50000, "state_rows_total": 10777,
             "updated": 10085, "removed": 10023, "commit_ms_sum": 103334,
             "trigger_ms": 5019}],
        "ab_shuffle_partitions": {
            "parts32": {"total_sec": 31.16, "rows_per_sec": 6419},
            "parts8": {"total_sec": 13.84, "rows_per_sec": 14448,
                       "commit_ms_sum_range": [3387, 4277]}},
        "sf1x_10x_events_mb": {
            "method": ("same probe over /tmp/stream_sf1x (1M events, "
                       "8 ts-ordered slices, mfpt=2 -> 4 batches of "
                       "500k), parts=32"),
            "total_sec": 22.73, "rows_per_sec": 87988,
            "state_rows_peak": 99935, "state_rows_after_eviction": 3620,
            "commit_ms_sum_range": [64876, 85355],
            "conclusion": ("10x the events -> 13.7x the multi-batch "
                           "rate: the per-batch store-commit cost is "
                           "FLAT (~65-85 s summed, same as the 100k "
                           "replay) while batches are 10x larger, so "
                           "it amortizes exactly as predicted; state "
                           "stays bounded and eviction fires "
                           "(99.9k peak -> 3.6k after the watermark "
                           "passes the replicated window)")},
        "conclusion": (
            "state is BOUNDED and watermark eviction FIRES every batch "
            "(numRowsTotal plateaus at ~10.7k rows / 4 MB; removed ~= "
            "inserted from batch 1 on). The 4x single-vs-multi-batch "
            "rate gap is per-batch state-store COMMIT overhead: a "
            "symmetric hash join keeps 4 store instances per shuffle "
            "partition, each committing a delta file per micro-batch "
            "(32 partitions -> 128 tiny writes/batch = 67-104 s summed "
            "commitMs, ~3.3 s wall of each ~5 s trigger). Same replay "
            "at 8 partitions: 2.25x faster, identical state curve. At "
            "corpus scale batches are proportionally larger and the "
            "commit amortizes; on a real cluster size shuffle/state "
            "partitions to state volume, not the batch default."),
    },
    # Quiet-box single-op streaming rates at /tmp/sf10 via StreamProbe,
    # run AFTER the r14 oracle grind finished (loadavg at launch in
    # each block). Attribution experiment for VERDICT r13 #3: the
    # r10->r13 diff of the four streaming paths is near-empty
    # (CdcStream.pipeline gained an unused-by-default maxFilesPerTrigger
    # arg; Bench suite() is a semantically-identical refactor), so if
    # HEAD's quiet-box rates recover to ~r10 levels the r13 regression
    # was measurement environment, not code.
    # (quiet-box sf10 streaming rates are NOT hand-recorded: streaming()
    # pulls them live via fill_sf10_probe() below)
}


def fill_sf10_probe():
    p = "/tmp/sf10_probe_rates.json"
    if os.path.exists(p):
        return json.load(open(p))
    return {"status": "not yet recorded - run tools/sf10_stream_probe.sh"}


FAMILIES = {
    "dedup_shuffle": {
        "claim": ("banded near-dup stays ~linear in docs: LSH bucket "
                  "joins, two-regime containment, never all-pairs "
                  "(SURVEY §5 dedup shuffle volume)"),
        "tiers": [("sf0_1", 1.0), ("docs10", 10.0)],
        "queries": ["dedup_minhash_lsh", "dedup_ngram_jaccard",
                    "dedup_containment", "dedup_lines", "dedup_simhash"],
    },
    "codec_fusion": {
        "claim": ("the codec family is row-local fused codegen - "
                  "linear in rows, zero shuffle beyond the scan "
                  "(SURVEY §5 codec stage fusion)"),
        "tiers": [("sf0_1", 1.0), ("sf1x", 10.0), ("sf10", 100.0)],
        "queries": ["codec_canal_json", "codec_canal_decode",
                    "codec_debezium", "codec_open_wire_bytes",
                    "codec_checksum", "codec_csv"],
    },
    "eventstore_sort": {
        "claim": ("the A2 keyed-sort class (eventstore key render + "
                  "sort, seq check) is n log n with a fixed shuffle "
                  "count (SURVEY §5 eventstore sort)"),
        "tiers": [("sf0_1", 1.0), ("sf1x", 10.0), ("sf10", 100.0)],
        "queries": ["cdc_eventstore_key", "cdc_event_sort",
                    "cdc_event_seq_check"],
    },
    "corpus_grid": {
        "claim": ("the grid/vocab-bounded corpus ops (hashed-feature "
                  "DSIR, phrase mining, novelty) aggregate onto "
                  "dimension-scale frames - the corpus-scale work is "
                  "one explode + partial agg (r14 C85/C86)"),
        "tiers": [("sf0_1", 1.0), ("docs10", 10.0)],
        "queries": ["quality_dsir", "corpus_phrases", "ngram_novelty"],
    },
}


def exponent(points):
    pts = [(s, t) for s, t in points if t and t > 0]
    if len(pts) < 2:
        return None
    xs = [math.log(s) for s, _ in pts]
    ys = [math.log(t) for _, t in pts]
    mx, my = sum(xs) / len(xs), sum(ys) / len(ys)
    den = sum((x - mx) ** 2 for x in xs)
    return round(sum((x - mx) * (y - my)
                     for x, y in zip(xs, ys)) / den, 3) if den else None


def growth():
    out = {}
    for fam, spec in FAMILIES.items():
        per_q = {}
        for q in spec["queries"]:
            pts = []
            for tier, scale in spec["tiers"]:
                v = L14.get(tier, {}).get("queries", {}).get(q)
                if v and v > 0:
                    pts.append((scale, v))
            per_q[q] = {
                "seconds_by_scale": {str(s): v for s, v in pts},
                "exponent": exponent(pts)}
        exps = [v["exponent"] for v in per_q.values()
                if v["exponent"] is not None]
        out[fam] = {"claim": spec["claim"], "queries": per_q,
                    "family_max_exponent": max(exps) if exps else None,
                    "verdict": ("scale-safe (<=1.15 ~ linear/n log n)"
                                if exps and max(exps) <= 1.15 else
                                "REVIEW: super-linear growth measured"
                                if exps else "no data")}
    return out


def streaming():
    def rates(entry):
        st = entry.get("streaming") or {}
        return {k: {"rows_per_sec": v.get("rows_per_sec"),
                    "micro_batches": v.get("micro_batches")}
                for k, v in st.items()}
    return {
        "sf0_1_head": rates(L14.get("sf0_1", {})),
        "sf10_head": rates(L14.get("sf10", {})),
        "sf10_r13": rates(L13.get("sf10", {})),
        "sf10_r10": rates(L10.get("sf10", {})),
        "sf10_quiet_probe_head": fill_sf10_probe(),
        "note": ("*_mb keys are the multi-micro-batch smoke (sliced "
                 "events + maxFilesPerTrigger, >=3 batch boundaries). "
                 "sf10_quiet_probe_head is the r14 attribution "
                 "experiment: single-op AvailableNow replays of "
                 "/tmp/sf10 events on a quiet box via StreamProbe - "
                 "the code-path diff r10->HEAD is near-empty, so "
                 "quiet-box recovery to ~r10 rates attributes the r13 "
                 "regression to measurement environment (the r13 sf10 "
                 "ladder cell ran at loadavg 23.8 with the whole "
                 "235-query board warm in the same JVM)"),
        "loadavg_sf0_1_head": L14.get("sf0_1", {}).get("loadavg"),
        "loadavg_sf10_head": L14.get("sf10", {}).get("loadavg"),
    }


def fix_evidence():
    def cell(lad, tier, q):
        return lad.get(tier, {}).get("queries", {}).get(q)
    return {
        "emb25_signed_zero_catch": {
            "what": ("the r14 dense-tier oracle run (VERDICT r13 #1) "
                     "caught embedding_random_projection hash-diverging "
                     "at emb25 (50k vectors): a projection within 5e-5 "
                     "of zero rounds to -0.0 under DuckDB's binary "
                     "ROUND but +0.0 under Spark's decimal-string "
                     "route, so '%.4f' rendered '-0.0000' vs '0.0000' "
                     "inside the md5 digest. Invisible at sf0.1 (2k "
                     "vectors x 16 planes never landed a projection in "
                     "the window). Fixed by IEEE signed-zero "
                     "normalization (+ 0.0) on BOTH renderings; "
                     "re-verified hash-equal at emb25 and sf0.01."),
            "artifact": "CORRECTNESS_SF10_r14.json embedding_random_projection",
        },
        "sf0_1_noise_tail_recheck": {
            "what": ("VERDICT r13 #5: ~15 sf0.1 cells read 1.6-2.9x "
                     "over r12 with no plan change; the r13 board ran "
                     "passes=2 with medians 3-10x mins (dirty box). "
                     "r14 re-records at >=3 interleaved passes - the "
                     "cells below compare r14 vs the r13/r12 mins."),
            "cells": {q: {"r14": cell(L14, "sf0_1", q),
                          "r13": cell(L13, "sf0_1", q),
                          "r12": cell(L12, "sf0_1", q)}
                      for q in ["cdc_dispatcher_checkpoint",
                                "cdc_dispatcher_block",
                                "codec_canal_decode", "cdc_txn_match"]},
        },
        "mb_range_join_attribution": HAND_RECORDED["mb_range_join"],
    }


def main():
    commit = subprocess.check_output(
        ["git", "rev-parse", "HEAD"]).decode().strip()
    doc = {"round": 14, "commit_at_probe": commit,
           "timestamp_utc": time.strftime("%Y-%m-%dT%H:%M:%SZ",
                                          time.gmtime()),
           "loadavg_at_write": [round(x, 2) for x in os.getloadavg()],
           "derivation": ("every number below is read from "
                          "BENCH_LADDER_r14.json (r10/r12/r13 ladders "
                          "for priors) by tools/probes_update.py — "
                          "regenerate, don't hand-edit; the "
                          "mb_range_join and sf10_quiet_probe blocks "
                          "are hand-recorded StreamProbe runs, labeled "
                          "with their commands"),
           "growth_exponents": growth(),
           "streaming_smoke": streaming(),
           "fix_evidence": fix_evidence()}
    with open("BENCH_PROBES_r14.json", "w") as f:
        json.dump(doc, f, indent=1)
    for fam, g in doc["growth_exponents"].items():
        print(fam, g["family_max_exponent"], g["verdict"])


if __name__ == "__main__":
    main()
