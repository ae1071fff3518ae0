#!/usr/bin/env python3
"""Generate BENCH_PROBES_r12.json FROM recorded data (the ladder and
the r10/r11 artifacts) — the ladder_update.py note-from-data
discipline applied to the probe artifact.

Sections:
  growth_exponents       (mandate #8) fitted scaling exponents for the
                         three most load-bearing SURVEY §5 claims,
                         computed from the r12 ladder's own tiers:
                         exponent = log(t_hi/t_lo) / log(scale_hi/lo).
                         docs tiers scale docs 10x (token-salted, so
                         near-dup pair volume scales linearly by
                         construction); fact tiers scale events 100x.
  streaming_smoke        (mandate #6) sf0.1 + sf10 streaming rates at
                         HEAD vs the r10/r11 recorded rates, with the
                         run-end loadavg of each measurement.
  fix_evidence           r12 per-query ladder deltas for the three
                         expression-level fixes this round shipped.

Usage: tools/probes_update.py
"""
import json
import math
import os
import subprocess
import time

L12 = json.load(open("BENCH_LADDER_r12.json"))
L11 = json.load(open("BENCH_LADDER_r11.json"))
L10 = json.load(open("BENCH_LADDER_r10.json"))

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
        "tiers": [("sf0_1", 1.0), ("sf10", 100.0)],
        "queries": ["codec_canal_json", "codec_canal_decode",
                    "codec_debezium", "codec_open_wire_bytes",
                    "codec_checksum", "codec_csv"],
    },
    "eventstore_sort": {
        "claim": ("the A2 keyed-sort class (eventstore key render + "
                  "sort, seq check) is n log n with a fixed shuffle "
                  "count (SURVEY §5 eventstore sort)"),
        "tiers": [("sf0_1", 1.0), ("sf10", 100.0)],
        "queries": ["cdc_eventstore_key", "cdc_event_sort",
                    "cdc_event_seq_check"],
    },
}


def exponent(points):
    pts = [(s, t) for s, t in points if t and t > 0]
    if len(pts) < 2:
        return None
    xs = [math.log(s) for s, _ in pts]
    ys = [math.log(t) for _, t in pts]
    n, mx, my = len(xs), sum(xs) / len(xs), sum(ys) / len(ys)
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
                v = L12.get(tier, {}).get("queries", {}).get(q)
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
        return {k: v.get("rows_per_sec") for k, v in st.items()}
    return {
        "sf0_1_head": rates(L12.get("sf0_1", {})),
        "sf10_head": rates(L12.get("sf10", {})),
        "sf10_r10": rates(L10.get("sf10", {})),
        "loadavg_sf0_1_head": L12.get("sf0_1", {}).get("loadavg"),
        "loadavg_sf10_head": L12.get("sf10", {}).get("loadavg"),
    }


def fix_evidence():
    def delta(tier, q, prior):
        now = L12.get(tier, {}).get("queries", {}).get(q)
        was = prior.get(tier, {}).get("queries", {}).get(q)
        return {"r12": now, "prior": was, "tier": tier}
    return {
        "canal_decode_single_pass_scanner": {
            "what": ("r11 Wrong #2: six get_json_object probes re-parsed "
                     "the canal payload per extracted field; replaced by "
                     "the native CanalScan single-pass scanner (commit "
                     "9ff0a67)"),
            "sf0_1": delta("sf0_1", "codec_canal_decode", L11),
            "mandate_target": "sf0.1 <= ~2.2 s, sf10 <= 12.8 s"},
        "embedding_quantize_native_loop": {
            "what": ("the unrolled 64-column projection generated a "
                     "20,382-bytecode method — over the 8000-byte JIT "
                     "ceiling, stage ran interpreted; one native loop "
                     "(graft_quantize) emits struct(codes, max_err), "
                     "2,998 bytecodes after (caught by the new "
                     "JitCeilingSpec lint, not by benching)"),
            "emb25": delta("emb25", "embedding_quantize", L10),
            "sf0_1": delta("sf0_1", "embedding_quantize", L11)},
        "claim_check_single_render": {
            "what": ("A31 rendered the canal value twice per inline row "
                     "(octet_length + conditional otherwise branch); "
                     "single named-column render, plan-contract-pinned"),
            "sf0_1": delta("sf0_1", "sink_claim_check", L11),
            "sf10": delta("sf10", "sink_claim_check", L10)},
    }


def main():
    commit = subprocess.check_output(
        ["git", "rev-parse", "HEAD"]).decode().strip()
    doc = {"round": 12, "commit_at_probe": commit,
           "timestamp_utc": time.strftime("%Y-%m-%dT%H:%M:%SZ",
                                          time.gmtime()),
           "loadavg_at_write": [round(x, 2) for x in os.getloadavg()],
           "derivation": ("every number below is read from "
                          "BENCH_LADDER_r12.json (and the r10/r11 "
                          "ladders for priors) by tools/probes_update.py "
                          "— regenerate, don't hand-edit"),
           "growth_exponents": growth(),
           "streaming_smoke": streaming(),
           "fix_evidence": fix_evidence()}
    with open("BENCH_PROBES_r12.json", "w") as f:
        json.dump(doc, f, indent=1)
    for fam, g in doc["growth_exponents"].items():
        print(fam, g["family_max_exponent"], g["verdict"])


if __name__ == "__main__":
    main()
