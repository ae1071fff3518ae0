#!/usr/bin/env python3
"""Merge a fresh graft.Bench JSON line into the round ladder.

Usage:
  ladder_update.py <tier-key> <bench-json-file-or-log>   # merge a tier
  ladder_update.py verify                                # recheck note

Self-evidencing rules (VERDICT r10 #1/#8 — two consecutive rounds
shipped a ladder note contradicting its own json):
  * every merged tier is stamped with the commit hash it measured, a
    UTC timestamp, and the 1/5/15-min load averages at merge time;
  * the top-level `note` is REGENERATED from the recorded data on
    every merge (tier totals, 100x growth audit, sf10 streaming
    rates) — it cannot disagree with the json by construction;
  * free-form analysis lives in `commentary` (a dict keyed by topic);
    the verifier REFUSES any commentary string that contains a
    "<number> s" total differing from every recorded tier total by
    >2% (a stale hand-written total is exactly the r9/r10 disease);
  * `ladder_update.py verify` recomputes the note from the data and
    exits nonzero on any mismatch — run it before committing.
Picks the LAST {"metric":"total"...} line from the input (the bench
prints it twice) and replaces the tier wholesale.
"""
import json
import os
import re
import statistics
import subprocess
import sys
import time

LADDER = "BENCH_LADDER_r15.json"
PREV_LADDER = "BENCH_LADDER_r14.json"
# round id derived from the ladder filename so it can't go stale again
# (the r14 ladder shipped stamped "round": 13 — VERDICT r14 wrong #2)
ROUND = int(re.search(r"_r(\d+)\.json$", LADDER).group(1))
TIERS = ["sf0_1", "sf1x", "sf10", "emb25", "skew01", "docs10"]


def last_json_line(path):
    line, load = None, None
    samples = {}
    pass_re = re.compile(r"\[bench\] pass \d+ (\S+)\s+(-?\d+\.\d+) s")
    with open(path) as f:
        for ln in f:
            if ln.startswith('{"metric":"total"'):
                line = ln
            elif ln.startswith("LOADAVG "):
                load = [float(x) for x in ln.split()[1:4]]
            else:
                m = pass_re.search(ln)
                if m:
                    samples.setdefault(m.group(1), []).append(
                        float(m.group(2)))
    if line is None:
        raise SystemExit(f"no bench JSON line in {path}")
    return json.loads(line), load, samples


def noise_floor(samples):
    """Per-cell noise record (VERDICT r12 #5): passes run, min, median.
    median - min IS the recorded spread; a round-over-round delta
    smaller than either round's spread is noise-class, not a finding."""
    out = {}
    for q, ss in samples.items():
        ok = [s for s in ss if s >= 0]
        if ok:
            out[q] = {"passes": len(ss), "min": round(min(ok), 3),
                      "median": round(statistics.median(ok), 3)}
    return out


def compose_note(d):
    """The note, derived ONLY from the recorded tiers."""
    parts = []
    totals = ", ".join(f"{t} {d[t]['value']:.1f} s"
                       for t in TIERS if t in d)
    parts.append(f"quiet-box totals at {d.get('commit', '?')[:9]}: {totals}")
    if "sf0_1" in d and "sf10" in d:
        g = d["sf10"]["value"] / d["sf0_1"]["value"]
        parts.append(f"100x fact data -> {g:.2f}x total wall")
        viol = d.get("growth_audit_100x", {}).get(
            "rule_10x_per_10x_violations", [])
        parts.append(f"{len(viol)} 10x-per-10x violations")
    st = d.get("sf10", {}).get("streaming")
    if st:
        rates = [v.get("rows_per_sec") for v in st.values()
                 if isinstance(v, dict) and v.get("rows_per_sec")]
        if rates:
            parts.append(
                f"sf10 streaming {min(rates)/1e6:.2f}-{max(rates)/1e6:.2f}M rows/s "
                f"across {len(rates)} ops")
    return "; ".join(parts)


def growth_audit(d):
    if "sf0_1" not in d or "sf10" not in d:
        return
    lo, hi = d["sf0_1"]["queries"], d["sf10"]["queries"]
    shared = [q for q in hi if q in lo and lo[q] > 0 and hi[q] > 0]
    growth = sorted(((q, round(hi[q] / lo[q], 1)) for q in shared),
                    key=lambda kv: -kv[1])
    d["growth_audit_100x"] = {
        "total_growth": round(d["sf10"]["value"] / d["sf0_1"]["value"], 2),
        "worst": [{"query": q, "growth": g} for q, g in growth[:10]],
        "rule_10x_per_10x_violations": [q for q, g in growth if g > 100],
    }


def check_commentary(d):
    """A commentary total that matches no recorded tier total is stale."""
    tier_totals = [d[t]["value"] for t in TIERS if t in d]
    bad = []
    for key, text in d.get("commentary", {}).items():
        for m in re.finditer(r"(\d+(?:\.\d+)?)\s*s\b", str(text)):
            v = float(m.group(1))
            if v < 30:  # per-query numbers are fine; police tier totals
                continue
            if not any(abs(v - t) / t <= 0.02 for t in tier_totals):
                bad.append(f"commentary[{key}]: '{m.group(0)}' matches no "
                           f"recorded tier total {tier_totals}")
    return bad


def noise_class_report(d):
    """Round-over-round deltas smaller than the recorded spread of
    either round are noise-class — list them so they stop consuming
    judge/builder attention (VERDICT r12 #5)."""
    try:
        with open(PREV_LADDER) as f:
            prev = json.load(f)
    except FileNotFoundError:
        return {}
    report = {}
    for t in TIERS:
        if t not in d or t not in prev:
            continue
        cur_q, prev_q = d[t]["queries"], prev[t]["queries"]
        cur_noise = d[t].get("noise", {})
        prev_noise = prev[t].get("noise", {})
        cls = []
        for q in sorted(set(cur_q) & set(prev_q)):
            delta = cur_q[q] - prev_q[q]
            spread = max(
                cur_noise.get(q, {}).get("median", cur_q[q]) - cur_q[q],
                prev_noise.get(q, {}).get("median", prev_q[q]) - prev_q[q])
            if delta != 0 and abs(delta) <= spread:
                cls.append(q)
        if cls:
            report[t] = cls
    return report


def verify():
    with open(LADDER) as f:
        d = json.load(f)
    errs = []
    if d.get("note") != compose_note(d):
        errs.append("note does not equal compose_note(data) — regenerate")
    errs += check_commentary(d)
    for t in TIERS:
        if t in d:
            qsum = sum(d[t]["queries"].values())
            if abs(qsum - d[t]["value"]) / d[t]["value"] > 0.01:
                errs.append(f"{t}: query sum {qsum:.1f} != value {d[t]['value']}")
            for k in ("commit", "measured_utc", "loadavg"):
                if k not in d[t]:
                    errs.append(f"{t}: missing provenance field {k}")
    if errs:
        print("\n".join(errs))
        sys.exit(1)
    nc = noise_class_report(d)
    for t, qs in nc.items():
        print(f"noise-class vs {PREV_LADDER} [{t}]: {len(qs)} cells "
              f"whose delta is within the recorded spread: "
              f"{', '.join(qs[:12])}{'…' if len(qs) > 12 else ''}")
    print("ladder note, totals and provenance are consistent")


def main():
    if sys.argv[1] == "verify":
        return verify()
    tier, src = sys.argv[1], sys.argv[2]
    bench, run_load, samples = last_json_line(src)
    commit = subprocess.check_output(
        ["git", "rev-parse", "HEAD"]).decode().strip()
    if subprocess.run(["git", "diff", "--quiet", "HEAD", "--",
                       "src", "build.sbt"]).returncode != 0:
        commit += "+dirty"
    try:
        with open(LADDER) as f:
            d = json.load(f)
    except FileNotFoundError:
        d = {}
    d["round"] = ROUND
    entry = {"value": bench["value"], "unit": "sec",
             "commit": commit,
             "measured_utc": time.strftime("%Y-%m-%dT%H:%M:%SZ",
                                           time.gmtime()),
             # run-end load (a LOADAVG line in the bench log) beats
             # merge-time load as evidence the RUN was quiet
             "loadavg": run_load or [round(x, 2) for x in os.getloadavg()],
             "loadavg_source": "run-end" if run_load else "merge-time",
             "queries": bench["queries"]}
    if samples:
        entry["noise"] = noise_floor(samples)
    if "streaming" in bench:
        entry["streaming"] = bench["streaming"]
    d[tier] = entry
    d["commit"] = commit
    growth_audit(d)
    d["note"] = compose_note(d)
    bad = check_commentary(d)
    if bad:
        raise SystemExit("stale commentary refused:\n" + "\n".join(bad))
    with open(LADDER, "w") as f:
        json.dump(d, f, indent=1)
    print(f"{tier}: total={bench['value']}s, {len(bench['queries'])} queries, "
          f"commit {commit[:9]}, loadavg {entry['loadavg']}")


if __name__ == "__main__":
    main()
