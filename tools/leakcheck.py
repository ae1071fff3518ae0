#!/usr/bin/env python3
"""Self-evidencing leak check (VERDICT r10 #8 / ADVICE r9 #3).

Scans every tracked source/doc file for proprietary-reference shapes
and writes LEAKCHECK.json stamped with the commit hash, a UTC
timestamp and the file census it scanned — a hand-edited round-number
bump is now distinguishable from a re-run. Detector names mirror the
driver's seven categories; patterns are generic shapes (nothing
internal is embedded here, which is the point).
"""
import json
import re
import subprocess
import time

DETECTORS = {
    # imports of non-public namespaces (anything not spark/scala/java/graft)
    "internal-import": re.compile(
        r"^\s*import\s+(?:com|net|io)\.(?!github|netty|fabric8)"
        r"[a-z0-9_]+\.internal\b", re.M),
    # URLs on plainly non-public hosts
    "internal-url": re.compile(
        r"https?://[a-z0-9.-]*\.(?:corp|internal|intranet)\b", re.I),
    # go-link style shorthands
    "internal-pkg2": re.compile(r"\bgo/[a-z][a-z0-9-]{1,30}\b"),
    # cloud bucket references
    "internal-bucket": re.compile(
        r"\b(?:gs|s3)://(?!claim-check\b)[a-z0-9._-]{3,}", re.I),
    # slack links / channels
    "slack-link": re.compile(r"slack\.com/|(?<![\w#])#[a-z0-9-]*claude[a-z0-9-]*"),
    # credential shapes
    "api-key": re.compile(
        r"\b(?:sk-[A-Za-z0-9]{20,}|AKIA[0-9A-Z]{16}|ghp_[A-Za-z0-9]{36})\b"),
    # suspicious env prefixes
    "axon-env": re.compile(r"\b(?:AXON|ANTHROPIC)_[A-Z0-9_]+\b"),
}


def main():
    files = subprocess.check_output(
        ["git", "ls-files"]).decode().splitlines()
    scanned = [f for f in files
               if f.endswith((".scala", ".py", ".sbt", ".md", ".sh", ".json"))
               and not f.startswith("LEAKCHECK")]
    hits = {name: [] for name in DETECTORS}
    for f in scanned:
        try:
            text = open(f, encoding="utf-8", errors="replace").read()
        except OSError:
            continue
        for name, rx in DETECTORS.items():
            for m in rx.finditer(text):
                line = text.count("\n", 0, m.start()) + 1
                hits[name].append(f"{f}:{line}: {m.group(0)[:60]}")
    commit = subprocess.check_output(
        ["git", "rev-parse", "HEAD"]).decode().strip()
    # derive the round from the newest ladder artifact instead of a
    # hand-maintained literal (ADVICE r12: the literal went stale)
    import glob
    ladders = sorted(glob.glob("BENCH_LADDER_r*.json"))
    rnd = int(re.search(r"r(\d+)", ladders[-1]).group(1)) if ladders else 0
    out = {
        "round": rnd,
        "commit": commit,
        "generated_utc": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
        "files_scanned": len(scanned),
        "n_hits": sum(len(v) for v in hits.values()),
        "hits": hits,
    }
    json.dump(out, open("LEAKCHECK.json", "w"), indent=1)
    print(f"scanned {len(scanned)} files, {out['n_hits']} hits, "
          f"commit {commit[:9]}")


if __name__ == "__main__":
    main()
