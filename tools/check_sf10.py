#!/usr/bin/env python3
"""Corpus-tier oracle check (VERDICT r11 mandate #3): run the codec
family (or any named queries) through Verify at a big tier and compare
against the DuckDB oracle WITHOUT materializing rows in pandas — at
sf10 a codec query returns 10M wide rows, so the compare runs entirely
inside DuckDB:

  rows_match    counts equal
  schema_match  sorted column-name lists equal
  hash_match    (count, SUM(hash(row)), BIT_XOR(hash(row))) triples
                equal — per-row 64-bit DuckDB hashes over the
                sorted-name column list, aggregated order-independently
                two ways. One single-pass evaluation per side: the
                first cut used EXCEPT ALL both directions, which
                re-evaluates the oracle SQL three times and external-
                sorts 2×20 GB of wire strings per query (the open-wire
                batch alone ran an hour before being killed).

Queries are verified in batches and each Spark result is deleted
after its check, so peak disk is one batch's output.

Usage: tools/check_sf10.py <sfDir> <outJson> <query> [query ...]
"""
import json
import os
import shutil
import subprocess
import sys
import time

import duckdb

TABLES = ("region nation customer supplier part orders lineitem "
          "events documents embeddings").split()


def write(out_json, sf_dir, commit, results):
    import glob as _glob
    import re as _re
    ladders = sorted(_glob.glob("BENCH_LADDER_r*.json"))
    # GRAFT_ROUND overrides: early in a round the newest ladder file is
    # still the PRIOR round's (the ladder is recorded at round end)
    rnd = int(os.environ.get("GRAFT_ROUND", 0)) or (
        int(_re.search(r"r(\d+)", ladders[-1]).group(1)) if ladders else 0)
    doc = {"round": rnd, "tier": sf_dir, "commit": commit,
           "checked_utc": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
           "method": ("DuckDB-internal bag equality per query: "
                      "(count, SUM(hash(row)), BIT_XOR(hash(row))) over "
                      "the sorted-name column list, spark parquet vs "
                      "oracle SQL, one single-pass evaluation per side; "
                      "per-query `tier` records which dataset it ran on; "
                      "written incrementally, resumable"),
           "results": results}
    with open(out_json, "w") as f:
        json.dump(doc, f, indent=1)


def green(r):
    return (r.get("rows_match") and r.get("schema_match")
            and r.get("hash_match"))


def main():
    sf_dir, out_json = sys.argv[1], sys.argv[2]
    queries = sys.argv[3:]
    # scratch dir derived from the output name so family runners can
    # run in parallel without clobbering each other's Verify output
    out_dir = "/tmp/verify_sf10_" + \
        os.path.basename(out_json).replace(".json", "")
    # resume: keep prior results, skip queries already green (the
    # first run died 40 min into one pathological oracle and lost
    # every completed batch — write incrementally, always)
    try:
        results = json.load(open(out_json)).get("results", {})
    except (FileNotFoundError, json.JSONDecodeError):
        results = {}
    queries = [q for q in queries if not green(results.get(q, {}))]
    commit = subprocess.check_output(
        ["git", "rev-parse", "HEAD"]).decode().strip()

    # one Verify JVM per batch of queries keeps peak disk bounded while
    # amortizing session startup; batch size 4 ≈ a few GB on disk max
    BATCH = 4
    oracles = None
    for i in range(0, len(queries), BATCH):
        batch = queries[i:i + BATCH]
        shutil.rmtree(out_dir, ignore_errors=True)
        env = dict(os.environ, SKIP_BUILD="1", SPARK_GRAFT_CPUS="32",
                   SPARK_DRIVER_MEM="48g")
        r = subprocess.run(
            ["tools/run.sh", "graft.Verify", sf_dir, out_dir] + batch,
            cwd="/root/repo", env=env, capture_output=True, text=True)
        if r.returncode != 0:
            for q in batch:
                results[q] = {"err": f"verify exited {r.returncode}"}
            continue
        if oracles is None:
            oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
        con = duckdb.connect()
        for t in TABLES:
            p = f"{sf_dir}/{t}.parquet"
            if os.path.exists(p):
                con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
        for q in batch:
            res = {"rows_match": False, "schema_match": False,
                   "hash_match": False, "spark_rows": None,
                   "oracle_rows": None, "err": None, "tier": sf_dir}
            results[q] = res
            try:
                glob_p = f"{out_dir}/{q}/*.parquet"
                con.execute(
                    f"CREATE OR REPLACE VIEW spark_res AS SELECT * FROM '{glob_p}'")
                con.execute(
                    f"CREATE OR REPLACE VIEW oracle_res AS ({oracles[q]})")
                s_cols = [r[0] for r in con.execute(
                    "DESCRIBE spark_res").fetchall()]
                o_cols = [r[0] for r in con.execute(
                    "DESCRIBE oracle_res").fetchall()]
                res["schema_match"] = sorted(s_cols) == sorted(o_cols)
                res["spark_rows"] = con.execute(
                    "SELECT count(*) FROM spark_res").fetchone()[0]
                if res["schema_match"]:
                    cols = ", ".join(f'"{c}"' for c in sorted(s_cols))
                    agg = (f"SELECT count(*), CAST(sum(h) AS VARCHAR), "
                           f"CAST(bit_xor(h) AS VARCHAR) FROM "
                           f"(SELECT hash({cols}) AS h FROM %s)")
                    hs = con.execute(agg % "spark_res").fetchone()
                    ho = con.execute(agg % "oracle_res").fetchone()
                    res["spark_hash"] = list(hs)
                    res["oracle_hash"] = list(ho)
                    res["oracle_rows"] = ho[0]
                    res["rows_match"] = res["spark_rows"] == ho[0]
                    res["hash_match"] = hs == ho
                    if not res["hash_match"]:
                        res["err"] = f"hash triple diff: spark={hs} oracle={ho}"
            except Exception as e:
                res["err"] = str(e)[:300]
            print(f"[{'OK  ' if green(res) else 'BAD '}] {q}: "
                  f"{res['spark_rows']} rows, err={res['err']}")
            sys.stdout.flush()
            write(out_json, sf_dir, commit, results)
        con.close()
    shutil.rmtree(out_dir, ignore_errors=True)
    write(out_json, sf_dir, commit, results)
    bad = [q for q, r in results.items() if not green(r)]
    print(f"{len(results) - len(bad)} ok, {len(bad)} bad -> {out_json}")
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
