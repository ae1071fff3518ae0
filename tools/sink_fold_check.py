#!/usr/bin/env python3
"""Corpus-tier oracle for the A50/A93 sink batch folds
(sink_batch_bytes, sink_batch_flush) — the a63_fold_check.py pattern.

The registry oracles express the per-(schema,table,partition) batch
fold as a RECURSIVE CTE — exact, but DuckDB evaluates each recursion
step against the full event frame, so deep groups (sf10's ~110k, the
skew tier's ~21k hot partition) grind for hours. This checker replaces
ONLY the recursion with an imperative fold computed independently in
Python (a third engine), and leaves everything else — payload
rendering, ordering, aggregation, bag-equality hashing — inside DuckDB
at scan speed. Fold parameters are parsed from the registry oracle SQL
itself so a registry retune cannot silently desynchronize this checker.

Usage: tools/sink_fold_check.py <sfDir> <mergeIntoJson> <query> [...]
  query in {sink_batch_bytes, sink_batch_flush}
"""
import json
import os
import re
import shutil
import subprocess
import sys
import time

import duckdb

TABLES = ("region nation customer supplier part orders lineitem "
          "events documents embeddings").split()


def check_one(con, query, oracle, sf_dir, out_dir):
    o_prefix = oracle.split("\n), fold AS (", 1)[0]
    max_batch = int(re.search(r"f\.rows_in >= (\d+)", oracle).group(1))
    if query == "sink_batch_bytes":
        max_bytes = int(re.search(
            r"f\.acc \+ m\.payload_bytes > (\d+)", oracle).group(1))
        rule = f"maxBatch={max_batch}, maxBytes={max_bytes}"
    else:
        flush_ticks = int(re.search(
            r"m\.commit_ts - f\.bfirst >= (\d+)", oracle).group(1))
        rule = f"maxBatch={max_batch}, flushTicks={flush_ticks}"
    print(f"[fold] {query}: params from oracle: {rule}")
    con.execute("DROP TABLE IF EXISTS o")
    con.execute(f"CREATE TEMP TABLE o AS {o_prefix}\n) SELECT * FROM o")
    meta = con.execute(
        "SELECT schema_name, table_name, partition, rn, commit_ts, "
        "payload_bytes FROM o "
        "ORDER BY schema_name, table_name, partition, rn").df()
    print(f"[fold] python fold over {len(meta)} events")
    batch_ids = []
    prev_key = None
    rows_in = acc = batch = bfirst = 0
    for sch, tbl, part, rn, cts, pb in zip(
            meta["schema_name"].values, meta["table_name"].values,
            meta["partition"].values, meta["rn"].values,
            meta["commit_ts"].values, meta["payload_bytes"].values):
        key = (sch, tbl, part)
        if query == "sink_batch_bytes":
            if key != prev_key:
                prev_key, batch, rows_in, acc = key, 0, 1, int(pb)
            elif rows_in >= max_batch or acc + int(pb) > max_bytes:
                batch += 1
                rows_in, acc = 1, int(pb)
            else:
                rows_in += 1
                acc += int(pb)
        else:  # sink_batch_flush
            if key != prev_key:
                prev_key, batch, rows_in, bfirst = key, 0, 1, int(cts)
            elif rows_in >= max_batch or int(cts) - bfirst >= flush_ticks:
                batch += 1
                rows_in, bfirst = 1, int(cts)
            else:
                rows_in += 1
        batch_ids.append(batch)
    meta["batch_id"] = batch_ids
    con.unregister("fold_py") if hasattr(con, "unregister") else None
    con.register("fold_py", meta[["schema_name", "table_name",
                                  "partition", "rn", "batch_id"]])
    agged = """
      SELECT o.schema_name, o.table_name, o.partition, f.batch_id,
        COUNT(*) AS n_rows,
        CAST(SUM(o.payload_bytes) AS BIGINT) AS batch_bytes,
        MIN(o.commit_ts) AS first_ts, MAX(o.commit_ts) AS last_ts
      FROM o JOIN fold_py f
        ON f.schema_name = o.schema_name AND f.table_name = o.table_name
       AND f.partition = o.partition AND f.rn = o.rn
      GROUP BY 1, 2, 3, 4"""
    if query == "sink_batch_bytes":
        final = agged
    else:
        final = f"""
      SELECT *, CASE WHEN n_rows >= {max_batch} THEN 'size'
        WHEN batch_id = MAX(batch_id) OVER (
          PARTITION BY schema_name, table_name, partition) THEN 'eof'
        ELSE 'flush' END AS close_reason
      FROM ({agged})"""
    con.execute(f"CREATE OR REPLACE TEMP VIEW oracle_res AS {final}")
    con.execute(f"CREATE OR REPLACE TEMP VIEW spark_res AS "
                f"SELECT * FROM '{out_dir}/{query}/*.parquet'")
    s_cols = sorted(r[0] for r in con.execute(
        "DESCRIBE spark_res").fetchall())
    o_cols = sorted(r[0] for r in con.execute(
        "DESCRIBE oracle_res").fetchall())
    cols = ", ".join(f'"{c}"' for c in s_cols)
    agg = (f"SELECT count(*), CAST(sum(h) AS VARCHAR), "
           f"CAST(bit_xor(h) AS VARCHAR) FROM "
           f"(SELECT hash({cols}) AS h FROM %s)")
    hs = con.execute(agg % "spark_res").fetchone()
    ho = con.execute(agg % "oracle_res").fetchone()
    res = {"rows_match": hs[0] == ho[0], "schema_match": s_cols == o_cols,
           "hash_match": list(hs) == list(ho), "spark_rows": hs[0],
           "oracle_rows": ho[0], "err": None, "tier": sf_dir,
           "spark_hash": list(hs), "oracle_hash": list(ho),
           "note": ("registry oracle's recursive fold grinds at deep "
                    "groups in DuckDB; the batch fold was replayed "
                    "imperatively in Python (third engine) with the "
                    "payload rendering, ordering and aggregation reused "
                    "verbatim from the registry oracle SQL (the "
                    "a63_fold_check pattern)")}
    if not res["hash_match"]:
        res["err"] = f"hash triple diff: spark={hs} oracle={ho}"
    return res


def main():
    sf_dir, out_json = sys.argv[1], sys.argv[2]
    queries = sys.argv[3:] or ["sink_batch_bytes", "sink_batch_flush"]
    out_dir = "/tmp/verify_sink_fold"
    shutil.rmtree(out_dir, ignore_errors=True)
    env = dict(os.environ, SKIP_BUILD="1", SPARK_GRAFT_CPUS="32",
               SPARK_DRIVER_MEM="48g")
    r = subprocess.run(
        ["tools/run.sh", "graft.Verify", sf_dir, out_dir] + queries,
        cwd="/root/repo", env=env, capture_output=True, text=True)
    if r.returncode != 0:
        raise SystemExit(f"verify failed:\n{r.stderr[-2000:]}")
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    rc = 0
    for q in queries:
        res = check_one(con, q, oracles[q], sf_dir, out_dir)
        doc = json.load(open(out_json))
        doc["results"][q] = res
        doc["checked_utc"] = time.strftime(
            "%Y-%m-%dT%H:%M:%SZ", time.gmtime())
        with open(out_json, "w") as f:
            json.dump(doc, f, indent=1)
        ok = (res["rows_match"] and res["schema_match"]
              and res["hash_match"])
        if not ok:
            rc = 1
        print(f"[{'OK  ' if ok else 'BAD '}] {q}: {res['spark_rows']} "
              f"rows, err={res['err']}")
    shutil.rmtree(out_dir, ignore_errors=True)
    sys.exit(rc)


if __name__ == "__main__":
    main()
