#!/usr/bin/env python3
"""A63 (codec_open_wire_bytes) corpus-tier oracle.

The registry oracle expresses the byte-capped batch fold as a RECURSIVE
CTE — exact, but DuckDB evaluates each recursion step against the full
event frame, so depth ~100k at sf10 never terminates (measured: killed
after 40+ min; sf0.01's depth ~1k is instant). This checker replaces
ONLY the recursion with an imperative fold computed independently in
Python — a different engine from both Spark and the SQL oracle — and
leaves everything else (segment rendering, ordering, group-concat,
bag-equality hashing) inside DuckDB at scan speed:

  1. DuckDB renders the per-event key/value wire segments and the
     per-(schema,table,partition) commit_ts row numbers (the exact
     `msgs`/`o` CTEs of the registry oracle, non-recursive).
  2. Python replays pushMessage: running (rows_in, acc_bytes) per
     group, sealed at maxBatch rows or maxBytes bytes (+8 per frame),
     assigning batch ids — a 10M-step loop, seconds.
  3. DuckDB joins the assignment back, group-concats the segments in
     commit_ts order per batch, unions the DDL/RESOLVED legs verbatim
     from the registry oracle, and compares (count, SUM(hash(row)),
     BIT_XOR(hash(row))) against the Spark parquet result.

Usage: tools/a63_fold_check.py <sfDir> <mergeIntoJson>
"""
import json
import os
import shutil
import subprocess
import sys
import time

import duckdb



def main():
    sf_dir, out_json = sys.argv[1], sys.argv[2]
    out_dir = "/tmp/verify_a63"
    shutil.rmtree(out_dir, ignore_errors=True)
    env = dict(os.environ, SKIP_BUILD="1", SPARK_GRAFT_CPUS="32",
               SPARK_DRIVER_MEM="48g")
    r = subprocess.run(
        ["tools/run.sh", "graft.Verify", sf_dir, out_dir,
         "codec_open_wire_bytes"],
        cwd="/root/repo", env=env, capture_output=True, text=True)
    if r.returncode != 0:
        raise SystemExit(f"verify failed:\n{r.stderr[-2000:]}")

    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))[
        "codec_open_wire_bytes"]
    # the registry oracle's own non-recursive prefix (changelog + msgs +
    # o CTEs, exactly as written) and its DDL/RESOLVED legs, reused
    # verbatim so this checker only replaces the recursion
    import re as _re
    o_prefix = oracle.split("\n), fold AS (", 1)[0]
    ddl_legs = oracle.split("GROUP BY 1, 2, 3, 4, 5\nUNION ALL\n", 1)[1]
    version_hex = _re.search(
        r"CONCAT\('([0-9A-Fa-f]+)', string_agg\(k_seg", oracle).group(1)
    # the registry's fold parameters, read from the oracle itself so a
    # registry retune cannot silently desynchronize this checker
    max_batch = int(_re.search(r"f\.rows_in >= (\d+)", oracle).group(1))
    max_bytes = int(_re.search(
        r"f\.acc \+ m\.ev_bytes > (\d+)", oracle).group(1))
    print(f"[a63] fold params from oracle: maxBatch={max_batch}, "
          f"maxBytes={max_bytes}")

    con = duckdb.connect()
    for t in ("region nation customer supplier part orders lineitem "
              "events documents embeddings").split():
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    print("[a63] rendering per-event segments in DuckDB")
    con.execute(f"CREATE TEMP TABLE o AS {o_prefix}\n) SELECT * FROM o")
    meta = con.execute(
        "SELECT schema_name, table_name, partition, rn, ev_bytes FROM o "
        "ORDER BY schema_name, table_name, partition, rn").df()
    print(f"[a63] python fold over {len(meta)} events")
    batch_ids = []
    prev_key = None
    rows_in = acc = batch = 0
    for sch, tbl, part, rn, ev in zip(
            meta["schema_name"].values, meta["table_name"].values,
            meta["partition"].values, meta["rn"].values,
            meta["ev_bytes"].values):
        key = (sch, tbl, part)
        if key != prev_key:
            prev_key, batch, rows_in, acc = key, 0, 1, int(ev) + 8
        elif rows_in >= max_batch or acc + int(ev) > max_bytes:
            batch += 1
            rows_in, acc = 1, int(ev) + 8
        else:
            rows_in += 1
            acc += int(ev)
        batch_ids.append(batch)
    meta["batch_id"] = batch_ids
    con.register("fold_py", meta[["schema_name", "table_name", "partition",
                                  "rn", "batch_id"]])
    print("[a63] group-concat + hash compare in DuckDB")
    # rebuild the oracle's own CTE chain (the DDL/RESOLVED legs
    # reference `changelog`) with the recursion replaced by the
    # python-computed assignment join
    con.execute(f"""
      CREATE TEMP VIEW oracle_res AS
      {o_prefix}
      )
      SELECT 'ROW' AS msg_type, o.schema_name, o.table_name, o.partition,
        f.batch_id, COUNT(*) AS n_rows,
        CONCAT('{version_hex}',
               string_agg(o.k_seg, '' ORDER BY o.commit_ts)) AS key_wire,
        string_agg(o.v_seg, '' ORDER BY o.commit_ts) AS value_wire
      FROM o JOIN fold_py f
        ON f.schema_name = o.schema_name AND f.table_name = o.table_name
       AND f.partition = o.partition AND f.rn = o.rn
      GROUP BY 1, 2, 3, 4, 5
      UNION ALL
      {ddl_legs}""")
    con.execute(
        f"CREATE TEMP VIEW spark_res AS SELECT * FROM "
        f"'{out_dir}/codec_open_wire_bytes/*.parquet'")
    s_cols = sorted(r[0] for r in con.execute("DESCRIBE spark_res").fetchall())
    o_cols = sorted(r[0] for r in con.execute("DESCRIBE oracle_res").fetchall())
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
           "note": ("registry oracle's recursion depth ~100k never "
                    "terminates in DuckDB at this tier; the byte-capped "
                    "fold was replayed imperatively in Python (third "
                    "engine) with the segment rendering, ordering, "
                    "group-concat and DDL/RESOLVED legs reused verbatim "
                    "from the registry oracle SQL")}
    if not res["hash_match"]:
        res["err"] = f"hash triple diff: spark={hs} oracle={ho}"
    doc = json.load(open(out_json))
    doc["results"]["codec_open_wire_bytes"] = res
    doc["checked_utc"] = time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime())
    with open(out_json, "w") as f:
        json.dump(doc, f, indent=1)
    ok = res["rows_match"] and res["schema_match"] and res["hash_match"]
    print(f"[{'OK  ' if ok else 'BAD '}] codec_open_wire_bytes: "
          f"{hs[0]} msgs, err={res['err']}")
    shutil.rmtree(out_dir, ignore_errors=True)
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
