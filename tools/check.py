#!/usr/bin/env python3
"""Driver-mimic correctness check: compare Verify output vs DuckDB oracle.

Usage: tools/check.py <sfDir> <verifyOutDir> [query ...]
Registers each parquet table as a DuckDB view, runs every oracle SQL from
oracle_sql.json, and compares (columns sorted by name, rows sorted) against
the Spark parquet result. Reports per-query OK/MISMATCH with detail.
"""
import sys, json, glob, os
import duckdb
import pandas as pd

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

def canon(df: pd.DataFrame) -> pd.DataFrame:
    import decimal
    df = df.reindex(sorted(df.columns), axis=1)
    # normalize dtypes for comparison
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype("datetime64[us]")
        elif pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].astype("float64")
        elif pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("int64")
        elif df[c].dtype == object and df[c].map(
                lambda v: v is None or isinstance(v, decimal.Decimal)).all():
            # decimal columns: spark parquet -> Decimal objects, duckdb
            # .df() -> float64; both sides carry the exact same decimal
            # value, so nearest-double conversion compares losslessly
            df[c] = df[c].astype("float64")
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    rest = sys.argv[3:]
    json_out = None
    if "--json" in rest:
        i = rest.index("--json")
        json_out = rest[i + 1]
        rest = rest[:i] + rest[i + 2:]
    only = set(rest)
    results = {}

    def record(name, rows_match, schema_match, hash_match,
               spark_rows=None, oracle_rows=None, err=None):
        results[name] = {
            "rows_match": rows_match, "schema_match": schema_match,
            "hash_match": hash_match, "spark_rows": spark_rows,
            "oracle_rows": oracle_rows, "err": err}

    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_ok = n_bad = 0
    for name, sql in sorted(oracles.items()):
        if only and name not in only:
            continue
        res_dir = f"{out_dir}/{name}"
        files = glob.glob(f"{res_dir}/*.parquet")
        if not files:
            print(f"[MISS] {name}: no spark result");  n_bad += 1
            record(name, False, False, False, err="no spark result")
            continue
        try:
            got = canon(pd.read_parquet(res_dir))
            want = canon(con.sql(sql).df())
        except Exception as e:
            print(f"[ERR ] {name}: {e}"); n_bad += 1
            record(name, False, False, False, err=str(e)[:300])
            continue
        if list(got.columns) != list(want.columns):
            print(f"[BAD ] {name}: columns spark={list(got.columns)} oracle={list(want.columns)}")
            n_bad += 1
            record(name, len(got) == len(want), False, False,
                   len(got), len(want), "column mismatch")
            continue
        if len(got) != len(want):
            print(f"[BAD ] {name}: rows spark={len(got)} oracle={len(want)}")
            n_bad += 1
            record(name, False, True, False, len(got), len(want),
                   "row count mismatch")
            continue
        try:
            pd.testing.assert_frame_equal(got, want, check_dtype=False, check_exact=True)
            print(f"[OK  ] {name}: {len(got)} rows"); n_ok += 1
            record(name, True, True, True, len(got), len(want))
        except AssertionError:
            # retry with tolerance to show whether it's float noise
            try:
                pd.testing.assert_frame_equal(got, want, check_dtype=False, rtol=1e-9)
                print(f"[WARN] {name}: exact mismatch but within 1e-9 (float noise)"); n_bad += 1
                record(name, True, True, False, len(got), len(want),
                       "within 1e-9 (float noise)")
            except AssertionError as e2:
                print(f"[BAD ] {name}: {str(e2)[:300]}"); n_bad += 1
                record(name, True, True, False, len(got), len(want),
                       str(e2)[:300])
    print(f"\n{n_ok} ok, {n_bad} bad")
    if json_out:
        import subprocess, time
        commit = subprocess.check_output(
            ["git", "rev-parse", "HEAD"]).decode().strip()
        payload = dict(sorted(results.items()))
        payload["_meta"] = {
            "commit": commit, "sf_dir": sf_dir,
            "generated_utc": time.strftime("%Y-%m-%dT%H:%M:%SZ",
                                           time.gmtime()),
            "n_ok": n_ok, "n_bad": n_bad,
            "writer": "tools/check.py --json"}
        json.dump(payload, open(json_out, "w"), indent=1)
        print(f"wrote {json_out} ({n_ok} ok, {n_bad} bad)")
    sys.exit(1 if n_bad else 0)

if __name__ == "__main__":
    main()
