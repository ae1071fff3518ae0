#!/usr/bin/env python3
"""Output-type audit: the driver hashes Spark parquet vs DuckDB .df() values;
any column that is not int64 / string / timestamp / bool / binary on BOTH
sides is a hash-flake risk (decimal scale rendering, HUGEINT->float64, ULP).

Usage: tools/audit_types.py <sfDir> <verifyOutDir> [query ...]
Prints one line per risky column; exits 1 if any found.
"""
import sys, json, os, glob
import duckdb
import pandas as pd
import pyarrow.parquet as pq

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()
SAFE_PANDAS = {"int64", "int32", "bool", "object", "string"}


def pandas_kind(s):
    if pd.api.types.is_datetime64_any_dtype(s):
        return "timestamp"
    return str(s.dtype)


def risky(kind):
    return kind not in SAFE_PANDAS and kind != "timestamp"


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    bad = 0
    for name, sql in sorted(oracles.items()):
        if only and name not in only:
            continue
        notes = []
        res_dir = f"{out_dir}/{name}"
        if glob.glob(f"{res_dir}/*.parquet"):
            sch = pq.read_schema(glob.glob(f"{res_dir}/*.parquet")[0])
            for f in sch:
                t = str(f.type)
                if t.startswith(("double", "float", "decimal")):
                    notes.append(f"spark:{f.name}={t}")
        try:
            rel = con.sql(f"SELECT * FROM ({sql}) LIMIT 0")
            ddl_types = dict(zip(rel.columns, [str(t) for t in rel.types]))
            df = con.sql(f"SELECT * FROM ({sql}) LIMIT 50").df()
            for c in df.columns:
                k = pandas_kind(df[c])
                if risky(k):
                    notes.append(f"duck:{c}={ddl_types.get(c)}->{k}")
                elif k == "object" and df[c].map(
                        lambda v: type(v).__name__ == "Decimal").any():
                    notes.append(f"duck:{c}={ddl_types.get(c)}->object(Decimal)")
            # a NULL anywhere in an integer column (not just the 50-row
            # sample) coerces the whole column to float64 on the pandas
            # bridge — probe the full result, not the sample
            int_cols = [c for c, t in ddl_types.items()
                        if t.upper() in ("BIGINT", "INTEGER", "SMALLINT",
                                         "TINYINT", "HUGEINT", "UBIGINT",
                                         "UINTEGER")]
            if int_cols:
                probes = ", ".join(
                    f'COUNT(*) FILTER ("{c}" IS NULL) AS "{c}"'
                    for c in int_cols)
                nulls = con.sql(
                    f"SELECT {probes} FROM ({sql})").fetchone()
                for c, n in zip(int_cols, nulls):
                    if n:
                        notes.append(
                            f"duck:{c}={ddl_types.get(c)} has {n} NULLs"
                            "->float64 on pandas bridge")
        except Exception as e:
            notes.append(f"duck:ERR {str(e)[:120]}")
        if notes:
            bad += 1
            print(f"[RISK] {name}: " + "; ".join(notes))
    print(f"{bad} queries with risky output types")
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
