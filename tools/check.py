#!/usr/bin/env python3
"""Local mimic of the driver's correctness gate: run each oracle SQL in
DuckDB against the sf tables, load the Spark parquet dump, sort columns
by name + rows by all columns, and compare exactly.

Usage: python3 tools/check.py <sfDir> <outDir> [query ...]
(outDir = what graft.Verify wrote)
"""
import sys, os, json, glob
import duckdb
import pandas as pd
import numpy as np

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df

def main():
    sfdir, outdir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sfdir}/{t}.parquet"
        if os.path.isdir(p):
            # Spark-written table (the sf1 replica layout): a directory
            # of part files, not the driver's single-file layout
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{p}/*.parquet'")
        elif os.path.exists(p):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracles = json.load(open(f"{outdir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracles.items()):
        if only and name not in only:
            continue
        try:
            exp = canon(con.sql(sql).df())
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}")
            n_fail += 1
            continue
        files = glob.glob(f"{outdir}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output")
            n_fail += 1
            continue
        got = canon(con.sql(f"SELECT * FROM read_parquet({files!r})").df())
        if list(got.columns) != list(exp.columns):
            print(f"FAIL {name}: columns spark={list(got.columns)} oracle={list(exp.columns)}")
            n_fail += 1
            continue
        if len(got) != len(exp):
            print(f"FAIL {name}: rows spark={len(got)} oracle={len(exp)}")
            n_fail += 1
            continue
        diffs = []
        for c in got.columns:
            a, b = got[c].values, exp[c].values
            # Driver-faithful dtype strictness: the driver hashes canonical
            # STRING forms, so an integral column on one side meeting a
            # floating column on the other (e.g. DuckDB HUGEINT -> pandas
            # float64) hashes "0.0" vs "0" and FAILS there even when the
            # values are numerically equal. Flag that drift here instead of
            # silently comparing through float.
            ga, gb = got[c].dtype, exp[c].dtype
            int_vs_float = (
                (np.issubdtype(ga, np.integer) and np.issubdtype(gb, np.floating)) or
                (np.issubdtype(ga, np.floating) and np.issubdtype(gb, np.integer)))
            if int_vs_float:
                diffs.append(f"{c}: dtype drift spark={ga} oracle={gb} "
                             "(driver hashes canonical strings; cast the oracle column)")
                continue
            if np.issubdtype(got[c].dtype, np.floating) or np.issubdtype(exp[c].dtype, np.floating):
                af = a.astype(float); bf = b.astype(float)
                both_nan = np.isnan(af) & np.isnan(bf)
                neq = ~both_nan & (af != bf)
                if neq.any():
                    idx = np.where(neq)[0][0]
                    diffs.append(f"{c}: {neq.sum()} diffs, e.g. row {idx}: {af[idx]!r} vs {bf[idx]!r} (maxabs={np.nanmax(np.abs(af-bf))})")
            else:
                sa = pd.Series(a).astype(str); sb = pd.Series(b).astype(str)
                neq = (sa != sb).values
                if neq.any():
                    idx = np.where(neq)[0][0]
                    diffs.append(f"{c}: {neq.sum()} diffs, e.g. row {idx}: {a[idx]!r} vs {b[idx]!r}")
        if diffs:
            print(f"FAIL {name}: " + " | ".join(diffs))
            n_fail += 1
        else:
            print(f"PASS {name} ({len(got)} rows)")
            n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()
