#!/usr/bin/env python3
"""Local pre-validation of SparkEntry oracles, mimicking the driver's
DuckDB compare: run `sbt runMain graft.Verify <sfdir> <out>` first, then
this script loads each result parquet, runs the oracle SQL in DuckDB over
the same tables, sorts columns by name + rows by all columns, and compares
values. Usage: tools/validate.py <sfDir> <verifyOutDir> [query ...]
"""
import json, sys, glob, os
import duckdb
import pandas as pd

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.sort_values(by=list(df.columns), ignore_index=True,
                        key=lambda s: s.astype(str))
    return df

def main():
    sfdir, outdir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sfdir}/{t}.parquet"
        if os.path.exists(p):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracles = json.load(open(f"{outdir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracles.items()):
        if only and name not in only:
            continue
        res_dir = f"{outdir}/{name}"
        files = glob.glob(f"{res_dir}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark result written"); n_fail += 1; continue
        try:
            spark_df = pd.concat([pd.read_parquet(f) for f in files], ignore_index=True)
            duck_df = con.sql(sql).df()
        except Exception as e:
            print(f"FAIL {name}: {e}"); n_fail += 1; continue
        a, b = canon(spark_df), canon(duck_df)
        if list(a.columns) != list(b.columns):
            print(f"FAIL {name}: columns {list(a.columns)} vs {list(b.columns)}"); n_fail += 1; continue
        if len(a) != len(b):
            print(f"FAIL {name}: rows {len(a)} vs {len(b)}"); n_fail += 1; continue
        # value compare via string canonicalization (mirrors a hash compare)
        eq = True
        for c in a.columns:
            av, bv = a[c].astype(str), b[c].astype(str)
            if not av.equals(bv):
                bad = (av != bv)
                i = bad.idxmax()
                print(f"FAIL {name}: col {c} differs at row {i}: spark={av[i]!r} duck={bv[i]!r} ({bad.sum()} diffs)")
                eq = False; break
        if eq:
            print(f"PASS {name} ({len(a)} rows)"); n_pass += 1
        else:
            n_fail += 1
    print(f"== {n_pass} pass, {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()
