#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate.

Usage: python3 tools/check.py <sfDir> <outDir>
Reads each <outDir>/<name> parquet written by graft.Verify, runs the
matching oracle SQL from <outDir>/oracle_sql.json in DuckDB over the
<sfDir> tables, and compares (columns sorted by name, rows sorted).
"""
import sys, os, json, glob
import duckdb
import pandas as pd

def load(outdir, name):
    files = glob.glob(os.path.join(outdir, name, "*.parquet"))
    if not files:
        return None
    return pd.concat([pd.read_parquet(f) for f in files], ignore_index=True)

def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    df = df.sort_values(by=list(df.columns), ignore_index=True, na_position="first")
    return df

def main():
    sfdir, outdir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in ["region","nation","customer","supplier","part","orders","lineitem",
              "events","documents","embeddings"]:
        p = os.path.join(sfdir, f"{t}.parquet")
        if os.path.isdir(p):  # Spark-written table = directory of parts
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}/*.parquet')")
        elif os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracles = json.load(open(os.path.join(outdir, "oracle_sql.json")))
    n_ok = n_bad = 0
    for name, sql in sorted(oracles.items()):
        spark_df = load(outdir, name)
        if spark_df is None:
            print(f"MISS  {name}: no spark output"); n_bad += 1; continue
        try:
            duck_df = con.execute(sql).fetchdf()
        except Exception as e:
            print(f"ORAERR {name}: {str(e)[:200]}"); n_bad += 1; continue
        a, b = norm(spark_df), norm(duck_df)
        if list(a.columns) != list(b.columns):
            print(f"COLS  {name}: spark={list(a.columns)} duck={list(b.columns)}"); n_bad += 1; continue
        if len(a) != len(b):
            print(f"ROWS  {name}: spark={len(a)} duck={len(b)}"); n_bad += 1; continue
        # dtype must match exactly for integers (int32 vs int64 can change
        # the driver's value hashing), and by kind otherwise: the driver's
        # hash compare diverges on e.g. DuckDB HUGEINT->float64 vs Spark
        # int64 even when values are numerically equal.
        def sig(d):
            return str(d) if d.kind in "iu" else d.kind
        sigs_a = [sig(d) for d in a.dtypes]
        sigs_b = [sig(d) for d in b.dtypes]
        if sigs_a != sigs_b:
            print(f"DTYPE {name}: spark={list(zip(a.columns,sigs_a))} duck={list(zip(b.columns,sigs_b))}")
            n_bad += 1; continue
        try:
            pd.testing.assert_frame_equal(a, b, check_dtype=False, check_exact=True)
            print(f"OK    {name} ({len(a)} rows)"); n_ok += 1
        except AssertionError as e:
            print(f"DIFF  {name}: {str(e).splitlines()[-1][:300]}")
            merged = a.compare(b) if a.shape == b.shape else None
            if merged is not None and not merged.empty:
                print(merged.head(5))
            n_bad += 1
    print(f"\n{n_ok} ok, {n_bad} bad")
    sys.exit(1 if n_bad else 0)

if __name__ == "__main__":
    main()
