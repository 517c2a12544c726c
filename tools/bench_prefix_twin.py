#!/usr/bin/env python3
"""DuckDB PREFIX-FILTER twin of q_simjoin_prefix, for at-scale benching.

The correctness oracle (oracle_sql.json) states the naive inverted-index
formulation — the clearest spec, fine at gate scale. At bench scale the
fair comparison is ALGORITHM-EQUAL: this script runs the same
All-Pairs/PPJoin prefix-filter pipeline the Spark operator runs (df-rank
tokens with the (df, md5) total order, prefix length n − ceil(τn) + 1,
integer length filter, exact common-token verify) in DuckDB SQL, with
the identical scale-6 integer τ arithmetic — so its SURVIVOR SET is
bit-identical to the Spark operator's and can be hash-compared against
the Spark parquet output before timing.

Usage: python3 tools/bench_prefix_twin.py <sfDir> [<sparkOutDir>]
<sparkOutDir>, if given, must contain q_simjoin_prefix/ parquet written
by graft.Verify on the SAME sfDir; the script then asserts row-count and
md5-of-sorted-rows equality before reporting timings.
"""
import sys, os, glob, time, hashlib
import duckdb

TAU_Q = 800000  # scale-6 Jaccard threshold, = Dedup.prefixJaccardPairs arg

SQL = f"""
WITH words AS (SELECT doc_id, string_split(text, ' ') w FROM documents),
sh0 AS (
  SELECT DISTINCT doc_id, w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS s
  FROM words, unnest(generate_series(1, greatest(len(w)-2, 0))) t(i)
),
toks AS (SELECT doc_id, md5(s) AS h FROM sh0),
dfs AS (SELECT h, count(*) AS df FROM toks GROUP BY 1),
ranked AS (
  SELECT doc_id, h,
         row_number() OVER (PARTITION BY doc_id ORDER BY df, h) AS rk,
         count(*) OVER (PARTITION BY doc_id) AS nsh
  FROM toks JOIN dfs USING (h)
),
pref AS (
  SELECT doc_id, h, nsh FROM ranked
  WHERE rk <= nsh - (({TAU_Q} * nsh + 999999) // 1000000) + 1
),
cands AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
                  a.nsh AS na, b.nsh AS nb
  FROM pref a JOIN pref b ON a.h = b.h AND a.doc_id < b.doc_id
  WHERE least(a.nsh, b.nsh) * 1000000 >= {TAU_Q} * greatest(a.nsh, b.nsh)
),
common AS (
  SELECT c.doc_a, c.doc_b, c.na, c.nb, count(*) AS n_common
  FROM cands c
  JOIN toks ta ON ta.doc_id = c.doc_a
  JOIN toks tb ON tb.doc_id = c.doc_b AND tb.h = ta.h
  GROUP BY 1, 2, 3, 4
)
SELECT doc_a, doc_b, n_common,
       CAST(n_common AS DOUBLE) / (na + nb - n_common) AS jaccard
FROM common
WHERE n_common * 1000000 >= {TAU_Q} * (na + nb - n_common)
"""


def main():
    sfdir = sys.argv[1]
    sparkout = sys.argv[2] if len(sys.argv) > 2 else None
    # optional 3rd arg: timed-run count (default 3). At corpus sizes
    # where one run is 10+ minutes, min-of-1 vs min-of-3 changes nothing
    # material against a 10x+ gap — and a long run should PRINT as it
    # goes, so a capped/killed campaign still yields its measurements.
    n_runs = int(sys.argv[3]) if len(sys.argv) > 3 else 3
    con = duckdb.connect()
    con.execute("SET threads TO 32")
    p = os.path.join(sfdir, "documents.parquet")
    src = f"'{p}/*.parquet'" if os.path.isdir(p) else f"'{p}'"
    con.execute(f"CREATE VIEW documents AS SELECT * FROM read_parquet({src})")

    if sparkout:
        import pandas as pd
        t0 = time.time()
        duck = con.execute(SQL).fetchdf()
        print(f"verify query: {time.time() - t0:.3f}s", flush=True)
        files = glob.glob(os.path.join(sparkout, "q_simjoin_prefix", "*.parquet"))
        spark = pd.concat([pd.read_parquet(f) for f in files], ignore_index=True)

        def digest(df):
            df = df[sorted(df.columns)].sort_values(
                by=sorted(df.columns), ignore_index=True)
            return len(df), hashlib.md5(
                df.to_csv(index=False, float_format="%.12g").encode()).hexdigest()
        nd, hd = digest(duck)
        ns, hs = digest(spark)
        print(f"verify: duck rows={nd} spark rows={ns} "
              f"hash {'MATCH' if (nd, hd) == (ns, hs) else 'MISMATCH'}", flush=True)
        assert (nd, hd) == (ns, hs), "refusing to time an unverified twin"

    times = []
    for i in range(n_runs):
        t0 = time.time()
        con.execute(SQL).fetchall()
        times.append(time.time() - t0)
        print(f"run {i + 1}/{n_runs}: {times[-1]:.3f}s", flush=True)
    print(f"duckdb prefix twin best={min(times):.3f}  "
          f"runs={[round(x, 3) for x in times]}")


if __name__ == "__main__":
    main()
