#!/usr/bin/env python3
"""Local mimic of the driver's correctness gate: run DuckDB oracle SQL
against the same parquet tables and compare to Verify's parquet dumps
(column-name-sorted, row-sorted, value-hash).

If DuckDB/pyarrow report tiny-malloc OOM ("malloc of size N failed",
"bad allocation") with plenty of free RAM at sf0.1+, the box has hit
vm.max_map_count (65530 default): the 90+ heavy CTE queries exhaust
memory MAPPINGS, which malloc surfaces as ENOMEM. Fix:
`sysctl -w vm.max_map_count=1048576` and re-run."""
import sys, json, glob, os
import duckdb
import pandas as pd

sfdir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
outdir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"

con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders","lineitem","events","documents","embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sfdir}/{t}.parquet')")

oracle = json.load(open(f"{outdir}/oracle_sql.json"))
fails = 0
for name, sql in sorted(oracle.items()):
    spark_files = glob.glob(f"{outdir}/{name}/*.parquet")
    if not spark_files:
        print(f"FAIL {name}: no spark output"); fails += 1; continue
    got = pd.concat([pd.read_parquet(f) for f in sorted(spark_files)], ignore_index=True)
    try:
        exp = con.execute(sql).df()
    except Exception as e:
        print(f"FAIL {name}: oracle error {e}"); fails += 1; continue
    g = got.reindex(sorted(got.columns), axis=1)
    e = exp.reindex(sorted(exp.columns), axis=1)
    if list(g.columns) != list(e.columns):
        print(f"FAIL {name}: columns {list(g.columns)} vs {list(e.columns)}"); fails += 1; continue
    g = g.sort_values(list(g.columns)).reset_index(drop=True)
    e = e.sort_values(list(e.columns)).reset_index(drop=True)
    if len(g) != len(e):
        print(f"FAIL {name}: rows {len(g)} vs {len(e)}"); fails += 1; continue
    # normalize dtypes for comparison
    def norm(df):
        out = df.copy()
        for c in out.columns:
            if out[c].dtype.kind in "iu":
                out[c] = out[c].astype("int64")
            elif out[c].dtype.kind == "f":
                out[c] = out[c].astype("float64")
        return out
    g, e = norm(g), norm(e)
    diff = None
    for c in g.columns:
        if g[c].dtype.kind == "f":
            import numpy as np
            if not np.allclose(g[c].fillna(-9e99), e[c].fillna(-9e99), rtol=0, atol=0):
                diff = c; break
        else:
            if not (g[c].fillna("<N>").astype(str) == e[c].fillna("<N>").astype(str)).all():
                diff = c; break
    if diff:
        bad = (g[diff].astype(str) != e[diff].astype(str))
        print(f"FAIL {name}: column {diff} differs, e.g. got={g[diff][bad].head(3).tolist()} exp={e[diff][bad].head(3).tolist()}")
        fails += 1
    else:
        print(f"OK   {name}: {len(g)} rows")
print("RESULT:", "PASS" if fails == 0 else f"{fails} FAILURES")
sys.exit(1 if fails else 0)
