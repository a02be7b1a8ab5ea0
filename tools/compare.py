#!/usr/bin/env python3
"""Local pre-check of SparkEntry oracles: replays oracle_sql.json in DuckDB
against the same parquet tables and diffs against the Spark parquet dumps.
Mirrors the driver's compare (sort columns by name, compare values).
Usage: compare.py <sfDir> <verifyOutDir> [q1,q2,...]
The optional third arg restricts the replay to the named queries (exact
names or qNN prefixes) — pairs with Verify's subset arg for targeted
iteration without replaying all 242 oracles in DuckDB.
"""
import sys, json, glob, os
import duckdb
import pyarrow.parquet as pq
import pandas as pd
import numpy as np

sf_dir, out_dir = sys.argv[1], sys.argv[2]
only = set(sys.argv[3].split(",")) if len(sys.argv) > 3 else None
con = duckdb.connect()
for f in glob.glob(f"{sf_dir}/*.parquet"):
    name = os.path.basename(f)[:-8]
    con.sql(f"CREATE VIEW {name} AS SELECT * FROM '{f}'")

oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
if only is not None:
    oracles = {k: v for k, v in oracles.items()
               if k in only or k.split("_")[0] in only}
fails = 0
for name in sorted(oracles):
    sql = oracles[name]
    try:
        oracle = con.sql(sql).df()
    except Exception as e:
        print(f"FAIL {name}: oracle SQL error: {e}")
        fails += 1
        continue
    files = glob.glob(f"{out_dir}/{name}/*.parquet")
    if not files:
        print(f"FAIL {name}: no spark output")
        fails += 1
        continue
    import pyarrow as pa
    spark = pa.concat_tables([pq.read_table(f) for f in sorted(files)]).to_pandas()
    oracle = oracle[sorted(oracle.columns)]
    spark = spark[sorted(spark.columns)]
    if list(oracle.columns) != list(spark.columns):
        print(f"FAIL {name}: columns oracle={list(oracle.columns)} spark={list(spark.columns)}")
        fails += 1
        continue
    if len(oracle) != len(spark):
        print(f"FAIL {name}: rows oracle={len(oracle)} spark={len(spark)}")
        fails += 1
        continue
    ok = True
    for c in oracle.columns:
        a, b = oracle[c].values, spark[c].values
        # Hard gate: the driver hashes raw values, so an int64-vs-float64
        # representation difference fails there even when every value is
        # equal (DuckDB SUM(BIGINT) -> HUGEINT -> float64). Catch it here.
        if oracle[c].dtype != spark[c].dtype:
            print(f"FAIL {name}.{c}: dtype oracle={oracle[c].dtype} spark={spark[c].dtype}")
            ok = False
            continue
        if np.issubdtype(oracle[c].dtype, np.floating) or np.issubdtype(spark[c].dtype, np.floating):
            bad = ~(np.isclose(a.astype(float), b.astype(float), rtol=0, atol=1e-12)
                    | (pd.isna(a) & pd.isna(b)))
            exact = (a.astype(float) == b.astype(float)) | (pd.isna(a) & pd.isna(b))
            if bad.any():
                i = np.argmax(bad)
                print(f"FAIL {name}.{c}: {bad.sum()} diffs, e.g. row {i}: oracle={a[i]} spark={b[i]}")
                ok = False
            elif not exact.all():
                i = np.argmax(~exact)
                print(f"WARN {name}.{c}: {np.sum(~exact)} non-bitwise-equal floats, e.g. row {i}: {a[i]} vs {b[i]}")
        else:
            eq = (pd.Series(a).astype(object) == pd.Series(b).astype(object)) | (pd.isna(a) & pd.isna(b))
            if not eq.all():
                i = int(np.argmax(~eq.values))
                print(f"FAIL {name}.{c}: {int((~eq).sum())} diffs, e.g. row {i}: oracle={a[i]!r} spark={b[i]!r}")
                ok = False
    if ok:
        print(f"OK   {name} ({len(spark)} rows)")
    else:
        fails += 1
print(f"\n{len(oracles) - fails}/{len(oracles)} queries match")
sys.exit(1 if fails else 0)
