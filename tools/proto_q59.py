#!/usr/bin/env python3
"""Prototype of the q59 LOWESS DuckDB oracle before porting the string
builder to Scala. Mirrors graft.stats.Lowess.correctedVar(nBins=10,
frac=0.5, iters=100) exactly: tricube-weighted local linear fit over the
bin representatives with bisquare robustifying iterations, as a
single-row recursive CTE carrying list state.
Usage: proto_q59.py <sfDir> [sparkParquetDir]
"""
import sys, glob
import duckdb

sf = sys.argv[1]

# --- expression builders (ported verbatim to Scala once green) ---------
# d_j = |xs[j]-xs[i]| / h (0 when h == 0), computed inside binding `bb`
DJ = "(CASE WHEN bb.h > 0 THEN ABS(xs[j] - xs[i]) / bb.h ELSE 0.0 END)"
# tricube: t = 1 - d^3; w0 = t*t*t, zero at d >= 1
W0 = (f"(CASE WHEN {DJ} >= 1.0 THEN 0.0 ELSE "
      f"(1.0 - {DJ}*{DJ}*{DJ})*(1.0 - {DJ}*{DJ}*{DJ})*(1.0 - {DJ}*{DJ}*{DJ}) END)")


def local_fit(dl):
    """WLS fitted list given delta-list expression `dl` (robust weights,
    sorted-x order). 3 binding levels via single-element list_transform:
    win (k-nearest window, greedy-tie-left order), bb (h + j-ascending
    window indices), sm (the five WLS sums)."""
    w = f"({W0} * {dl}[j])"
    return f"""list_transform(range(1, n + 1), i ->
      list_transform([list_slice(list_sort(
          list_transform(range(1, n + 1), j ->
            {{'d': ABS(xs[j] - xs[i]),
             's': CASE WHEN j = i THEN -1 WHEN j < i THEN 0 ELSE 1 END,
             'jj': CASE WHEN j < i THEN -j ELSE j END,
             'j': j}})), 1, k)], win ->
        list_transform([{{'h': win[k].d,
                         'wj': list_sort(list_transform(win, w -> w.j))}}], bb ->
          list_transform([{{
              'sw':   list_sum(list_transform(bb.wj, j -> {w})),
              'swx':  list_sum(list_transform(bb.wj, j -> {w} * xs[j])),
              'swy':  list_sum(list_transform(bb.wj, j -> {w} * ys[j])),
              'swxx': list_sum(list_transform(bb.wj, j -> {w} * xs[j] * xs[j])),
              'swxy': list_sum(list_transform(bb.wj, j -> {w} * xs[j] * ys[j]))}}], sm ->
            CASE WHEN sm.sw <= 0 THEN ys[i]
                 WHEN ABS(sm.sw * sm.swxx - sm.swx * sm.swx)
                      < 1e-12 * GREATEST(1.0, sm.swxx * sm.sw) THEN sm.swy / sm.sw
                 ELSE (sm.swy - ((sm.sw * sm.swxy - sm.swx * sm.swy)
                        / (sm.sw * sm.swxx - sm.swx * sm.swx)) * sm.swx) / sm.sw
                      + ((sm.sw * sm.swxy - sm.swx * sm.swy)
                        / (sm.sw * sm.swxx - sm.swx * sm.swx)) * xs[i]
            END)[1])[1])[1])"""


# robust scale s = max(median |res|, 1e-9 * max|y|)
S = ("GREATEST(list_aggregate(list_transform(range(1, n + 1), "
     "i -> ABS(ys[i] - fitted[i])), 'median'), 1e-9 * may)")
U = f"((ys[i] - fitted[i]) / (6.0 * {S}))"
ND = (f"CASE WHEN it = -1 OR {S} <= 0 THEN delta "
      f"ELSE list_transform(range(1, n + 1), i -> "
      f"CASE WHEN ABS({U}) >= 1.0 THEN 0.0 "
      f"ELSE (1.0 - {U}*{U})*(1.0 - {U}*{U}) END) END")

SQL = f"""WITH RECURSIVE normed AS MATERIALIZED (
    SELECT l_orderkey AS cell_id, l_partkey AS feat_id,
           LN(1 + 10000.0 * l_quantity / SUM(l_quantity) OVER (PARTITION BY l_orderkey)) AS normed
    FROM lineitem),
  nc AS (SELECT COUNT(DISTINCT l_orderkey) AS n_total_cells FROM lineitem),
  stats AS MATERIALIZED (
    SELECT feat_id,
           SUM(normed) / nc.n_total_cells AS avg,
           (SUM(normed * normed) - SUM(normed) * SUM(normed) / nc.n_total_cells)
             / (nc.n_total_cells - 1) AS sigmas
    FROM normed CROSS JOIN nc GROUP BY feat_id, nc.n_total_cells),
  s AS MATERIALIZED (SELECT feat_id, LN(avg) AS la, LN(sigmas) AS lb FROM stats
        WHERE avg > 0 AND sigmas > 0),
  bounds AS MATERIALIZED (SELECT MIN(la) AS lo, MAX(la) AS hi FROM s),
  binned AS MATERIALIZED (SELECT s.feat_id, s.la, s.lb,
                    CAST(GREATEST(LEAST(FLOOR((s.la - b.lo) / ((b.hi - b.lo) / 10)), 9), 0) AS INT) AS bin
             FROM s CROSS JOIN bounds b),
  reps AS MATERIALIZED (SELECT bin, la AS ra, lb AS rb FROM (
             SELECT bin, la, lb,
                    ROW_NUMBER() OVER (PARTITION BY bin ORDER BY lb, feat_id) AS rn
             FROM binned) WHERE rn = 1),
  pts AS (SELECT LIST(ra ORDER BY bin) AS xs, LIST(rb ORDER BY bin) AS ys,
                 LIST(bin ORDER BY bin) AS bins, LEN(LIST(ra)) AS n,
                 GREATEST(2, LEAST(LEN(LIST(ra)),
                   CAST(CEIL(0.5 * LEN(LIST(ra))) AS INT))) AS k,
                 MAX(ABS(rb)) AS may
          FROM reps),
  rec AS (
    SELECT -1 AS it, xs, ys, bins, n, k, may,
           list_transform(xs, x -> 1.0) AS delta, ys AS fitted
    FROM pts
    UNION ALL
    SELECT it + 1, xs, ys, bins, n, k, may,
           {ND} AS nd,
           {local_fit('nd')} AS f2
    FROM rec WHERE it < 100),
  fin AS (SELECT * FROM rec WHERE it = 100),
  corr AS (SELECT UNNEST(bins) AS bin, UNNEST(fitted) AS bcf FROM fin)
  SELECT b.feat_id, ROUND(EXP(b.lb - c.bcf), 4) AS c_var_lowess
  FROM binned b JOIN corr c ON b.bin = c.bin
  ORDER BY b.feat_id"""

con = duckdb.connect()
import os
for f in glob.glob(f"{sf}/*.parquet"):
    name = os.path.basename(f)[:-8]
    con.sql(f"CREATE VIEW {name} AS SELECT * FROM '{f}'")
oracle = con.sql(SQL).df()
print(oracle.head(10))
print(len(oracle), "rows")

if len(sys.argv) > 2:
    import pyarrow.parquet as pq
    import pyarrow as pa
    import numpy as np
    files = sorted(glob.glob(f"{sys.argv[2]}/*.parquet"))
    spark = pa.concat_tables([pq.read_table(f) for f in files]).to_pandas()
    merged = oracle.merge(spark, on="feat_id", suffixes=("_o", "_s"))
    diff = (merged.c_var_lowess_o - merged.c_var_lowess_s).abs()
    print("rows:", len(oracle), "vs", len(spark),
          "max |diff|:", diff.max(), "mismatches:", (diff > 1e-12).sum())
    print(merged[diff > 1e-12].head(20))
