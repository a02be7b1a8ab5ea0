#!/usr/bin/env python3
"""Prototype of the q53 deterministic-PCA DuckDB oracle: HVG top-30 ->
dense z-scaled vectors (5 dp-rounded moments) -> 5 dp-rounded covariance
-> fixed-count subspace iteration with classical Gram-Schmidt (pure
IEEE +,*,/,sqrt in the same order as Reduce.pcaDeterministic -> identical
bits) -> latent projection.
Usage: proto_q53.py <sfDir> [sparkParquetDir]
"""
import sys, glob, os
import duckdb

sf = sys.argv[1]
D = 30      # selected features
K = 5       # latent dims
T = 300     # subspace iterations

R31 = "range(1, 31)"


def dot_lists(a, b):
    return f"list_sum(list_transform({R31}, i2 -> {a}[i2] * {b}[i2]))"


def gs(u_expr):
    """normalize(u): bind u then its norm."""
    return (f"list_transform([{u_expr}], u -> "
            f"list_transform([SQRT(list_sum(list_transform(u, e -> e * e)))], nrm -> "
            f"CASE WHEN nrm > 0 THEN list_transform(u, e -> e / nrm) ELSE u END)[1])[1]")


def u_expr(j):
    """classical GS residual of w[j] against v1n..v{j-1}n (left-assoc)."""
    if j == 1:
        return "wN[1]"
    ds = ", ".join(f"'d{l}': {dot_lists(f'wN[{j}]', f'nv{l}')}" for l in range(1, j))
    sub = f"wN[{j}][i]"
    for l in range(1, j):
        sub = f"({sub} - ds.d{l} * nv{l}[i])"
    return (f"list_transform([{{{ds}}}], ds -> "
            f"list_transform({R31}, i -> {sub}))[1]")


MV = "list_value(" + ", ".join(
    f"list_transform({R31}, i -> list_sum(list_transform({R31}, k -> c[i][k] * v[{j}][k])))"
    for j in range(1, K + 1)) + ")"

# nested single-element bindings: each [expr] list literal evaluates its
# element ONCE, so wN/nv1..nv5 are shared, never re-inlined
VNEXT = f"list_transform([{MV}], wN -> "
CLOSE = ")[1]"
for _j in range(1, K + 1):
    VNEXT += f"list_transform([{gs(u_expr(_j))}], nv{_j} -> "
    CLOSE += ")[1]"
VNEXT += "list_value(" + ", ".join(f"nv{_j}" for _j in range(1, K + 1)) + ")" + CLOSE

IDENT = ", ".join(
    "list_transform(range(1, 31), i -> CASE WHEN i = %d THEN CAST(1.0 AS DOUBLE) ELSE CAST(0.0 AS DOUBLE) END)" % j
    for j in range(1, K + 1))

SQL = f"""WITH RECURSIVE normed AS MATERIALIZED (
    SELECT l_orderkey AS cell_id, l_partkey AS feat_id,
           LN(1 + 10000.0 * l_quantity / SUM(l_quantity) OVER (PARTITION BY l_orderkey)) AS normed
    FROM lineitem),
  nc AS (SELECT COUNT(DISTINCT l_orderkey) AS n_total_cells FROM lineitem),
  stats AS MATERIALIZED (
    SELECT feat_id,
           COUNT(CASE WHEN normed > 0 THEN 1 END) AS normed_n,
           (SUM(normed * normed) - SUM(normed) * SUM(normed) / nc.n_total_cells)
             / (nc.n_total_cells - 1) AS sigmas,
           SUM(normed) / nc.n_total_cells AS avg_all
    FROM normed CROSS JOIN nc GROUP BY feat_id, nc.n_total_cells),
  s AS MATERIALIZED (
    SELECT feat_id, sigmas, LOG2(avg_all) AS log_mean
    FROM stats WHERE normed_n >= 5),
  bounds AS MATERIALIZED (SELECT MIN(log_mean) AS lo, MAX(log_mean) AS hi FROM s),
  binned AS MATERIALIZED (
    SELECT s.*, LEAST(FLOOR((s.log_mean - b.lo) / ((b.hi - b.lo) / 10)), 9) AS bin
    FROM s CROSS JOIN bounds b),
  sel AS MATERIALIZED (
    SELECT feat_id FROM (
      SELECT feat_id, ROUND(sigmas / AVG(sigmas) OVER (PARTITION BY bin), 6) AS c_var
      FROM binned)
    ORDER BY c_var DESC, feat_id LIMIT {D}),
  fidx AS MATERIALIZED (
    SELECT feat_id, CAST(ROW_NUMBER() OVER (ORDER BY feat_id) AS INT) AS idx
    FROM sel),
  vals AS MATERIALIZED (
    SELECT n.cell_id, f.idx, SUM(n.normed) AS x
    FROM normed n JOIN fidx f ON n.feat_id = f.feat_id
    GROUP BY n.cell_id, f.idx),
  cells0 AS MATERIALIZED (SELECT DISTINCT cell_id FROM vals),
  n1 AS (SELECT COUNT(*) AS n FROM cells0),
  dense AS MATERIALIZED (
    SELECT c.cell_id, f.idx, COALESCE(v.x, 0.0) AS x
    FROM cells0 c CROSS JOIN fidx f
    LEFT JOIN vals v ON c.cell_id = v.cell_id AND f.idx = v.idx),
  mom AS MATERIALIZED (
    SELECT idx, ROUND(SUM(x) / n1.n, 5) AS m,
           ROUND(SQRT((SUM(x * x) - SUM(x) * SUM(x) / n1.n) / (n1.n - 1)), 5) AS sd
    FROM dense CROSS JOIN n1 GROUP BY idx, n1.n),
  z AS MATERIALIZED (
    SELECT d.cell_id, d.idx,
           CASE WHEN mom.sd > 0 THEN (d.x - mom.m) / mom.sd ELSE 0.0 END AS z
    FROM dense d JOIN mom ON d.idx = mom.idx),
  covu AS MATERIALIZED (
    SELECT a.idx AS i, b.idx AS j,
           ROUND(SUM(a.z * b.z) / (n1.n - 1), 5) AS cv
    FROM z a JOIN z b ON a.cell_id = b.cell_id AND a.idx <= b.idx
    CROSS JOIN n1
    GROUP BY a.idx, b.idx, n1.n),
  covf AS MATERIALIZED (
    SELECT i, j, cv FROM covu
    UNION ALL SELECT j, i, cv FROM covu WHERE i <> j),
  covm AS MATERIALIZED (
    SELECT LIST(rl ORDER BY i) AS c FROM (
      SELECT i, LIST(cv ORDER BY j) AS rl FROM covf GROUP BY i)),
  iter AS (
    SELECT 0 AS it, c, list_value({IDENT}) AS v
    FROM covm
    UNION ALL
    SELECT it + 1, c, {VNEXT} AS v
    FROM iter WHERE it < {T}),
  fin AS MATERIALIZED (SELECT v FROM iter WHERE it = {T}),
  zrows AS MATERIALIZED (
    SELECT cell_id, LIST(z ORDER BY idx) AS zs FROM z GROUP BY cell_id)
  SELECT r.cell_id, comp.j - 1 AS component,
         ROUND(list_sum(list_transform({R31}, i -> r.zs[i] * f.v[comp.j][i])), 4) AS value
  FROM zrows r CROSS JOIN fin f
  CROSS JOIN (SELECT UNNEST(range(1, {K + 1})) AS j) comp
  ORDER BY r.cell_id, component"""

con = duckdb.connect()
for fpath in glob.glob(f"{sf}/*.parquet"):
    con.sql(f"CREATE VIEW {os.path.basename(fpath)[:-8]} AS SELECT * FROM '{fpath}'")
oracle = con.sql(SQL).df()
print(oracle.head(6))
print(len(oracle), "rows")

if len(sys.argv) > 2:
    import pyarrow.parquet as pq
    import pyarrow as pa
    import numpy as np
    files = sorted(glob.glob(f"{sys.argv[2]}/*.parquet"))
    spark = pa.concat_tables([pq.read_table(f) for f in files]).to_pandas()
    merged = oracle.merge(spark, on=["cell_id", "component"], suffixes=("_o", "_s"))
    diff = (merged.value_o - merged.value_s).abs()
    print("rows:", len(oracle), "vs", len(spark),
          "max|diff|:", diff.max(), "mismatches:", (diff > 1e-12).sum())
    print(merged[diff > 1e-12].head(10))
