#!/usr/bin/env python3
"""Prototype of the q67 knn_clustering DuckDB oracle: q56's binned
profiles (6 dp-rounded) -> exact feature self-KNN (l2 on the rounded
profiles) -> the Paris agglomeration REPLAYED as a recursive CTE over a
79x79 integer weight matrix (binary KNN + symmetrization keep every sum
exact) -> cut_straight -> argmax-median module reorder.
Usage: proto_q67.py <sfDir> [sparkParquetDir]
"""
import sys, glob, os
import duckdb

sf = sys.argv[1]
NF = 40        # selected features (leaves)
K = 5          # knn
NC = 4         # clusters
NB = 20        # bins
TOT = 2 * NF - 1          # 79 internal node ids (1-based)
MERGES = NF - 1           # 39
KEEP = MERGES - (NC - 1)  # 36

R_N = f"range(1, {TOT + 1})"

# candidate pairs (alive, connected), sorted by (d, a, b); d = exact
# integer products/divisions
CANDS = f"""flatten(list_transform({R_N}, a ->
  flatten(list_transform(range(a + 1, {TOT + 1}), b ->
    CASE WHEN alive[a] = 1 AND alive[b] = 1 AND c[a][b] > 0
         THEN [{{'d': mass[a] * mass[b] / (wtot * c[a][b]), 'a': a, 'b': b}}]
         ELSE [] END))))"""

# best pair: min (d, a, b), or the two smallest alive ids when no
# connected pair remains (infinite-distance merge)
BEST = f"""list_transform([{CANDS}], cd ->
  CASE WHEN len(cd) > 0 THEN {{'a': list_sort(cd)[1].a, 'b': list_sort(cd)[1].b}}
       ELSE list_transform([list_filter({R_N}, x2 -> alive[x2] = 1)], al ->
              {{'a': al[1], 'b': al[2]}})[1] END)[1]"""

# one merge step: bind best, then rewrite alive/mass/links/matrix
STEP_V = f"""list_transform([{BEST}], bst ->
  {{'alive': list_transform({R_N}, x -> CASE WHEN x = bst.a OR x = bst.b THEN 0
       WHEN x = {NF} + it + 1 THEN 1 ELSE alive[x] END),
   'mass': list_transform({R_N}, x -> CASE WHEN x = {NF} + it + 1
       THEN mass[bst.a] + mass[bst.b] ELSE mass[x] END),
   'links': list_append(links, {{'a': bst.a, 'b': bst.b}}),
   'c': list_transform({R_N}, x -> list_transform({R_N}, y ->
      CASE WHEN x = {NF} + it + 1 THEN
             CASE WHEN y = bst.a OR y = bst.b OR y = x THEN 0.0
                  ELSE c[bst.a][y] + c[bst.b][y] END
           WHEN y = {NF} + it + 1 THEN
             CASE WHEN x = bst.a OR x = bst.b THEN 0.0
                  ELSE c[x][bst.a] + c[x][bst.b] END
           WHEN x = bst.a OR x = bst.b OR y = bst.a OR y = bst.b THEN 0.0
           ELSE c[x][y] END))}})[1]"""

SQL = f"""WITH RECURSIVE coo AS MATERIALIZED (
    SELECT l_orderkey AS cell_id, l_partkey AS feat_id,
           SUM(l_quantity) AS value
    FROM lineitem GROUP BY 1, 2),
  sel AS MATERIALIZED (
    SELECT feat_id FROM (
      SELECT feat_id, COUNT(*) AS nnz FROM coo GROUP BY feat_id)
    ORDER BY nnz DESC, feat_id LIMIT {NF}),
  dense AS MATERIALIZED (
    SELECT o.o_orderkey AS cell_id, s.feat_id,
           EPOCH_MS(o.o_orderdate) AS ptime,
           COALESCE(c.value, 0) AS v
    FROM orders o CROSS JOIN sel s
    LEFT JOIN coo c ON c.cell_id = o.o_orderkey AND c.feat_id = s.feat_id),
  rolled AS MATERIALIZED (
    SELECT *, AVG(v) OVER (PARTITION BY feat_id ORDER BY ptime, cell_id
           ROWS BETWEEN 2 PRECEDING AND 2 FOLLOWING) AS r
    FROM dense),
  st AS MATERIALIZED (
    SELECT feat_id, AVG(r) AS mu, STDDEV_SAMP(r) AS sd
    FROM rolled GROUP BY feat_id),
  zb AS MATERIALIZED (
    SELECT rolled.feat_id AS feat_id,
           CASE WHEN st.sd <> 0 THEN (rolled.r - st.mu) / st.sd ELSE 0.0 END AS z,
           NTILE({NB}) OVER (PARTITION BY rolled.feat_id
             ORDER BY rolled.ptime, rolled.cell_id) AS bin
    FROM rolled JOIN st ON rolled.feat_id = st.feat_id),
  prof AS MATERIALIZED (
    SELECT feat_id, bin, ROUND(AVG(z), 6) AS z_mean
    FROM zb GROUP BY feat_id, bin),
  vecs AS MATERIALIZED (
    SELECT feat_id, LIST(z_mean ORDER BY bin) AS p FROM prof GROUP BY feat_id),
  fmap AS MATERIALIZED (
    SELECT feat_id, CAST(ROW_NUMBER() OVER (ORDER BY feat_id) AS INT) AS leaf
    FROM vecs),
  knn AS MATERIALIZED (
    SELECT src, dst FROM (
      SELECT a.feat_id AS src, b.feat_id AS dst,
             ROW_NUMBER() OVER (PARTITION BY a.feat_id ORDER BY
               SQRT(list_sum(list_transform(range(1, {NB + 1}),
                 i -> (a.p[i] - b.p[i]) * (a.p[i] - b.p[i])))), b.feat_id) AS rn
      FROM vecs a JOIN vecs b ON a.feat_id <> b.feat_id)
    WHERE rn <= {K}),
  wm AS MATERIALIZED (
    SELECT fa.leaf AS i, fb.leaf AS j, CAST(COUNT(*) AS DOUBLE) AS w FROM (
      SELECT src, dst FROM knn UNION ALL SELECT dst, src FROM knn) e
    JOIN fmap fa ON e.src = fa.feat_id JOIN fmap fb ON e.dst = fb.feat_id
    GROUP BY fa.leaf, fb.leaf),
  init AS MATERIALIZED (
    SELECT LIST(rl ORDER BY x) AS c,
           LIST(ms ORDER BY x) AS mass,
           LIST(CASE WHEN x <= {NF} THEN 1 ELSE 0 END ORDER BY x) AS alive,
           SUM(ms) AS wtot
    FROM (
      SELECT x.x AS x,
             LIST(COALESCE(wm.w, 0.0) ORDER BY y.x) AS rl,
             SUM(COALESCE(wm.w, 0.0)) AS ms
      FROM (SELECT UNNEST({R_N}) AS x) x
      CROSS JOIN (SELECT UNNEST({R_N}) AS x) y
      LEFT JOIN wm ON wm.i = x.x AND wm.j = y.x
      GROUP BY x.x)),
  agg AS (
    SELECT 0 AS it, c, mass, alive, wtot,
           CAST([] AS STRUCT(a INT, b INT)[]) AS links
    FROM init
    UNION ALL
    SELECT it + 1, stp.c, stp.mass, stp.alive, wtot, stp.links
    FROM (SELECT *, {STEP_V} AS stp FROM agg WHERE it < {MERGES})),
  linksf AS MATERIALIZED (
    SELECT links FROM agg WHERE it = {MERGES}),
  parents AS MATERIALIZED (
    SELECT l.e.a AS child, {NF} + l.j AS parent FROM (
      SELECT UNNEST(links) AS e, GENERATE_SUBSCRIPTS(links, 1) AS j
      FROM linksf) l
    WHERE l.j <= {KEEP}
    UNION ALL
    SELECT l.e.b, {NF} + l.j FROM (
      SELECT UNNEST(links) AS e, GENERATE_SUBSCRIPTS(links, 1) AS j
      FROM linksf) l
    WHERE l.j <= {KEEP}),
  chase AS (
    SELECT leaf, leaf AS cur FROM (SELECT UNNEST(range(1, {NF + 1})) AS leaf)
    UNION ALL
    SELECT chase.leaf, p.parent FROM chase JOIN parents p ON chase.cur = p.child),
  roots AS MATERIALIZED (
    SELECT leaf, MAX(cur) AS root FROM chase GROUP BY leaf),
  relabel AS MATERIALIZED (
    SELECT root, CAST(ROW_NUMBER() OVER (ORDER BY cnt DESC, root) AS BIGINT) AS cl
    FROM (SELECT root, COUNT(*) AS cnt FROM roots GROUP BY root)),
  labels0 AS MATERIALIZED (
    SELECT f.feat_id, rl.cl AS cluster
    FROM roots r JOIN fmap f ON r.leaf = f.leaf
    JOIN relabel rl ON r.root = rl.root),
  amax AS MATERIALIZED (
    SELECT feat_id, CAST(list_position(p, list_aggregate(p, 'max')) AS BIGINT) AS am
    FROM vecs),
  med AS MATERIALIZED (
    SELECT l.cluster, quantile_cont(a.am, 0.5) AS md
    FROM labels0 l JOIN amax a ON l.feat_id = a.feat_id
    GROUP BY l.cluster),
  ord2 AS MATERIALIZED (
    SELECT cluster, CAST(ROW_NUMBER() OVER (ORDER BY md, cluster) AS BIGINT) AS newc
    FROM med)
  SELECT l.feat_id, o.newc AS cluster
  FROM labels0 l JOIN ord2 o ON l.cluster = o.cluster
  ORDER BY l.feat_id"""

con = duckdb.connect()
for fpath in glob.glob(f"{sf}/*.parquet"):
    con.sql(f"CREATE VIEW {os.path.basename(fpath)[:-8]} AS SELECT * FROM '{fpath}'")
oracle = con.sql(SQL).df()
print(oracle.head(6))
print(len(oracle), "rows;", oracle.cluster.value_counts().to_dict())

if len(sys.argv) > 2:
    import pyarrow.parquet as pq
    import pyarrow as pa
    files = sorted(glob.glob(f"{sys.argv[2]}/*.parquet"))
    spark = pa.concat_tables([pq.read_table(f) for f in files]).to_pandas()
    merged = oracle.merge(spark, on="feat_id", suffixes=("_o", "_s"))
    bad = merged[merged.cluster_o != merged.cluster_s]
    print("rows:", len(oracle), "vs", len(spark), "mismatches:", len(bad))
    print(bad.head(12))
