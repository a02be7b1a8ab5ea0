#!/usr/bin/env python3
"""Prototype of the q69 multi-index IVF ANN DuckDB oracle: for each of 3
rounds, replay Cluster.lloyd's training (md5-ranked distinct-vector
init, 10 iterations, 9 dp-rounded means) over the 128-dim embeddings,
assign/probe lists, exact l2 within probed lists; union rounds, dedupe,
top-k. Mirrors Knn.ivfSelfKnn(k=5, nLists=16, nProbe=4, rounds=3).
Usage: proto_q69.py <sfDir> [sparkParquetDir]
"""
import sys, glob, os
import duckdb

sf = sys.argv[1]
NL, NPROBE, ROUNDS, ITERS, K, DIM, SEED = 16, 4, 3, 10, 5, 128, 4466

RD = f"range(1, {DIM + 1})"
# squared distance between a vector list a and center list c (no sqrt —
# lloyd's assignment metric; ascending-index accumulation)
def d2(a, c):
    return f"list_sum(list_transform({RD}, i -> ({a}[i] - {c}[i]) * ({a}[i] - {c}[i])))"


def lloyd_round(r):
    seed = SEED + 7919 * r
    ctes = [f"""
  init{r} AS MATERIALIZED (
    SELECT CAST(ROW_NUMBER() OVER (ORDER BY hsh, cell_id) AS INT) AS cid, p AS c
    FROM (SELECT * FROM (
            SELECT v.*, MD5('{seed}:' || cell_id) AS hsh,
                   ROW_NUMBER() OVER (PARTITION BY p ORDER BY MD5('{seed}:' || cell_id), cell_id) AS rv
            FROM v) WHERE rv = 1)
    ORDER BY hsh, cell_id LIMIT {NL}),
  cent{r}_0 AS MATERIALIZED (SELECT cid, c FROM init{r})"""]
    for t in range(1, ITERS + 1):
        ctes.append(f"""
  asg{r}_{t} AS MATERIALIZED (
    SELECT cell_id, cid FROM (
      SELECT v.cell_id, k.cid,
             ROW_NUMBER() OVER (PARTITION BY v.cell_id
               ORDER BY {d2('v.p', 'k.c')}, k.cid) AS rn
      FROM v CROSS JOIN cent{r}_{t - 1} k) WHERE rn = 1),
  cent{r}_{t} AS MATERIALIZED (
    SELECT p.cid, COALESCE(m.c, p.c) AS c
    FROM cent{r}_{t - 1} p LEFT JOIN (
      SELECT cid, LIST(m ORDER BY pos) AS c FROM (
        SELECT a.cid, u.pos, ROUND(AVG(u.x), 9) AS m
        FROM asg{r}_{t} a JOIN vex u ON a.cell_id = u.cell_id
        GROUP BY a.cid, u.pos)
      GROUP BY cid) m ON p.cid = m.cid)""")
    ctes.append(f"""
  lists{r} AS MATERIALIZED (
    SELECT cell_id, cid AS list FROM (
      SELECT v.cell_id, k.cid,
             ROW_NUMBER() OVER (PARTITION BY v.cell_id
               ORDER BY {d2('v.p', 'k.c')}, k.cid) AS rn
      FROM v CROSS JOIN cent{r}_{ITERS} k) WHERE rn = 1),
  probes{r} AS MATERIALIZED (
    SELECT cell_id, cid AS list FROM (
      SELECT v.cell_id, k.cid,
             ROW_NUMBER() OVER (PARTITION BY v.cell_id
               ORDER BY {d2('v.p', 'k.c')}, k.cid) AS rn
      FROM v CROSS JOIN cent{r}_{ITERS} k) WHERE rn <= {NPROBE}),
  cand{r} AS MATERIALIZED (
    SELECT p.cell_id AS src, l.cell_id AS dst,
           SQRT(list_sum(list_transform({RD},
             i -> (a.p[i] - b.p[i]) * (a.p[i] - b.p[i])))) AS dist
    FROM probes{r} p JOIN lists{r} l ON p.list = l.list
    JOIN v a ON p.cell_id = a.cell_id JOIN v b ON l.cell_id = b.cell_id
    WHERE p.cell_id <> l.cell_id)""")
    return ",".join(ctes)


ROUND_CTES = ",".join(lloyd_round(r) for r in range(ROUNDS))
UNION = " UNION ALL ".join(f"SELECT * FROM cand{r}" for r in range(ROUNDS))

SQL = f"""WITH v AS MATERIALIZED (
    SELECT vec_id AS cell_id, embedding::DOUBLE[] AS p FROM embeddings),
  vex AS MATERIALIZED (
    SELECT cell_id, GENERATE_SUBSCRIPTS(p, 1) AS pos, UNNEST(p) AS x FROM v),{ROUND_CTES},
  allc AS MATERIALIZED ({UNION}),
  dd AS MATERIALIZED (
    SELECT src, dst, MIN(dist) AS dist FROM allc GROUP BY src, dst)
  SELECT src, dst, ROUND(dist, 6) AS dist, CAST(rn AS INT) AS rn FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY src ORDER BY dist, dst) AS rn
    FROM dd) WHERE rn <= {K}
  ORDER BY src, rn"""

con = duckdb.connect()
for fpath in glob.glob(f"{sf}/*.parquet"):
    con.sql(f"CREATE VIEW {os.path.basename(fpath)[:-8]} AS SELECT * FROM '{fpath}'")
oracle = con.sql(SQL).df()
print(len(oracle), "rows")

if len(sys.argv) > 2:
    import pyarrow.parquet as pq
    import pyarrow as pa
    files = sorted(glob.glob(f"{sys.argv[2]}/*.parquet"))
    spark = pa.concat_tables([pq.read_table(f) for f in files]).to_pandas()
    merged = oracle.merge(spark, on=["src", "rn"], suffixes=("_o", "_s"))
    bad = merged[(merged.dst_o != merged.dst_s) |
                 ((merged.dist_o - merged.dist_s).abs() > 1e-12)]
    print("rows:", len(oracle), "vs", len(spark), "mismatches:", len(bad))
    print(bad.head(10))
