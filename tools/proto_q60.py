#!/usr/bin/env python3
"""Prototype of the q60 full-demux DuckDB oracle: CLR -> deterministic
Lloyd's KMeans (25 unrolled iterations) -> background cluster argmin ->
NB-MLE golden section (Lanczos lgamma, recursive CTE) -> log-space ppf
(recursive CTE) -> classify. Mirrors graft.stats.HtoDemux.demux +
graft.pipeline.Cluster.lloyd step by step.
Usage: proto_q60.py <sfDir> [sparkParquetDir]
"""
import sys, glob, os
import duckdb

sf = sys.argv[1]

PHI = "((SQRT(5.0) - 1) / 2)"


def body(z):
    """Lanczos lgamma body for z >= 0.5, matching the Scala constant and
    summation order exactly (denominators z, z+1, ..., z+7)."""
    terms = ["0.99999999999980993",
             f"676.5203681218851/({z})",
             f"(-1259.1392167224028)/(({z}) + 1.0)",
             f"771.32342877765313/(({z}) + 2.0)",
             f"(-176.61502916214059)/(({z}) + 3.0)",
             f"12.507343278686905/(({z}) + 4.0)",
             f"(-0.13857109526572012)/(({z}) + 5.0)",
             f"9.9843695780195716e-6/(({z}) + 6.0)",
             f"1.5056327351493116e-7/(({z}) + 7.0)"]
    a = " + ".join(terms)
    return (f"(0.5 * LN(2 * PI()) + (({z}) - 0.5) * LN(({z}) + 6.5)"
            f" - (({z}) + 6.5) + LN({a}))")


def lgam(x):
    return (f"(CASE WHEN ({x}) < 0.5 THEN LN(PI() / SIN(PI() * ({x})))"
            f" - {body(f'1.0 - ({x})')} ELSE {body(x)} END)")


def ll(alpha):
    """NB2 log-likelihood over the vals histogram list for dispersion
    expression `alpha` (r recomputed per use = same bits as Scala's
    single division since the operands are identical)."""
    r = f"(1.0/({alpha}))"
    p = f"({r}/({r} + mu))"
    return (f"list_sum(list_transform(vals, e -> e.m * ("
            f"{lgam(f'e.v + {r}')} - {lgam(r)} - {lgam('e.v + 1.0')}"
            f" + {r} * LN({p}) + e.v * LN(1.0 - {p}))))")


# 25 unrolled Lloyd iterations
lloyd = []
for t in range(1, 26):
    lloyd.append(f"""
  assign{t} AS MATERIALIZED (
    SELECT cell_id, x1, x2, cid FROM (
      SELECT c.cell_id, c.x1, c.x2, k.cid,
             ROW_NUMBER() OVER (PARTITION BY c.cell_id
               ORDER BY (c.x1 - k.cx)*(c.x1 - k.cx) + (c.x2 - k.cy)*(c.x2 - k.cy), k.cid) AS rn
      FROM cells c CROSS JOIN cent{t - 1} k) WHERE rn = 1),
  cent{t} AS MATERIALIZED (
    SELECT p.cid, COALESCE(m.mx, p.cx) AS cx, COALESCE(m.my, p.cy) AS cy
    FROM cent{t - 1} p LEFT JOIN (
      SELECT cid, ROUND(AVG(x1), 9) AS mx, ROUND(AVG(x2), 9) AS my
      FROM assign{t} GROUP BY cid) m ON p.cid = m.cid)""")
LLOYD = ",".join(lloyd)

C0 = f"(8.0 - {PHI} * (8.0 - (-12.0)))"
D0 = f"((-12.0) + {PHI} * (8.0 - (-12.0)))"

SQL = f"""WITH RECURSIVE h AS MATERIALIZED (
    SELECT l_orderkey AS cell_id,
           SUM(CASE WHEN l_partkey BETWEEN 1 AND 50 THEN l_quantity ELSE 0 END) AS h1,
           SUM(CASE WHEN l_partkey BETWEEN 51 AND 100 THEN l_quantity ELSE 0 END) AS h2
    FROM lineitem GROUP BY l_orderkey),
  nc AS (SELECT COUNT(*) AS n FROM h),
  f AS MATERIALIZED (
    SELECT ROUND(EXP(SUM(LN(h1 + 1)) / nc.n), 6) AS f1,
           ROUND(EXP(SUM(LN(h2 + 1)) / nc.n), 6) AS f2
    FROM h CROSS JOIN nc GROUP BY nc.n),
  cells AS MATERIALIZED (
    SELECT cell_id, h1, h2,
           LN(h1 / f.f1 + 1) AS x1, LN(h2 / f.f2 + 1) AS x2,
           MD5('4466:' || cell_id) AS hsh
    FROM h CROSS JOIN f),
  cent0 AS MATERIALIZED (
    SELECT ROW_NUMBER() OVER (ORDER BY hsh, cell_id) AS cid, x1 AS cx, x2 AS cy
    FROM (SELECT * FROM (
            SELECT cells.*, ROW_NUMBER() OVER (PARTITION BY x1, x2
              ORDER BY hsh, cell_id) AS rv FROM cells) WHERE rv = 1)
    ORDER BY hsh, cell_id LIMIT 3),{LLOYD},
  avgexp AS MATERIALIZED (
    SELECT hto, cid, AVG(x) AS m FROM (
      SELECT cid, 'HTO1' AS hto, x1 AS x FROM assign25
      UNION ALL SELECT cid, 'HTO2', x2 FROM assign25) GROUP BY hto, cid),
  bg AS MATERIALIZED (SELECT hto, cid AS bgc FROM (
      SELECT hto, cid, ROW_NUMBER() OVER (PARTITION BY hto ORDER BY m, cid) AS rn
      FROM avgexp) WHERE rn = 1),
  hist AS MATERIALIZED (
    SELECT nv.hto, nv.v, CAST(COUNT(*) AS BIGINT) AS m FROM (
      SELECT a.cid, 'HTO1' AS hto, CAST(c.h1 AS DOUBLE) AS v
      FROM assign25 a JOIN cells c USING (cell_id)
      UNION ALL
      SELECT a.cid, 'HTO2', CAST(c.h2 AS DOUBLE)
      FROM assign25 a JOIN cells c USING (cell_id)) nv
    JOIN bg ON nv.hto = bg.hto AND nv.cid = bg.bgc
    GROUP BY nv.hto, nv.v),
  nb0 AS MATERIALIZED (
    SELECT hto, LIST({{'v': v, 'm': m}} ORDER BY v) AS vals,
           GREATEST(SUM(v * m) / SUM(m), 1e-8) AS mu
    FROM hist GROUP BY hto),
  gold AS (
    SELECT hto, vals, mu,
           CAST(-12.0 AS DOUBLE) AS lo, CAST(8.0 AS DOUBLE) AS hi,
           {C0} AS c, {D0} AS d,
           {ll(f'EXP({C0})')} AS fc,
           {ll(f'EXP({D0})')} AS fd,
           0 AS it
    FROM nb0
    UNION ALL
    SELECT hto, vals, mu,
           CASE WHEN fc > fd THEN lo ELSE c END AS nlo,
           CASE WHEN fc > fd THEN d ELSE hi END AS nhi,
           CASE WHEN fc > fd THEN nhi - {PHI} * (nhi - nlo) ELSE d END AS ncc,
           CASE WHEN fc > fd THEN c ELSE nlo + {PHI} * (nhi - nlo) END AS ndd,
           CASE WHEN fc > fd THEN {ll('EXP(ncc)')} ELSE fd END AS nfc,
           CASE WHEN fc > fd THEN fc ELSE {ll('EXP(ndd)')} END AS nfd,
           it + 1
    FROM gold WHERE it < 80 AND hi - lo > 1e-9),
  goldfin AS MATERIALIZED (
    SELECT hto, mu, EXP((lo + hi) / 2) AS alpha FROM (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY hto ORDER BY it DESC) AS r
      FROM gold) WHERE r = 1),
  nbp AS MATERIALIZED (
    SELECT hto, mu, 1.0/alpha AS r,
           (1.0/alpha) / ((1.0/alpha) + mu) AS p
    FROM goldfin),
  ppf AS (
    SELECT hto, mu, r, p, CAST(0 AS BIGINT) AS k,
           r * LN(p) AS logpmf, EXP(r * LN(p)) AS cdf
    FROM nbp
    UNION ALL
    SELECT hto, mu, r, p, k + 1,
           logpmf + LN((k + r) / (k + 1.0)) + LN(1.0 - p) AS nlogpmf,
           cdf + EXP(nlogpmf) AS ncdf
    FROM ppf WHERE cdf < 0.99 AND k < 1000000),
  cut AS MATERIALIZED (
    SELECT hto, CAST(FLOOR(mu + k + 0.5) AS BIGINT) AS cutoff FROM (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY hto ORDER BY k DESC) AS rr
      FROM ppf) WHERE rr = 1),
  c2 AS (SELECT cell_id, 'HTO1' AS hto, h1 AS cnt FROM h
         UNION ALL SELECT cell_id, 'HTO2', h2 FROM h),
  disc AS (SELECT c2.cell_id, c2.hto, c2.cnt,
                  CASE WHEN c2.cnt > t.cutoff THEN 1 ELSE 0 END AS pos
           FROM c2 JOIN cut t ON c2.hto = t.hto),
  best AS (SELECT cell_id, hto AS top_hto FROM (
             SELECT cell_id, hto,
                    ROW_NUMBER() OVER (PARTITION BY cell_id ORDER BY cnt DESC, hto) AS rn
             FROM disc) WHERE rn = 1),
  agg AS (SELECT cell_id, SUM(pos) AS n_pos FROM disc GROUP BY cell_id)
  SELECT a.cell_id,
         CASE WHEN a.n_pos = 0 THEN 'Negative'
              WHEN a.n_pos > 1 THEN 'Doublet'
              ELSE b.top_hto END AS call
  FROM agg a JOIN best b ON a.cell_id = b.cell_id
  ORDER BY a.cell_id"""

con = duckdb.connect()
for fpath in glob.glob(f"{sf}/*.parquet"):
    con.sql(f"CREATE VIEW {os.path.basename(fpath)[:-8]} AS SELECT * FROM '{fpath}'")
oracle = con.sql(SQL).df()
print(oracle.head(6))
print(len(oracle), "rows;", oracle.call.value_counts().to_dict())
print("cutoffs:", con.sql("SELECT * FROM (" + SQL[:SQL.rindex("c2 AS")]
      + " sel AS (SELECT 1)SELECT * FROM cut)").df().to_dict("records")
      if False else "skip")

if len(sys.argv) > 2:
    import pyarrow.parquet as pq
    import pyarrow as pa
    files = sorted(glob.glob(f"{sys.argv[2]}/*.parquet"))
    spark = pa.concat_tables([pq.read_table(f) for f in files]).to_pandas()
    merged = oracle.merge(spark, on="cell_id", suffixes=("_o", "_s"))
    bad = merged[merged.call_o != merged.call_s]
    print("rows:", len(oracle), "vs", len(spark), "mismatches:", len(bad))
    print(bad.head(20))
