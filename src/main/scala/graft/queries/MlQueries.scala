package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.pipeline.{Metrics, Pseudotime, Reduce}

/** ML-tagged operators exposed as driver queries WITHOUT SQL oracles
  * (SURVEY.md §2 [ML]): the driver records a rows-only check; value-level
  * validation lives in the ScalaTest specs (golden/invariant style, as
  * the reference's own CI does — SURVEY.md §5).
  */
object MlQueries {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // z-scale + PCA latent space over the top-30-variable feature slice
    "q53_pca_latent" -> ((s, d) => {
      val coo = Tables.coo(s, d)
      val normed = graft.norm.Normalize.libSizeLog(coo)
        .select("cell_id", "feat_id", "normed")
      val stats = graft.stats.MatrixStats.featureStats(normed, Tables.nCells(coo))
      val sel = graft.stats.MatrixStats
        .topVariableFeatures(stats, nBins = 10, topN = 30, minCells = 5)
        .select("feat_id")
      val vecs = Reduce.assembleVectors(
        normed.join(broadcast(sel), Seq("feat_id")),
        Reduce.featureIndex(sel), "normed")
      // Scalar rows (cell_id, component, value): the driver's rows-only
      // check sorts/hashes columns, which fails on array columns.
      Reduce.pca(vecs, dims = 5)
        .select(col("cell_id"), posexplode(col("latent")).as(Seq("component", "value")))
        .select(col("cell_id"), col("component"), round(col("value"), 4).as("value"))
        .orderBy("cell_id", "component")
    }),

    // LISI of the embedding KNN graph against the stored labels
    "q54_lisi" -> ((s, d) => {
      val e = Tables.t(s, d, "embeddings")
      val q = e.filter(col("vec_id") % 50 === 0)
        .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
      val knn = graft.sim.Similarity.cosineTopK(q, e, 10)
        .select(col("qid").as("src"), col("vec_id").as("dst"),
          (lit(1.0) - col("cos")).as("dist"))
      val labels = e.select(col("vec_id").as("cell_id"),
        col("label").cast("string").as("label"))
      Metrics.lisi(knn, labels, perplexity = 5.0)
        .select(col("cell_id"), round(col("lisi"), 4).as("lisi"))
        .orderBy("cell_id")
    }),

    // LOWESS-corrected HVG variance (fit_lowess, scarf/feat_utils.py:11-46)
    "q59_hvg_lowess" -> ((s, d) => {
      val coo = Tables.coo(s, d)
      val normed = graft.norm.Normalize.libSizeLog(coo)
        .select("cell_id", "feat_id", "normed")
      val stats = graft.stats.MatrixStats.featureStats(normed, Tables.nCells(coo))
      graft.stats.Lowess.correctedVar(stats, nBins = 10, frac = 0.5)
        .select(col("feat_id"), round(col("c_var_lowess"), 4).as("c_var_lowess"))
        .orderBy("feat_id")
    }),

    // Seurat-style HTO demux: CLR → KMeans → NB-MLE background cutoff
    // (hto_demux, scarf/feat_utils.py:95-162)
    "q60_hto_nb" -> ((s, d) => {
      val coo = Tables.coo(s, d)
      val counts = coo.groupBy("cell_id").agg(
          sum(when(col("feat_id").between(1, 50), col("value")).otherwise(0.0)).as("HTO1"),
          sum(when(col("feat_id").between(51, 100), col("value")).otherwise(0.0)).as("HTO2"))
        .select(col("cell_id"),
          explode(array(
            struct(lit("HTO1").as("hto"), col("HTO1").as("count")),
            struct(lit("HTO2").as("hto"), col("HTO2").as("count")))).as("e"))
        .select(col("cell_id"), col("e.hto"), col("e.count"))
      graft.stats.HtoDemux.demux(counts)
        .orderBy("cell_id")
    }),

    // lazy-PPR pseudotime over the SNN co-occurrence graph
    "q55_pseudotime" -> ((s, d) => {
      val edges = Tables.t(s, d, "lineitem").filter(col("l_partkey") % 10 === 0)
        .select(col("l_orderkey").as("src"), col("l_partkey").as("dst")).distinct()
      val snn = graft.graph.GraphOps.snn(edges, 2)
      val sym = snn.select(col("i").as("src"), col("j").as("dst"),
          col("shared").cast("double").as("weight"))
        .unionByName(snn.select(col("j").as("src"), col("i").as("dst"),
          col("shared").cast("double").as("weight")))
      val source = sym.agg(min(col("src")).as("cell_id"))
      Pseudotime.score(sym, source, iters = 10)
        .select(col("cell_id"), round(col("pseudotime"), 4).as("pseudotime"))
        .orderBy("cell_id")
    }))

  /** DuckDB oracles for the ML queries that ARE SQL-expressible after all:
    * q55's lazy-PPR core unrolls to 10 materialized join+aggregate CTEs
    * (materialization matters — x_k is referenced twice, so inlined CTEs
    * would re-expand 2^10 scans); q54's perplexity calibration is the
    * exact 64-step beta bisection as a recursive CTE over k-bounded
    * neighbor lists. Both verified bit-identical at 4 dp against the
    * Spark plans on sf0.01.
    */
  val oracle: Map[String, String] = Map(
    "q55_pseudotime" -> {
      val om = (1 - 0.85).toString // Scala's exact double bits for 1-alpha
      val iters = (1 to 10).map { k =>
        s""",
         push$k AS MATERIALIZED (SELECT n.dst AS cell_id, SUM(n.p * x.x) AS pushed
                     FROM norm n JOIN x${k - 1} x ON n.src = x.cell_id GROUP BY n.dst),
         x$k AS MATERIALIZED (SELECT c.cell_id,
                    $om * (CASE WHEN c.cell_id = s.s_id THEN 1.0 ELSE 0.0 END)
                    + 0.85 * (COALESCE(xp.x, 0.0) + COALESCE(pk.pushed, 0.0)) / 2 AS x
                  FROM cells c CROSS JOIN srcv s
                  LEFT JOIN x${k - 1} xp ON c.cell_id = xp.cell_id
                  LEFT JOIN push$k pk ON c.cell_id = pk.cell_id)"""
      }.mkString
      s"""WITH e AS MATERIALIZED (
           SELECT DISTINCT l_orderkey AS src, l_partkey AS dst
           FROM lineitem WHERE l_partkey % 10 = 0),
         snn AS MATERIALIZED (
           SELECT a.src AS i, b.src AS j, CAST(COUNT(*) AS DOUBLE) AS w
           FROM e a JOIN e b ON a.dst = b.dst AND a.src < b.src
           GROUP BY 1, 2 HAVING COUNT(*) >= 2),
         sym AS MATERIALIZED (SELECT i AS src, j AS dst, w FROM snn
           UNION ALL SELECT j, i, w FROM snn),
         norm AS MATERIALIZED (
           SELECT src, dst, w / SUM(w) OVER (PARTITION BY src) AS p FROM sym),
         cells AS MATERIALIZED (SELECT DISTINCT src AS cell_id FROM sym),
         srcv AS MATERIALIZED (SELECT MIN(src) AS s_id FROM sym),
         x0 AS MATERIALIZED (
           SELECT c.cell_id, CASE WHEN c.cell_id = s.s_id THEN 1.0 ELSE 0.0 END AS x
           FROM cells c CROSS JOIN srcv s)$iters,
         pot AS (SELECT cell_id, -LN(1 + x) AS pot FROM x10),
         mm AS (SELECT MIN(pot) AS lo, MAX(pot) AS hi FROM pot)
         SELECT cell_id, ROUND((pot - lo) / (hi - lo), 4) AS pseudotime
         FROM pot CROSS JOIN mm ORDER BY cell_id"""
    },

    "q54_lisi" ->
      """WITH RECURSIVE
         q AS (SELECT vec_id AS qid, embedding::DOUBLE[] AS qv FROM embeddings
               WHERE vec_id % 50 = 0),
         c AS (SELECT vec_id, embedding::DOUBLE[] AS cv FROM embeddings),
         p0 AS (SELECT q.qid, c.vec_id,
                  LIST_DOT_PRODUCT(qv, cv)
                    / (SQRT(LIST_DOT_PRODUCT(qv, qv)) * SQRT(LIST_DOT_PRODUCT(cv, cv))) AS cos
                FROM q CROSS JOIN c WHERE q.qid != c.vec_id),
         topk AS (SELECT qid, vec_id, ROUND(cos, 6) AS cos,
                         ROW_NUMBER() OVER (PARTITION BY qid
                           ORDER BY ROUND(cos, 6) DESC, vec_id) AS rn
                  FROM p0),
         knn AS MATERIALIZED (
           SELECT qid AS src, vec_id AS dst, 1.0 - cos AS dist FROM topk WHERE rn <= 10),
         lab AS (SELECT vec_id AS dst, CAST(label AS VARCHAR) AS label FROM embeddings),
         agg AS MATERIALIZED (
           SELECT k.src,
                  LIST(k.dist * k.dist ORDER BY k.dist, k.dst) AS d2s,
                  LIST(l.label ORDER BY k.dist, k.dst) AS labels
           FROM knn k JOIN lab l ON k.dst = l.dst GROUP BY k.src),
         bis AS (
           SELECT src, d2s, labels, CAST(1.0 AS DOUBLE) AS beta,
                  CAST('-infinity' AS DOUBLE) AS lo, CAST('infinity' AS DOUBLE) AS hi, 0 AS it
           FROM agg
           UNION ALL
           SELECT src, d2s, labels,
                  CASE WHEN h > logu THEN (CASE WHEN isinf(hi) THEN beta * 2 ELSE (beta + hi) / 2 END)
                       ELSE (CASE WHEN isinf(lo) THEN beta / 2 ELSE (beta + lo) / 2 END) END,
                  CASE WHEN h > logu THEN beta ELSE lo END,
                  CASE WHEN h > logu THEN hi ELSE beta END,
                  it + 1
           FROM (SELECT *, LN(sumw) + beta * swd / sumw AS h, LN(5.0) AS logu
                 FROM (SELECT *,
                         LIST_SUM(LIST_TRANSFORM(d2s, d -> EXP(-beta * d))) AS sumw,
                         LIST_SUM(LIST_TRANSFORM(d2s, d -> d * EXP(-beta * d))) AS swd
                       FROM bis))
           WHERE it < 63 AND ABS(h - logu) >= 1e-5),
         fin AS (SELECT src, d2s, labels, beta
                 FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY src ORDER BY it DESC) AS r
                       FROM bis)
                 WHERE r = 1),
         ex AS (SELECT src, UNNEST(labels) AS label, UNNEST(d2s) AS d2, beta,
                       LIST_SUM(LIST_TRANSFORM(d2s, d -> EXP(-beta * d))) AS sumw
                FROM fin),
         pl AS (SELECT src, label, SUM(EXP(-beta * d2) / sumw) AS p FROM ex GROUP BY src, label)
         SELECT src AS cell_id, ROUND(1.0 / SUM(p * p), 4) AS lisi
         FROM pl GROUP BY src ORDER BY cell_id""")
}
