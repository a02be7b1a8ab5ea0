package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.{MetaOps, Tables}
import graft.norm.Normalize
import graft.stats.MatrixStats

/** Driver-verified queries for the metadata / normalization / statistics
  * operators (SURVEY.md §2.2-2.4), expressed over the generic test tables
  * (FIXTURES.md §5): `lineitem` plays the COO counts matrix (cells =
  * orders, features = parts), `part` plays the feature-name table.
  *
  * Every query is paired with an independently-written DuckDB oracle in
  * `oracle` — same column names, same ORDER BY, doubles rounded to 6dp on
  * both sides so cross-engine float noise cannot flip the hash compare.
  */
object CoreQueries {
  private def li(s: SparkSession, d: String) = Tables.t(s, d, "lineitem")
  private def r6(c: String) = round(col(c), 6).as(c)

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q01_cell_props" -> ((s, d) =>
      MatrixStats.cellProps(Tables.coo(s, d)).orderBy("cell_id")),

    "q02_feat_props" -> ((s, d) => {
      val coo = Tables.coo(s, d)
      MatrixStats.featureProps(coo, Tables.nCells(coo)).orderBy("feat_id")
    }),

    "q03_sift" -> ((s, d) =>
      li(s, d).filter(MetaOps.sift(col("l_quantity"), 10, 40))
        .select("l_orderkey", "l_linenumber", "l_quantity")
        .orderBy("l_orderkey", "l_linenumber", "l_quantity")),

    "q04_multi_sift" -> ((s, d) =>
      Tables.t(s, d, "orders").filter(MetaOps.multiSift(Seq(
          MetaOps.sift(col("o_totalprice"), 50000, 300000),
          col("o_orderdate") >= to_timestamp(lit("1997-01-01")),
          col("o_orderdate") < to_timestamp(lit("2000-01-01")))))
        .select("o_orderkey", "o_totalprice")
        .orderBy("o_orderkey")),

    "q05_grep" -> ((s, d) =>
      MetaOps.grep(Tables.t(s, d, "part"), "p_name", "rod|bolt")),

    "q06_index_by" -> ((s, d) =>
      MetaOps.indexBy(Tables.t(s, d, "nation"), "n_name",
          Seq("nation_3", "NATION_7", "nation_11"))
        .select("n_nationkey", "n_name").orderBy("n_nationkey")),

    "q07_norm_libsize" -> ((s, d) =>
      Normalize.libSize(Tables.coo(s, d))
        .select(col("cell_id"), col("feat_id"), round(col("normed"), 6).as("normed"))
        .orderBy("cell_id", "feat_id", "normed")),

    "q08_norm_libsize_log" -> ((s, d) =>
      Normalize.libSizeLog(Tables.coo(s, d))
        .select(col("cell_id"), col("feat_id"), round(col("normed"), 6).as("normed"))
        .orderBy("cell_id", "feat_id", "normed")),

    "q09_norm_clr" -> ((s, d) => {
      val coo = Tables.coo(s, d)
      Normalize.clr(coo, Tables.nCells(coo))
        .select(col("cell_id"), col("feat_id"), round(col("normed"), 6).as("normed"))
        .orderBy("cell_id", "feat_id", "normed")
    }),

    "q10_norm_tfidf" -> ((s, d) => {
      val coo = Tables.coo(s, d)
      Normalize.tfIdf(coo, Tables.nCells(coo))
        .select(col("cell_id"), col("feat_id"), round(col("normed"), 6).as("normed"))
        .orderBy("cell_id", "feat_id", "normed")
    }),

    "q11_feature_stats" -> ((s, d) => {
      val coo = Tables.coo(s, d)
      val normed = Normalize.libSizeLog(coo).select("cell_id", "feat_id", "normed")
      MatrixStats.featureStats(normed, Tables.nCells(coo))
        .select(col("feat_id"), col("normed_n"), r6("normed_tot"),
          r6("sigmas"), round(col("avg"), 6).as("avg_all"), r6("nz_mean"))
        .orderBy("feat_id")
    }),

    "q12_hvg" -> ((s, d) => {
      val coo = Tables.coo(s, d)
      val normed = Normalize.libSizeLog(coo).select("cell_id", "feat_id", "normed")
      val stats = MatrixStats.featureStats(normed, Tables.nCells(coo))
      MatrixStats.topVariableFeatures(stats, nBins = 10, topN = 50, minCells = 2)
        .select(col("feat_id"), col("normed_n"), r6("sigmas"), col("c_var"), col("rk"))
        .orderBy("rk")
    }),

    "q13_percent_feature" -> ((s, d) => {
      val coo = Tables.coo(s, d)
      val names = Tables.t(s, d, "part")
        .select(col("p_partkey").as("feat_id"), col("p_name").as("name"))
      MatrixStats.percentFeature(coo, names, "rod|bolt")
        .select(col("cell_id"), r6("percent_sub"))
        .orderBy("cell_id")
    }))

  private val nCellsSql =
    "(SELECT COUNT(DISTINCT l_orderkey) AS n_total_cells FROM lineitem)"

  val oracle: Map[String, String] = Map(
    "q01_cell_props" ->
      """SELECT l_orderkey AS cell_id, SUM(l_quantity) AS n_counts,
         COUNT(CASE WHEN l_quantity > 0 THEN 1 END) AS n_features
         FROM lineitem GROUP BY l_orderkey ORDER BY cell_id""",

    "q02_feat_props" ->
      s"""SELECT l_partkey AS feat_id,
          COUNT(CASE WHEN l_quantity > 0 THEN 1 END) AS n_cells,
          n.n_total_cells - COUNT(CASE WHEN l_quantity > 0 THEN 1 END) AS drop_outs
          FROM lineitem CROSS JOIN $nCellsSql n
          GROUP BY l_partkey, n.n_total_cells ORDER BY feat_id""",

    "q03_sift" ->
      """SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem
         WHERE l_quantity >= 10 AND l_quantity <= 40
         ORDER BY l_orderkey, l_linenumber, l_quantity""",

    "q04_multi_sift" ->
      """SELECT o_orderkey, o_totalprice FROM orders
         WHERE o_totalprice >= 50000 AND o_totalprice <= 300000
           AND o_orderdate >= TIMESTAMP '1997-01-01'
           AND o_orderdate < TIMESTAMP '2000-01-01'
         ORDER BY o_orderkey""",

    "q05_grep" ->
      """SELECT DISTINCT p_name FROM part
         WHERE REGEXP_MATCHES(UPPER(p_name), 'ROD|BOLT') ORDER BY p_name""",

    "q06_index_by" ->
      """SELECT n_nationkey, n_name FROM nation
         WHERE UPPER(n_name) IN ('NATION_3', 'NATION_7', 'NATION_11')
         ORDER BY n_nationkey""",

    "q07_norm_libsize" ->
      """SELECT l_orderkey AS cell_id, l_partkey AS feat_id,
         ROUND(10000.0 * l_quantity / SUM(l_quantity) OVER (PARTITION BY l_orderkey), 6) AS normed
         FROM lineitem ORDER BY cell_id, feat_id, normed""",

    "q08_norm_libsize_log" ->
      """SELECT l_orderkey AS cell_id, l_partkey AS feat_id,
         ROUND(LN(1 + 10000.0 * l_quantity / SUM(l_quantity) OVER (PARTITION BY l_orderkey)), 6) AS normed
         FROM lineitem ORDER BY cell_id, feat_id, normed""",

    "q09_norm_clr" ->
      s"""WITH geo AS (
           SELECT l_partkey AS feat_id,
                  EXP(SUM(LN(1 + l_quantity)) / n.n_total_cells) AS geomean
           FROM lineitem CROSS JOIN $nCellsSql n
           GROUP BY l_partkey, n.n_total_cells)
         SELECT l.l_orderkey AS cell_id, l.l_partkey AS feat_id,
                ROUND(LN(1 + l.l_quantity / g.geomean), 6) AS normed
         FROM lineitem l JOIN geo g ON l.l_partkey = g.feat_id
         ORDER BY cell_id, feat_id, normed""",

    "q10_norm_tfidf" ->
      s"""WITH idf AS (
           SELECT l_partkey AS feat_id,
                  LOG2(1 + n.n_total_cells / (COUNT(CASE WHEN l_quantity > 0 THEN 1 END) + 1)) AS idf
           FROM lineitem CROSS JOIN $nCellsSql n
           GROUP BY l_partkey, n.n_total_cells),
         tf AS (
           SELECT l_orderkey AS cell_id, l_partkey AS feat_id, l_quantity,
                  COUNT(CASE WHEN l_quantity > 0 THEN 1 END) OVER (PARTITION BY l_orderkey) AS nf
           FROM lineitem)
         SELECT tf.cell_id AS cell_id, tf.feat_id AS feat_id,
                ROUND(tf.l_quantity / tf.nf * idf.idf, 6) AS normed
         FROM tf JOIN idf ON tf.feat_id = idf.feat_id
         ORDER BY tf.cell_id, tf.feat_id, normed""",

    "q11_feature_stats" ->
      s"""WITH normed AS (
           SELECT l_orderkey AS cell_id, l_partkey AS feat_id,
                  LN(1 + 10000.0 * l_quantity / SUM(l_quantity) OVER (PARTITION BY l_orderkey)) AS normed
           FROM lineitem)
         SELECT feat_id,
                COUNT(CASE WHEN normed > 0 THEN 1 END) AS normed_n,
                ROUND(SUM(normed), 6) AS normed_tot,
                ROUND((SUM(normed * normed) - SUM(normed) * SUM(normed) / n.n_total_cells)
                      / (n.n_total_cells - 1), 6) AS sigmas,
                ROUND(SUM(normed) / n.n_total_cells, 6) AS avg_all,
                ROUND(SUM(normed) / COUNT(CASE WHEN normed > 0 THEN 1 END), 6) AS nz_mean
         FROM normed CROSS JOIN $nCellsSql n
         GROUP BY feat_id, n.n_total_cells ORDER BY feat_id""",

    "q12_hvg" ->
      s"""WITH normed AS (
           SELECT l_orderkey AS cell_id, l_partkey AS feat_id,
                  LN(1 + 10000.0 * l_quantity / SUM(l_quantity) OVER (PARTITION BY l_orderkey)) AS normed
           FROM lineitem),
         stats AS (
           SELECT feat_id,
                  COUNT(CASE WHEN normed > 0 THEN 1 END) AS normed_n,
                  (SUM(normed * normed) - SUM(normed) * SUM(normed) / n.n_total_cells)
                    / (n.n_total_cells - 1) AS sigmas,
                  SUM(normed) / n.n_total_cells AS avg_all
           FROM normed CROSS JOIN $nCellsSql n
           GROUP BY feat_id, n.n_total_cells),
         s AS (
           SELECT feat_id, normed_n, sigmas, LOG2(avg_all) AS log_mean
           FROM stats WHERE normed_n >= 2),
         bounds AS (SELECT MIN(log_mean) AS lo, MAX(log_mean) AS hi FROM s),
         binned AS (
           SELECT s.*, LEAST(FLOOR((s.log_mean - b.lo) / ((b.hi - b.lo) / 10)), 9) AS bin
           FROM s CROSS JOIN bounds b),
         corrected AS (
           SELECT feat_id, normed_n, sigmas,
                  ROUND(sigmas / AVG(sigmas) OVER (PARTITION BY bin), 6) AS c_var
           FROM binned)
         SELECT feat_id, normed_n, ROUND(sigmas, 6) AS sigmas, c_var,
                CAST(ROW_NUMBER() OVER (ORDER BY c_var DESC, feat_id) AS INT) AS rk
         FROM corrected
         ORDER BY c_var DESC, feat_id LIMIT 50""",

    "q13_percent_feature" ->
      """WITH cp AS (
           SELECT l_orderkey AS cell_id, SUM(l_quantity) AS n_counts
           FROM lineitem GROUP BY 1),
         sub AS (
           SELECT l.l_orderkey AS cell_id, SUM(l.l_quantity) AS sub_sum
           FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
           WHERE REGEXP_MATCHES(UPPER(p.p_name), 'ROD|BOLT') GROUP BY 1)
         SELECT cp.cell_id AS cell_id,
                ROUND(100.0 * COALESCE(sub.sub_sum, 0) / cp.n_counts, 6) AS percent_sub
         FROM cp LEFT JOIN sub ON cp.cell_id = sub.cell_id
         ORDER BY cp.cell_id""")
}
