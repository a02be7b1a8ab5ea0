package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.dedup.Dedup
import graft.graph.GraphStats

/** Round-6 tenth tail: structural statistics of the near-duplicate
  * candidate graph (triangle closure, degree assortativity, global
  * PageRank) and distribution-shape gates. The graph queries all run on
  * one shared edge list: the q120 sweep universe's exact-Jaccard pairs
  * at J ≥ 2/5 — full copies (~0.9), half copies (~0.5) and the
  * half-vs-full closure edges all clear the bar, so each %40 doc plants
  * a guaranteed triangle (base, +1e6 full copy, +2e6 half copy) and the
  * reports are never vacuous. Each query pairs with an independently
  * written DuckDB oracle below.
  */
object StatQueries {

  private def docs(s: SparkSession, d: String) = Tables.t(s, d, "documents")

  /** Exact-Jaccard near-dup edges over the planted sweep universe:
    * inter·5 ≥ union·2 in integer arithmetic (no float threshold).
    */
  private def sweepEdges(s: SparkSession, d: String): DataFrame =
    Dedup.sharedShinglePairs(TrainingQueries.sweepShingles(s, d), dfCap = 500)
      .filter(col("inter") * 5 >= (col("sza") + col("szb") - col("inter")) * 2)
      .select("ida", "idb")

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // triangle census of the near-dup graph: the corroboration gate
    // before CC closure — a candidate pair inside a triangle is backed
    // by a second witness; global CC = 3T/wedges, integers until the
    // one final division
    "q204_triangles" -> ((s, d) =>
      GraphStats.triangleStats(sweepEdges(s, d))),

    // integer-quantized global PageRank (8 iterations, damping 0.85 in
    // exact integer arithmetic): ranks the documents most entangled in
    // duplicate mass — the review-first list for a dedup audit
    "q205_pagerank" -> ((s, d) =>
      GraphStats.pageRank(sweepEdges(s, d), iters = 8)
        .orderBy("node")),

    // degree assortativity of the near-dup graph: negative = hub-and-
    // spoke (boilerplate stitching), positive = clique-like duplicate
    // clusters; exact decimal(38) moment sums, one IEEE division
    "q206_assortativity" -> ((s, d) =>
      GraphStats.degreeAssortativity(sweepEdges(s, d))))

  /** Shared oracle chain: sweep universe shingles → df-capped
    * inverted-index pairs → exact-integer Jaccard ≥ 2/5 edge list.
    * `sweepChainSql`'s sig/band CTEs are unreferenced here and pruned
    * by DuckDB.
    */
  private val edgeChainSql =
    s"""${TrainingQueries.sweepChainSql},
       shc AS (
         SELECT * FROM psh WHERE shingle IN (
           SELECT shingle FROM psh GROUP BY shingle HAVING COUNT(*) <= 500)),
       sizes AS (SELECT doc_id, COUNT(*) AS sz FROM shc GROUP BY doc_id),
       inter AS (
         SELECT a.doc_id AS ida, b.doc_id AS idb, COUNT(*) AS inter
         FROM shc a JOIN shc b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
         GROUP BY 1, 2),
       edges AS (
         SELECT i.ida, i.idb FROM inter i
         JOIN sizes sa ON i.ida = sa.doc_id
         JOIN sizes sb ON i.idb = sb.doc_id
         WHERE i.inter * 5 >= (sa.sz + sb.sz - i.inter) * 2),
       dirn AS (SELECT ida AS node, idb AS nbr FROM edges
                UNION ALL
                SELECT idb, ida FROM edges),
       deg AS (SELECT node, COUNT(*) AS deg FROM dirn GROUP BY node)"""

  /** q205's replay: `iters` unrolled share-and-reseat stages, all
    * integer (`//` and Spark's `div` agree on positive operands).
    */
  private def pageRankSql(iters: Int): String = {
    val stages = (1 to iters).map { i =>
      s"""r$i AS (
           SELECT a.nbr AS node,
                  CAST(150000000000 + (85 * SUM(r.r // a.deg)) // 100
                       AS BIGINT) AS r
           FROM adj a JOIN r${i - 1} r ON a.node = r.node
           GROUP BY a.nbr)"""
    }.mkString(",\n         ")
    s"""WITH $edgeChainSql,
       adj AS (SELECT d.node, d.nbr, g.deg FROM dirn d
               JOIN deg g ON d.node = g.node),
       r0 AS (SELECT node, CAST(1000000000000 AS BIGINT) AS r FROM deg),
       $stages
       SELECT r.node AS node, g.deg AS deg, r.r AS rank_scaled
       FROM r$iters r JOIN deg g ON r.node = g.node
       ORDER BY r.node"""
  }

  def oracle: Map[String, String] = Map(

    "q204_triangles" ->
      s"""WITH $edgeChainSql,
         tri AS (
           SELECT COUNT(*) AS n_triangles
           FROM (SELECT ida AS a, idb AS b FROM edges) e1
           JOIN (SELECT ida AS b, idb AS c FROM edges) e2 USING (b)
           JOIN (SELECT ida AS a, idb AS c FROM edges) e3 USING (a, c)),
         da AS (
           SELECT COUNT(*) AS n_nodes, CAST(MAX(deg) AS BIGINT) AS max_deg,
                  CAST(SUM(deg * (deg - 1) // 2) AS BIGINT) AS n_wedges
           FROM deg),
         ne AS (SELECT COUNT(*) AS n_edges FROM edges)
         SELECT da.n_nodes, ne.n_edges, da.max_deg, da.n_wedges,
                tri.n_triangles,
                ROUND(CAST(3 * tri.n_triangles AS DOUBLE)
                      / CAST(da.n_wedges AS DOUBLE), 6) AS global_cc
         FROM da, ne, tri""",

    "q205_pagerank" -> pageRankSql(8),

    "q206_assortativity" ->
      s"""WITH $edgeChainSql,
         dp AS (
           SELECT COUNT(*) AS m2,
                  CAST(SUM(da.deg) AS HUGEINT) AS sx,
                  SUM(CAST(da.deg AS HUGEINT) * CAST(db.deg AS HUGEINT)) AS sxy,
                  SUM(CAST(da.deg AS HUGEINT) * CAST(da.deg AS HUGEINT)) AS sxx
           FROM dirn JOIN deg da ON dirn.node = da.node
                     JOIN deg db ON dirn.nbr = db.node),
         da2 AS (SELECT COUNT(*) AS n_nodes, CAST(MAX(deg) AS BIGINT) AS max_deg
                 FROM deg),
         ne AS (SELECT COUNT(*) AS n_edges FROM edges)
         SELECT da2.n_nodes, ne.n_edges, da2.max_deg,
                ROUND(CASE WHEN CAST(dp.m2 AS HUGEINT) * dp.sxx - dp.sx * dp.sx = 0
                           THEN NULL
                           ELSE CAST(CAST(dp.m2 AS HUGEINT) * dp.sxy
                                     - dp.sx * dp.sx AS DOUBLE)
                              / CAST(CAST(dp.m2 AS HUGEINT) * dp.sxx
                                     - dp.sx * dp.sx AS DOUBLE)
                      END, 6) AS assortativity
         FROM dp, da2, ne""")
}
