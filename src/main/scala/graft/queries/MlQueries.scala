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
}
