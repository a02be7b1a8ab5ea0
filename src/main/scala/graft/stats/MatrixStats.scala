package graft.stats

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Cell/feature statistic jobs (SURVEY.md §2.4) over the COO matrix.
  * Each is one hash aggregation — map-side partial combine, single
  * shuffle on the grouping key; scales linearly with matrix nnz.
  */
object MatrixStats {

  /** Per-cell `nCounts = sum(x)`, `nFeatures = count(x>0)`
    * (scarf/datastore/base_datastore.py:324-401).
    */
  def cellProps(coo: DataFrame): DataFrame =
    coo.groupBy("cell_id").agg(
      sum(col("value")).as("n_counts"),
      count(when(col("value") > 0, 1)).as("n_features"))

  /** Per-feature `nCells = count(x>0)`, `dropOuts = N - nCells`
    * (scarf/assay.py:201-225). `nTotalCells` is a 1-row frame.
    */
  def featureProps(coo: DataFrame, nTotalCells: DataFrame): DataFrame =
    coo.groupBy("feat_id")
      .agg(count(when(col("value") > 0, 1)).as("n_cells"))
      .crossJoin(broadcast(nTotalCells))
      .select(col("feat_id"), col("n_cells"),
        (col("n_total_cells") - col("n_cells")).as("drop_outs"))

  /** Percent of per-cell counts captured by a regex-matched feature subset
    * (scarf/assay.py:227-270): `100 * sum(x[, subset]) / nCounts`.
    * `featNames(feat_id, name)`; the matched subset is tiny → broadcast
    * semi-join, then one aggregation joined to the full per-cell totals.
    */
  def percentFeature(coo: DataFrame, featNames: DataFrame, pattern: String): DataFrame = {
    val subset = featNames.filter(upper(col("name")).rlike(pattern.toUpperCase))
      .select("feat_id")
    val subSum = coo.join(broadcast(subset), Seq("feat_id"))
      .groupBy("cell_id").agg(sum(col("value")).as("sub_sum"))
    cellProps(coo).join(subSum, Seq("cell_id"), "left")
      .select(col("cell_id"),
        (lit(100.0) * coalesce(col("sub_sum"), lit(0.0)) / col("n_counts"))
          .as("percent_sub"))
  }

  /** Per-feature stats on normalized data (scarf/assay.py:830-897):
    * `normed_n = count(>0)`, `normed_tot = sum`, `sigmas = variance over
    * ALL cells (zero-inflated)`, `avg = tot/N`, `nz_mean = tot/normed_n`.
    *
    * The variance includes the implicit zero block, so it is computed from
    * moments: `(Σx² − (Σx)²/N) / (N−1)` — identical formula to the oracle,
    * avoiding engine-specific `var_samp` semantics over densified data.
    * Input: `normed(cell_id, feat_id, normed)`.
    */
  def featureStats(normed: DataFrame, nTotalCells: DataFrame): DataFrame =
    normed.groupBy("feat_id").agg(
        count(when(col("normed") > 0, 1)).as("normed_n"),
        sum(col("normed")).as("normed_tot"),
        sum(col("normed") * col("normed")).as("sum_sq"))
      .crossJoin(broadcast(nTotalCells))
      .select(
        col("feat_id"), col("normed_n"), col("normed_tot"),
        ((col("sum_sq") - col("normed_tot") * col("normed_tot") / col("n_total_cells"))
          / (col("n_total_cells") - lit(1))).as("sigmas"),
        (col("normed_tot") / col("n_total_cells")).as("avg"),
        (col("normed_tot") / col("normed_n")).as("nz_mean"))

  /** HVG-style selection (scarf/assay.py:945-1074): threshold predicates,
    * bin features by log-mean into `nBins` equal-width buckets, correct
    * variance by the per-bin mean variance (relational stand-in for the
    * reference's LOWESS trend removal — deterministic and oracle-checkable),
    * then take global top-n by corrected variance.
    * One aggregation + two small window passes over |features| rows.
    */
  def topVariableFeatures(stats: DataFrame, nBins: Int, topN: Int,
                          minCells: Long): DataFrame = {
    val s = stats.filter(col("normed_n") >= minCells)
      .withColumn("log_mean", log2(col("avg")))
    // global min/max as a broadcast 1-row frame (no single-partition window)
    val bounds = s.agg(min(col("log_mean")).as("lo"), max(col("log_mean")).as("hi"))
    val binned = s.crossJoin(broadcast(bounds))
      .withColumn("bin",
        least(floor((col("log_mean") - col("lo")) / ((col("hi") - col("lo")) / nBins)),
          lit(nBins - 1)).cast("long"))
    val binSigma = binned.groupBy("bin").agg(avg(col("sigmas")).as("bin_sigma"))
    // c_var rounded to 6dp: makes the (c_var, feat_id) ordering stable under
    // cross-engine float noise, so top-n membership and ranks are exact.
    val corrected = binned.join(broadcast(binSigma), Seq("bin"))
      .withColumn("c_var", round(col("sigmas") / col("bin_sigma"), 6))
    // global top-n: distributed TakeOrdered via orderBy+limit, then a
    // window over only the surviving topN rows to emit the rank.
    graft.ops.Windows.globalOrdinal(
        corrected.orderBy(col("c_var").desc, col("feat_id")).limit(topN),
        Seq(col("c_var").desc, col("feat_id")), "_rk")
      .withColumn("rk", col("_rk").cast("int"))
      .select("feat_id", "normed_n", "sigmas", "c_var", "rk")
  }
}
