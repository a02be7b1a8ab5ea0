package graft.stats

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Marker search (SURVEY.md §2.9; scarf/markers.py:101-275): per
  * feature × group statistics — normalized mean dense-rank score, group and
  * rest means, fractions expressing, fold change, and a two-sided
  * Mann-Whitney U p-value with tie correction (mannwhitneyu_from_ranks,
  * scarf/markers.py:26-98).
  *
  * The reference ranks a dense matrix; here ranks are computed over the
  * sparse COO form with the implicit zero block handled in closed form
  * (every feature's absent cells tie at value 0, the minimum):
  *   dense rank of 0      = 1
  *   dense rank of v > 0  = dense_rank among nonzeros + 1
  *   avg rank of 0        = (n_zero + 1) / 2
  *   avg rank of v > 0    = avg rank among nonzeros + n_zero
  *   tie term             = Σ_nonzero-values (t³−t)  +  (n_zero³ − n_zero)
  * This keeps the whole computation at O(nnz) instead of O(N·|features|):
  * at 100 TB the dense rank matrix never materializes.
  *
  * Inputs: `coo(cell_id, feat_id, value)` with value > 0;
  * `cellGroups(cell_id, group)` covering ALL N cells (cells absent from a
  * feature count as zeros).
  */
object Markers {

  /** 1 − erf(x) for x ≥ 0, Abramowitz & Stegun 7.1.26 (|err| ≤ 1.5e-7).
    * Written as plain arithmetic so the oracle can evaluate the identical
    * expression — no engine-specific erf needed.
    */
  def erfc(x: Column): Column = {
    val t = lit(1.0) / (lit(1.0) + lit(0.3275911) * x)
    (((((lit(1.061405429) * t - lit(1.453152027)) * t) + lit(1.421413741)) * t
      - lit(0.284496736)) * t + lit(0.254829592)) * t * exp(-x * x)
  }

  def findMarkersByRank(coo: DataFrame, cellGroups: DataFrame): DataFrame = {
    // group sizes and total N (broadcastable 1-row / |groups|-row frames)
    val sizes = cellGroups.groupBy("group").agg(count(lit(1)).as("n_g"))
    val nTot = cellGroups.agg(count(lit(1)).cast("double").as("n_total"))

    // Ranks are CONSTANT within a (feature, value) tie class, so every
    // window runs over the distinct-value domain (one coo shuffle on
    // (feat, value)) and per-row ranks are recovered as count-weighted
    // products in the group sums — replacing two per-row windows over
    // all nnz rows (one of them on a second (feat, value) shuffle) and
    // two extra coo scans. Exactness: dense ranks are integral, average
    // ranks multiples of 0.5, counts-matrix values integral — every
    // weighted sum below stays < 2⁵³ and is IEEE-exact, bit-identical
    // to the per-row form this replaces (MarkersSpec's NumPy golden and
    // the q27 oracle pin the semantics; fractional input values would
    // be last-ulp-sensitive to the summation order here, but the kernel
    // is defined over counts matrices — the reference ranks raw counts).
    val tv = coo.groupBy("feat_id", "value")
      .agg(count(lit(1)).cast("double").as("t"), sum(col("value")).as("sv"))
    val wf = Window.partitionBy("feat_id").orderBy("value")
    val rk = tv
      .withColumn("dr_nz", row_number().over(wf).cast("double"))
      .withColumn("_cum", sum(col("t")).over(wf))
      // rank() of the tie class = cum-before + 1; average rank adds
      // (t − 1)/2, i.e. cum-before + (t + 1)/2
      .withColumn("ar_nz",
        col("_cum") - col("t") + (col("t") + lit(1.0)) / lit(2.0))
      .select("feat_id", "value", "t", "sv", "dr_nz", "ar_nz")

    // per-feature totals + tie correction, ONE fused aggregation
    val featTot = rk.groupBy("feat_id").agg(
        sum(col("t")).as("nnz_tot"),
        sum(col("sv")).as("sum_tot"),
        sum(col("t") * col("t") * col("t") - col("t")).as("tie_nz"))
      .crossJoin(broadcast(nTot))
      .withColumn("n_zero", col("n_total") - col("nnz_tot"))

    // per (feature, group, value) member counts, then count-weighted
    // rank/value sums per (feature, group)
    val gv = coo.join(cellGroups, Seq("cell_id"))
      .groupBy("feat_id", "group", "value")
      .agg(count(lit(1)).cast("double").as("c"))
    val grpAgg = gv
      .join(rk.select("feat_id", "value", "dr_nz", "ar_nz"),
        Seq("feat_id", "value"))
      .groupBy("feat_id", "group").agg(
        sum(col("c")).as("nnz_g"),
        sum(col("c") * col("value")).as("sum_g"),
        sum(col("c") * col("dr_nz")).as("sum_dr_nz"),
        sum(col("c") * col("ar_nz")).as("sum_ar_nz"))

    // dense base: every feature × every group (reference reindexes to the
    // full group set); |features|×|groups| rows, built from two small frames
    val base = featTot.select("feat_id").crossJoin(broadcast(sizes))
      .join(featTot, Seq("feat_id"))
      .join(grpAgg, Seq("feat_id", "group"), "left")
      .na.fill(0.0, Seq("nnz_g", "sum_g", "sum_dr_nz", "sum_ar_nz"))

    val n1 = col("n_g").cast("double")
    val n2 = col("n_total") - n1
    // group mean dense rank: zeros rank 1, nonzeros shift by +1
    val meanDr = (col("sum_dr_nz") + col("nnz_g") + (n1 - col("nnz_g"))) / n1
    // group rank sum (average ranks): zero members + shifted nonzero members
    val r1 = (n1 - col("nnz_g")) * (col("n_zero") + 1) / 2 +
      col("sum_ar_nz") + col("nnz_g") * col("n_zero")
    val u1 = r1 - n1 * (n1 + 1) / 2
    val muU = n1 * n2 / 2
    val tieT = (col("tie_nz") + col("n_zero") * col("n_zero") * col("n_zero") - col("n_zero")) /
      (col("n_total") * (col("n_total") - 1))
    val sigmaU = sqrt(n1 * n2 / 12 * (col("n_total") + 1 - tieT))
    val z = (u1 - muU - lit(0.5)) / sigmaU
    val mean = col("sum_g") / n1
    val meanRest = (col("sum_tot") - col("sum_g")) / n2

    val perGroup = base.select(
      col("feat_id"), col("group"),
      meanDr.as("mean_dr"),
      mean.as("mean"),
      meanRest.as("mean_rest"),
      (col("nnz_g") / n1).as("frac_exp"),
      ((col("nnz_tot") - col("nnz_g")) / n2).as("frac_exp_rest"),
      when(meanRest === 0, lit(0.0)).otherwise(mean / meanRest).as("fold_change"),
      erfc(abs(z) / lit(math.sqrt(2.0))).as("p_value"))

    // score = mean dense rank normalized across groups of the same feature
    perGroup.withColumn("score",
      col("mean_dr") / sum(col("mean_dr")).over(Window.partitionBy("feat_id")))
      .drop("mean_dr")
  }

  /** Regression markers (scarf/markers.py:278-320): per-feature Pearson r
    * against a continuous per-cell variable, with the implicit zero cells
    * included via the moments formulation; features with fewer than
    * `minCells` nonzero cells report r = 0 (reference behavior).
    * `cellVar(cell_id, y)` covers all N cells.
    */
  def findMarkersByRegression(coo: DataFrame, cellVar: DataFrame,
                              minCells: Long): DataFrame = {
    val yMoms = cellVar.agg(
      count(lit(1)).cast("double").as("n_total"),
      sum(col("y")).as("sum_y"),
      sum(col("y") * col("y")).as("sum_y2"))
    val joined = coo.join(cellVar, Seq("cell_id"))
    val r = joined.groupBy("feat_id").agg(
        count(lit(1)).as("nnz"),
        sum(col("value")).as("sum_x"),
        sum(col("value") * col("value")).as("sum_x2"),
        sum(col("value") * col("y")).as("sum_xy"))
      .crossJoin(broadcast(yMoms))
    val num = col("n_total") * col("sum_xy") - col("sum_x") * col("sum_y")
    val den = sqrt((col("n_total") * col("sum_x2") - col("sum_x") * col("sum_x")) *
      (col("n_total") * col("sum_y2") - col("sum_y") * col("sum_y")))
    r.select(col("feat_id"), col("nnz"),
      when(col("nnz") < minCells, lit(0.0)).otherwise(num / den).as("r"))
  }
}
