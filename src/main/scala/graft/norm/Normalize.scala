package graft.norm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The reference's normalization strategies (SURVEY.md §2.3;
  * scarf/assay.py:28-94) over the COO matrix `(cell_id, feat_id, value)`.
  *
  * All four are single-pass relational plans:
  *  - per-cell scalars come from a window partitioned by `cell_id`
  *    (one hash shuffle on the cell key, map-side partial aggregation);
  *  - per-feature scalars come from a `groupBy(feat_id)` joined back
  *    (the per-feature aggregate is tiny — broadcast join);
  *  - the global cell count is a 1-row cross join (broadcast).
  *
  * At 100 TB: COO pre-partitioned by cell_id makes the window shuffle-free;
  * the feature-side aggregates are |features| rows and always broadcastable.
  */
object Normalize {

  private val cellW = Window.partitionBy("cell_id")

  /** `sf * x / rowsum` (scarf/assay.py:41-51). */
  def libSize(coo: DataFrame, sf: Double = 10000.0): DataFrame =
    coo.withColumn("normed",
      lit(sf) * col("value") / sum(col("value")).over(cellW))

  /** `log1p(sf * x / rowsum)` (scarf/assay.py:54-64). */
  def libSizeLog(coo: DataFrame, sf: Double = 10000.0): DataFrame =
    coo.withColumn("normed",
      log1p(lit(sf) * col("value") / sum(col("value")).over(cellW)))

  /** Centered log-ratio (scarf/assay.py:67-78):
    * `log1p(x / geomean_feat)` with `geomean = exp(mean_cells(log1p(x)))`.
    * The mean runs over ALL cells (zeros contribute log1p(0)=0 to the sum
    * but count in the denominator), so the COO form divides the nonzero
    * log1p-sum by the global cell count.
    */
  def clr(coo: DataFrame, nTotalCells: DataFrame): DataFrame = {
    val geo = coo.groupBy("feat_id")
      .agg(sum(log1p(col("value"))).as("log_sum"))
      .crossJoin(broadcast(nTotalCells))
      .select(col("feat_id"),
        exp(col("log_sum") / col("n_total_cells")).as("geomean"))
    coo.join(broadcast(geo), Seq("feat_id"))
      .withColumn("normed", log1p(col("value") / col("geomean")))
      .drop("geomean")
  }

  /** TF-IDF (scarf/assay.py:81-94): `tf = x / nFeatures_row`,
    * `idf = log2(1 + n_cells / (nCells_feat + 1))`, result `tf * idf`.
    */
  def tfIdf(coo: DataFrame, nTotalCells: DataFrame): DataFrame = {
    val idf = coo.groupBy("feat_id")
      .agg(count(when(col("value") > 0, 1)).as("n_cells_feat"))
      .crossJoin(broadcast(nTotalCells))
      .select(col("feat_id"),
        log2(lit(1) + col("n_total_cells") / (col("n_cells_feat") + lit(1)))
          .as("idf"))
    coo
      .withColumn("n_feats_row", count(when(col("value") > 0, 1)).over(cellW))
      .join(broadcast(idf), Seq("feat_id"))
      .withColumn("normed", col("value") / col("n_feats_row") * col("idf"))
      .drop("n_feats_row", "idf")
  }
}
