package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Assay-melding operators (SURVEY.md §2.4/§2.5):
  *
  *  - `groupedAssay` — add_grouped_assay (scarf/datastore/datastore.py:
  *    824-894): collapse features into their cluster/module identity and
  *    emit the per-(cell, group) MEAN of normalized values. The reference's
  *    mean runs over the dense feature axis (`normed(...).mean(axis=1)`),
  *    so absent (cell, feature) entries count as zeros: group sum / group
  *    size, densified to every cell.
  *  - `createCountsMat` — create_counts_mat (scarf/meld_assay.py:385-440):
  *    TF-IDF normalize, then many-to-one sum of peak columns into target
  *    features via a coordinate mapping, with the optional per-cell
  *    rescale to `scalarCoeff`. The ATAC→RNA melding kernel; the mapping
  *    usually comes from the interval overlap join (Joins.overlapJoin).
  *
  * Both are pure join/groupBy plans: the group/mapping tables are
  * |features|-sized and broadcast; the only shuffle is the (cell, group)
  * aggregation, which partitions on the cell key — scale-safe at any cell
  * count.
  */
object Meld {

  /** add_grouped_assay: `normed(cell_id, feat_id, normed)` ×
    * `groups(feat_id, group)` → `(cell_id, group, mean_normed)`, dense in
    * `cells(cell_id)` × surviving groups. Features whose group is in
    * `excludeValues` (reference default: -1 = unclustered) are dropped.
    */
  def groupedAssay(normed: DataFrame, groups: DataFrame, cells: DataFrame,
                   excludeValues: Seq[Long] = Seq(-1L)): DataFrame = {
    val g = groups.filter(!col("group").isin(excludeValues: _*))
    val sizes = g.groupBy("group").agg(count(lit(1)).as("_gsz"))
    val sums = normed.join(broadcast(g), Seq("feat_id"))
      .groupBy("cell_id", "group").agg(sum(col("normed")).as("_gsum"))
    cells.select("cell_id").crossJoin(broadcast(sizes))
      .join(sums, Seq("cell_id", "group"), "left")
      .select(col("cell_id"), col("group"),
        (coalesce(col("_gsum"), lit(0.0)) / col("_gsz")).as("mean_normed"))
  }

  /** create_counts_mat: TF-IDF the raw COO, map peaks to target features
    * (`mapping(feat_id, new_feat)`, many peaks → one feature; a peak may
    * feed several features), sum per (cell, new feature), then optionally
    * rescale each cell's row to sum to `scalarCoeff`.
    */
  def createCountsMat(coo: DataFrame, mapping: DataFrame,
                      nTotalCells: DataFrame, scalarCoeff: Double = 1e5,
                      renormalization: Boolean = true): DataFrame = {
    val tfidf = graft.norm.Normalize.tfIdf(coo, nTotalCells)
      .select("cell_id", "feat_id", "normed")
    val melded = tfidf.join(broadcast(mapping), Seq("feat_id"))
      .groupBy("cell_id", "new_feat").agg(sum(col("normed")).as("value"))
    if (!renormalization) melded
    else {
      val rowSum = melded.groupBy("cell_id").agg(sum(col("value")).as("_rs"))
      melded.join(rowSum, Seq("cell_id"))
        .select(col("cell_id"), col("new_feat"),
          (lit(scalarCoeff) * col("value") / col("_rs")).as("value"))
    }
  }
}
