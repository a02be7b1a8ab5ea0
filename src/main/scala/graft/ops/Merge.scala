package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Dataset merging (SURVEY.md §2.5; scarf/merge.py): feature-id union
  * across datasets with `_n`-suffix disambiguation of colliding names,
  * per-dataset index remap, cell-table concat with dataset prefixes, and
  * the disjointness sanity check.
  */
object Merge {

  /** Union feature tables `(feat_id, name)` from several datasets:
    * - union key = `feat_id` (first-seen ↦ lowest dataset tag);
    * - colliding names across DIFFERENT ids get `_1`, `_2`… suffixes in
    *   (dataset, id) order (scarf/merge.py:388-433);
    * - errors if the id sets are fully disjoint (merging unrelated
    *   datasets is almost certainly a mistake, scarf/merge.py:477-486).
    * Returns `(feat_id, name, uname, merged_idx)` with a dense 0-based
    * merged ordinal in id order.
    */
  def mergeFeatures(featureTables: Seq[DataFrame]): DataFrame = {
    val tagged = featureTables.zipWithIndex.map { case (df, i) =>
      df.select(col("feat_id"), col("name"), lit(i).as("ds"))
    }.reduce(_ unionByName _)
    val union = tagged.groupBy("feat_id")
      .agg(min(struct(col("ds"), col("name"))).as("first"))
      .select(col("feat_id"), col("first.name").as("name"))
    val n = featureTables.length
    val overlap = tagged.select("feat_id").distinct().count()
    val total = featureTables.map(_.select("feat_id").distinct().count()).sum
    require(n == 1 || overlap < total,
      "feature id sets are fully disjoint across datasets — refusing to merge")
    union
      .withColumn("dup_rank", row_number().over(
        Window.partitionBy("name").orderBy("feat_id")))
      .withColumn("uname",
        when(col("dup_rank") === 1, col("name"))
          .otherwise(concat(col("name"), lit("_"), col("dup_rank") - 1)))
      .transform(df => Windows.globalOrdinal(df, Seq(col("feat_id"), col("uname")), "_mi")
        .withColumn("merged_idx", (col("_mi") - 1).cast("int"))
        .drop("_mi"))
      .drop("dup_rank")
  }

  /** Concat cell tables with dataset-name prefixes `name__id`
    * (scarf/merge.py:93-167) and a seeded deterministic interleave
    * (perform_randomization_rows) so no dataset forms a contiguous block.
    */
  def concatCells(cellTables: Seq[(String, DataFrame)], seed: Long = 42L): DataFrame = {
    val union = cellTables.map { case (dsName, df) =>
      df.select(concat(lit(dsName), lit("__"), col("cell_id")).as("id"))
    }.reduce(_ unionByName _)
      .withColumn("_h", md5(concat(lit(s"$seed:"), col("id"))))
    // global ordinal via range-partitioned sort + partition offsets — no
    // single-partition window at any dataset size
    Windows.globalOrdinal(union, Seq(col("_h")), "pos").drop("_h")
  }

  /** Remap a dataset's COO to the merged feature ordinals (broadcast
    * join on the small feature map).
    */
  def remapCoo(coo: DataFrame, featureMap: DataFrame): DataFrame =
    coo.join(broadcast(featureMap.select("feat_id", "merged_idx")), Seq("feat_id"))
      .select(col("cell_id"), col("merged_idx").as("feat_id"), col("value"))
}
