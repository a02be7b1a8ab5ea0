package graft.core

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Metadata-table operators (SURVEY.md §2.2) — the boolean-mask algebra of
  * the reference's MetaData table (scarf/metadata.py) re-expressed as
  * Catalyst predicates. All are pushdown-friendly: a `sift` over a parquet
  * column compiles to a parquet `PushedFilters` entry, so at 100 TB the
  * scan skips row groups instead of post-filtering.
  */
object MetaOps {

  /** Range predicate (scarf/metadata.py:483-505). `keepBounds` selects
    * closed vs open interval.
    */
  def sift(c: Column, lo: Double, hi: Double, keepBounds: Boolean = true): Column =
    if (keepBounds) c >= lo && c <= hi else c > lo && c < hi

  /** AND of several range predicates (scarf/metadata.py:507-533). */
  def multiSift(preds: Seq[Column]): Column =
    preds.reduce(_ && _)

  /** Monotone AND-update of a boolean mask column — once False, stays
    * False (scarf/metadata.py:437-450).
    */
  def updateKey(df: DataFrame, key: String, newMask: Column): DataFrame =
    df.withColumn(key, col(key) && newMask)

  /** Reset mask to all-True (scarf/metadata.py:452-460). */
  def resetKey(df: DataFrame, key: String): DataFrame =
    df.withColumn(key, lit(true))

  /** Case-insensitive IN-list lookup (scarf/metadata.py:339-376). */
  def indexBy(df: DataFrame, column: String, values: Seq[String]): DataFrame =
    df.filter(upper(col(column)).isin(values.map(_.toUpperCase): _*))

  /** Regex match on a name column, distinct + sorted
    * (scarf/metadata.py:569-584). Case-insensitive like the reference.
    */
  def grep(df: DataFrame, column: String, pattern: String): DataFrame =
    df.filter(upper(col(column)).rlike(pattern.toUpperCase))
      .select(col(column)).distinct().orderBy(col(column))

  /** Fill-to-index insert (scarf/metadata.py:289-337): values provided
    * only for active rows are scattered back onto the full table; inactive
    * rows get `fill`. Left join on the row key + coalesce.
    */
  def fillToIndex(full: DataFrame, key: String, activeVals: DataFrame,
                  valueCol: String, fill: Column): DataFrame =
    full.join(activeVals, Seq(key), "left")
      .withColumn(valueCol, coalesce(col(valueCol), fill))
}
