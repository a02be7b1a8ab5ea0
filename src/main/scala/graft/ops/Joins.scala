package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Join-shaped kernels of the reference (SURVEY.md §2.5). */
object Joins {

  /** Feature alignment (scarf/mapping_utils.py:102-220): left-outer join of
    * source feature ids against target ids; misses get ordinal `-1`.
    * The target ordinal is a dense 0-based index in target-key order.
    * Target feature sets are bounded (|features| rows), so the ordinal
    * window and the join's build side are both small; Catalyst broadcasts.
    */
  def alignFeatures(source: DataFrame, sourceKey: String,
                    target: DataFrame, targetKey: String): DataFrame = {
    val ordinal = Windows.globalOrdinal(
        target.select(col(targetKey).as(sourceKey)).distinct(),
        Seq(col(sourceKey)), "_p")
      .withColumn("target_idx", (col("_p") - 1).cast("int")).drop("_p")
    source.join(broadcast(ordinal), Seq(sourceKey), "left")
      .withColumn("target_idx", coalesce(col("target_idx"), lit(-1)))
  }

  /** Interval-overlap join (scarf/meld_assay.py:223-298): pairs (a, b) with
    * `a.lo < b.hi AND a.hi > b.lo`. The right side is expected to be the
    * small interval set (bins/peak windows) → broadcast nested-loop with a
    * codegen'd predicate; for two large sides, pre-bucket both by
    * `floor(lo / binWidth)` and equi-join on the bucket first.
    */
  def overlapJoin(a: DataFrame, b: DataFrame): DataFrame =
    a.join(broadcast(b), a("lo") < b("b_hi") && a("hi") > b("b_lo"))

  /** Union of two keyed sets with first-seen provenance
    * (scarf/merge.py:348-523): duplicate keys keep the lowest source tag —
    * a deterministic stand-in for the reference's first-seen order.
    */
  def unionDedup(ds1: DataFrame, ds2: DataFrame, key: String): DataFrame =
    ds1.withColumn("src", lit(1)).unionByName(ds2.withColumn("src", lit(2)))
      .groupBy(key).agg(min(col("src")).as("src"))

  /** Blacklist exclusion (scarf/assay.py:1023-1029): anti-join. */
  def exceptBlacklist(df: DataFrame, key: String, blacklist: DataFrame): DataFrame =
    df.join(broadcast(blacklist), Seq(key), "left_anti")
}
