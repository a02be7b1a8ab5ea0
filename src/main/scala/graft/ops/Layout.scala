package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-layout operators: multi-dimensional clustering for scan pruning.
  *
  * At 100 TB the scan you avoid is the one you optimized: parquet
  * row-group min/max skipping only prunes on the sort dimension, so a
  * log sorted by time answers time filters but full-scans user filters.
  * Z-ordering interleaves the bits of both dimensions before sorting —
  * every file then covers a small rectangle in (user, time) space and
  * BOTH predicates prune (the Delta/Iceberg OPTIMIZE ZORDER technique).
  * The curve value is a pure codegen'd bit-arithmetic projection; the
  * sort is Spark's ordinary range-partitioned sort.
  */
object Layout {

  /** Morton (Z-order) interleave of two 16-bit dimensions into a 32-bit
    * curve position: bit i of `x` lands at bit 2i, bit i of `y` at
    * 2i+1. Inputs must already be quantized to [0, 65535].
    */
  def zOrder16(x: Column, y: Column): Column =
    (0 until 16).map { i =>
      shiftleft(shiftright(x, i).bitwiseAND(lit(1L)), 2 * i) +
        shiftleft(shiftright(y, i).bitwiseAND(lit(1L)), 2 * i + 1)
    }.reduce(_ + _)

  /** Per-bucket locality report for a Z-ordered layout of `(xCol, yCol)`:
    * quantize both dims to 16 bits against their global min/max, split
    * the curve into 2^`bucketBits` equal z-ranges (the "files"), and
    * report each bucket's row count and x/y bounding box — the min/max a
    * parquet footer would carry, i.e. exactly what a scan prunes on.
    * Tight boxes on BOTH dims = both predicates skip.
    */
  def zOrderStats(df: DataFrame, xCol: String, yCol: String,
                  bucketBits: Int): DataFrame = {
    val bounds = df.agg(
      min(col(xCol)).as("x_min0"), max(col(xCol)).as("x_max0"),
      min(col(yCol)).as("y_min0"), max(col(yCol)).as("y_max0"))
    // integral `div`, not `/`: the scaled numerator exceeds 2^53, where a
    // double divide would round before truncation and diverge from the
    // oracle's integer `//`
    val q = df.crossJoin(broadcast(bounds))
      .withColumn("xq",
        expr(s"(($xCol - x_min0) * 65535L) div (x_max0 - x_min0)"))
      .withColumn("yq",
        expr(s"(($yCol - y_min0) * 65535L) div (y_max0 - y_min0)"))
      .withColumn("z", zOrder16(col("xq"), col("yq")))
      .withColumn("bucket", shiftright(col("z"), 32 - bucketBits))
    q.groupBy("bucket").agg(
      count(lit(1)).as("n"),
      min(col("xq")).as("xq_min"), max(col("xq")).as("xq_max"),
      min(col("yq")).as("yq_min"), max(col("yq")).as("yq_max"))
  }
}
