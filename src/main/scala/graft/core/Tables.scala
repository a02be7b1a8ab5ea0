package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the driver-generated test tables (TESTDATA.md) plus the
  * long/COO matrix view the scarf-equivalent operators work over.
  *
  * Data-model mapping (SURVEY.md §1.4): the reference's chunked dense
  * counts matrix (scarf/writers.py:202-204) becomes a sparse long-format
  * DataFrame `(cell_id, feat_id, value)` — shuffle-friendly, joinable
  * against metadata tables, and native to Spark's columnar execution.
  * At 100 TB the COO table partitions by `cell_id` ranges and every
  * per-cell / per-feature statistic is one hash aggregation.
  */
object Tables {

  def t(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** `lineitem` viewed as a sparse cell×feature counts matrix:
    * cells = orders, features = parts, value = quantity. This is the
    * generic-relational stand-in for an assay matrix (FIXTURES.md §5).
    */
  def coo(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "lineitem").select(
      col("l_orderkey").as("cell_id"),
      col("l_partkey").as("feat_id"),
      col("l_quantity").as("value"))

  /** `events` with its timestamp exposed as an epoch-ns long (`ts_ns`),
    * whatever the parquet physical type:
    *  - TIMESTAMP(NANOS) files: Spark's reader rejects nanos, so the
    *    legacy nanosAsLong mode maps the column to LongType (lossless)
    *    and it is already epoch-ns;
    *  - TIMESTAMP(MICROS) files (the current generator): the column
    *    arrives as a timestamp (possibly NTZ); under the UTC session
    *    timezone `unix_micros(cast)` recovers the naive epoch value the
    *    oracle's DuckDB `EPOCH_US(ts)` sees, scaled to ns.
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = t(spark, dir, "events")
    df.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        df.withColumnRenamed("ts", "ts_ns")
      case _ =>
        df.withColumn("ts_ns", unix_micros(col("ts").cast("timestamp")) * lit(1000L))
          .drop("ts")
    }
  }

  /** Scalar total number of cells (orders) as a 1-row DataFrame to
    * cross-join against — keeps plans fully lazy/distributed instead of
    * collecting a scalar on the driver. Catalyst broadcasts the 1-row side.
    */
  def nCells(coo: DataFrame): DataFrame =
    coo.agg(countDistinct(col("cell_id")).as("n_total_cells"))
}
