package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Tables

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * Queries and their DuckDB oracles live in per-domain objects under
  * `graft.queries`; this object just aggregates them.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * Classic star-join: revenue per region/nation — small dims broadcast,
    * single shuffle for the aggregation.
    */
  def entry(spark: SparkSession): DataFrame = {
    val d = "/root/testdata/sf0.001"
    val li = Tables.t(spark, d, "lineitem")
    val o = Tables.t(spark, d, "orders")
    val c = Tables.t(spark, d, "customer")
    val n = Tables.t(spark, d, "nation")
    val r = Tables.t(spark, d, "region")
    li.join(o, li("l_orderkey") === o("o_orderkey"))
      .join(broadcast(c), o("o_custkey") === c("c_custkey"))
      .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
      .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
      .groupBy(col("r_name"), col("n_name"))
      .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2)
        .as("revenue"))
      .orderBy("r_name", "n_name")
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    graft.queries.CoreQueries.queries ++
      graft.queries.RelationalQueries.queries ++
      graft.queries.TrainingQueries.queries ++
      graft.queries.ExtendedQueries.queries ++
      graft.queries.MlQueries.queries ++
      graft.queries.TemporalQueries.queries ++
      graft.queries.CurationQueries.queries ++
      graft.queries.MiningQueries.queries ++
      graft.queries.AuditQueries.queries ++
      graft.queries.StatQueries.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] =
    graft.queries.CoreQueries.oracle ++
      graft.queries.RelationalQueries.oracle ++
      graft.queries.TrainingQueries.oracle ++
      graft.queries.ExtendedQueries.oracle ++
      graft.queries.MlQueries.oracle ++
      graft.queries.TemporalQueries.oracle ++
      graft.queries.CurationQueries.oracle ++
      graft.queries.MiningQueries.oracle ++
      graft.queries.AuditQueries.oracle ++
      graft.queries.StatQueries.oracle
}
