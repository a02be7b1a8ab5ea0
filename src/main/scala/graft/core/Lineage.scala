package graft.core

import org.apache.spark.sql.DataFrame

/** Iteration hygiene for loop-shaped jobs (diffusion, PPR, Harmony):
  *
  * `Dataset.localCheckpoint` truncates the lineage but PRESERVES the
  * plan's estimated `sizeInBytes`. An iterative plan that references its
  * previous state twice (carry + push) therefore doubles that BigInt's
  * bit-length every round — after ~20 rounds Catalyst's stats visitor
  * spends minutes multiplying million-bit integers even though the data
  * is tiny. Rewrapping the checkpointed RDD in a fresh DataFrame resets
  * the stats to the engine default, making per-iteration planning O(1).
  */
object Lineage {
  def reset(df: DataFrame): DataFrame = {
    val ck = df.localCheckpoint()
    ck.sparkSession.createDataFrame(ck.rdd, ck.schema)
  }
}
