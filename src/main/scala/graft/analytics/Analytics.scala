package graft.analytics

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Event-log analytics staples: ordered funnel progression and cohort
  * retention. Both are per-user aggregations over a single hash
  * partitioning of the log — at 100 TB each is one shuffle on user_id
  * (AQE-coalesced), with the per-user state a handful of timestamps.
  */
object Analytics {

  /** Ordered funnel: for each user, the earliest time of step 1, the
    * earliest step-2 event STRICTLY AFTER that, the earliest step-3
    * event strictly after that, and the step count reached. The strict
    * ordering is what makes it a funnel (a purchase before the first
    * view does not count) — a plain per-type min would overcount.
    *
    * Shape: one conditional aggregation per step over the same user_id
    * partitioning — step n's aggregation joins step n-1's times back on
    * user_id (same key → Catalyst reuses the exchange), never a window
    * over the whole log.
    */
  def funnel(ev: DataFrame, steps: Seq[String], typeCol: String = "event_type",
             tsCol: String = "ts_us", userCol: String = "user_id"): DataFrame = {
    require(steps.nonEmpty)
    val s1 = ev.filter(col(typeCol) === steps.head)
      .groupBy(userCol).agg(min(col(tsCol)).as("t1"))
    val withTimes = steps.zipWithIndex.drop(1).foldLeft(s1) {
      case (acc, (step, i)) =>
        val cur = s"t${i + 1}"
        val nxt = ev.filter(col(typeCol) === step)
          .join(acc.select(col(userCol), col(s"t$i")), Seq(userCol))
          .filter(col(tsCol) > col(s"t$i"))
          .groupBy(userCol).agg(min(col(tsCol)).as(cur))
        acc.join(nxt, Seq(userCol), "left")
    }
    val reached = (1 to steps.length).map(i => when(col(s"t$i").isNotNull, 1).otherwise(0))
      .reduce(_ + _)
    withTimes.withColumn("steps_reached", reached)
  }

  /** Cohort retention: users grouped by the period of their first event
    * (the cohort); per (cohort, period-offset) the count of distinct
    * users active in that period. `periodUs` is the bucket width (e.g.
    * 7 days in µs). Three aggregations: first-seen per user, distinct
    * (user, period), then the cohort×offset matrix — all keyed on
    * user_id then small grouped output.
    */
  def retention(ev: DataFrame, periodUs: Long, tsCol: String = "ts_us",
                userCol: String = "user_id"): DataFrame = {
    val period = expr(s"$tsCol div ${periodUs}L")
    val first = ev.groupBy(userCol)
      .agg(min(period).as("cohort"))
    val active = ev.select(col(userCol), period.as("p")).distinct()
    active.join(first, Seq(userCol))
      .groupBy(col("cohort"), (col("p") - col("cohort")).as("offset"))
      .agg(countDistinct(col(userCol)).as("n_active"))
  }

  /** Exact per-group quantiles (nearest-rank: the value at rank
    * `max(1, ceil(p·n))` — no interpolation, so the result is a real data
    * point and replays engine-exact). The p50/p95/p99 observability
    * shape, computed WITHOUT a per-group window: one global
    * range-partitioned ordinal over (group, value) — groups share the
    * sort, no group ever lands in a single task — then per-group ranks
    * from a small (|groups|-row) offset join.
    */
  def groupQuantiles(df: DataFrame, group: String, valueCol: String,
                     ps: Seq[Double]): DataFrame = {
    val ordered = graft.ops.Windows.globalOrdinal(
      df.select(col(group), col(valueCol)),
      Seq(col(group), col(valueCol)), "pos")
    val bounds = ordered.groupBy(group)
      .agg(min(col("pos")).as("p0"), count(lit(1)).as("cnt"))
    val targets = bounds
      .select(col(group), col("p0"), col("cnt"),
        explode(typedlit(ps)).as("p"))
      .withColumn("target_rk",
        greatest(lit(1L), ceil(col("p") * col("cnt")).cast("long")))
    ordered.join(broadcast(targets), Seq(group))
      .filter(col("pos") - col("p0") + 1 === col("target_rk"))
      .select(col(group), col("p"), col(valueCol).as("q_value"))
  }

  /** Exponentially-decayed activity counters: per user,
    * `Σ_events 0.5^age` where age is the event's distance (in whole
    * `periodUs` periods) from the corpus's latest period — the trending/
    * recency score with half-life one period. One aggregation after a
    * 1-row broadcast of the reference period.
    *
    * Engine-exactness by construction: every term is a power of two, so
    * the per-user sum is an exact binary fraction (n·lsb well under 53
    * bits at any realistic horizon) — no rounding step needed, the
    * double replays bit-for-bit under ANY summation order. That also
    * makes the counter mergeable across partitions/engines without
    * drift, unlike an e^{-λt} decay.
    */
  def decayedCounts(ev: DataFrame, periodUs: Long, tsCol: String = "ts_us",
                    userCol: String = "user_id"): DataFrame = {
    val period = expr(s"$tsCol div ${periodUs}L")
    val ref = ev.agg(max(period).as("ref_p"))
    ev.crossJoin(broadcast(ref))
      .withColumn("_age", (col("ref_p") - period).cast("double"))
      .groupBy(userCol)
      .agg(count(lit(1)).as("n_events"),
        sum(pow(lit(0.5), col("_age"))).as("decayed"))
  }
}
