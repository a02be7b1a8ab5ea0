package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Temporal joins Spark has no native operator for: point-in-time (as-of)
  * join and bounded-window (range) self-join. Both avoid the naive
  * theta-join / per-key quadratic plans:
  *
  *  - [[asofJoin]] rewrites the join as ONE union + ONE per-key ordered
  *    window (`last(..., ignoreNulls)` carry-forward) — a single shuffle
  *    on the key, no join at all, O(n log n) per key partition. This is
  *    the standard log-structured rewrite (kdb/QuestDB-style aj) and the
  *    only shape that survives a key whose right side is large: a
  *    broadcast-range join would re-scan, and a theta-join explodes.
  *  - [[rangePairs]] buckets time into window-width bins and probes only
  *    a row's own and successor bin — the equi-join prefilter turns the
  *    per-key cross product into ~O(pairs actually within range).
  *
  * At 100 TB both are one hash partition by key: skewed users salt like
  * any aggregation, and neither plan materializes candidates outside the
  * time bound beyond one adjacent bin.
  */
object AsOf {

  /** Point-in-time join: for every left row, the `valCol` of the latest
    * right row of the same `key` with `right.ts <= left.ts` (ties on ts:
    * the right row is visible, and among simultaneous right rows the one
    * with the largest `idCol` wins — a total order, so results are
    * replay-identical). Left columns pass through; adds `asof_<valCol>`
    * and `asof_ts` (null when no right row precedes).
    *
    * Reference semantics: scarf has no temporal data; this extends the
    * engine for event-log training data (feature backfill at label time).
    */
  def asofJoin(left: DataFrame, right: DataFrame, key: String, ts: String,
               idCol: String, valCol: String): DataFrame = {
    val leftCols = left.columns
    val l = left.withColumn("_side", lit(1))
      .withColumn("_rv", lit(null).cast(right.schema(valCol).dataType))
      .withColumn("_rts", lit(null).cast("long"))
    val r = right.select(
      col(key), col(ts), col(idCol),
      lit(0).as("_side"), col(valCol).as("_rv"), col(ts).cast("long").as("_rts"))
    val unioned = l.select((leftCols.map(col) ++
      Seq(col("_side"), col("_rv"), col("_rts"))): _*)
      .unionByName(r, allowMissingColumns = true)
    // right rows (side 0) sort before left rows at equal ts → "<=" visibility
    val w = Window.partitionBy(key)
      .orderBy(col(ts), col("_side"), col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    unioned
      .withColumn(s"asof_$valCol", last(col("_rv"), ignoreNulls = true).over(w))
      .withColumn("asof_ts", last(col("_rts"), ignoreNulls = true).over(w))
      .filter(col("_side") === 1)
      .drop("_side", "_rv", "_rts")
  }

  /** [[asofJoin]] with a staleness budget: a matched right value older
    * than `toleranceUs` at the left row's timestamp is nulled out — the
    * "feature freshness cap" form every point-in-time feature store
    * applies (a week-old last-purchase is not a usable feature at
    * serving time). Same single-shuffle carry-forward plan; the cap is
    * one codegen'd projection on top.
    */
  def asofJoinWithin(left: DataFrame, right: DataFrame, key: String,
                     ts: String, idCol: String, valCol: String,
                     toleranceUs: Long): DataFrame = {
    val base = asofJoin(left, right, key, ts, idCol, valCol)
    val fresh = col("asof_ts").isNotNull &&
      col(ts).cast("long") - col("asof_ts") <= toleranceUs
    base
      .withColumn(s"asof_$valCol", when(fresh, col(s"asof_$valCol")))
      .withColumn("asof_ts", when(fresh, col("asof_ts")))
  }

  /** All ordered pairs (a, b) of the same `key` with
    * `0 <= b.ts - a.ts <= window` and b strictly after a in the
    * `(ts, id)` total order. Binned: a row probes bins
    * `{ts div window, ts div window + 1}` — the only bins a successor
    * within `window` can land in — so the join is an equi-join on
    * `(key, bin)` plus a residual codegen'd filter, never a per-key
    * cross product. Each qualifying pair matches exactly one probe bin
    * (b's own), so no dedup pass is needed.
    */
  def rangePairs(ev: DataFrame, key: String, ts: String, idCol: String,
                 window: Long): DataFrame = {
    val base = ev.select(col(key), col(ts).cast("long").as(ts), col(idCol))
    val probe = base.select(col(key).as("k"), col(ts).as("ts_a"),
        col(idCol).as("id_a"),
        explode(array(expr(s"$ts div ${window}L"),
          expr(s"$ts div ${window}L + 1L"))).as("_bin"))
    val build = base.select(col(key).as("k"), col(ts).as("ts_b"),
      col(idCol).as("id_b"), expr(s"$ts div ${window}L").as("_bin"))
    probe.join(build, Seq("k", "_bin"))
      .filter(col("ts_b") - col("ts_a") <= window &&
        (col("ts_b") > col("ts_a") ||
          (col("ts_b") === col("ts_a") && col("id_b") > col("id_a"))))
      .select(col("k").as(key), col("id_a"), col("id_b"),
        (col("ts_b") - col("ts_a")).as("gap"))
  }
}
