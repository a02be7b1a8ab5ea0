package graft.stats

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic distinct-count sketching — the 100 TB path for
  * COUNT(DISTINCT) where the exact shuffle-distinct is the bottleneck.
  *
  * KMV (k-minimum-values, Bar-Yossef 2002): per group keep the k
  * smallest of a uniform 60-bit hash of the key; the k-th minimum m
  * estimates the distinct count as (k-1) * 2^60 / m. Unlike HLL the
  * sketch is deterministic and mergeable by "union then re-take min-k",
  * and every arithmetic step (md5, hex compare, IEEE divide) replays
  * bit-identically in any engine — so the estimate itself is oracle-able,
  * not just "approximately right".
  */
object Sketches {

  /** Per-`group` distinct count of `key`, exact and KMV-estimated.
    *
    * Shape: one distinct-aggregation on (group, hash) — the same shuffle
    * an exact distinct needs, but the k-minimum selection then runs as a
    * salted two-phase top-k (never one window task per group; the global
    * pass sees ≤ k·salts rows per group). In a real 100 TB deployment the
    * exact column is dropped and the distinct-agg is replaced by a
    * partial min-k per partition (the sketch's whole point); it is kept
    * here so the oracle validates the estimator against the truth it
    * approximates. Groups with fewer than k distinct keys report the
    * exact count (the sketch is lossless below its capacity).
    */
  def kmvDistinct(df: DataFrame, group: String, key: String, k: Int,
                  salts: Int = 16): DataFrame = {
    // 60-bit uniform hash: first 15 md5 hex chars; lexicographic order on
    // the fixed-width hex string == numeric order, so ranking stays on
    // strings and only the k-th minimum is ever parsed to a number
    val hashes = df
      .select(col(group), md5(col(key).cast("string")).as("hhex"))
      .distinct()
    val local = Window.partitionBy(group, "_salt").orderBy("hhex")
    val global = Window.partitionBy(group).orderBy("hhex")
    val survivors = hashes
      .withColumn("_salt", pmod(conv(substring(col("hhex"), 16, 2), 16, 10)
        .cast("int"), lit(salts)))
      .withColumn("_r", row_number().over(local)).filter(col("_r") <= k)
      .drop("_r", "_salt")
      .withColumn("_r", row_number().over(global)).filter(col("_r") <= k)
    val sketch = survivors.groupBy(group).agg(
      max(conv(substring(col("hhex"), 1, 15), 16, 10).cast("long")).as("mk"),
      count(lit(1)).as("n_in_sketch"))
    val exact = hashes.groupBy(group).agg(count(lit(1)).as("n_exact"))
    exact.join(sketch, Seq(group))
      .select(col(group), col("n_exact"),
        when(col("n_in_sketch") < k, col("n_in_sketch").cast("double"))
          .otherwise(round(lit((k - 1).toDouble) * pow(lit(2.0), lit(60))
            / col("mk").cast("double"), 4))
          .as("kmv_est"))
  }

  /** Count-min frequency estimation (Cormode 2005), validated against
    * the exact counts: `depth` hash rows × `width` counters, estimate =
    * min over rows of the hashed-to counter. The counter table is
    * `depth·width` cells REGARDLESS of corpus size — the whole point at
    * 100 TB, where per-item exact counting shuffles the full vocabulary
    * but the sketch aggregates into a fixed-size, mergeable state. Hashes
    * are md5-derived, so estimates (and their one-sided collision
    * inflation) replay bit-identically in any engine.
    *
    * Output: one row per distinct item with exact count ≥ `minCount`
    * (the exact side exists here to oracle the estimator; a production
    * deployment keeps only the counters and point-queries them).
    */
  def countMinCompare(items: DataFrame, itemCol: String, depth: Int,
                      width: Int, minCount: Long): DataFrame = {
    val cells = items.select(col(itemCol).as("item"),
        explode(sequence(lit(0), lit(depth - 1))).as("r"))
      .withColumn("cell",
        pmod(conv(substring(md5(concat_ws(":", col("r"), col("item"))), 1, 15),
          16, 10).cast("long"), lit(width.toLong)))
    val counters = cells.groupBy("r", "cell").agg(count(lit(1)).as("c"))
    val exact = items.groupBy(col(itemCol).as("item"))
      .agg(count(lit(1)).as("c_true"))
      .filter(col("c_true") >= minCount)
    val est = cells.select("item", "r", "cell").distinct()
      .join(counters, Seq("r", "cell"))
      .groupBy("item").agg(min(col("c")).as("cm_est"))
    exact.join(est, Seq("item"))
      .withColumn("inflated", col("cm_est") > col("c_true"))
  }
}
