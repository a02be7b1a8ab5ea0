package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.ops.Windows

/** The scale-safe window replacements must be SEMANTICALLY IDENTICAL to
  * the single-partition originals they replaced — checked on randomized
  * inputs across seeds (ties included).
  */
class WindowEquivalenceSpec extends SparkSpec {

  private def randomDf(seed: Int, n: Int) = {
    import spark.implicits._
    val rnd = new scala.util.Random(seed)
    // duplicate values on purpose: ties must break identically
    (0 until n).map(i => (i.toLong, rnd.nextInt(20).toDouble, rnd.nextInt(5)))
      .toDF("id", "v", "g").repartition(7)
  }

  test("globalOrdinal == row_number over the same total order") {
    for (seed <- Seq(1, 2, 3)) {
      val df = randomDf(seed, 500)
      val expected = df.withColumn("pos",
        row_number().over(Window.orderBy(col("v"), col("id"))).cast("long"))
        .select("id", "pos").collect().map(r => (r.getLong(0), r.getLong(1))).toMap
      val got = Windows.globalOrdinal(df, Seq(col("v"), col("id")), "pos")
        .select("id", "pos").collect().map(r => (r.getLong(0), r.getLong(1))).toMap
      assert(got == expected, s"seed $seed mismatch")
    }
  }

  test("ntileBin == NTILE(n) over the same total order, all n") {
    for (seed <- Seq(4, 5); n <- Seq(3, 7, 10, 64)) {
      val df = randomDf(seed, 311) // non-divisible count exercises remainders
      val expected = df.withColumn("bin",
        ntile(n).over(Window.orderBy(col("v"), col("id"))))
        .select("id", "bin").collect().map(r => (r.getLong(0), r.getInt(1))).toMap
      val got = Windows.ntileBin(df, Seq(col("v"), col("id")), n)
        .select("id", "bin").collect().map(r => (r.getLong(0), r.getInt(1))).toMap
      assert(got == expected, s"seed $seed n $n mismatch")
    }
  }

  test("runningTotal == exclusive running sum window") {
    for (seed <- Seq(6, 7)) {
      val df = randomDf(seed, 400)
      val expected = df.withColumn("run",
        coalesce(sum(col("v")).over(Window.orderBy(col("v"), col("id"))
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0.0)))
        .select("id", "run").collect().map(r => (r.getLong(0), r.getDouble(1))).toMap
      val got = Windows.runningTotal(df, Seq(col("v"), col("id")), "v", "run")
        .select("id", "run").collect().map(r => (r.getLong(0), r.getDouble(1))).toMap
      expected.foreach { case (k, v) =>
        assert(approx(got(k), v, 1e-9), s"seed $seed id $k: ${got(k)} != $v")
      }
    }
  }

  test("runningTotalLongWithPos == exclusive long running sum + row_number") {
    for (seed <- Seq(8, 9)) {
      val df = randomDf(seed, 400)
        .withColumn("c", (col("v") * 3 + 1).cast("long"))
      val order = Seq(col("v"), col("id"))
      val expected = df
        .withColumn("run", coalesce(sum(col("c"))
          .over(Window.orderBy(order: _*)
            .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
        .withColumn("pos",
          row_number().over(Window.orderBy(order: _*)).cast("long"))
        .select("id", "run", "pos").collect()
        .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2)))).toMap
      val got = Windows.runningTotalLongWithPos(df, order, "c", "run", "pos")
        .select("id", "run", "pos").collect()
        .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2)))).toMap
      assert(got == expected, s"seed $seed")
    }
  }

  test("min-rank construction (1 + strictly-below count) == RANK()") {
    import spark.implicits._
    for (seed <- Seq(8, 9)) {
      val df = randomDf(seed, 300).select(col("id").as("feat_id"), col("v").as("value"))
      val expected = df.withColumn("rank",
        rank().over(Window.orderBy(col("value"))).cast("long"))
        .select("feat_id", "rank").collect().map(r => (r.getLong(0), r.getLong(1))).toMap
      val perVal = df.groupBy("value").agg(count(lit(1)).cast("double").as("cnt"))
      val ranked = Windows.runningTotal(perVal, Seq(col("value")), "cnt", "below")
        .select(col("value"), (lit(1) + col("below")).cast("long").as("rank"))
      val got = df.join(ranked, Seq("value"))
        .select("feat_id", "rank").collect().map(r => (r.getLong(0), r.getLong(1))).toMap
      assert(got == expected, s"seed $seed mismatch")
    }
  }
}
