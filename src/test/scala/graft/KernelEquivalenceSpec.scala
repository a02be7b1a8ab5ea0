package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Pins the r14 kernel rewrites to the exact formulations they replaced:
  *
  *  - QuantSqDiffSum vs the interpreted
  *    `aggregate(zip_with((fix(x)−fix(y))²))` fixed-point fold (including
  *    .5 rounding knife edges, where HALF_UP vs HALF_EVEN would diverge);
  *  - TopKMin vs the `groupBy(src, dst).min(dist)` dedup + per-src
  *    row_number window chain, on candidate streams WITH cross-round
  *    duplicates and rounded-distance ties.
  */
class KernelEquivalenceSpec extends SparkSpec {
  import spark.implicits._

  test("QuantSqDiffSum matches the fixed-point HOF fold bit-for-bit") {
    val rnd = new scala.util.Random(4466)
    val dims = 7
    val base = (1 to 300).map { i =>
      (i.toLong,
        Seq.fill(dims)(rnd.nextDouble() * 4 - 2),
        Seq.fill(dims)(rnd.nextDouble() * 4 - 2))
    }
    // knife edges: components whose ×1e6 lands exactly on .5, both signs
    // (HALF_UP rounds 2.5→3 and −2.5→−3; HALF_EVEN would give 2/−2)
    val edges = Seq(
      (1001L, Seq(0.0000025, -0.0000025, 1.0000005, 0.5, -0.5, 0.0, 2.0),
        Seq(0.0000015, 0.0000035, -1.0000015, 0.25, 0.75, 0.0, -2.0)),
      (1002L, Seq.fill(dims)(0.0000005), Seq.fill(dims)(-0.0000005)))
    val df = (base ++ edges).toDF("id", "a", "b")
    def fix(c: org.apache.spark.sql.Column) = round(c * lit(1e6)).cast("long")
    val out = df.select(col("id"),
      aggregate(zip_with(col("a"), col("b"),
        (x, y) => (fix(x) - fix(y)) * (fix(x) - fix(y))),
        lit(0L), (acc, x) => acc + x).as("fold"),
      graft.functions.QuantSqDiffSum.column(col("a"), col("b"), 1e6)
        .as("kernel"))
    assert(out.filter(col("fold") =!= col("kernel")).count() === 0)
    // and through an aggregation (codegen'd path), like the ADC sum uses
    val sums = out.agg(sum("fold").as("f"), sum("kernel").as("k")).head
    assert(sums.getLong(0) === sums.getLong(1))
  }

  test("TopKMin reproduces the dedup-groupBy + row_number window top-k") {
    val rnd = new scala.util.Random(77)
    // candidate stream with duplicates (same (src, dst) repeated with the
    // SAME dist — the multi-round LSH shape) and forced rounded ties
    val cand0 = for {
      src <- 1L to 40L
      dst <- 1L to 30L
      if rnd.nextDouble() < 0.7
    } yield (src, dst + 100L,
      // coarse grid ⇒ many exact ties at 6dp, exercising the dst tie-break
      math.floor(rnd.nextDouble() * 20) / 10.0 + src * 1e-9)
    val dups = cand0.filter(_ => rnd.nextBoolean())
    val cand = (cand0 ++ dups ++ dups).toDF("src", "dst", "dist")
    val k = 5
    val ref = cand.groupBy("src", "dst").agg(min(col("dist")).as("dist"))
      .withColumn("rn", row_number().over(
        Window.partitionBy("src").orderBy(round(col("dist"), 6), col("dst"))))
      .filter(col("rn") <= k)
      .select(col("src"), col("dst"), round(col("dist"), 6).as("dist"), col("rn"))
    val got = cand.groupBy("src")
      .agg(graft.functions.TopKMin.column(
        struct(round(col("dist"), 6).as("dist"), col("dst").as("dst")), k).as("_tk"))
      .select(col("src"), posexplode(col("_tk")).as(Seq("_p", "_e")))
      .select(col("src"), col("_e.dst").as("dst"), col("_e.dist").as("dist"),
        (col("_p") + 1).as("rn"))
    assert(ref.count() > 0)
    assert(ref.unionByName(got).distinct().count() === ref.count(),
      "TopKMin rows differ from the window formulation")
    assert(got.count() === ref.count())
  }

  test("TopKMin survives partial-aggregation merges across many partitions") {
    val n = 5000
    val df = spark.range(n)
      .select((col("id") % 7).as("src"), col("id").as("dst"),
        (col("id") % 997).cast("double").as("dist"))
      .repartition(16)
    val k = 3
    val ref = df
      .withColumn("rn", row_number().over(
        Window.partitionBy("src").orderBy(col("dist"), col("dst"))))
      .filter(col("rn") <= k)
      .select("src", "dst", "dist", "rn")
    val got = df.groupBy("src")
      .agg(graft.functions.TopKMin.column(
        struct(col("dist").as("dist"), col("dst").as("dst")), k).as("_tk"))
      .select(col("src"), posexplode(col("_tk")).as(Seq("_p", "_e")))
      .select(col("src"), col("_e.dst").as("dst"), col("_e.dist").as("dist"),
        (col("_p") + 1).as("rn"))
    assert(got.count() === 7L * k)
    assert(ref.unionByName(got).distinct().count() === ref.count())
  }
}
