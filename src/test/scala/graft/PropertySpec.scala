package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.core.MetaOps
import graft.ops.Windows

/** Property tests for the load-bearing mask/rank semantics
  * (SURVEY.md §7.4 risk 4). Uses raw ScalaCheck generators with fixed
  * seeds (scalatestplus bridge isn't on the classpath).
  */
class PropertySpec extends SparkSpec {
  import spark.implicits._

  private def samples[A](g: Gen[A], n: Int): Seq[A] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(42L + i)))

  test("updateKey is monotone: repeated AND-updates never resurrect a row") {
    val gen = Gen.listOfN(20, Gen.zip(Gen.posNum[Int], Gen.oneOf(true, false)))
    samples(gen, 10).foreach { data =>
      val df = data.zipWithIndex.map { case ((v, m), i) => (i, v, m) }
        .toDF("id", "v", "I")
      val once = MetaOps.updateKey(df, "I", col("v") % 2 === 0)
      val twice = MetaOps.updateKey(once, "I", lit(true))
      // a second update with an all-true predicate changes nothing
      assert(rows(twice.orderBy("id")) === rows(once.orderBy("id")))
      // no row that was false before is true after
      val resurrected = df.select(col("id"), col("I").as("before"))
        .join(once.select(col("id"), col("I").as("after")), Seq("id"))
        .filter(!col("before") && col("after")).count()
      assert(resurrected === 0)
    }
  }

  test("average ranks within a group always sum to n(n+1)/2") {
    samples(Gen.nonEmptyListOf(Gen.choose(0, 5)), 10).foreach { vs =>
      val df = vs.map(v => ("g", v.toDouble)).toDF("grp", "v")
      val n = vs.length
      val s = Windows.ranks(df, "grp", "v")
        .agg(sum(col("arank"))).head().getDouble(0)
      assert(approx(s, n * (n + 1) / 2.0), s"n=$n sum=$s")
    }
  }
}
