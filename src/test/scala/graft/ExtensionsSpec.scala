package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.sim.Similarity

/** The SparkSessionExtensions surface: SQL function registration for the
  * native codegen expressions and the HOF→kernel dot-product rewrite
  * rule (graft.plans.GraftExtensions).
  */
class ExtensionsSpec extends SparkSpec {

  /** A second session on the SAME SparkContext with GraftExtensions
    * installed (getOrCreate would return the shared plain session, so
    * the default/active slots are cleared for the build and restored
    * after).
    */
  private def withExtendedSession[A](f: SparkSession => A): A = {
    val base = spark // force the shared session (and its context) first
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      val ext = SparkSession.builder()
        .master("local[4]")
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.ui.enabled", "false")
        .withExtensions(new graft.plans.GraftExtensions)
        .getOrCreate()
      f(ext)
    } finally {
      SparkSession.setDefaultSession(base)
      SparkSession.setActiveSession(base)
    }
  }

  test("injected SQL functions: dot_product and hamming64 reachable from spark.sql") {
    withExtendedSession { ext =>
      val r = ext.sql(
        """SELECT dot_product(array(1.0d, 2.0d, 3.0d), array(4.0d, 5.0d, 6.0d)) AS d,
                  hamming64(CAST(7 AS BIGINT), CAST(1 AS BIGINT)) AS h""").head()
      assert(r.getDouble(0) == 32.0)
      assert(r.getInt(1) == 2)
    }
  }

  // a non-constant source (id-dependent arrays) so ConvertToLocalRelation
  // cannot pre-evaluate the projection before the plan is inspected
  private def arraysDf(s: SparkSession) =
    s.range(2).select(
      array(col("id").cast("double"), lit(2.0)).as("a"),
      array(lit(3.0), lit(4.0)).as("b"))

  test("DotProductRewrite: HOF spelling optimizes into the codegen kernel, values unchanged") {
    withExtendedSession { ext =>
      import ext.implicits._
      val hof = arraysDf(ext).select(Similarity.dotHof(col("a"), col("b")).as("d"))
      val opt = hof.queryExecution.optimizedPlan.toString
      assert(opt.contains("dotproduct") || opt.contains("DotProduct"),
        s"rewrite did not fire:\n$opt")
      assert(hof.as[Double].collect().toSeq.sorted == Seq(8.0, 11.0))
      // negative control: the squared-difference fold is NOT a dot
      // product and must survive untouched
      val l2ish = arraysDf(ext).select(aggregate(zip_with(col("a"), col("b"),
        (x, y) => (x - y) * (x - y)), lit(0.0), (acc, v) => acc + v).as("s"))
      val opt2 = l2ish.queryExecution.optimizedPlan.toString
      assert(!opt2.contains("dotproduct") && !opt2.contains("DotProduct"))
      assert(l2ish.as[Double].collect().toSeq.sorted == Seq(8.0, 13.0))
    }
  }

  test("rewrite rule is inert in plain sessions (opt-in only)") {
    import spark.implicits._
    val hof = arraysDf(spark).select(Similarity.dotHof(col("a"), col("b")).as("d"))
    assert(!hof.queryExecution.optimizedPlan.toString.contains("dotproduct"))
    assert(hof.as[Double].collect().toSeq.sorted == Seq(8.0, 11.0))
  }
}
