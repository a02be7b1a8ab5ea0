package graft

import graft.stats.Markers

/** Golden-value test of the marker kernel against an independent NumPy
  * implementation of scarf's find_markers_by_rank semantics
  * (dense/average ranks incl. implicit zeros, tie-corrected MWU with the
  * signed −0.5 continuity correction).
  */
class MarkersSpec extends SparkSpec {
  import spark.implicits._

  // 6 cells, groups A,A,A,B,B,B; feat 1 = [5,0,3,0,2,0]; feat 2 = [0,1,4,4,0,9]
  lazy val coo = Seq(
    (1L, 1L, 5.0), (3L, 1L, 3.0), (5L, 1L, 2.0),
    (2L, 2L, 1.0), (3L, 2L, 4.0), (4L, 2L, 4.0), (6L, 2L, 9.0)
  ).toDF("cell_id", "feat_id", "value")
  lazy val groups = Seq(
    (1L, "A"), (2L, "A"), (3L, "A"), (4L, "B"), (5L, "B"), (6L, "B")
  ).toDF("cell_id", "group")

  lazy val result = Markers.findMarkersByRank(coo, groups)
    .collect().map(r => ((r.getAs[Long]("feat_id"), r.getAs[String]("group")), r)).toMap

  val golden = Map(
    (1L, "A") -> (0.666667, 2.666667, 0.666667, 0.666667, 0.333333, 0.353679),
    (1L, "B") -> (0.333333, 0.666667, 2.666667, 0.333333, 0.666667, 0.164160),
    (2L, "A") -> (0.428571, 1.666667, 4.333333, 0.666667, 0.666667, 0.368688),
    (2L, "B") -> (0.571429, 4.333333, 1.666667, 0.666667, 0.666667, 0.653095))

  test("rank-score/mean/frac/p match the NumPy golden") {
    golden.foreach { case (key, (score, mean, meanRest, frac, fracRest, p)) =>
      val r = result(key)
      assert(approx(r.getAs[Double]("score"), score, 1e-5), s"score $key")
      assert(approx(r.getAs[Double]("mean"), mean, 1e-5), s"mean $key")
      assert(approx(r.getAs[Double]("mean_rest"), meanRest, 1e-5), s"mean_rest $key")
      assert(approx(r.getAs[Double]("frac_exp"), frac, 1e-5), s"frac $key")
      assert(approx(r.getAs[Double]("frac_exp_rest"), fracRest, 1e-5), s"frac_rest $key")
      assert(approx(r.getAs[Double]("p_value"), p, 1e-5), s"p $key")
    }
  }

  test("fold_change = mean/mean_rest") {
    val r = result((1L, "A"))
    assert(approx(r.getAs[Double]("fold_change"), 2.666667 / 0.666667, 1e-4))
  }

  test("scores of a feature sum to 1 across groups") {
    Seq(1L, 2L).foreach { f =>
      val s = result((f, "A")).getAs[Double]("score") +
        result((f, "B")).getAs[Double]("score")
      assert(approx(s, 1.0))
    }
  }

  test("regression markers: perfect linear relation gives r = 1") {
    val c = Seq((1L, 1L, 1.0), (2L, 1L, 2.0), (3L, 1L, 3.0))
      .toDF("cell_id", "feat_id", "value")
    val y = Seq((1L, 10.0), (2L, 20.0), (3L, 30.0)).toDF("cell_id", "y")
    val r = Markers.findMarkersByRegression(c, y, minCells = 1)
      .select("r").as[Double].head()
    assert(approx(r, 1.0))
  }
}
