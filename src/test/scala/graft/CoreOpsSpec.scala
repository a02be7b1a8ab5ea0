package graft

import org.apache.spark.sql.functions._
import graft.core.MetaOps
import graft.norm.Normalize
import graft.stats.MatrixStats

/** Exact-value unit tests on the toy 3-cell fixture (FIXTURES.md §1):
  * RNA matrix (cells × g1..g4) = [[5,0,0,2],[3,3,0,7],[3,3,0,7]].
  */
class CoreOpsSpec extends SparkSpec {
  import spark.implicits._

  // COO form of the toy RNA matrix (zeros omitted)
  lazy val coo = Seq(
    (1L, 1L, 5.0), (1L, 4L, 2.0),
    (2L, 1L, 3.0), (2L, 2L, 3.0), (2L, 4L, 7.0),
    (3L, 1L, 3.0), (3L, 2L, 3.0), (3L, 4L, 7.0)
  ).toDF("cell_id", "feat_id", "value")
  lazy val nTot = Seq(3L).toDF("n_total_cells")

  test("cellProps: nCounts/nFeatures per cell") {
    val r = rows(MatrixStats.cellProps(coo).orderBy("cell_id"))
    assert(r === Seq(Seq(1L, 7.0, 2L), Seq(2L, 13.0, 3L), Seq(3L, 13.0, 3L)))
  }

  test("featureProps: nCells and dropOuts (feature 3 is all-zero => absent)") {
    val r = rows(MatrixStats.featureProps(coo, nTot).orderBy("feat_id"))
    assert(r === Seq(Seq(1L, 3L, 0L), Seq(2L, 2L, 1L), Seq(4L, 3L, 0L)))
  }

  test("libSize normalizes rows to sf") {
    val r = Normalize.libSize(coo, sf = 100.0)
      .groupBy("cell_id").agg(sum("normed").as("s"))
    r.collect().foreach(x => assert(approx(x.getDouble(1), 100.0)))
  }

  test("libSizeLog matches hand computation") {
    val r = Normalize.libSizeLog(coo, sf = 10.0)
      .filter($"cell_id" === 1 && $"feat_id" === 1)
      .select("normed").as[Double].head()
    assert(approx(r, math.log1p(10.0 * 5 / 7)))
  }

  test("clr uses geometric mean over ALL cells incl. implicit zeros") {
    // feat 2: values (0,3,3) => geomean = exp((log1p(3)+log1p(3))/3)
    val g = math.exp(2 * math.log1p(3.0) / 3)
    val r = Normalize.clr(coo, nTot)
      .filter($"cell_id" === 2 && $"feat_id" === 2)
      .select("normed").as[Double].head()
    assert(approx(r, math.log1p(3.0 / g)))
  }

  test("tfIdf: tf = x/nFeats_row, idf = log2(1 + N/(nCells+1))") {
    val expected = (5.0 / 2) * (math.log(1 + 3.0 / 4) / math.log(2))
    val r = Normalize.tfIdf(coo, nTot)
      .filter($"cell_id" === 1 && $"feat_id" === 1)
      .select("normed").as[Double].head()
    assert(approx(r, expected))
  }

  test("sift keeps closed bounds; open excludes them") {
    val df = Seq(1.0, 2.0, 3.0).toDF("x")
    assert(df.filter(MetaOps.sift(col("x"), 1, 2)).count() === 2)
    assert(df.filter(MetaOps.sift(col("x"), 1, 2, keepBounds = false)).count() === 0)
  }

  test("updateKey is a monotone AND: once false, stays false") {
    val df = Seq((1, false), (2, true)).toDF("id", "I")
    val r = MetaOps.updateKey(df, "I", col("id") >= 0)
    assert(rows(r.orderBy("id")) === Seq(Seq(1, false), Seq(2, true)))
  }

  test("fillToIndex scatters active values, fills the rest") {
    val full = Seq(1, 2, 3).toDF("id")
    val active = Seq((2, 9.0)).toDF("id", "v")
    val r = MetaOps.fillToIndex(full, "id", active, "v", lit(-1.0))
    assert(rows(r.orderBy("id")) === Seq(Seq(1, -1.0), Seq(2, 9.0), Seq(3, -1.0)))
  }

  test("featureStats sigmas equals zero-inflated variance") {
    // feat 2 normed==raw values over cells: (0,3,3): var = 3.0
    val stats = MatrixStats.featureStats(
      coo.withColumnRenamed("value", "normed"), nTot)
    val sig = stats.filter($"feat_id" === 2).select("sigmas").as[Double].head()
    assert(approx(sig, 3.0))
  }
}
