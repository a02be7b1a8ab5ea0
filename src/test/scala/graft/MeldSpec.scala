package graft

import org.apache.spark.sql.functions._
import graft.ops.Meld

/** add_grouped_assay + create_counts_mat value semantics on hand-computed
  * fixtures (ref scarf/datastore/datastore.py:824-894,
  * scarf/meld_assay.py:385-440).
  */
class MeldSpec extends SparkSpec {
  import spark.implicits._

  test("groupedAssay: dense per-(cell, group) mean over group SIZE, -1 excluded") {
    // features 1,2 -> group 10 (size 2); feature 3 -> group 20 (size 1);
    // feature 4 -> group -1 (excluded)
    val normed = Seq(
      (1L, 1L, 4.0), (1L, 2L, 2.0), (1L, 4L, 99.0),
      (2L, 1L, 6.0), (2L, 3L, 5.0)).toDF("cell_id", "feat_id", "normed")
    val groups = Seq((1L, 10L), (2L, 10L), (3L, 20L), (4L, -1L))
      .toDF("feat_id", "group")
    val cells = Seq(1L, 2L, 3L).toDF("cell_id")
    val out = Meld.groupedAssay(normed, groups, cells)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(out.size === 6) // 3 cells × 2 surviving groups, dense
    assert(approx(out((1L, 10L)), 3.0)) // (4+2)/2 — mean over group size
    assert(approx(out((2L, 10L)), 3.0)) // (6+0)/2 — absent feature counts as 0
    assert(approx(out((1L, 20L)), 0.0))
    assert(approx(out((2L, 20L)), 5.0))
    assert(approx(out((3L, 10L)), 0.0)) // cell with no counts still present
  }

  test("createCountsMat: tf-idf, many-to-one sum, per-cell rescale to coeff") {
    val coo = Seq(
      (1L, 1L, 2.0), (1L, 2L, 2.0), (2L, 1L, 3.0)).toDF("cell_id", "feat_id", "value")
    val mapping = Seq((1L, 100L), (2L, 100L)).toDF("feat_id", "new_feat")
    val out = Meld.createCountsMat(coo, mapping, graft.core.Tables.nCells(coo),
        scalarCoeff = 10.0, renormalization = true)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    // single target feature -> renormalized row value is exactly the coeff
    assert(approx(out((1L, 100L)), 10.0))
    assert(approx(out((2L, 100L)), 10.0))
  }

  test("createCountsMat without renormalization sums raw tf-idf") {
    // one cell, two features, both map to 100: value = sum of tf*idf
    val coo = Seq((1L, 1L, 2.0), (1L, 2L, 6.0)).toDF("cell_id", "feat_id", "value")
    val mapping = Seq((1L, 100L), (2L, 100L)).toDF("feat_id", "new_feat")
    val out = Meld.createCountsMat(coo, mapping, graft.core.Tables.nCells(coo),
        renormalization = false)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    // n_cells=1; idf = log2(1 + 1/(1+1)) for both features; tf = v/2
    val idf = math.log(1 + 0.5) / math.log(2)
    assert(approx(out((1L, 100L)), (2.0 / 2) * idf + (6.0 / 2) * idf))
  }

  test("peak feeding two features contributes to both") {
    val coo = Seq((1L, 1L, 2.0)).toDF("cell_id", "feat_id", "value")
    val mapping = Seq((1L, 100L), (1L, 200L)).toDF("feat_id", "new_feat")
    val out = Meld.createCountsMat(coo, mapping, graft.core.Tables.nCells(coo),
        scalarCoeff = 8.0, renormalization = true)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(approx(out((1L, 100L)), 4.0)) // split evenly after renorm
    assert(approx(out((1L, 200L)), 4.0))
  }
}
