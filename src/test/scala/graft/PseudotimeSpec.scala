package graft

import graft.pipeline.Pseudotime

/** PBA potential (the reference's actual Laplacian pseudo-inverse,
  * graph_datastore.py:1818-2003) and its agreement with the distributed
  * PPR substitute used by q55.
  */
class PseudotimeSpec extends SparkSpec {

  private def chain(n: Int) = {
    import spark.implicits._
    val e = (0 until n - 1).flatMap(i =>
      Seq((i.toLong, (i + 1).toLong, 1.0), ((i + 1).toLong, i.toLong, 1.0)))
    e.toDF("src", "dst", "weight")
  }

  test("pbaPotential is monotone along the chain interior (numpy-checked shape)") {
    // The exact reference computation (column-normalized L_rw) distorts
    // the two degree-1 endpoints — verified against a numpy
    // pinv(I - A/D) @ r solve, which yields the same shape:
    // [0.1944, 0, 0.1111, ..., 1, 0.8056] on a 12-chain.
    val pt = Pseudotime.pbaPotential(chain(12), sources = Seq(0L), sinks = Seq(11L))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(approx(pt(1L), 0.0, 1e-9) && approx(pt(10L), 1.0, 1e-9))
    (1 until 10).foreach(i =>
      assert(pt(i.toLong) < pt((i + 1).toLong),
        s"not monotone at $i: ${pt(i.toLong)} !< ${pt((i + 1).toLong)}"))
    assert(approx(pt(0L), 0.1944, 1e-3) && approx(pt(11L), 0.8056, 1e-3))
  }

  test("ss_vec balancing: potential sums respect the zero-sum source/sink vector") {
    // with sources={0}, sinks={9}, middle cells get the balancing value;
    // the solve must produce finite values for every node
    val pt = Pseudotime.pbaPotential(chain(10), Seq(0L), Seq(9L))
      .collect().map(_.getDouble(1))
    assert(pt.length == 10 && pt.forall(v => !v.isNaN && !v.isInfinite))
    assert(pt.min == 0.0 && pt.max == 1.0)
  }

  test("PPR substitute rank-agrees with the exact PBA potential on a chain") {
    import spark.implicits._
    val edges = chain(12)
    val exact = Pseudotime.pbaPotential(edges, Seq(0L), Seq(11L))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val src = Seq(0L).toDF("cell_id")
    val approx0 = Pseudotime.score(edges, src, iters = 30)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // Spearman rank correlation of the two orderings
    def ranks(m: Map[Long, Double]): Map[Long, Double] = {
      val sorted = m.toSeq.sortBy(_._2).map(_._1).zipWithIndex
      sorted.map { case (k, i) => k -> i.toDouble }.toMap
    }
    val (ra, rb) = (ranks(exact), ranks(approx0))
    val keys = exact.keys.toSeq
    val n = keys.size
    val d2 = keys.map(k => math.pow(ra(k) - rb(k), 2)).sum
    val rho = 1.0 - 6 * d2 / (n * (n * n - 1.0))
    assert(rho >= 0.9, s"Spearman rho $rho below 0.9")
  }
}
