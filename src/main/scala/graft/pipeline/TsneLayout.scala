package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** t-SNE 2-D layout (SURVEY.md §2.11; run_tsne,
  * scarf/datastore/graph_datastore.py — the reference shells out to the
  * external SG-tSNE-Π binary). This is the exact van der Maaten 2008
  * algorithm at the same single-node boundary the reference draws:
  * perplexity-calibrated Gaussian affinities (the same beta bisection the
  * LISI kernel uses), symmetrized P, early-exaggerated momentum gradient
  * descent on the Student-t Q. O(n²) per iteration — the test-scale
  * exactness baseline; at cluster scale the distributed UMAP layout is
  * the embedding path (UmapLayout.distributedLayout).
  */
object TsneLayout {

  def layout(latent: DataFrame, perplexity: Double = 30.0, nIter: Int = 300,
             learningRate: Double = 200.0, seed: Long = 4444L): DataFrame = {
    val spark = latent.sparkSession
    import spark.implicits._
    val rows = latent.select("cell_id", "latent").as[(Long, Seq[Double])]
      .collect().sortBy(_._1)
    val ids = rows.map(_._1)
    val x = rows.map(_._2.toArray)
    val n = ids.length
    require(n >= 3, "t-SNE needs at least 3 points")

    // pairwise squared distances in the latent space
    val d2 = Array.ofDim[Double](n, n)
    var i = 0
    while (i < n) {
      var j = i + 1
      while (j < n) {
        var s = 0.0
        var k = 0
        while (k < x(i).length) { val t = x(i)(k) - x(j)(k); s += t * t; k += 1 }
        d2(i)(j) = s; d2(j)(i) = s
        j += 1
      }
      i += 1
    }

    // per-point beta bisection to the target perplexity (exact SNE calibration)
    val p = Array.ofDim[Double](n, n)
    val logU = math.log(math.min(perplexity, (n - 1).toDouble))
    i = 0
    while (i < n) {
      var beta = 1.0
      var lo = Double.NegativeInfinity
      var hi = Double.PositiveInfinity
      var it = 0
      while (it < 64) {
        var sum = 0.0
        var sumD = 0.0
        var j = 0
        while (j < n) {
          if (j != i) {
            val w = math.exp(-beta * d2(i)(j))
            sum += w; sumD += w * d2(i)(j)
          }
          j += 1
        }
        val h = if (sum > 0) math.log(sum) + beta * sumD / sum else 0.0
        if (math.abs(h - logU) < 1e-5 || sum <= 0) it = 64
        else {
          if (h > logU) { lo = beta; beta = if (hi.isPosInfinity) beta * 2 else (beta + hi) / 2 }
          else { hi = beta; beta = if (lo.isNegInfinity) beta / 2 else (beta + lo) / 2 }
          it += 1
        }
      }
      var sum = 0.0
      var j = 0
      while (j < n) { if (j != i) { p(i)(j) = math.exp(-beta * d2(i)(j)); sum += p(i)(j) }; j += 1 }
      j = 0
      while (j < n) { if (sum > 0) p(i)(j) /= sum; j += 1 }
      i += 1
    }
    // symmetrize and floor
    i = 0
    while (i < n) {
      var j = i + 1
      while (j < n) {
        val v = math.max((p(i)(j) + p(j)(i)) / (2 * n), 1e-12)
        p(i)(j) = v; p(j)(i) = v
        j += 1
      }
      i += 1
    }

    // deterministic small init from a seeded hash (the reference's random
    // normal init, made reproducible)
    val rnd = new scala.util.Random(seed)
    val y = Array.fill(n, 2)(rnd.nextGaussian() * 1e-4)
    descend(p, y, nIter, learningRate)
    ids.indices.map(i0 => (ids(i0), y(i0)(0), y(i0)(1)))
      .toSeq.toDF("cell_id", "tsne1", "tsne2")
  }

  /** Graph-affinity t-SNE: P comes from the symmetrized, mass-normalized
    * edge weights instead of a latent-space Gaussian kernel, and descent
    * starts from the caller's init coordinates — the role SG-tSNE-Π
    * plays for run_tsne/run_unified_tsne (the reference feeds it the KNN
    * graph, scarf/datastore/graph_datastore.py run_tsne;
    * mapping_datastore.py:573-668). Same single-node boundary as
    * [[layout]]; nodes present in `init` but absent from `edges` feel
    * only repulsion, and every edge endpoint must carry an init row.
    */
  def layoutFromGraph(edges: DataFrame, init: DataFrame, nIter: Int = 300,
                      learningRate: Double = 200.0): DataFrame = {
    val spark = edges.sparkSession
    import spark.implicits._
    val rows = init.select("cell_id", "x", "y").as[(Long, Double, Double)]
      .collect().sortBy(_._1)
    val ids = rows.map(_._1)
    val idx = ids.zipWithIndex.toMap
    val n = ids.length
    require(n >= 3, "t-SNE needs at least 3 points")
    val p = Array.ofDim[Double](n, n)
    edges.select("src", "dst", "weight").as[(Long, Long, Double)].collect()
      .foreach { case (s, d, w) =>
        require(idx.contains(s) && idx.contains(d),
          s"edge endpoint without an init row: ($s, $d)")
        if (s != d) { p(idx(s))(idx(d)) += w; p(idx(d))(idx(s)) += w }
      }
    var tot = 0.0
    var i = 0
    while (i < n) { var j = 0; while (j < n) { tot += p(i)(j); j += 1 }; i += 1 }
    i = 0
    while (i < n) {
      var j = 0
      while (j < n) {
        if (j != i) p(i)(j) = math.max(if (tot > 0) p(i)(j) / tot else 0.0, 1e-12)
        j += 1
      }
      i += 1
    }
    // rescale the init to std 1e-4 (openTSNE's convention for informed
    // inits): the descent's step sizes assume a near-origin start, and a
    // wide init makes the early-exaggeration phase diverge. Relative
    // geometry — the only thing the init carries — is preserved.
    val y = rows.map(r => Array(r._2, r._3))
    val mx = Array(y.map(_(0)).sum / n, y.map(_(1)).sum / n)
    val sd = math.sqrt(y.map(r => {
      val a = r(0) - mx(0); val b = r(1) - mx(1); a * a + b * b
    }).sum / (2 * n))
    val sc = if (sd > 0) 1e-4 / sd else 1.0
    y.foreach { r => r(0) = (r(0) - mx(0)) * sc; r(1) = (r(1) - mx(1)) * sc }
    descend(p, y, nIter, learningRate)
    ids.indices.map(i0 => (ids(i0), y(i0)(0), y(i0)(1)))
      .toSeq.toDF("cell_id", "tsne1", "tsne2")
  }

  /** Early-exaggerated momentum gradient descent on the Student-t Q
    * (van der Maaten 2008) — mutates `y` in place. */
  private def descend(p: Array[Array[Double]], y: Array[Array[Double]],
                      nIter: Int, learningRate: Double): Unit = {
    val n = y.length
    val dy = Array.fill(n, 2)(0.0)
    val gains = Array.fill(n, 2)(1.0)
    var i = 0
    var iter = 0
    while (iter < nIter) {
      val exag = if (iter < 100) 12.0 else 1.0
      val momentum = if (iter < 250) 0.5 else 0.8
      // Student-t Q and total mass
      val num = Array.ofDim[Double](n, n)
      var qSum = 0.0
      i = 0
      while (i < n) {
        var j = i + 1
        while (j < n) {
          val dx = y(i)(0) - y(j)(0); val dyy = y(i)(1) - y(j)(1)
          val q = 1.0 / (1.0 + dx * dx + dyy * dyy)
          num(i)(j) = q; num(j)(i) = q
          qSum += 2 * q
          j += 1
        }
        i += 1
      }
      i = 0
      while (i < n) {
        var gx = 0.0; var gy = 0.0
        var j = 0
        while (j < n) {
          if (j != i) {
            val q = num(i)(j)
            val coef = (exag * p(i)(j) - q / qSum) * q
            gx += coef * (y(i)(0) - y(j)(0))
            gy += coef * (y(i)(1) - y(j)(1))
          }
          j += 1
        }
        var k = 0
        val g = Array(4 * gx, 4 * gy)
        while (k < 2) {
          gains(i)(k) = math.max(0.01,
            if (math.signum(g(k)) != math.signum(dy(i)(k))) gains(i)(k) + 0.2
            else gains(i)(k) * 0.8)
          dy(i)(k) = momentum * dy(i)(k) - learningRate * gains(i)(k) * g(k)
          y(i)(k) += dy(i)(k)
          k += 1
        }
        i += 1
      }
      iter += 1
    }
  }
}
