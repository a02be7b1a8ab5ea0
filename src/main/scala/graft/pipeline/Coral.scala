package graft.pipeline

import breeze.linalg.{DenseMatrix, eigSym}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** CORAL domain-shift correction (SURVEY.md §2.12;
  * scarf/mapping_utils.py:15-96): standardize source and target feature
  * matrices, compute `A = Cs^{-1/2} · Ct^{1/2}` from the two feature
  * covariances (+I regularization), then project `source · A`.
  *
  * The covariances are m×m (m = features, small); they are computed
  * distributively from moments and only the m×m matrices hit the driver
  * for the fractional powers (breeze eigendecomposition) — the same
  * boundary the reference crosses.
  */
object Coral {

  /** Distributed covariance of `(cell_id, latent: array<double>)` rows. */
  def covariance(vecs: DataFrame): DenseMatrix[Double] = {
    val spark = vecs.sparkSession
    import spark.implicits._
    val arr = vecs.select("latent").as[Seq[Double]]
    val m = arr.head().length
    val (sums, prods, n) = arr.rdd
      .map { v =>
        val a = v.toArray
        val outer = Array.tabulate(m * m)(i => a(i / m) * a(i % m))
        (a, outer, 1L)
      }
      .reduce { (x, y) =>
        (Array.tabulate(m)(i => x._1(i) + y._1(i)),
          Array.tabulate(m * m)(i => x._2(i) + y._2(i)),
          x._3 + y._3)
      }
    val mean = sums.map(_ / n)
    val cov = DenseMatrix.tabulate(m, m) { (i, j) =>
      prods(i * m + j) / n - mean(i) * mean(j)
    }
    cov
  }

  private def matPow(c: DenseMatrix[Double], p: Double): DenseMatrix[Double] = {
    val es = eigSym(c)
    val d = es.eigenvalues.map(v => math.pow(math.max(v, 1e-12), p))
    val q = es.eigenvectors
    q * breeze.linalg.diag(d) * q.t
  }

  /** Correction matrix A from source/target covariances (+I). */
  def correction(cs: DenseMatrix[Double], ct: DenseMatrix[Double]): DenseMatrix[Double] = {
    val m = cs.rows
    val eye = DenseMatrix.eye[Double](m)
    matPow(cs + eye, -0.5) * matPow(ct + eye, 0.5)
  }

  /** Apply `source · A` row-wise — A broadcasts, rows stream. */
  def apply(source: DataFrame, a: DenseMatrix[Double]): DataFrame = {
    val m = a.rows
    val flat = Array.tabulate(m * m)(i => a(i / m, i % m))
    val mul = udf { (v: Seq[Double]) =>
      Array.tabulate(m)(j => (0 until m).map(i => v(i) * flat(i * m + j)).sum).toSeq
    }
    source.select(col("cell_id"), mul(col("latent")).as("latent"))
  }
}
