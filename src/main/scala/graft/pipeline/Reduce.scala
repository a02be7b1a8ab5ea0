package graft.pipeline

import org.apache.spark.ml.feature.{PCA, StandardScaler}
import org.apache.spark.ml.linalg.{Vector, Vectors}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Dimensionality reduction (SURVEY.md §2.10): COO → per-cell feature
  * vector → z-scale → PCA, mirroring scarf's normalize → (mu, sigma) →
  * IncrementalPCA path (scarf/ann.py:191-256) with Spark ML's
  * deterministic SVD-based PCA.
  *
  * The vector assembly keys features by a dense 0-based ordinal (window
  * over the selected feature set — |features| rows, broadcastable), so
  * the per-cell vectors have a fixed layout regardless of partitioning.
  */
object Reduce {

  /** Map selected features to dense ordinals `(feat_id, feat_idx)`. */
  def featureIndex(selected: DataFrame): DataFrame =
    graft.ops.Windows.globalOrdinal(
        selected.select("feat_id").distinct(), Seq(col("feat_id")), "_p")
      .withColumn("feat_idx", (col("_p") - 1).cast("int")).drop("_p")

  /** Assemble per-cell ml Vectors from the COO slice restricted to the
    * selected features. Cells with no selected feature are dropped (same
    * as slicing a dense matrix to zero columns would not).
    */
  def assembleVectors(coo: DataFrame, featIdx: DataFrame, valueCol: String = "value"): DataFrame = {
    val nFeats = featIdx.count().toInt
    val spark = coo.sparkSession
    import spark.implicits._
    coo.join(broadcast(featIdx), Seq("feat_id"))
      .select(col("cell_id"), col("feat_idx"), col(valueCol).as("v"))
      .as[(Long, Int, Double)]
      .groupByKey(_._1)
      .mapGroups { (cell, it) =>
        // duplicate (cell, feat) entries sum, matching a counts matrix
        val pairs = it.map(t => (t._2, t._3)).toSeq
          .groupMapReduce(_._1)(_._2)(_ + _).toSeq.sortBy(_._1)
        (cell, Vectors.sparse(nFeats, pairs.map(_._1).toArray, pairs.map(_._2).toArray))
      }
      .toDF("cell_id", "features")
  }

  /** z-scale + PCA to `dims` components; returns `(cell_id, latent)` with
    * `latent: Array[Double]`. Deterministic given the input (SVD-based).
    */
  def pca(vectors: DataFrame, dims: Int, withStd: Boolean = true): DataFrame = {
    val scaler = new StandardScaler()
      .setInputCol("features").setOutputCol("scaled")
      .setWithMean(true).setWithStd(withStd)
    val scaled = scaler.fit(vectors).transform(vectors)
    val pcaModel = new PCA().setInputCol("scaled").setOutputCol("pc")
      .setK(dims).fit(scaled)
    val toArr = udf((v: Vector) => v.toArray)
    pcaModel.transform(scaled)
      .select(col("cell_id"), toArr(col("pc")).as("latent"))
  }

  /** LSI (scarf/ann.py:258-288): SVD of the (TF-IDF-normalized) matrix
    * WITHOUT centering — the ATAC path. Computes `dims + 1` components
    * and drops the first (depth-correlated) one when `skipFirst`, the
    * reference's `lsi_skip_first` semantic.
    */
  def lsi(vectors: DataFrame, dims: Int, skipFirst: Boolean = true): DataFrame = {
    val k = if (skipFirst) dims + 1 else dims
    // uncentered projection: PCA without mean removal == right singular
    // vectors of the raw matrix; use RowMatrix SVD for exactness
    val spark = vectors.sparkSession
    import spark.implicits._
    val rows = vectors.select("cell_id", "features")
      .map { r =>
        (r.getLong(0), org.apache.spark.mllib.linalg.Vectors.fromML(
          r.getAs[Vector](1)))
      }
    val mat = new org.apache.spark.mllib.linalg.distributed.RowMatrix(rows.rdd.map(_._2))
    val svd = mat.computeSVD(k, computeU = false)
    val v = svd.V // (nFeats x k)
    val proj = udf { (vec: Vector) =>
      val out = new Array[Double](k)
      vec.foreachActive { (i, x) =>
        var j = 0
        while (j < k) { out(j) += x * v(i, j); j += 1 }
      }
      (if (skipFirst) out.drop(1) else out).toSeq
    }
    vectors.select(col("cell_id"), proj(col("features")).as("latent"))
  }
}
