package graft.sim

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (`Array[Float]`).
  *
  * Brute-force cosine top-k is the exactness baseline: queries × corpus
  * pairs with an O(dim) fold per pair, all inside Catalyst higher-order
  * functions (no UDF, no driver loop). The query side is expected to be
  * small → broadcast; the corpus side streams, so the plan scales to any
  * corpus size at O(|queries| · |corpus| · dim).
  *
  * The scale path is [[lshBuckets]]: deterministic random-hyperplane
  * signs bucket the corpus; candidates only compare within a bucket
  * (the IVF/LSH shape), trading recall for a |corpus|-independent
  * per-query cost.
  */
object Similarity {

  private def toDouble(c: Column): Column = c.cast("array<double>")

  /** Sequential dot product via the native codegen'd Catalyst expression
    * (graft.functions.DotProduct) — same ascending-index evaluation order
    * as a SQL engine's list_dot_product, so results are
    * engine-reproducible; ~order-of-magnitude faster than the interpreted
    * `aggregate(zip_with(...))` fold it replaces.
    */
  def dot(a: Column, b: Column): Column =
    graft.functions.GraftFunctions.dot_product(a, b)

  /** The interpreted higher-order-function formulation (kept for
    * cross-checking the native expression in tests).
    */
  def dotHof(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (sqrt(dot(a, a)) * sqrt(dot(b, b)))

  /** Euclidean distance via the dot-product identity |a−b|² =
    * a·a − 2a·b + b·b — the same ascending fold a SQL engine's
    * list_dot_product performs, so results are engine-reproducible
    * bit-for-bit. Clamped at 0 against −1e−16 cancellation noise.
    * The single shared kernel behind Knn.bucketedSelfKnn and
    * Metrics.silhouetteScores.
    */
  def l2(a: Column, b: Column): Column =
    sqrt(greatest(dot(a, a) - lit(2) * dot(a, b) + dot(b, b), lit(0.0)))

  /** Exact top-k cosine neighbors of each query vector (self excluded).
    * `queries(qid, qvec)`, `corpus(vec_id, embedding)`.
    */
  def cosineTopK(queries: DataFrame, corpus: DataFrame, k: Int): DataFrame = {
    val q = queries.select(col("qid"), toDouble(col("qvec")).as("qvec"))
    val c = corpus.select(col("vec_id"), toDouble(col("embedding")).as("cvec"))
    val pairs = c.crossJoin(broadcast(q))
      .filter(col("qid") =!= col("vec_id"))
      .select(col("qid"), col("vec_id"),
        cosine(col("qvec"), col("cvec")).as("cos"))
    pairs.withColumn("rn", row_number().over(
        Window.partitionBy("qid").orderBy(round(col("cos"), 6).desc, col("vec_id"))))
      .filter(col("rn") <= k)
      .select(col("qid"), col("vec_id"), round(col("cos"), 6).as("cos"), col("rn"))
  }

  /** Deterministic random-hyperplane LSH bucketing: hyperplane h has
    * pseudo-random ±1 components derived from md5(h:dim) parity; bucket id
    * packs the `nPlanes` sign bits. Vectors in the same bucket are
    * near-duplicates candidates — the scale path for ANN.
    */
  def lshBuckets(corpus: DataFrame, nPlanes: Int): DataFrame =
    bucketsWithKey(corpus, nPlanes, h => s"$h:")

  /** Seeded hyperplane set for multi-round ANN: round r uses planes keyed
    * `"r:h:j"`, giving `rounds` independent bucketings whose candidate
    * unions drive recall toward 1 (see Knn.bucketedSelfKnn).
    */
  def lshBucketsSeeded(corpus: DataFrame, nPlanes: Int, seed: Int): DataFrame =
    bucketsWithKey(corpus, nPlanes, h => s"$seed:$h:")

  private def bucketsWithKey(corpus: DataFrame, nPlanes: Int,
                             prefix: Int => String): DataFrame = {
    val v = toDouble(col("embedding"))
    val bits = (0 until nPlanes).map { h =>
      // component j of plane h: +1 if md5(key(h) + j) first hex digit >= '8'
      val proj = aggregate(
        zip_with(v, sequence(lit(0), size(v) - 1), (x, j) =>
          when(substring(md5(concat(lit(prefix(h)), j.cast("string"))), 1, 1)
            .isInCollection(Seq("8", "9", "a", "b", "c", "d", "e", "f")), x)
            .otherwise(-x)),
        lit(0.0), (acc, x) => acc + x)
      when(proj > 0, lit(1L << h)).otherwise(lit(0L))
    }
    corpus.select(col("vec_id"), bits.reduce(_ + _).as("bucket"))
  }
}
