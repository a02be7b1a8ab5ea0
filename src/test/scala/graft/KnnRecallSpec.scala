package graft

import org.apache.spark.sql.functions._
import graft.pipeline.Knn

/** Recall of the bucketed (LSH multi-probe) self-KNN against the exact
  * O(n²) baseline — the reference reports recall per ANN run
  * (scarf/knn_utils.py:74-76); we gate at 0.95 on the sf0.01 embeddings.
  */
class KnnRecallSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.01"

  test("bucketedSelfKnn recall >= 0.95 vs exact at sf0.01, no O(n²) stage") {
    assume(new java.io.File(s"$sfDir/embeddings.parquet").exists())
    val latent = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select(col("vec_id").as("cell_id"),
        col("embedding").cast("array<double>").as("latent"))
    val exact = Knn.exactSelfKnn(latent, 5).cache()
    val approx = Knn.bucketedSelfKnn(latent, 5, nPlanes = 4, rounds = 6).cache()
    val r = Knn.recall(approx, exact)
    assert(r >= 0.95, s"recall $r below 0.95")
    // the plan must contain no cartesian/nested-loop product: the only
    // joins are equi-joins on (bucket) and (cell_id)
    val plan = approx.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), "bucketed KNN plan has a cartesian product")
    assert(!plan.contains("BroadcastNestedLoopJoin"), "bucketed KNN plan has a nested-loop join")
  }

  test("default nPlanes auto-sizes via planesFor and matches explicit planes at small n") {
    assume(new java.io.File(s"$sfDir/embeddings.parquet").exists())
    val latent = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select(col("vec_id").as("cell_id"),
        col("embedding").cast("array<double>").as("latent"))
    // n = 500 → planesFor = max(4, ceil(log2(500/128))) = 4, so the
    // auto default must reproduce the explicit-4-planes result exactly;
    // the quadratic-regime guard is that big-n callers (makeGraph etc.)
    // get log₂-grown planes without opting in
    val auto = Knn.bucketedSelfKnn(latent, 5).orderBy("src", "rn").collect()
    val fixed = Knn.bucketedSelfKnn(latent, 5, nPlanes = 4, rounds = 6)
      .orderBy("src", "rn").collect()
    assert(auto === fixed)
    assert(graft.sim.Similarity.planesFor(500) === 4)
    assert(graft.sim.Similarity.planesFor(1000000) === 13)
  }

  test("bucketedSelfKnn emits exactly k neighbors per source on a grid") {
    import spark.implicits._
    // 3 tight clusters of 4 points each in 8-d
    val pts = (0 until 12).map { i =>
      val c = i / 4
      (i.toLong, Array.tabulate(8)(j => c * 10.0 + 0.01 * ((i % 4) + j)))
    }
    val latent = pts.toDF("cell_id", "latent")
    val res = Knn.bucketedSelfKnn(latent, 3, nPlanes = 3, rounds = 4)
    val counts = res.groupBy("src").count().collect()
    assert(counts.length == 12 && counts.forall(_.getLong(1) == 3L))
    // neighbors of any point stay inside its cluster (clusters are 10 apart)
    val cross = res.filter(expr("src div 4 != dst div 4")).count()
    assert(cross == 0L, s"$cross cross-cluster edges in top-3")
  }

  test("bucketedEpsNeighborsBetween: asymmetric probe finds planted copies only") {
    import spark.implicits._
    // corpus: 3 well-separated cluster centers; queries: a near-copy of
    // center 0 (must match), and a far point (must not)
    val corpus = Seq(
      (0L, Array.tabulate(8)(j => 0.01 * j)),
      (1L, Array.tabulate(8)(j => 10.0 + 0.01 * j)),
      (2L, Array.tabulate(8)(j => 20.0 + 0.01 * j))).toDF("cell_id", "latent")
    val queries = Seq(
      (100L, Array.tabulate(8)(j => 0.01 * j + 0.01)),
      (101L, Array.tabulate(8)(_ => -50.0))).toDF("cell_id", "latent")
    val nb = Knn.bucketedEpsNeighborsBetween(queries, corpus, eps = 0.5,
      nPlanes = 3, rounds = 4)
    val rows = nb.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(rows == Set((100L, 0L)), s"unexpected matches: $rows")
    val plan = nb.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"))
    assert(!plan.contains("BroadcastNestedLoopJoin"))
  }

  test("q61 silhouette plan is ANN-fed: no cartesian/nested-loop stage") {
    assume(new java.io.File(s"$sfDir/embeddings.parquet").exists())
    val df = graft.queries.MlQueries.queries("q61_silhouette")(spark, sfDir)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), "q61 plan has a cartesian product")
    assert(!plan.contains("BroadcastNestedLoopJoin"), "q61 plan has a nested-loop join")
    assert(df.count() > 0)
  }

  test("ivfSelfKnn recall >= 0.9 vs exact at sf0.01, no O(n²) stage") {
    assume(new java.io.File(s"$sfDir/embeddings.parquet").exists())
    val latent = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select(col("vec_id").as("cell_id"),
        col("embedding").cast("array<double>").as("latent"))
    val exact = Knn.exactSelfKnn(latent, 5).cache()
    val ivf = Knn.ivfSelfKnn(latent, 5, nLists = 16, nProbe = 4, rounds = 4).cache()
    val r = Knn.recall(ivf, exact)
    assert(r >= 0.9, s"IVF recall $r below 0.9")
    val plan = ivf.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), "IVF plan has a cartesian product")
    assert(!plan.contains("BroadcastNestedLoopJoin"), "IVF plan has a nested-loop join")
    // deterministic: same seed reproduces the result exactly
    val ivf2 = Knn.ivfSelfKnn(latent, 5, nLists = 16, nProbe = 4, rounds = 4)
    assert(Knn.recall(ivf2, ivf) == 1.0 && Knn.recall(ivf, ivf2) == 1.0)
  }
}
