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

  test("hot-bucket refinement: clustered corpus keeps recall >= 0.9, self and asymmetric") {
    import spark.implicits._
    // 4 TIGHT off-origin clusters of 100 points each: sign-LSH origin
    // planes cannot split them, so with hotCap = 32 every cluster-core
    // bucket is refined by projection-ranked chunks (chunkW = 16). The
    // geometry is adversarial for the refinement too: true neighbors are
    // chunk-adjacent only per round, so recall rides the 6 directions.
    val pts = (0 until 400).map { i =>
      val c = i / 100
      (i.toLong, Array.tabulate(6)(j =>
        c * 50.0 + math.sin(i * 0.7 + j * 1.3) * 0.5))
    }
    val latent = pts.toDF("cell_id", "latent").cache()
    val exact = Knn.exactSelfKnn(latent, 5).cache()
    val self = Knn.bucketedKnn(latent, latent, 5, excludeSelf = true,
      hotCap = 32, chunkW = 16)
    val rSelf = Knn.recall(self, exact)
    assert(rSelf >= 0.9, s"self recall $rSelf below 0.9 under refinement")
    // above stragglerCap the hot path must contain NO single-task sort:
    // the per-bucket chunk rank switches from the (lazy, task-sized)
    // per-bucket window to the range-partitioned two-pass ordinal, so a
    // mega-bucket cannot serialize its whole sort through one thread —
    // forced here by stragglerCap = 1, and the refined recall must hold
    val (cand, release) = Knn.lshCandidates(latent, latent, nPlanes = 0,
      rounds = 6, excludeSelf = true, hotCap = 32, chunkW = 16,
      stragglerCap = 1L)
    val candPlan = cand.queryExecution.executedPlan.toString
    assert(!candPlan.contains("windowspecdefinition(bucket"),
      "mega-bucket chunk ranks still use a per-bucket window")
    assert(!candPlan.contains("windowspecdefinition()"),
      "hot-path candidates contain an unpartitioned window")
    // and the ordinal-ranked candidates reproduce the window-ranked
    // top-k EXACTLY (identical ranks → identical chunks → same pairs)
    val selfOrd = {
      val topk = cand.groupBy("src", "dst").agg(min(col("dist")).as("dist"))
        .withColumn("rn", row_number().over(
          org.apache.spark.sql.expressions.Window.partitionBy("src")
            .orderBy(round(col("dist"), 6), col("dst"))))
        .filter(col("rn") <= 5)
        .select(col("src"), col("dst"), round(col("dist"), 6).as("dist"),
          col("rn")).localCheckpoint()
      release(); topk
    }
    assert(selfOrd.orderBy("src", "rn").collect() ===
      self.orderBy("src", "rn").collect(),
      "straggler-safe ordinal path diverged from the window path")
    // asymmetric: external queries (cluster centers + jitter, distinct
    // ids) probe the same clustered corpus via chunk boundaries
    val queries = (0 until 40).map { i =>
      val c = i / 10
      (1000L + i, Array.tabulate(6)(j =>
        c * 50.0 + math.cos(i * 0.9 + j) * 0.5))
    }.toDF("cell_id", "latent")
    val asym = Knn.bucketedKnn(queries, latent, 5,
      hotCap = 32, chunkW = 16).cache()
    // every query finds k corpus neighbors, all from its own cluster
    // (clusters are 50 apart; anything cross-cluster would be a gross
    // recall failure)
    val counts = asym.groupBy("src").count().collect()
    assert(counts.length == 40 && counts.forall(_.getLong(1) == 5L))
    val cross = asym.filter(expr("(src - 1000) div 10 != dst div 100")).count()
    assert(cross == 0L, s"$cross cross-cluster hits in asymmetric top-5")
    // and the asymmetric result is genuinely near-exact: compare against
    // the brute-force truth for the query set
    val exactQ = {
      val a = queries.select(col("cell_id").as("src"), col("latent").as("va"))
      val b = latent.select(col("cell_id").as("dst"), col("latent").as("vb"))
      a.join(b)
        .select(col("src"), col("dst"),
          graft.sim.Similarity.l2(col("va"), col("vb")).as("dist"))
        .withColumn("rn", row_number().over(
          org.apache.spark.sql.expressions.Window.partitionBy("src")
            .orderBy(col("dist"), col("dst"))))
        .filter(col("rn") <= 5)
    }
    val rAsym = Knn.recall(asym, exactQ)
    assert(rAsym >= 0.9, s"asymmetric recall $rAsym below 0.9 under refinement")
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
