package graft

import org.apache.spark.sql.functions._
import graft.graph.GraphOps
import graft.pipeline.{Harmony, Metrics}

/** Round-2 polish operators: load_graph option set, weighted-Jaccard
  * cluster similarity + sampled silhouette, Harmony diversity penalty.
  */
class PolishSpec extends SparkSpec {

  test("Fingerprint: even-multiplicity xor cancellation no longer collides") {
    import spark.implicits._
    // Two DIFFERENT same-count inputs whose rows each occur twice: the
    // per-row xxhash64 xor cancels pairwise (h ⊕ h = 0) on BOTH, so the
    // old xor+count fingerprint collided ("0_2" == "0_2") — the ADVICE-
    // flagged silent-wrong-memo-reuse mode. The xor ∥ sum form must
    // separate them, and stay stable under row reordering.
    val a = Seq((1L, "alpha"), (1L, "alpha")).toDF("id", "t")
    val b = Seq((2L, "beta"), (2L, "beta")).toDF("id", "t")
    def fp(df: org.apache.spark.sql.DataFrame): String = df.agg(
      expr(graft.core.Fingerprint.sqlExpr("id, t"))).head.getString(0)
    def xorOnly(df: org.apache.spark.sql.DataFrame): Long = df.agg(
      coalesce(expr("bit_xor(xxhash64(id, t))"), lit(0L))).head.getLong(0)
    assert(xorOnly(a) == 0L && xorOnly(b) == 0L,
      "precondition: both inputs xor-cancel")
    assert(fp(a) != fp(b), "xor ∥ sum fingerprints must differ")
    // order-independent: a reversed/shuffled frame fingerprints equal
    val aShuf = Seq((1L, "alpha"), (1L, "alpha")).reverse.toDF("id", "t")
      .repartition(3)
    assert(fp(a) == fp(aShuf))
    // empty input → empty string (callers map to their "empty" sentinel)
    assert(fp(a.filter(col("id") < 0)) == "")
  }

  test("loadGraph: useK truncation, symmetrize, upper_only") {
    import spark.implicits._
    val e = Seq((1L, 2L, 5.0), (1L, 3L, 3.0), (1L, 4L, 1.0), (2L, 1L, 2.0))
      .toDF("src", "dst", "weight")
    val trunc = GraphOps.loadGraph(e, symmetric = false, useK = 2)
    val t1 = trunc.filter(col("src") === 1).collect().map(_.getLong(1)).toSet
    assert(t1 == Set(2L, 3L), "useK=2 keeps node 1's two heaviest edges")
    val sym = GraphOps.loadGraph(e, symmetric = true, useK = 2)
    val w12 = sym.filter(col("src") === 1 && col("dst") === 2).head().getDouble(2)
    assert(w12 == 5.0, "symmetrize keeps max weight per pair")
    val upper = GraphOps.loadGraph(e, symmetric = true, useK = -1, upperOnly = true)
    assert(upper.filter(col("src") >= col("dst")).count() == 0)
  }

  test("clusterSimilarity: weighted Jaccard is symmetric and favors linked clusters") {
    import spark.implicits._
    val e = Seq((0L, 1L, 2.0), (2L, 3L, 2.0), (1L, 2L, 1.0), (4L, 5L, 2.0))
      .toDF("src", "dst", "weight")
    val cl = Seq((0L, 1L), (1L, 1L), (2L, 2L), (3L, 2L), (4L, 3L), (5L, 3L))
      .toDF("cell_id", "cluster")
    val sim = GraphOps.clusterSimilarity(e, cl)
      .collect().map(r => (r.getLong(1), r.getLong(0)) -> r.getDouble(2)).toMap
    assert(approx(sim((1L, 2L)), sim((2L, 1L))))
    assert(sim((1L, 2L)) > 0 && sim.getOrElse((1L, 3L), 0.0) == 0.0)
  }

  test("silhouetteScores: separated clusters score high") {
    import spark.implicits._
    val rnd = new scala.util.Random(3)
    def jitter() = rnd.nextDouble() * 0.5
    val cells = (0 until 30).map(i => (i.toLong, 1L, Array(0.0 + jitter(), 0.0 + jitter()))) ++
      (30 until 60).map(i => (i.toLong, 2L, Array(10.0 + jitter(), 10.0 + jitter())))
    val latent = cells.map { case (id, _, v) => (id, v) }.toDF("cell_id", "latent")
    val clusters = cells.map { case (id, c, _) => (id, c) }.toDF("cell_id", "cluster")
    // intra-cluster chains + one weak cross edge so similarity is defined
    val edges = ((0 until 29).map(i => (i.toLong, (i + 1).toLong, 1.0)) ++
      (30 until 59).map(i => (i.toLong, (i + 1).toLong, 1.0)) :+ (29L, 30L, 0.01))
      .toDF("src", "dst", "weight")
    val scores = Metrics.silhouetteScores(edges, clusters, latent, k0 = 11)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(scores.size == 2)
    scores.values.foreach(s => assert(s > 0.8, s"silhouette $s too low for separated clusters"))
  }

  test("silhouetteScores: interleaved clusters score near zero") {
    import spark.implicits._
    val rnd = new scala.util.Random(5)
    val cells = (0 until 60).map(i =>
      (i.toLong, (i % 2 + 1).toLong, Array(rnd.nextDouble(), rnd.nextDouble())))
    val latent = cells.map { case (id, _, v) => (id, v) }.toDF("cell_id", "latent")
    val clusters = cells.map { case (id, c, _) => (id, c) }.toDF("cell_id", "cluster")
    val edges = (0 until 59).map(i => (i.toLong, (i + 1).toLong, 1.0))
      .toDF("src", "dst", "weight")
    val scores = Metrics.silhouetteScores(edges, clusters, latent, k0 = 11)
      .collect().map(_.getDouble(1))
    scores.foreach(s => assert(math.abs(s) < 0.5, s"silhouette $s should be near 0"))
  }

  test("smartLabelNames: letter suffixes and hyphenated unclaimed labels") {
    import spark.implicits._
    // counts: (A=1,B=x):6 (A=2,B=x):4 (A=3,B=y):5 (A=3,B=z):2 (A=2,B=z):1
    val rows = Seq.fill(6)((1, "x")) ++ Seq.fill(4)((2, "x")) ++
      Seq.fill(5)((3, "y")) ++ Seq.fill(2)((3, "z")) ++ Seq.fill(1)((2, "z"))
    val df = rows.toDF("a", "b")
    val labels = graft.stats.Pseudobulk.smartLabelNames(df, "a", "b")
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    // both A=1 and A=2 claim B=x: suffixes by row-fraction (0.6 vs 0.4)
    assert(labels("1") == "xa" && labels("2") == "xb")
    // B=z is claimed by nobody; its max column is A=3 -> hyphen-append
    assert(labels("3") == "y-za")
  }

  test("smoothEdges patches zero weights to the global minimum positive weight") {
    import spark.implicits._
    // two sources; src 2's far neighbor underflows to weight 0 for small
    // sigma — it must receive the GLOBAL min positive weight
    val knn = Seq((1L, 10L, 0.0, 1), (1L, 11L, 0.1, 2),
      (2L, 20L, 0.0, 1), (2L, 21L, 500.0, 2))
      .toDF("src", "dst", "dist", "rn")
    val w = graft.pipeline.Knn.smoothEdges(knn)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(w.values.forall(_ > 0))
    val minPos = w.values.min
    assert(w((2L, 21L)) == minPos, "underflowed weight takes the global min")
  }

  test("makeGraph cacheRoot: param-encoded caches, latest pointers, fingerprint reuse") {
    val dir = java.nio.file.Files.createTempDirectory("graftcache").toString
    val ds = graft.pipeline.DataStore.fromTestData(spark, "/root/testdata/sf0.001")
      .withQcStats.markHvgs(topN = 20)
    val g1 = ds.makeGraph(dims = 3, k = 4, cacheRoot = Some(dir))
    val lat1 = g1.caches("latent").orderBy("cell_id").collect()
    val cs = new graft.core.CacheStore(dir)
    assert(cs.latest("latent").contains(Map("dims" -> "3", "k" -> "4", "ann" -> "false")))
    assert(cs.loadLatest(spark, "edges").isDefined)
    // same params + same mask -> manifest hit, identical result
    val manifest = new java.io.File(s"$dir").listFiles()
      .filter(_.getName.endsWith(".manifest.json")).map(f => f.getName -> f.lastModified()).toMap
    val g2 = ds.makeGraph(dims = 3, k = 4, cacheRoot = Some(dir))
    val lat2 = g2.caches("latent").orderBy("cell_id").collect()
    assert(lat1.sameElements(lat2))
    val manifest2 = new java.io.File(s"$dir").listFiles()
      .filter(_.getName.endsWith(".manifest.json")).map(f => f.getName -> f.lastModified()).toMap
    assert(manifest == manifest2, "unchanged inputs must not restamp manifests")
    // different params materialize a second path and move the pointer
    ds.makeGraph(dims = 2, k = 4, cacheRoot = Some(dir))
    assert(cs.latest("latent").contains(Map("dims" -> "2", "k" -> "4", "ann" -> "false")))
  }

  test("Harmony theta: diversity penalty changes assignments, stays finite") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    // batch composition IMBALANCED across clusters (a perfectly balanced
    // design has O = E and the penalty is exactly 1): batch a is mostly
    // cluster 0, batch b mostly cluster 1
    val cells = (0 until 80).map { i =>
      val b = if (i < 40) "a" else "b"
      val c = if (b == "a") (if (i % 4 == 0) 1 else 0) else (if (i % 4 == 0) 0 else 1)
      val shift = if (b == "b") 1.5 else 0.0
      (i.toLong, b, Array(c * 4.0 + shift + rnd.nextDouble() * 0.3, rnd.nextDouble() * 0.3))
    }
    val latent = cells.map { case (id, _, v) => (id, v) }.toDF("cell_id", "latent")
    val batches = cells.map { case (id, b, _) => (id, b) }.toDF("cell_id", "batch")
    val base = Harmony.correct(latent, batches, k = 2, iters = 2)
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    val div = Harmony.correct(latent, batches, k = 2, iters = 2, theta = 4.0)
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    assert(base.size == 80 && div.size == 80)
    div.values.foreach(v => v.foreach(x => assert(!x.isNaN && !x.isInfinite)))
    assert(base != div, "theta > 0 must alter the correction")
  }
}
