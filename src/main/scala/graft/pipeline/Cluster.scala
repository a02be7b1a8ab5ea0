package graft.pipeline

import org.apache.spark.ml.clustering.KMeans
import org.apache.spark.ml.linalg.Vectors
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Clustering (SURVEY.md §2.10-2.11): distributed KMeans seeding (MLlib,
  * mirrors scarf's MiniBatchKMeans stage) and graph community detection.
  *
  * The KNN graph has n·k edges (k ≈ 11-21), so like the reference —
  * which hands igraph/sknetwork a CSR built on one machine
  * (scarf/datastore/graph_datastore.py:1379-1584) — community detection
  * collects the edge list to the driver. That stays feasible up to ~10⁷
  * cells; beyond that the Pregel/aggregateMessages path replaces it.
  */
object Cluster {

  /** KMeans labels over the latent space: `(cell_id, cluster)`, 1-based
    * like the reference's labels (scarf/datastore/graph_datastore.py:1446).
    */
  def kmeans(latent: DataFrame, k: Int, seed: Long = 4466L): DataFrame = {
    val toVec = udf((a: Seq[Double]) => Vectors.dense(a.toArray))
    val vecs = latent.select(col("cell_id"), toVec(col("latent")).as("features"))
    val model = new KMeans().setK(k).setSeed(seed).setFeaturesCol("features")
      .setPredictionCol("cluster0").fit(vecs)
    model.transform(vecs)
      .select(col("cell_id"), (col("cluster0") + 1).cast("long").as("cluster"))
  }

  /** Deterministic seeded Lloyd's KMeans over array latent vectors.
    * Unlike MLlib's KMeans (k-means|| randomized init, engine-private
    * RNG), every step here is a deterministic join + aggregate an
    * external engine can replay bit-for-bit: init = the k cells with
    * the smallest md5(seed:cell_id) digests; fixed iteration count;
    * argmin ties break to the lowest center index; empty clusters keep
    * their previous center; per-iteration centers are rounded to 9 dp
    * so cross-engine float-summation-order noise cannot accumulate.
    * This is what makes the full HTO-demux chain (q60) oracle-checkable
    * end-to-end. Per iteration: one distributed aggregation; only the
    * k×dims center matrix ever reaches the driver. Returns
    * `(cell_id, cluster)` 1-based.
    */
  def lloyd(latent0: DataFrame, k: Int, iters: Int = 25,
            seed: Long = 4466L): DataFrame =
    lloydWithCenters(latent0, k, iters, seed)._1

  /** [[lloyd]] plus the final 9 dp-rounded center matrix (index i =
    * init-rank i, the oracle's `cid = i+1`). Callers that assign OTHER
    * vectors to the trained centers (IVF list assignment) must use these
    * exact centers — recomputing means from the assignment adds an extra
    * un-rounded update step that drifts from the replayable fence.
    */
  def lloydWithCenters(latent0: DataFrame, k: Int, iters: Int = 25,
                       seed: Long = 4466L): (DataFrame, Array[Array[Double]]) = {
    val spark = latent0.sparkSession
    import spark.implicits._
    // the vector frame feeds init + every iteration + the final
    // assignment (iters + 2 actions) — without a cache the whole
    // upstream plan re-executes each time
    val cached = latent0.cache()
    // Wall-clock here is `iters` SEQUENTIAL tiny jobs, so per-job task
    // overhead multiplies by 25: compact the cached vectors to
    // ~200k-vector partitions (a cap keeps a real cluster parallel) so
    // each iteration schedules a handful of tasks instead of one per
    // input partition. Partitioning only — every value and the 9 dp
    // center fence are untouched (group-sum order shifts are exactly
    // the noise the fence already absorbs across engines).
    val n = cached.count()
    val parts = math.max(1, math.min(((n - 1) / 200000L).toInt + 1, 1024))
    val latent = cached.coalesce(parts)
    // init: k smallest-digest cells with DISTINCT vectors (duplicate
    // init centers would permanently empty the later cluster)
    val byVec = org.apache.spark.sql.expressions.Window
      .partitionBy(col("latent")).orderBy(col("h"), col("cell_id"))
    var centers: Array[Array[Double]] = latent
      .withColumn("h", md5(concat(lit(s"$seed:"), col("cell_id"))))
      .withColumn("rv", row_number().over(byVec)).filter(col("rv") === 1)
      .orderBy(col("h"), col("cell_id")).limit(k)
      .select("latent").as[Seq[Double]].collect().map(_.toArray)
    def assignUdf(cs: Array[Array[Double]]) = udf { (v: Seq[Double]) =>
      var best = 0; var bd = Double.MaxValue
      var c = 0
      while (c < cs.length) {
        var d = 0.0; var i = 0
        while (i < cs(c).length) {
          val t = v(i) - cs(c)(i); d += t * t; i += 1
        }
        if (d < bd) { bd = d; best = c }
        c += 1
      }
      best
    }
    for (_ <- 1 to iters) {
      val means = latent.withColumn("c0", assignUdf(centers)(col("latent")))
        .select(col("c0"), posexplode(col("latent")).as(Seq("pos", "x")))
        .groupBy("c0", "pos").agg(round(avg(col("x")), 9).as("m"))
        .as[(Int, Int, Double)].collect()
        .groupBy(_._1).map { case (c, rs) =>
          c -> rs.sortBy(_._2).map(_._3).toArray
        }
      centers = centers.zipWithIndex.map { case (old, c) =>
        means.getOrElse(c, old)
      }
    }
    // materialize the final assignment (eager localCheckpoint) so the
    // input cache can be released NOW — repeated lloyd calls in one
    // session (ivfSelfKnn trains one per round) no longer accumulate
    // cached partitions, and downstream consumers re-read a tiny
    // (cell_id, cluster) frame instead of re-running the assign UDF
    val assigned = latent.withColumn("c0", assignUdf(centers)(col("latent")))
      .select(col("cell_id"), (col("c0") + 1).cast("long").as("cluster"))
      .localCheckpoint()
    cached.unpersist()
    (assigned, centers)
  }

  /** Driver-side greedy modularity (Louvain-style, deterministic node
    * order) over a collected weighted edge list — the stand-in for the
    * reference's Leiden call (external C library). Returns
    * `(cell_id, cluster)` with clusters relabeled 1..C by size desc.
    */
  /** DBSCAN over a precomputed ε-neighborhood pair set (from
    * [[Knn.bucketedEpsNeighbors]] at scale, or an exact radius join):
    * the classic density clustering a curation pipeline uses for
    * embedding-space outlier pruning. `pairs (src, dst)` must contain
    * both directions of every ε-pair (the LSH chain's symmetric
    * construction guarantees it). A point is `core` iff its
    * ε-neighborhood (self included) holds ≥ minPts points; clusters are
    * connected components over core–core edges (distributed
    * large/small-star, min-id labels); non-core points with a core
    * ε-neighbor are `border` and take the MINIMUM neighboring core
    * cluster (the deterministic tie policy — plain DBSCAN leaves border
    * assignment order-dependent, which an engine replay cannot be);
    * everything else is `noise` with a null cluster.
    * Shapes: one degree aggregation, the CC rounds, two id-keyed joins.
    */
  def dbscan(universe: DataFrame, pairs: DataFrame, minPts: Int): DataFrame = {
    val deg = pairs.groupBy("src").agg(count(lit(1)).as("_n"))
    val core = deg.filter(col("_n") + 1 >= minPts)
      .select(col("src").as("id")).localCheckpoint()
    val coreEdges = pairs
      .join(core.select(col("id").as("src")), Seq("src"), "left_semi")
      .join(core.select(col("id").as("dst")), Seq("dst"), "left_semi")
      .select(col("src"), col("dst"))
    val lbl = graft.graph.ConnectedComponents.labels(coreEdges)
    // isolated cores (no core neighbor) are their own singleton cluster
    val coreLbl = core
      .join(lbl.select(col("node").as("id"), col("component")), Seq("id"), "left")
      .select(col("id"), coalesce(col("component"), col("id")).as("cluster"))
      .localCheckpoint()
    val borderLbl = pairs
      .join(core.select(col("id").as("src")), Seq("src"), "left_anti")
      .join(coreLbl.select(col("id").as("dst"), col("cluster")), Seq("dst"))
      .groupBy("src").agg(min(col("cluster")).as("cluster"))
      .select(col("src").as("id"), col("cluster"))
    val assigned = coreLbl.select(col("id"), col("cluster"), lit("core").as("role"))
      .unionByName(borderLbl.select(col("id"), col("cluster"),
        lit("border").as("role")))
    universe.select(col("cell_id").as("id"))
      .join(assigned, Seq("id"), "left")
      .select(col("id"), coalesce(col("role"), lit("noise")).as("role"),
        col("cluster"))
  }

  def louvain(edges: DataFrame, maxPasses: Int = 10): DataFrame = {
    val spark = edges.sparkSession
    import spark.implicits._
    val es = edges.select("src", "dst", "weight")
      .as[(Long, Long, Double)].collect()

    // undirected adjacency with combined weights
    val adj = scala.collection.mutable.Map[Long, scala.collection.mutable.Map[Long, Double]]()
    def add(a: Long, b: Long, w: Double): Unit = {
      val m = adj.getOrElseUpdate(a, scala.collection.mutable.Map())
      m(b) = m.getOrElse(b, 0.0) + w
    }
    es.foreach { case (s, d, w) => if (s != d) { add(s, d, w); add(d, s, w) } }

    val nodes = adj.keys.toArray.sorted
    val deg = nodes.map(n => n -> adj(n).values.sum).toMap
    val m2 = deg.values.sum // 2m
    val comm = scala.collection.mutable.Map(nodes.map(n => n -> n): _*)
    val commDeg = scala.collection.mutable.Map(nodes.map(n => n -> deg(n)): _*)

    var moved = true
    var pass = 0
    while (moved && pass < maxPasses) {
      moved = false
      pass += 1
      nodes.foreach { n =>
        val cOld = comm(n)
        commDeg(cOld) -= deg(n)
        // weight from n to each neighboring community
        val toComm = scala.collection.mutable.Map[Long, Double]()
        adj(n).foreach { case (nb, w) =>
          toComm(comm(nb)) = toComm.getOrElse(comm(nb), 0.0) + w
        }
        // best community by modularity gain, deterministic tie-break
        val candidates = (toComm.keys ++ Iterator(cOld)).toSeq.distinct.sorted
        val best = candidates.maxBy { c =>
          (toComm.getOrElse(c, 0.0) - deg(n) * commDeg(c) / m2, -c)
        }
        if (best != cOld) moved = true
        comm(n) = best
        commDeg(best) += deg(n)
      }
    }
    // relabel by community size desc (stable)
    val bySize = comm.groupBy(_._2).toSeq
      .map { case (c, ms) => (c, ms.size) }
      .sortBy { case (c, sz) => (-sz, c) }
      .zipWithIndex.map { case ((c, _), i) => c -> (i + 1L) }.toMap
    comm.toSeq.map { case (n, c) => (n, bySize(c)) }
      .toDF("cell_id", "cluster")
  }

  /** Leiden refinement phase (Traag, Waltman & van Eck 2019, §A/B — the
    * reason scarf uses Leiden over Louvain,
    * scarf/datastore/graph_datastore.py:1379-1459): within each community,
    * rebuild sub-communities from singletons; a node may only merge with a
    * sub-community of its own community, and only if it is well-connected
    * to the community (w(v, P∖v) ≥ γ·deg(v)·(vol(P)−deg(v))/2m, γ = 1).
    * Badly-connected nodes stay singletons, so every output community is
    * internally connected — the property greedy Louvain cannot guarantee.
    * Returns `(cell_id, cluster)` relabeled 1..C by size desc.
    */
  def refine(edges: DataFrame, labels: DataFrame): DataFrame = {
    val spark = edges.sparkSession
    import spark.implicits._
    val es = edges.select("src", "dst", "weight").as[(Long, Long, Double)].collect()
    val lab = labels.select("cell_id", "cluster").as[(Long, Long)].collect().toMap

    val adj = scala.collection.mutable.Map[Long, scala.collection.mutable.Map[Long, Double]]()
    def add(a: Long, b: Long, w: Double): Unit = {
      val m = adj.getOrElseUpdate(a, scala.collection.mutable.Map())
      m(b) = m.getOrElse(b, 0.0) + w
    }
    es.foreach { case (s, d, w) => if (s != d) { add(s, d, w); add(d, s, w) } }
    val deg = adj.map { case (n, m) => n -> m.values.sum }
    val m2 = deg.values.sum

    val out = scala.collection.mutable.Map[Long, (Long, Long)]() // node -> (comm, sub)
    lab.keys.groupBy(lab).toSeq.sortBy(_._1).foreach { case (commId, members0) =>
      val members = members0.toSeq.sorted
      val inP = members.toSet
      val volP = members.map(deg.getOrElse(_, 0.0)).sum
      val sub = scala.collection.mutable.Map(members.map(n => n -> n): _*)
      val subVol = scala.collection.mutable.Map(members.map(n => n -> deg.getOrElse(n, 0.0)): _*)
      def wellConnected(v: Long): Boolean = {
        val wIn = adj.getOrElse(v, Map.empty[Long, Double])
          .collect { case (nb, w) if inP(nb) => w }.sum
        val d = deg.getOrElse(v, 0.0)
        wIn >= d * (volP - d) / m2
      }
      var moved = true
      var pass = 0
      while (moved && pass < 10) {
        moved = false
        pass += 1
        members.foreach { v =>
          if (wellConnected(v)) {
            val cOld = sub(v)
            val d = deg.getOrElse(v, 0.0)
            subVol(cOld) -= d
            val toSub = scala.collection.mutable.Map[Long, Double]()
            adj.getOrElse(v, Map.empty[Long, Double]).foreach { case (nb, w) =>
              if (inP(nb)) toSub(sub(nb)) = toSub.getOrElse(sub(nb), 0.0) + w
            }
            val candidates = (toSub.keys ++ Iterator(cOld)).toSeq.distinct.sorted
            val best = candidates.maxBy { c =>
              (toSub.getOrElse(c, 0.0) - d * subVol(c) / m2, -c)
            }
            if (best != cOld) moved = true
            sub(v) = best
            subVol(best) += d
          }
        }
      }
      members.foreach(n => out(n) = (commId, sub(n)))
    }
    // dense relabel of (comm, sub) pairs by size desc
    val bySize = out.groupBy(_._2).toSeq
      .map { case (cs, ms) => (cs, ms.size) }
      .sortBy { case ((c, s), sz) => (-sz, c, s) }
      .zipWithIndex.map { case ((cs, _), i) => cs -> (i + 1L) }.toMap
    out.toSeq.map { case (n, cs) => (n, bySize(cs)) }.toDF("cell_id", "cluster")
  }

  /** Leiden = greedy local moves + refinement pass. */
  def leiden(edges: DataFrame, maxPasses: Int = 10): DataFrame =
    refine(edges, louvain(edges, maxPasses))
}
