package graft

import graft.pipeline.Paris

/** Exact-Paris distance + BalancedCut fidelity (scarf/dendrogram.py:
  * 106-239; sknetwork Paris node-pair sampling distance). The two-triangle
  * fixture's linkage is computed by hand from the published formula
  * d(a,b) = w(a)·w(b) / (W·w(a,b)) and asserted to 1e-9.
  */
class ParisSpec extends SparkSpec {

  // two unit-weight triangles {0,1,2} and {3,4,5}, bridge 2–3 at 0.1
  private def triangles = {
    import spark.implicits._
    Seq((0L, 1L, 1.0), (0L, 2L, 1.0), (1L, 2L, 1.0),
      (3L, 4L, 1.0), (3L, 5L, 1.0), (4L, 5L, 1.0),
      (2L, 3L, 0.1)).toDF("src", "dst", "weight")
  }

  test("linkage matches the hand-computed Paris distances") {
    val (links, leafId) = Paris.dendrogram(triangles)
    assert(leafId.size == 6 && links.length == 5)
    // W = 12.2; d(0,1) = 4/12.2, d(cluster,hub) = 8.4/24.4, top = 37.21/1.22
    val expect = Seq(
      (0L, 1L, 4.0 / 12.2, 2L),
      (4L, 5L, 4.0 / 12.2, 2L),
      (2L, 6L, 8.4 / 24.4, 3L),
      (3L, 7L, 8.4 / 24.4, 3L),
      (8L, 9L, 37.21 / 1.22, 6L))
    links.zip(expect).foreach { case (l, (a, b, d, s)) =>
      assert(Set(l.a, l.b) == Set(a, b), s"merge pair ${(l.a, l.b)} != ${(a, b)}")
      assert(approx(l.dist, d, 1e-9), s"dist ${l.dist} != $d")
      assert(l.size == s)
    }
  }

  test("balancedCut recovers the two triangles") {
    val labels = Paris.balancedCut(triangles, maxSize = 4, minSize = 1, maxDistFc = 2.0)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(labels.values.toSet.size == 2)
    assert(Set(labels(0L), labels(1L), labels(2L)).size == 1)
    assert(Set(labels(3L), labels(4L), labels(5L)).size == 1)
    assert(labels(0L) != labels(3L))
  }

  test("balancedCut maxSize forces splits below the cap") {
    val labels = Paris.balancedCut(triangles, maxSize = 2, minSize = 1, maxDistFc = 100.0)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // no cluster may exceed maxSize = 2 leaves... except a claimed stop node
    // is allowed to aggregate its own subtree; with cap 2 the triangles
    // split into size <= 2 groups and every leaf is labeled
    assert(labels.size == 6)
    val sizes = labels.values.groupBy(identity).map(_._2.size)
    assert(sizes.forall(_ <= 2), s"cluster sizes $sizes exceed maxSize")
  }

  test("balancedCut distance-fc veto blocks asymmetric-tightness merges") {
    import spark.implicits._
    // the fc veto compares SIBLING subtree tightness (scarf/dendrogram.py:
    // 137-151): a tight pair {0,1} (w=10) must not merge with a loose pair
    // {2,3} (w=0.1) when their merge distances differ by more than fc
    val e = Seq((0L, 1L, 10.0), (2L, 3L, 0.1), (1L, 2L, 0.01))
      .toDF("src", "dst", "weight")
    val merged = Paris.balancedCut(e, maxSize = 10, minSize = 1, maxDistFc = 1e9)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(merged.values.toSet.size == 1, "huge fc should allow one cluster")
    val split = Paris.balancedCut(e, maxSize = 10, minSize = 1, maxDistFc = 1.5)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(split.values.toSet.size == 2, "fc veto should split asymmetric subtrees")
    assert(split(0L) == split(1L) && split(2L) == split(3L))
    assert(split(0L) != split(2L))
  }

  test("sketchedCut recovers planted clusters from a ~100k-edge graph " +
    "while the driver sees only the sketched subgraph") {
    import org.apache.spark.sql.functions._
    // planted partition: 4 blocks x 1250 nodes, 20 deterministic
    // same-block neighbours each (~100k edges, weight 1), plus weak
    // bridges every 50th node to the next block (weight 0.05)
    val n = 10000L
    val blockSz = 2500L
    val base = spark.range(n).select(col("id").as("src"),
      (col("id") / blockSz).cast("long").as("block"))
    val intra = base.select(col("src"), col("block"),
        explode(sequence(lit(1), lit(10))).as("j"))
      .select(col("src"),
        (col("block") * blockSz +
          pmod(col("src") % blockSz + col("j") * col("j") + col("j") + 1, lit(blockSz)))
          .as("dst"), lit(1.0).as("weight"))
      .filter(col("src") =!= col("dst"))
    val bridges = base.filter(col("src") % 50 === 0)
      .select(col("src"),
        (pmod(col("block") + 1, lit(4L)) * blockSz + col("src") % blockSz).as("dst"),
        lit(0.05).as("weight"))
    val edges = intra.unionByName(bridges).cache()
    val planted = base.select(col("src").as("cell_id"), col("block").as("cluster"))

    // driver bound: the sketch (and thus the collected induced subgraph)
    // must be a small fraction of the graph
    val sk = graft.graph.Sketch.topacedo(edges, planted,
      maxRate = 0.02, minRate = 0.005, minCellsPerGroup = 3)
    val nSketched = sk.filter(col("sketched")).count()
    assert(nSketched < n / 4, s"sketch too large: $nSketched of $n")
    assert(nSketched >= 4 * 3, "every planted block needs its seed floor")

    val labels = Paris.sketchedCut(edges, planted, nClusters = 4,
      maxRate = 0.02, minRate = 0.005)
    val plantedBlocks = planted.withColumnRenamed("cluster", "block")
    val joined = labels.join(plantedBlocks, Seq("cell_id"))
      .groupBy("cluster", "block").count().collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2)))
    // purity: each Paris cluster should be dominated by one planted block
    val byCluster = joined.groupBy(_._1._1)
    val pure = byCluster.values.map { rows =>
      val tot = rows.map(_._2).sum.toDouble
      rows.map(_._2).max / tot
    }
    assert(pure.forall(_ >= 0.95), s"cluster purity $pure below 0.95")
    // coverage: all 4 blocks recovered as distinct clusters
    val dominant = byCluster.map { case (c, rows) => rows.maxBy(_._2)._1._2 }
    assert(dominant.toSet.size == 4, s"blocks collapsed: $dominant")
    // propagation reached every cell (cluster 0 marks unreached)
    assert(labels.filter(col("cluster") === 0).count() == 0)
    assert(labels.count() == n)
  }
}
