package graft

import graft.pipeline.Cluster
import graft.graph.DistributedLouvain

/** Leiden refinement (Traag 2019): communities must be internally
  * connected — the property that separates Leiden from greedy Louvain
  * (scarf/datastore/graph_datastore.py:1379-1459).
  */
class LeidenSpec extends SparkSpec {
  import org.apache.spark.sql.functions._

  // two disjoint unit triangles — NO edge between them
  private def cliquePair = {
    import spark.implicits._
    Seq((0L, 1L, 1.0), (0L, 2L, 1.0), (1L, 2L, 1.0),
      (3L, 4L, 1.0), (3L, 5L, 1.0), (4L, 5L, 1.0))
      .toDF("src", "dst", "weight")
  }

  private def mergedLabels = {
    import spark.implicits._
    (0L to 5L).map(n => (n, 1L)).toDF("cell_id", "cluster")
  }

  test("refine refuses a merged clique pair with no internal connection") {
    // a greedy merge (Louvain can produce this after node moves) put both
    // triangles in one community; refinement must split it
    val refined = Cluster.refine(cliquePair, mergedLabels)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(refined.values.toSet.size == 2)
    assert(Set(refined(0L), refined(1L), refined(2L)).size == 1)
    assert(Set(refined(3L), refined(4L), refined(5L)).size == 1)
    assert(refined(0L) != refined(3L))
  }

  test("leiden end-to-end separates the cliques and matches louvain here") {
    val l = Cluster.leiden(cliquePair)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(l.values.toSet.size == 2)
    assert(l(0L) == l(1L) && l(1L) == l(2L))
    assert(l(3L) == l(4L) && l(4L) == l(5L))
  }

  test("refine keeps a genuinely connected community whole") {
    import spark.implicits._
    val bridged = cliquePair.unionByName(Seq((2L, 3L, 1.0)).toDF("src", "dst", "weight"))
    val refined = Cluster.refine(bridged, mergedLabels)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // connected community: refinement may keep one or split by modularity,
    // but every resulting cluster must induce a connected subgraph
    val byCluster = refined.groupBy(_._2).values.map(_.keys.toSet)
    val adj = Map(0L -> Set(1L, 2L), 1L -> Set(0L, 2L), 2L -> Set(0L, 1L, 3L),
      3L -> Set(2L, 4L, 5L), 4L -> Set(3L, 5L), 5L -> Set(3L, 4L))
    byCluster.foreach { cs =>
      var seen = Set(cs.head)
      var frontier = Set(cs.head)
      while (frontier.nonEmpty) {
        frontier = frontier.flatMap(adj).intersect(cs).diff(seen)
        seen ++= frontier
      }
      assert(seen == cs, s"cluster $cs not connected")
    }
  }

  test("distributed refine splits disconnected communities via label propagation") {
    val refined = DistributedLouvain.refine(cliquePair, mergedLabels)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(refined.values.toSet.size == 2)
    assert(Set(refined(0L), refined(1L), refined(2L)).size == 1)
    assert(Set(refined(3L), refined(4L), refined(5L)).size == 1)
  }

  test("distributed refine keeps a long-diameter connected community whole") {
    import spark.implicits._
    // 30-node path: min-label propagation needs ~29 rounds — a fixed
    // round cap would wrongly split it; convergence looping must not
    val path = (0L until 29L).map(i => (i, i + 1, 1.0)).toDF("src", "dst", "weight")
    val labels = (0L to 29L).map(n => (n, 1L)).toDF("cell_id", "cluster")
    val refined = DistributedLouvain.refine(path, labels)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(refined.values.toSet.size == 1, s"path community split: $refined")
  }

  test("distributed louvain + refine covers all nodes with dense 1-based ids") {
    val clustered = DistributedLouvain.cluster(cliquePair, rounds = 4)
    val refined = DistributedLouvain.refine(cliquePair, clustered)
    val rows = refined.collect().map(r => r.getLong(0) -> r.getLong(1))
    assert(rows.map(_._1).toSet == (0L to 5L).toSet)
    val ids = rows.map(_._2).toSet
    assert(ids == (1L to ids.size).toSet)
  }

  test("distributed multi-level louvain coalesces two planted 100-node communities") {
    import spark.implicits._
    // two sparse 100-node communities (~10% internal density via a
    // UNIFORM md5 draw — String.hashCode on similar strings is striped
    // and plants spurious sub-structure) joined by 3 bridges:
    // one-hop-per-round local moves fragment communities this sparse;
    // the aggregation phase must coalesce each side into ONE community
    def block(offset: Long): Seq[(Long, Long, Double)] = {
      val md = java.security.MessageDigest.getInstance("MD5")
      (for {
        i <- 0 until 100; j <- (i + 1) until 100
        if (md.digest(s"e$offset:$i:$j".getBytes("UTF-8"))(0) & 0xff) < 26
      } yield (offset + i, offset + j, 1.0))
    }
    val bridges = Seq((5L, 1005L, 1.0), (50L, 1050L, 1.0), (99L, 1099L, 1.0))
    val edges = (block(0L) ++ block(1000L) ++ bridges)
      .toDF("src", "dst", "weight")
    val lab = DistributedLouvain.clusterMultiLevel(edges, rounds = 8)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(lab.keys.size == 200)
    // each planted side is ONE community, and the two differ
    val left = (0L until 100L).map(lab).toSet
    val right = (1000L until 1100L).map(lab).toSet
    assert(left.size == 1, s"left side fragmented into ${left.size}")
    assert(right.size == 1, s"right side fragmented into ${right.size}")
    assert(left != right)
  }

  test("multi-level louvain keeps cells of a fully-merged disconnected component") {
    import spark.implicits._
    // Component A: a triangle that merges into ONE community at level 1 —
    // after contraction it is a super-node whose only edge is a SELF-LOOP.
    // Component B: a sparse 100-node block that still needs aggregation
    // levels, forcing another contraction to run. The r8 bug: cluster()
    // derived its node universe from the self-loop-filtered edge list, so
    // the triangle super-node vanished from the level-2 label table and
    // the inner mapping join dropped its three cells.
    def block(offset: Long): Seq[(Long, Long, Double)] = {
      val md = java.security.MessageDigest.getInstance("MD5")
      (for {
        i <- 0 until 100; j <- (i + 1) until 100
        if (md.digest(s"e$offset:$i:$j".getBytes("UTF-8"))(0) & 0xff) < 26
      } yield (offset + i, offset + j, 1.0))
    }
    val tri = Seq((5000L, 5001L, 1.0), (5000L, 5002L, 1.0), (5001L, 5002L, 1.0))
    val edges = (block(0L) ++ tri).toDF("src", "dst", "weight")
    val lab = DistributedLouvain.clusterMultiLevel(edges, rounds = 8)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(lab.keys.size == 103, s"expected 103 labeled cells, got ${lab.keys.size}")
    val triLabels = Set(lab(5000L), lab(5001L), lab(5002L))
    assert(triLabels.size == 1, s"triangle fragmented into ${triLabels.size}")
    val blockLabels = (0L until 100L).map(lab).toSet
    assert(blockLabels.size == 1, s"block fragmented into ${blockLabels.size}")
    assert(!blockLabels.contains(triLabels.head))
  }
}
