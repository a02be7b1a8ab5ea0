package graft.pipeline

import org.apache.spark.sql.DataFrame

/** Paris-style hierarchical graph clustering (SURVEY.md §2.11;
  * scarf/datastore/graph_datastore.py:1461-1584): nearest-neighbor-chain
  * agglomeration over the (collected) weighted KNN graph producing a
  * scipy-style linkage matrix, plus a straight cut to n clusters.
  *
  * Like the reference (sknetwork on an in-process CSR), the O(n·k)-edge
  * agglomeration runs on the driver; distance = inverse normalized edge
  * weight with node-mass weighting (the Paris reducibility rule
  * simplified to weighted single-linkage on w(a,b)/(m(a)·m(b))).
  */
object Paris {

  /** Linkage row: merged clusters a, b (ids into the linkage forest),
    * merge distance, resulting size — the (n−1, 4) dendrogram shape.
    */
  case class Link(a: Long, b: Long, dist: Double, size: Long)

  def dendrogram(edges: DataFrame): (Array[Link], Map[Long, Long]) = {
    val spark = edges.sparkSession
    import spark.implicits._
    val es = edges.select("src", "dst", "weight").as[(Long, Long, Double)].collect()

    // symmetric adjacency between current clusters
    val adj = scala.collection.mutable.Map[Long, scala.collection.mutable.Map[Long, Double]]()
    def addE(a: Long, b: Long, w: Double): Unit = {
      val m = adj.getOrElseUpdate(a, scala.collection.mutable.Map())
      m(b) = m.getOrElse(b, 0.0) + w
    }
    es.foreach { case (s, d, w) => if (s != d) { addE(s, d, w); addE(d, s, w) } }

    val nodes = adj.keys.toArray.sorted
    val n = nodes.length
    // node ids -> dendrogram leaf ids 0..n-1
    val leafId = nodes.zipWithIndex.map { case (nd, i) => nd -> i.toLong }.toMap
    val size = scala.collection.mutable.Map(nodes.map(nd => leafId(nd) -> 1L): _*)
    // rekey adjacency to leaf ids
    val cadj = scala.collection.mutable.Map[Long, scala.collection.mutable.Map[Long, Double]]()
    adj.foreach { case (a, m) =>
      cadj(leafId(a)) = scala.collection.mutable.Map(
        m.toSeq.map { case (b, w) => leafId(b) -> w }: _*)
    }
    val links = scala.collection.mutable.ArrayBuffer[Link]()
    var nextId = n.toLong
    val alive = scala.collection.mutable.Set(cadj.keys.toSeq: _*)

    def pairDist(a: Long, b: Long): Double = {
      val w = cadj(a).getOrElse(b, 0.0)
      if (w <= 0) Double.PositiveInfinity
      else (size(a).toDouble * size(b)) / w
    }

    // lazy-invalidation priority queue of candidate pairs: O(E log E)
    // total instead of an O(n·E) scan per merge. Entries carry the
    // distance at push time; stale entries (dead endpoint or changed
    // distance) are discarded on pop. Deterministic tie-break on ids.
    val ord: Ordering[(Double, Long, Long)] = Ordering.Tuple3(
      Ordering.Double.TotalOrdering.reverse, Ordering.Long.reverse, Ordering.Long.reverse)
    val pq = scala.collection.mutable.PriorityQueue.empty[(Double, Long, Long)](ord)
    cadj.foreach { case (a, m) =>
      m.keys.foreach { b => if (b > a) pq.enqueue((pairDist(a, b), a, b)) }
    }

    while (alive.size > 1) {
      var picked: Option[(Double, Long, Long)] = None
      while (picked.isEmpty && pq.nonEmpty) {
        val e @ (d, a, b) = pq.dequeue()
        if (alive(a) && alive(b) && math.abs(pairDist(a, b) - d) < 1e-12)
          picked = Some(e)
      }
      val (bestD, a, b) = picked.getOrElse {
        val s = alive.toSeq.sorted // disconnected components: merge at inf
        (Double.PositiveInfinity, s(0), s(1))
      }
      // merge a, b into a new cluster c
      val c = nextId; nextId += 1
      val merged = scala.collection.mutable.Map[Long, Double]()
      Seq(a, b).foreach { x =>
        cadj(x).foreach { case (nb, w) =>
          if (nb != a && nb != b) merged(nb) = merged.getOrElse(nb, 0.0) + w
        }
      }
      links += Link(a, b, if (bestD.isPosInfinity) -1.0 else bestD, size(a) + size(b))
      size(c) = size(a) + size(b)
      alive -= a; alive -= b
      merged.keys.foreach { nb =>
        cadj(nb) -= a; cadj(nb) -= b
        cadj(nb)(c) = merged(nb)
      }
      cadj(c) = merged
      alive += c
      merged.foreach { case (nb, _) =>
        val (lo, hi) = if (nb < c) (nb, c) else (c, nb)
        pq.enqueue((pairDist(lo, hi), lo, hi))
      }
    }
    (links.toArray, leafId)
  }

  /** Cut the dendrogram to `nClusters` by undoing the last merges
    * (cut_straight): returns `(cell_id, cluster)` with clusters 1..C
    * ordered by size desc.
    */
  def cut(edges: DataFrame, nClusters: Int): DataFrame = {
    val spark = edges.sparkSession
    import spark.implicits._
    val (links, leafId) = dendrogram(edges)
    val n = leafId.size
    val parent = scala.collection.mutable.Map[Long, Long]()
    // apply all but the last (nClusters - 1) merges
    val keep = math.max(0, links.length - (nClusters - 1))
    links.take(keep).zipWithIndex.foreach { case (l, i) =>
      parent(l.a) = n + i.toLong; parent(l.b) = n + i.toLong
    }
    def root(x: Long): Long = {
      var r = x
      while (parent.contains(r)) r = parent(r)
      r
    }
    val assign = leafId.toSeq.map { case (cell, leaf) => (cell, root(leaf)) }
    val bySize = assign.groupBy(_._2).toSeq
      .map { case (c, ms) => (c, ms.size) }
      .sortBy { case (c, sz) => (-sz, c) }
      .zipWithIndex.map { case ((c, _), i) => c -> (i + 1L) }.toMap
    assign.map { case (cell, c) => (cell, bySize(c)) }.toDF("cell_id", "cluster")
  }
}
