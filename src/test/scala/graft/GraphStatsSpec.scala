package graft

import graft.graph.GraphStats

/** Specs for the near-dup-graph structural statistics (q204–q206):
  * triangle census, integer-quantized PageRank, and degree
  * assortativity. The driver oracles check the full planted-universe
  * values; these pin the formulas on hand-computed graphs.
  */
class GraphStatsSpec extends SparkSpec {
  import spark.implicits._

  test("hits: mutual reinforcement matches an exact BigInt reference") {
    // bipartite: order 1 → parts {10, 11}, order 2 → part {10}
    val e = Seq((1L, 10L), (1L, 11L), (2L, 10L)).toDF("src", "dst")
    val out = GraphStats.hits(e, iters = 3).collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    // exact integer reference: the same pico-unit recurrence in BigInt
    val edges = Seq((1L, 10L), (1L, 11L), (2L, 10L))
    val P = BigInt("1000000000000")
    var h = Map(1L -> P, 2L -> P)
    var a = Map.empty[Long, BigInt]
    for (_ <- 1 to 3) {
      val ar = edges.groupBy(_._2).map { case (p, es) =>
        p -> es.map(x => h(x._1)).sum }
      val sa = ar.values.sum
      a = ar.map { case (p, r) => p -> r * P / sa }
      val hr = edges.groupBy(_._1).map { case (o, es) =>
        o -> es.map(x => a(x._2)).sum }
      val sh = hr.values.sum
      h = hr.map { case (o, r) => o -> r * P / sh }
    }
    assert(out(("hub", 1L)) == h(1L).toLong && out(("hub", 2L)) == h(2L).toLong)
    assert(out(("authority", 10L)) == a(10L).toLong
      && out(("authority", 11L)) == a(11L).toLong)
    // the mutual-reinforcement ordering: order 1 (two good parts) out-
    // hubs order 2; part 10 (two buyers) out-ranks part 11
    assert(out(("hub", 1L)) > out(("hub", 2L)))
    assert(out(("authority", 10L)) > out(("authority", 11L)))
  }

  test("triangleStats: triangle + pendant gives hand-computed census") {
    // Edges: triangle (1,2),(1,3),(2,3) plus pendant (3,4).
    // Degrees 1:2, 2:2, 3:3, 4:1 → wedges = 1+1+3+0 = 5; triangles = 1;
    // global CC = 3·1/5 = 0.6.
    val e = Seq((1L, 2L), (1L, 3L), (2L, 3L), (3L, 4L)).toDF("ida", "idb")
    val r = GraphStats.triangleStats(e).collect().head
    assert(r.getAs[Long]("n_nodes") == 4L)
    assert(r.getAs[Long]("n_edges") == 4L)
    assert(r.getAs[Long]("max_deg") == 3L)
    assert(r.getAs[Long]("n_wedges") == 5L)
    assert(r.getAs[Long]("n_triangles") == 1L)
    assert(r.getAs[Double]("global_cc") == 0.6)
  }

  test("triangleStats: triangle-free star counts zero triangles") {
    val e = Seq((1L, 2L), (1L, 3L), (1L, 4L)).toDF("ida", "idb")
    val r = GraphStats.triangleStats(e).collect().head
    assert(r.getAs[Long]("n_triangles") == 0L)
    assert(r.getAs[Long]("n_wedges") == 3L) // center deg 3 → C(3,2)
  }

  test("degreeAssortativity: star is exactly −1, constant-degree graph is NULL") {
    // Star 1–{2,3,4}: every edge joins deg 3 to deg 1 → r = −1 exactly.
    val star = Seq((1L, 2L), (1L, 3L), (1L, 4L)).toDF("ida", "idb")
    val r1 = GraphStats.degreeAssortativity(star).collect().head
    assert(r1.getAs[Double]("assortativity") == -1.0)
    // Single edge: both endpoints deg 1 → zero variance → NULL.
    val edge = Seq((1L, 2L)).toDF("ida", "idb")
    val r2 = GraphStats.degreeAssortativity(edge).collect().head
    assert(r2.isNullAt(r2.fieldIndex("assortativity")))
  }

  test("kCore: tail peels over multiple rounds, dense core survives, star empties") {
    // Triangle (1,2,3) with a 2-hop tail 3–4–5: node 5 drops in the
    // initial degree filter, node 4 only becomes sub-core AFTER 5 is
    // gone — the peel must iterate, not filter once.
    val tailed = Seq((1L, 2L), (1L, 3L), (2L, 3L), (3L, 4L), (4L, 5L))
      .toDF("ida", "idb")
    val core = GraphStats.kCore(tailed, k = 2, rounds = 4).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(core == Map(1L -> 2L, 2L -> 2L, 3L -> 2L))
    // Star: every node is pendant or hub-of-pendants → 2-core is empty.
    val star = Seq((1L, 2L), (1L, 3L), (1L, 4L)).toDF("ida", "idb")
    assert(GraphStats.kCore(star, k = 2, rounds = 2).count() == 0L)
  }

  test("kCore: non-convergence throws instead of under-peeling") {
    // Path 1–2–3–4–5–6 at k=2 needs two peel rounds after the initial
    // filter; rounds = 1 leaves {3,4} un-peeled and must throw.
    val path = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (5L, 6L))
      .toDF("ida", "idb")
    intercept[IllegalArgumentException] {
      GraphStats.kCore(path, k = 2, rounds = 1).collect()
    }
  }

  test("pageRank: regular graph is the exact fixed point; star ranks center first") {
    // Two-node regular graph: each node sends its whole rank each round,
    // v' = 0.15e12 + 0.85e12 = 1e12 — the initial vector IS the fixed
    // point, bit-exactly, at any iteration count.
    val edge = Seq((1L, 2L)).toDF("ida", "idb")
    val fixed = GraphStats.pageRank(edge, iters = 3).collect()
    assert(fixed.forall(_.getAs[Long]("rank_scaled") == 1000000000000L))
    // Star: the center aggregates three leaf shares each round.
    val star = Seq((1L, 2L), (1L, 3L), (1L, 4L)).toDF("ida", "idb")
    val ranks = GraphStats.pageRank(star, iters = 8).collect()
      .map(r => r.getAs[Long]("node") -> r.getAs[Long]("rank_scaled")).toMap
    assert(ranks(1L) > ranks(2L))
    assert(ranks(2L) == ranks(3L) && ranks(3L) == ranks(4L))
  }
}
