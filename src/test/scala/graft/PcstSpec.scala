package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.graph.Pcst

/** Goemans–Williamson PCST: hand-computed fixtures (growth + strong
  * pruning), forest invariants, and an exhaustive-optimum sanity bound
  * on random small graphs.
  */
class PcstSpec extends AnyFunSuite {

  private def run(n: Int, edges: Seq[(Int, Int, Double)], prizes: Seq[Double]) = {
    val (s, d, c) = (edges.map(_._1).toArray, edges.map(_._2).toArray, edges.map(_._3).toArray)
    val (kn, ke) = Pcst.gw(n, s, d, c, prizes.toArray)
    (kn, ke, Pcst.objective(kn, ke, c, prizes.toArray))
  }

  test("cheap path: connector between two seeds is kept") {
    // 0(3) -1- 1(0) -1- 2(3): keep all, objective 3+3-2 = 4 > singleton 3
    val (kn, ke, obj) = run(3, Seq((0, 1, 1.0), (1, 2, 1.0)), Seq(3.0, 0.0, 3.0))
    assert(kn.toSeq == Seq(0, 1, 2))
    assert(ke.toSeq == Seq(0, 1))
    assert(math.abs(obj - 4.0) < 1e-9)
  }

  test("expensive bridge: seeds stay singletons, no connector") {
    // each moat dies at t=3 before a cost-4 edge can go tight
    val (kn, ke, obj) = run(3, Seq((0, 1, 4.0), (1, 2, 4.0)), Seq(3.0, 0.0, 3.0))
    assert(kn.toSeq == Seq(0, 2))
    assert(ke.isEmpty)
    assert(math.abs(obj - 6.0) < 1e-9)
  }

  test("star: zero-prize hub connects three seeds") {
    val (kn, ke, obj) = run(4,
      Seq((0, 1, 1.0), (0, 2, 1.0), (0, 3, 1.0)), Seq(0.0, 3.0, 3.0, 3.0))
    assert(kn.toSeq == Seq(0, 1, 2, 3))
    assert(ke.length == 3)
    assert(math.abs(obj - 6.0) < 1e-9)
  }

  test("strong pruning cuts a worthless grown appendage") {
    // seed 0 grows over 0-1 and 1-2 (both tight before the moat dies),
    // but the 1-2 arm pays nothing: pruned back to the bare seed
    val (kn, ke, obj) = run(3, Seq((0, 1, 1.0), (1, 2, 1.0)), Seq(3.0, 0.0, 0.0))
    assert(kn.toSeq == Seq(0))
    assert(ke.isEmpty)
    assert(math.abs(obj - 3.0) < 1e-9)
  }

  test("rerooting: best subtree found regardless of DFS entry node") {
    // entry node 0 is a bad root; optimum {1,2} with the cost-1 edge
    val (kn, ke, obj) = run(3, Seq((0, 1, 2.0), (1, 2, 1.0)), Seq(0.5, 3.0, 3.0))
    assert(kn.toSeq == Seq(1, 2))
    assert(ke.toSeq == Seq(1))
    assert(math.abs(obj - 5.0) < 1e-9)
  }

  test("two separate seed groups: forest keeps both components") {
    val edges = Seq((0, 1, 1.0), (1, 2, 1.0), (3, 4, 1.0))
    val (kn, ke, obj) = run(5, edges, Seq(3.0, 0.0, 3.0, 3.0, 3.0))
    assert(kn.toSeq == Seq(0, 1, 2, 3, 4))
    assert(ke.toSeq == Seq(0, 1, 2))
    assert(math.abs(obj - (12.0 - 3.0)) < 1e-9)
  }

  test("zero-prize isolates dropped; zero-marginal arm pruned as a tie") {
    // the cost-0 edge merges instantly during growth, but node 1 adds
    // zero net payoff, so strong pruning drops the arm — same objective
    val (kn, ke, obj) = run(4, Seq((0, 1, 0.0)), Seq(2.0, 0.0, 0.0, 0.0))
    assert(kn.toSeq == Seq(0))
    assert(ke.isEmpty)
    assert(math.abs(obj - 2.0) < 1e-9)
  }

  test("random trees with span-guaranteed growth: strong pruning is the exact subtree optimum") {
    // With a prize far above total edge cost, moats never die, so growth
    // merges the whole tree into one component; strong pruning is then an
    // exact DP over subtrees — the objective must equal the brute-force
    // optimum over all connected vertex subsets containing >= 1 node.
    val rnd = new scala.util.Random(77L)
    for (trial <- 1 to 40) {
      val n = 5 + rnd.nextInt(5) // 5..9
      val edges = (1 until n).map { v =>
        (rnd.nextInt(v), v, math.rint(rnd.nextDouble() * 30) / 10.0)
      }
      val prizes = (0 until n).map { v =>
        if (v == 0) 100.0 // span guarantee
        else if (rnd.nextDouble() < 0.5) math.rint(rnd.nextDouble() * 40) / 10.0
        else 0.0
      }
      val (kn, ke, obj) = run(n, edges, prizes)
      assert(ke.length == kn.length - 1, s"kept set not a single tree at trial $trial")
      // brute force: best connected subset (tree-induced subgraph is the
      // unique spanning tree of the subset, so cost is just its edges)
      var best = 0.0
      for (mask <- 1 until (1 << n)) {
        val sel = (0 until n).filter(b => (mask & (1 << b)) != 0).toSet
        val inEdges = edges.filter { case (u, v, _) => sel(u) && sel(v) }
        // connected iff |E_induced| = |S| - 1 and one BFS covers S (tree ⇒ acyclic)
        if (inEdges.size == sel.size - 1) {
          var compo = Set(sel.head); var grew = true
          while (grew) {
            val nxt = inEdges.collect {
              case (u, v, _) if compo(u) && !compo(v) => v
              case (u, v, _) if compo(v) && !compo(u) => u
            }.toSet
            grew = nxt.nonEmpty; compo ++= nxt
          }
          if (compo == sel) {
            val o = sel.toSeq.map(prizes).sum - inEdges.map(_._3).sum
            if (o > best) best = o
          }
        }
      }
      assert(math.abs(obj - best) < 1e-9,
        s"trial $trial: gw objective $obj != exhaustive subtree optimum $best")
    }
  }

  test("random small graphs: forest invariants, provable bounds, deterministic") {
    val rnd = new scala.util.Random(20260812L)
    for (trial <- 1 to 60) {
      val n = 4 + rnd.nextInt(5) // 4..8
      val pool = for (u <- 0 until n; v <- u + 1 until n) yield (u, v)
      val edges = rnd.shuffle(pool.toList).take(n + rnd.nextInt(n))
        .map { case (u, v) => (u, v, math.rint(rnd.nextDouble() * 40) / 10.0) }
      val prizes = Seq.fill(n)(if (rnd.nextDouble() < 0.4) math.rint(rnd.nextDouble() * 50) / 10.0 else 0.0)
      val (kn, ke, obj) = run(n, edges, prizes)
      val (kn2, ke2, _) = run(n, edges, prizes)
      assert(kn.toSeq == kn2.toSeq && ke.toSeq == ke2.toSeq, s"nondeterministic at trial $trial")
      // kept edges form a forest over kept nodes
      val keptSet = kn.toSet
      ke.foreach { e =>
        assert(keptSet(edges(e)._1) && keptSet(edges(e)._2), s"dangling edge at trial $trial")
      }
      val par = scala.collection.mutable.Map(kn.toSeq.map(x => x -> x): _*)
      def find(x: Int): Int = if (par(x) == x) x else { par(x) = find(par(x)); par(x) }
      ke.foreach { e =>
        val (u, v, _) = edges(e)
        val (ru, rv) = (find(u), find(v))
        assert(ru != rv, s"cycle at trial $trial")
        par(ru) = rv
      }
      // provable bounds: strong pruning guarantees the kept forest's
      // objective is at least the best singleton prize (the best root's
      // total dominates every node's bare prize in its component), and
      // trivially at most the total prize mass
      val bestSingle = prizes.max
      assert(obj >= bestSingle - 1e-9, s"below best singleton at trial $trial: $obj < $bestSingle")
      assert(obj <= prizes.sum + 1e-9, s"above total prize at trial $trial")
      // every kept component individually pays off: prize sum strictly
      // exceeds edge cost (else pruning would have cut it)
      val compOf = kn.map(v => v -> find(v)).toMap
      val byComp = kn.groupBy(compOf)
      byComp.foreach { case (_, nodes) =>
        val nodeSet = nodes.toSet
        val cst = ke.filter(e => nodeSet(edges(e)._1)).map(edges(_)._3).sum
        val prz = nodes.map(prizes).sum
        assert(prz - cst > -1e-9, s"losing component at trial $trial")
        // no zero-prize singletons survive
        if (nodes.length == 1) assert(prizes(nodes.head) > 0, s"worthless singleton at trial $trial")
      }
    }
  }
}
