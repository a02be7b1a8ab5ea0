package graft.graph

import scala.collection.mutable

/** Unrooted prize-collecting Steiner forest: Goemans–Williamson moat
  * growth + strong pruning.
  *
  * This is the algorithm behind the public `pcst_fast` library (Hegde,
  * Indyk & Schmidt, "A nearly-linear time framework for graph-structured
  * sparsity", ICML 2015) that the external `topacedo` package — which
  * the reference delegates to from run_topacedo_sampler
  * (scarf/datastore/graph_datastore.py:1586-1727) — uses to pick
  * connector ("Steiner") cells between sketch seeds. Implemented here
  * from the published construction (Goemans & Williamson, SIAM J.
  * Computing 24(2), 1995):
  *
  *  - Growth: every cluster with unspent prize grows a moat (its dual
  *    y_C) at unit rate. An edge goes tight when the moats accumulated
  *    around its two endpoints cover its cost → the clusters merge and
  *    the edge joins the candidate forest. A cluster deactivates when
  *    its accumulated moat equals its total prize. Zero-prize
  *    singletons start inactive, so moats grow outward from the seeds
  *    and absorb connector nodes along cheap paths — exactly the
  *    sketch-connector semantics.
  *  - Strong pruning: per candidate tree, a rerooting DP computes for
  *    every directed half-edge u→v the pruned payoff of v's side,
  *    net(u→v) = prize(v) + Σ_{v→w, w≠u} max(0, net(v→w) − cost(v,w));
  *    the best root is kept together with every subtree of positive
  *    marginal payoff. Isolated nodes survive iff their prize is
  *    positive. (Like pcst_fast, pruning keeps the single best rooted
  *    subtree per grown component; [[Sketch.topacedo]] unions the
  *    seeds back so a pruned-away seed never leaves the sketch.)
  *
  * The event queue is lazy — stale entries are re-predicted on pop.
  * That is safe because growth rates only decrease over time
  * (deactivations), so a prediction is a lower bound on the true event
  * time; the one rate increase (an inactive cluster pulled into an
  * active merge) re-pushes that side's incident edge events, with
  * incident lists concatenated small-to-large.
  *
  * Driver-side by design: the reference's pcst_fast is equally
  * single-node C++; at scale this runs on the TopACeDo-contracted
  * anchor supergraph, not the full KNN graph (see
  * [[graft.pipeline.Paris.sketchedCut]] for the contraction).
  */
object Pcst {

  /** @param n      number of nodes (ids 0..n-1)
    * @param src    edge endpoints (undirected; self-loops ignored)
    * @param dst    edge endpoints
    * @param cost   non-negative edge costs
    * @param prize  non-negative node prizes
    * @return (kept node ids ascending, kept edge indices ascending)
    */
  def gw(n: Int, src: Array[Int], dst: Array[Int], cost: Array[Double],
         prize: Array[Double]): (Array[Int], Array[Int]) = {
    val m = src.length
    require(dst.length == m && cost.length == m, "edge arrays must align")
    require(prize.length == n, "prize array must have n entries")
    var i = 0
    while (i < m) { require(cost(i) >= 0.0, s"negative edge cost at $i"); i += 1 }
    i = 0
    while (i < n) { require(prize(i) >= 0.0, s"negative prize at $i"); i += 1 }

    val eps = 1e-12
    // Kruskal-tree slots: leaves 0..n-1, merge incarnations n..2n-2.
    val cap = 2 * n
    val up = Array.tabulate(cap)(identity)   // union-find parent
    val pot = new Array[Double](cap)         // finalized moat: slot → current up(slot)
    val active = new Array[Boolean](cap)
    val accum = new Array[Double](cap)       // running moat of a live root incarnation
    val lastT = new Array[Double](cap)       // last flush time of a live root
    val moat = new Array[Double](cap)        // total dual over the root's whole history
    val prz = new Array[Double](cap)         // total prize under the root
    val incident = new Array[mutable.ArrayBuffer[Int]](cap)
    var nextSlot = n

    val path = new mutable.ArrayBuffer[Int](64)
    // find with path compression; afterwards pot(x) = Σ finalized moats
    // of every dead incarnation that ever contained x (x ≠ root).
    def find(x: Int): Int = {
      var r = x
      while (up(r) != r) r = up(r)
      path.clear()
      var c = x
      while (up(c) != c) { path += c; c = up(c) }
      // walk top-of-path → bottom, accumulating finalized moats
      var cum = 0.0
      var j = path.length - 1
      while (j >= 0) {
        val node = path(j)
        val old = pot(node)
        pot(node) = old + cum
        cum += old
        up(node) = r
        j -= 1
      }
      r
    }
    // total moat ever grown around leaf x, evaluated at time t
    def dOf(x: Int, t: Double): Double = {
      val r = find(x)
      val base = if (x == r) 0.0 else pot(x)
      base + accum(r) + (if (active(r)) t - lastT(r) else 0.0)
    }
    def flush(r: Int, t: Double): Unit = {
      if (active(r)) { val d = t - lastT(r); accum(r) += d; moat(r) += d }
      lastT(r) = t
    }

    i = 0
    while (i < n) {
      prz(i) = prize(i)
      active(i) = prize(i) > eps
      incident(i) = new mutable.ArrayBuffer[Int]()
      i += 1
    }
    i = 0
    while (i < m) {
      if (src(i) != dst(i)) { incident(src(i)) += i; incident(dst(i)) += i }
      i += 1
    }

    // events (time, kind, id); kind 0 = edge tight, 1 = deactivation.
    // Max-heap on negated keys → pops lowest time first, deterministic ties.
    val pq = new mutable.PriorityQueue[(Double, Int, Int)]()(
      Ordering.by(e => (-e._1, -e._2, -e._3)))
    var nActive = 0
    i = 0
    while (i < n) {
      if (active(i)) { nActive += 1; pq.enqueue((prize(i), 1, i)) }
      i += 1
    }
    def pushEdge(e: Int, t: Double): Unit = {
      val ru = find(src(e)); val rv = find(dst(e))
      if (ru != rv) {
        val rate = (if (active(ru)) 1 else 0) + (if (active(rv)) 1 else 0)
        if (rate > 0) {
          val slack = cost(e) - dOf(src(e), t) - dOf(dst(e), t)
          pq.enqueue((t + math.max(0.0, slack) / rate, 0, e))
        }
      }
    }
    i = 0
    while (i < m) { pushEdge(i, 0.0); i += 1 }

    val forest = new mutable.ArrayBuffer[Int]()
    while (nActive > 0 && pq.nonEmpty) {
      val (t, kind, id) = pq.dequeue()
      if (kind == 1) {
        val r = id
        if (up(r) == r && active(r)) {
          val trueT = lastT(r) + (prz(r) - moat(r))
          if (trueT > t + eps) pq.enqueue((trueT, 1, r))
          else { flush(r, trueT); active(r) = false; nActive -= 1 }
        }
      } else {
        val e = id
        val ru = find(src(e)); val rv = find(dst(e))
        if (ru != rv) {
          val au = active(ru); val av = active(rv)
          val rate = (if (au) 1 else 0) + (if (av) 1 else 0)
          if (rate > 0) {
            val slack = cost(e) - dOf(src(e), t) - dOf(dst(e), t)
            if (slack > eps) {
              pq.enqueue((t + slack / rate, 0, e))
            } else {
              flush(ru, t); flush(rv, t)
              if (au) nActive -= 1
              if (av) nActive -= 1
              val ms = nextSlot; nextSlot += 1
              up(ru) = ms; pot(ru) = accum(ru)
              up(rv) = ms; pot(rv) = accum(rv)
              prz(ms) = prz(ru) + prz(rv)
              moat(ms) = moat(ru) + moat(rv)
              accum(ms) = 0.0; lastT(ms) = t
              active(ms) = prz(ms) - moat(ms) > eps
              if (active(ms)) {
                nActive += 1
                pq.enqueue((t + (prz(ms) - moat(ms)), 1, ms))
              }
              forest += e
              // a previously-inactive side's incident edges grew a unit
              // of rate — their old predictions are no longer lower
              // bounds, so re-push before the lists merge
              if (active(ms)) {
                if (!au) incident(ru).foreach(pushEdge(_, t))
                if (!av) incident(rv).foreach(pushEdge(_, t))
              }
              val (big, small) = if (incident(ru).length >= incident(rv).length) (ru, rv) else (rv, ru)
              incident(big) ++= incident(small)
              incident(ms) = incident(big)
              incident(small) = null
              incident(big) = null
            }
          }
          // rate == 0: both sides dead; only a merge can revive the
          // edge, and the merge re-push above covers it. Drop.
        }
      }
    }

    strongPrune(n, src, dst, cost, prize, forest.toArray, eps)
  }

  /** Objective value of a PCST solution: Σ kept prizes − Σ kept costs. */
  def objective(keptNodes: Array[Int], keptEdges: Array[Int],
                cost: Array[Double], prize: Array[Double]): Double =
    keptNodes.map(prize).sum - keptEdges.map(cost).sum

  /** Strong pruning with rerooting over the candidate forest. */
  private def strongPrune(n: Int, src: Array[Int], dst: Array[Int],
                          cost: Array[Double], prize: Array[Double],
                          forest: Array[Int], eps: Double): (Array[Int], Array[Int]) = {
    val nf = forest.length
    // CSR adjacency over forest edges, with paired half-edge slots
    val deg = new Array[Int](n)
    forest.foreach { e => deg(src(e)) += 1; deg(dst(e)) += 1 }
    val off = new Array[Int](n + 1)
    var i = 0
    while (i < n) { off(i + 1) = off(i) + deg(i); i += 1 }
    val fill = off.clone()
    val adjN = new Array[Int](nf * 2)  // neighbour at slot
    val adjE = new Array[Int](nf * 2)  // original edge index at slot
    val rev = new Array[Int](nf * 2)   // paired (reverse) slot
    var fe = 0
    while (fe < nf) {
      val e = forest(fe); val u = src(e); val v = dst(e)
      val su = fill(u); fill(u) += 1
      val sv = fill(v); fill(v) += 1
      adjN(su) = v; adjE(su) = e
      adjN(sv) = u; adjE(sv) = e
      rev(su) = sv; rev(sv) = su
      fe += 1
    }

    // net(s) for half-edge slot s = u→v: pruned payoff of v's side.
    val net = new Array[Double](nf * 2)
    val parent = Array.fill(n)(-1)      // parent node in DFS, -1 = root/unvisited
    val parentSlot = Array.fill(n)(-1)  // slot parent→node
    val comp = Array.fill(n)(-1)

    val keptNodes = new mutable.ArrayBuffer[Int]()
    val keptEdges = new mutable.ArrayBuffer[Int]()

    i = 0
    while (i < n) {
      if (comp(i) < 0 && deg(i) > 0) {
        // DFS pre-order
        val order = new mutable.ArrayBuffer[Int]()
        val stack = mutable.ArrayDeque[Int](i)
        comp(i) = i
        while (stack.nonEmpty) {
          val u = stack.removeLast()
          order += u
          var s = off(u)
          while (s < off(u + 1)) {
            val v = adjN(s)
            if (comp(v) < 0) {
              comp(v) = i; parent(v) = u; parentSlot(v) = s
              stack.append(v)
            }
            s += 1
          }
        }
        // pass 1, reverse pre-order: net for parent→child half-edges.
        // In v's slot range every slot except rev(parentSlot(v)) points
        // at a child, whose parent→child net is already known.
        var oi = order.length - 1
        while (oi >= 0) {
          val v = order(oi)
          if (parent(v) >= 0) {
            val back = rev(parentSlot(v))
            var acc = prize(v)
            var s = off(v)
            while (s < off(v + 1)) {
              if (s != back) acc += math.max(0.0, net(s) - cost(adjE(s)))
              s += 1
            }
            net(parentSlot(v)) = acc
          }
          oi -= 1
        }
        // pass 2, pre-order rerooting: net for child→parent half-edges.
        // At u, every outgoing slot's net is known (children from pass 1,
        // parent side computed when u's parent was visited).
        var oj = 0
        while (oj < order.length) {
          val u = order(oj)
          var tot = prize(u)
          var s = off(u)
          while (s < off(u + 1)) { tot += math.max(0.0, net(s) - cost(adjE(s))); s += 1 }
          s = off(u)
          while (s < off(u + 1)) {
            val v = adjN(s)
            if (parent(v) == u && parentSlot(v) == s) {
              // fill slot v→u = rev(s): payoff of u's side minus v's branch
              net(rev(s)) = tot - math.max(0.0, net(s) - cost(adjE(s)))
            }
            s += 1
          }
          oj += 1
        }
        // best root, then keep positive-marginal subtrees from it
        var best = -1; var bestVal = 0.0
        order.foreach { v =>
          var tot = prize(v)
          var s = off(v)
          while (s < off(v + 1)) { tot += math.max(0.0, net(s) - cost(adjE(s))); s += 1 }
          if (tot > bestVal + eps) { bestVal = tot; best = v }
        }
        if (best >= 0 && bestVal > eps) {
          val seen = mutable.Set[Int](best)
          val st2 = mutable.ArrayDeque[Int](best)
          keptNodes += best
          while (st2.nonEmpty) {
            val u = st2.removeLast()
            var s = off(u)
            while (s < off(u + 1)) {
              val v = adjN(s)
              if (!seen.contains(v) && net(s) - cost(adjE(s)) > eps) {
                seen += v; keptNodes += v; keptEdges += adjE(s)
                st2.append(v)
              }
              s += 1
            }
          }
        }
      } else if (comp(i) < 0) {
        comp(i) = i
        if (prize(i) > eps) keptNodes += i
      }
      i += 1
    }
    (keptNodes.toArray.sorted, keptEdges.toArray.sorted)
  }
}
