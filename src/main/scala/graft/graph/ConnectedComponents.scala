package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed connected components via alternating large-star /
  * small-star rounds (Kiveris et al., "Connected Components in MapReduce
  * and Beyond", SoCC 2014 — the algorithm behind GraphFrames'
  * `connectedComponents`). Converges in O(log n) rounds versus the
  * O(diameter) of plain label propagation, and every round is two
  * hash-aggregations plus a join — no driver-side graph ever
  * materializes, so the operator holds at 100 TB edge lists.
  *
  * This is the missing tail of the near-duplicate pipeline: LSH/Jaccard
  * candidate PAIRS (Dedup.lshCandidatePairs / ngramJaccardPairs) become
  * duplicate GROUPS, and a keep-one policy needs the group, not the
  * pairs (A~B and B~C must collapse to one kept document even when A~C
  * was never emitted as a candidate).
  *
  * Invariant maintained throughout: edges are stored canonically as
  * `(u, v)` with `u > v`. large-star connects every neighbor larger
  * than `u` to the minimum of `u`'s neighborhood (including `u`);
  * small-star connects `u` and its smaller neighbors to that minimum.
  * Both emissions only ever point a node at a strictly smaller node, so
  * the canonical orientation is preserved and self-loops cannot appear.
  */
object ConnectedComponents {

  /** Component labels for an undirected edge list `(src, dst)`.
    * Output: `(node, component)` for every node incident to an edge,
    * where `component` is the minimum node id of its component.
    * Nodes not present in `edges` are absent (callers union singletons).
    *
    * Convergence is detected by a (count, xxhash64-sum) checksum of the
    * canonical edge set — one tiny aggregate per round. `maxIter` only
    * bounds a pathological input: if the checksum has NOT stabilized
    * when the cap is hit, the edge set is not yet a star forest and a
    * min-label pass would silently return split/inconsistent components
    * — so this throws instead (the caller can retry with a higher cap).
    * The proven bound for alternating large/small-star is O(log² n)
    * rounds; the default 64 covers ~2⁵⁶-node graphs at the observed
    * ~2·log₂(n) empirical rate and any realistic graph under the
    * quadratic bound.
    */
  def labels(edges: DataFrame, maxIter: Int = 64): DataFrame = {
    // Reset (localCheckpoint) + checksum in ONE pass via
    // Dataset.observe: the convergence checksum used to be its own
    // aggregate job over the just-checkpointed edges — a full re-read
    // of the edge set per round at scale, and one extra sequential
    // driver action per round at the small end (the q142/q208 job-
    // latency profile: CC rounds are inherently sequential, so every
    // saved job is saved wall-clock). CollectMetrics computes the
    // (count, xor) pair DURING the materializing checkpoint job;
    // `obs.get` then just reads the finished metric.
    //
    // bit_xor, not sum: ANSI mode makes a Long sum of 2⁶³-range hashes
    // an overflow error; xor is closed over Long and order-independent
    // (edges are distinct, so parity cancellation needs a full set
    // collision — the same 2⁻⁶⁴ regime as a sum collision). This gates
    // a fixpoint with a safety-net min() below, not result reuse, so
    // the Fingerprint xor∥sum form is not required.
    def resetWithChecksum(d: DataFrame): (DataFrame, (Long, Long)) = {
      val obs = org.apache.spark.sql.Observation()
      val out = graft.core.Lineage.reset(d.observe(obs,
        count(lit(1)).as("n"),
        coalesce(expr("bit_xor(xxhash64(u, v))"), lit(0L)).as("x")))
      val m = obs.get
      (out, (m("n").asInstanceOf[Long], m("x").asInstanceOf[Long]))
    }
    // The canonicalized input is referenced three times by round 1
    // (both unionAll branches of the neighborhood + the converged
    // min-label pass when the input is already a star forest); without
    // materialization its distinct shuffle — the heaviest step on a
    // large edge list — would re-execute for each.
    var (e, cur) = resetWithChecksum(edges
      .select(col("src").cast("long").as("a"), col("dst").cast("long").as("b"))
      .filter(col("a") =!= col("b"))
      .select(greatest(col("a"), col("b")).as("u"), least(col("a"), col("b")).as("v"))
      .distinct())

    var prev = (-1L, 0L)
    var it = 0
    while (cur != prev && it < maxIter) {
      // large-star: m = min(N(u) ∪ {u}) over the FULL neighborhood;
      // every neighbor larger than u re-points at m.
      val nbrs = e.select("u", "v")
        .unionAll(e.select(col("v").as("u"), col("u").as("v")))
      val bigMin = nbrs.groupBy("u")
        .agg(least(min(col("v")), first(col("u"))).as("m"))
      val afterLarge = nbrs.join(bigMin, "u")
        .filter(col("v") > col("u"))
        .select(col("v").as("u"), col("m").as("v"))
        .distinct()
      // small-star: m = min over the ≤-neighborhood (canonical v's plus
      // u itself — and all v < u here, so m = min(v)); u and every
      // smaller neighbor except m re-point at m.
      val smallMin = afterLarge.groupBy("u").agg(min(col("v")).as("m"))
      val withMin = afterLarge.join(smallMin, "u")
      val afterSmall = withMin.select(col("u"), col("m").as("v"))
        .unionAll(withMin.filter(col("v") =!= col("m"))
          .select(col("v").as("u"), col("m").as("v")))
        .distinct()
      val (e2, cur2) = resetWithChecksum(afterSmall)
      e = e2
      prev = cur
      cur = cur2
      it += 1
    }
    if (cur != prev)
      throw new IllegalStateException(
        s"connected components did not converge in $maxIter large/small-star " +
          s"rounds (edge checksum still moving: $prev -> $cur); labeling now " +
          "would return inconsistent components — retry with a higher maxIter")
    // Converged edge set is a star forest: (u, center). Centers label
    // themselves; min() stays as a safety net against checksum collision.
    val members = e.groupBy("u").agg(min(col("v")).as("component"))
      .select(col("u").as("node"), col("component"))
    val centers = e.select(col("v").as("node")).distinct()
      .join(members.select("node"), Seq("node"), "left_anti")
      .select(col("node"), col("node").as("component"))
    members.unionByName(centers)
  }
}
