package graft

import org.apache.spark.sql.functions._
import graft.dedup.Dedup
import graft.text.TextOps

/** Specs for the round-6 mining operators (q130–q133): hard-negative
  * mining, skip-gram PMI, eval-side containment decontamination, and the
  * dedup-yield cluster report. The driver's DuckDB oracle checks
  * full-corpus values; these pin the semantics on hand-built inputs.
  */
class MiningSpec extends SparkSpec {
  import spark.implicits._

  test("hardNegatives: nearer same-label neighbors are excluded, not ranked past") {
    // 1-D positive line: ids 0..5 at positions 1,2,3,10,11,12.
    // Anchor 0 (label 0): id 1 is nearest but same-label — the top
    // different-label negatives must be ids 2 then 3, NOT a top-k that
    // wastes slots on id 1.
    val vecs = Seq(
      (0L, Seq(1.0), 0), (1L, Seq(2.0), 0), (2L, Seq(3.0), 1),
      (3L, Seq(10.0), 1), (4L, Seq(11.0), 0), (5L, Seq(12.0), 1))
      .toDF("cell_id", "latent", "label")
    val out = graft.pipeline.Knn.hardNegatives(vecs, 2, rounds = 6)
      .filter(col("src") === 0).orderBy("rn")
      .select("dst", "src_label", "dst_label").as[(Long, Int, Int)].collect()
    assert(out.map(_._1).toSeq == Seq(2L, 3L))
    assert(out.forall(r => r._2 != r._3))
  }

  test("hardNegatives: every returned pair crosses labels; k honored") {
    val vecs = (0L until 40L).map(i =>
      (i, Seq(i.toDouble + 1, (i % 7).toDouble + 1), (i % 3).toInt))
      .toDF("cell_id", "latent", "label")
    val out = graft.pipeline.Knn.hardNegatives(vecs, 3, rounds = 6)
    val rows = out.select("src", "dst", "src_label", "dst_label", "rn")
      .as[(Long, Long, Int, Int, Int)].collect()
    assert(rows.nonEmpty && rows.forall(r => r._3 != r._4))
    assert(rows.groupBy(_._1).values.forall(_.length <= 3))
    assert(rows.forall(_._5 <= 3))
  }

  test("skipgramPmi: window-2 pair universe and PMI value are exact") {
    val docs = Seq((1L, "a b c d")).toDF("doc_id", "text")
    val out = TextOps.skipgramPmi(docs, window = 2, minCount = 1)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getDouble(3)).toMap
    // pairs at distance 1: ab bc cd; distance 2: ac bd — 5 total
    assert(out.keySet == Set("a" -> "b", "b" -> "c", "c" -> "d", "a" -> "c", "b" -> "d"))
    // n_uni = 4, n_pairs = 5, all counts 1: pmi = ln(1·16 / (5·1·1))
    val expected = math.log(16.0 / 5.0)
    out.values.foreach(v => assert(math.abs(v - expected) < 1e-6))
  }

  test("skipgramPmi: docs shorter than the window contribute no pairs") {
    val docs = Seq((1L, "only"), (2L, "x y")).toDF("doc_id", "text")
    val out = TextOps.skipgramPmi(docs, window = 3, minCount = 1).collect()
    assert(out.length == 1) // just (x, y)
  }

  test("containment: full substring fires, half-splice does not") {
    val host = (1L, (0 until 20).map(i => s"w$i").mkString(" "))
    val other = (2L, (0 until 20).map(i => s"v$i").mkString(" "))
    val evFull = (100L, (0 until 10).map(i => s"w$i").mkString(" "))
    val evHalf = (101L,
      ((0 until 5).map(i => s"w$i") ++ (0 until 5).map(i => s"x$i")).mkString(" "))
    val out = Dedup.containmentContamination(
        Seq(host, other).toDF("doc_id", "text"),
        Seq(evFull, evHalf).toDF("doc_id", "text"), 5)
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3), r.getBoolean(5)))).toMap
    // evFull: 6 of 6 shingles inside host → contaminated
    assert(out((1L, 100L)) == ((6L, 6L, true)))
    // evHalf: only 'w0..w4' (1 of 6) appears in host → clean
    assert(out((1L, 101L)) == ((1L, 6L, false)))
    assert(!out.contains((2L, 100L))) // disjoint docs never pair up
  }

  test("packingStats: window count, straddlers, and fill are exact integers") {
    // token counts 3, 4, 2 -> starts 0, 3, 7; budget 4: 3 windows (max
    // end (7+2-1) div 4 = 2), docs 2 (spans 0|1) and 3 (spans 1|2) straddle
    val docs = Seq(
      (1L, "a b c"), (2L, "d e f g"), (3L, "h i")).toDF("doc_id", "text")
    val out = graft.text.Mix.packingStats(docs, Seq(4, 16))
      .orderBy("budget")
      .collect().map(r => (r.getLong(0), r.getLong(3), r.getLong(4), r.getDouble(5)))
    assert(out(0) == ((4L, 3L, 2L, 0.75)))   // 9 tokens / (3*4)
    assert(out(1) == ((16L, 1L, 0L, 0.5625))) // 9 / 16
  }

  test("slidingRate: trailing range frame counts equal-ts peers; exact micro sum") {
    val ev = Seq(
      (1L, 2L, 10L, 1.25),          // ts 2 < frame floor 5 of events 2/3
      (2L, 3600000005L, 10L, 2.5),
      (3L, 3600000005L, 10L, 4.0),  // equal-ts peer: both rows see both
      (4L, 9000000000L, 10L, 8.0),  // outside every earlier window
      (5L, 0L, 11L, 1.0))           // other user
      .toDF("event_id", "ts_us", "user_id", "value")
    val out = graft.analytics.Analytics.slidingRate(ev, windowUs = 3600000000L)
      .collect().map(r => r.getLong(0) -> ((r.getLong(3), r.getDouble(4)))).toMap
    assert(out(1L) == ((1L, 1.25)))
    assert(out(2L) == ((2L, 6.5)) && out(3L) == ((2L, 6.5)))
    assert(out(4L) == ((1L, 8.0)))
    assert(out(5L) == ((1L, 1.0)))
  }

  test("qualityBlend: percentile ranks, mean blend, median keep threshold") {
    val docs = Seq(
      (1L, "a a"),          // worst on all three signals
      (2L, "a b c"),
      (3L, "the b c d"))    // best on all three (stopword hit, 4 tokens)
      .toDF("doc_id", "text")
    val out = graft.text.TextOps.qualityBlend(docs, Seq("the"))
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1) + r.getLong(2) + r.getLong(3), r.getDouble(4), r.getBoolean(5))))
      .toMap
    assert(out(1L) == ((3L, 0.333333, false)))  // rank 1 everywhere
    assert(out(2L) == ((6L, 0.666667, true)))   // exactly the median: kept
    assert(out(3L) == ((9L, 1.0, true)))
  }

  test("fingerprintNearDup: pigeonhole exactness at the maxHam boundary") {
    // fp 0 vs 3-bit flip: within ham 3 -> MUST pair (pigeonhole, no luck);
    // fp 0 vs 4-bit flip spread across all 4 bands: no shared band -> out
    val fps = Seq(
      (1L, 0L), (2L, 7L),                       // ham 3, flips in band 0
      (3L, (1L << 0) | (1L << 4) | (1L << 8) | (1L << 12))) // 1 flip/band
      .toDF("doc_id", "fp")
    val got = Dedup.fingerprintNearDup(fps, bits = 16, nBands = 4, maxHam = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(got.contains((1L, 2L, 3)))
    assert(!got.exists(p => p._1 == 3L || p._2 == 3L))
  }

  test("nbCalibration: bins partition the held-out set; accuracy consistent") {
    val docs = (0L until 60L).map { i =>
      val lang = if (i % 2 == 0) "en" else "de"
      val text = if (lang == "en") "the cat sat on the mat today"
                 else "der hund lief durch den wald heute"
      (i, text + s" x$i", lang)
    }.toDF("doc_id", "text", "lang")
    val out = graft.text.TextOps.nbCalibration(docs)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(out.map(_._2).sum == 6)            // 60 docs, 1-in-10 held out
    assert(out.forall(b => b._3 <= b._2))     // n_correct <= n
    // fully-separable languages: every held-out doc lands in the top bin
    assert(out.toSeq == Seq((9L, 6L, 6L)))
  }

  test("pqSelfTopK: ADC ranking keeps well-separated groups apart") {
    // two orthogonal groups in 8 dims with deterministic jitter; ids
    // 0..39, even-tens are queries. ADC over 2x4 codebooks must rank
    // every query's own group above the other group.
    val vecs = (0L until 40L).map { i =>
      val base = if (i % 2 == 0) Seq(1.0, 0, 0, 0, 1.0, 0, 0, 0)
                 else Seq(0, 0, 0, 1.0, 0, 0, 0, 1.0)
      (i, base.map(_ + i * 0.001))
    }.toDF("vec_id", "v")
    val out = graft.sim.Pq.pqSelfTopK(vecs, m = 2, k = 4, iters = 3,
        seed = 5L, queryMod = 10, topK = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(3)))
    assert(out.nonEmpty)
    assert(out.map(_._1).distinct.sorted.toSeq == Seq(0L, 10L, 20L, 30L))
    out.foreach { case (q, dst, _) =>
      assert(q % 2 == dst % 2, s"query $q paired across groups with $dst")
    }
    assert(out.groupBy(_._1).values.forall(_.length == 5))
  }

  test("ivfPqTopK: coarse routing keeps clustered groups intact") {
    // same two-orthogonal-group universe as the pqSelfTopK spec: with
    // real cluster structure the coarse quantizer separates the groups
    // into different lists, so probing the query's nearest lists loses
    // nothing — every query still ranks only its own group
    val vecs = (0L until 40L).map { i =>
      val base = if (i % 2 == 0) Seq(1.0, 0, 0, 0, 1.0, 0, 0, 0)
                 else Seq(0, 0, 0, 1.0, 0, 0, 0, 1.0)
      (i, base.map(_ + i * 0.001))
    }.toDF("vec_id", "v")
    val out = graft.sim.Pq.ivfPqTopK(vecs, nLists = 2, nProbe = 1, m = 2,
        k = 4, iters = 3, seedIvf = 9L, seedPq = 5L, queryMod = 10, topK = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(out.map(_._1).distinct.sorted.toSeq == Seq(0L, 10L, 20L, 30L))
    out.foreach { case (q, dst) =>
      assert(q % 2 == dst % 2, s"query $q routed across groups to $dst")
    }
    assert(out.groupBy(_._1).values.forall(_.length == 5))
  }

  test("embeddingQc: exact moments; a dead dimension reads variance 0") {
    val embs = Seq(
      (1L, Seq(1.0, 0.5)), (2L, Seq(3.0, 0.5)), (3L, Seq(5.0, 0.5)))
      .toDF("vec_id", "embedding")
    val out = graft.sim.Similarity.embeddingQc(embs)
      .collect().map(r => r.getInt(0) ->
        (r.getDouble(4), r.getDouble(5), r.getLong(2), r.getLong(3))).toMap
    // dim 0: {1,3,5} -> mean 3, population var 8/3 (6 dp), micros 1e6..5e6
    assert(out(0)._1 == 3.0 && out(0)._2 == 2.666667)
    assert(out(0)._3 == 1000000L && out(0)._4 == 5000000L)
    assert(out(1)._1 == 0.5 && out(1)._2 == 0.0)   // dead dim
  }

  test("ivfBalance: separated groups split lists; counts and ratio line up") {
    val vecs = (0L until 40L).map { i =>
      val base = if (i % 4 == 0) Seq(10.0, 0.0) else Seq(0.0, 10.0)
      (i, base.map(_ + i * 0.001))
    }.toDF("vec_id", "v")
    val rows = graft.sim.Pq.ivfBalance(vecs, nLists = 2, iters = 3, seedIvf = 9L)
      .collect()
    assert(rows.map(_.getLong(1)).sum == 40L)
    assert(rows.forall(_.getAs[Long]("n_lists_used") == 2L))
    val ns = rows.map(_.getLong(1)).sorted
    assert(rows.head.getAs[Double]("imbalance")
      == math.round(ns(1).toDouble / ns(0) * 1e6) / 1e6)
    assert(ns.toSeq == Seq(10L, 30L))  // the 1-in-4 group owns one list
  }

  test("ivfPqProbeSweep: one pass yields a row per probe budget, full cover at max") {
    val vecs = (0L until 40L).map { i =>
      val base = if (i % 2 == 0) Seq(1.0, 0, 0, 0, 1.0, 0, 0, 0)
                 else Seq(0, 0, 0, 1.0, 0, 0, 0, 1.0)
      (i, base.map(_ + i * 0.001))
    }.toDF("vec_id", "v")
    val rows = graft.sim.Pq.ivfPqProbeSweep(vecs, nLists = 2, maxProbe = 2,
        m = 2, k = 4, iters = 3, seedIvf = 9L, seedPq = 5L, queryMod = 10)
      .orderBy("nprobe").collect()
    assert(rows.map(_.getInt(0)).toSeq == Seq(1, 2))
    assert(rows.forall(_.getAs[Long]("n_queries") == 4L))
    val rec = rows.map(_.getAs[Double]("recall_mean"))
    assert(rec.forall(r => r >= 0.0 && r <= 1.0))
    // at this seed the 2-center coarse split cuts ACROSS the two
    // groups, so widening the probe budget genuinely adds candidates —
    // and on code-collapsed ADC ties the newcomers can EVICT true
    // positives (0.6 -> 0.4 here): recall is NOT monotone in nprobe,
    // which is exactly why the sweep reports the curve instead of
    // assuming it
    assert(rec(1) != rec(0))
  }

  test("gateRateCi: Wilson bounds match the textbook 8/10 case") {
    val df = (1 to 10).map(i => ("s", i <= 8)).toDF("src", "keep")
    val r = TextOps.gateRateCi(df, col("src"), col("keep")).head
    assert(r.getAs[Long]("n") == 10L && r.getAs[Long]("kept") == 8L)
    assert(r.getAs[Double]("keep_rate") == 0.8)
    // Wilson 95% for 8/10: (0.490157, 0.943319) — IEEE-exact
    assert(r.getAs[Double]("wilson_lo") == 0.490157)
    assert(r.getAs[Double]("wilson_hi") == 0.943319)
  }

  test("ivfAssignDelta: new vectors route to stored lists; drift shows in the mean") {
    val old = (0L until 40L).map { i =>
      val base = if (i % 2 == 0) Seq(10.0, 0.0) else Seq(0.0, 10.0)
      (i, base.map(_ + i * 0.001))
    }.toDF("vec_id", "v")
    val nv = Seq((100L, Seq(10.05, 0.0)),        // lands near a centroid
      (101L, Seq(100.0, 100.0)))                 // far from everything
      .toDF("vec_id", "v")
    val rows = graft.sim.Pq.ivfAssignDelta(old, nv, nLists = 2, iters = 3,
      seedIvf = 9L).collect()
    assert(rows.map(_.getAs[Long]("n_old")).sum == 40L)
    assert(rows.map(_.getAs[Long]("n_new")).sum == 2L)
    // the far plant drags its list's mean new-member distance way up
    val means = rows.filter(_.getAs[Long]("n_new") > 0)
      .map(_.getAs[Double]("mean_new_dist"))
    assert(means.max > 50.0)
    // growth is n_new/n_old on every row that has old members
    rows.filter(r => r.getAs[Long]("n_old") > 0).foreach { r =>
      val g = math.round(r.getAs[Long]("n_new").toDouble
        / r.getAs[Long]("n_old") * 1e6) / 1e6
      assert(r.getAs[Double]("growth") == g)
    }
  }

  test("rankBiasedOverlap: identical lists hit the truncated max, disjoint get 0") {
    val a = (1 to 10).map(r => (1L, r.toLong + 100, r)).toDF("qid", "dst", "rn")
    val same = graft.sim.Similarity.rankBiasedOverlap(a, a).head
    // truncated RBO@10 at p = 0.9: (1-p)·Σ p^(d-1) = 1 - 0.9^10
    assert(same.getAs[Double]("rbo") == 0.651322)
    assert(same.getAs[Long]("n_common") == 10L)
    val b = (1 to 10).map(r => (1L, r.toLong + 900, r)).toDF("qid", "dst", "rn")
    val disj = graft.sim.Similarity.rankBiasedOverlap(a, b).head
    assert(disj.getAs[Double]("rbo") == 0.0 && disj.getAs[Long]("n_common") == 0L)
    // top-heavy: agreeing only at rank 1 beats agreeing only at rank 10
    val top = (1L, 101L, 1) +: (2 to 10).map(r => (1L, r.toLong + 900, r))
    val bot = (1 to 9).map(r => (1L, r.toLong + 900, r)) :+ (1L, 110L, 10)
    val rboTop = graft.sim.Similarity
      .rankBiasedOverlap(a, top.toDF("qid", "dst", "rn")).head.getAs[Double]("rbo")
    val rboBot = graft.sim.Similarity
      .rankBiasedOverlap(a, bot.toDF("qid", "dst", "rn")).head.getAs[Double]("rbo")
    assert(rboTop > rboBot && rboBot > 0.0)
  }

  test("ksDrift: hand-computed two-sample D; identical groups read 0") {
    // group a: values {1,2}; group b: {3,4} — fully separated:
    // at v=2, F_a = 1, F_b = 0 -> D = 1
    val sep = Seq(("a", 1), ("a", 2), ("b", 3), ("b", 4)).toDF("g", "v")
    val d1 = TextOps.ksDrift(sep, col("g"), col("v"))
      .collect().map(r => r.getString(0) -> r.getDouble(2)).toMap
    assert(d1("a") == 1.0 && d1("b") == 1.0)
    // identical distributions -> D = 0
    val same = Seq(("a", 1), ("a", 2), ("b", 1), ("b", 2)).toDF("g", "v")
    val d0 = TextOps.ksDrift(same, col("g"), col("v"))
      .collect().map(r => r.getString(0) -> r.getDouble(2)).toMap
    assert(d0("a") == 0.0 && d0("b") == 0.0)
    // partial: a={1,2}, b={2,3}: at v=1 |1/2-0| = .5; at v=2 |1-1/2| = .5
    val mix = Seq(("a", 1), ("a", 2), ("b", 2), ("b", 3)).toDF("g", "v")
    val dm = TextOps.ksDrift(mix, col("g"), col("v"))
      .collect().map(r => r.getString(0) -> r.getDouble(2)).toMap
    assert(dm("a") == 0.5 && dm("b") == 0.5)
  }

  test("kmvMergeCheck: sketch union of group minima equals the direct sketch") {
    val rows = (1 to 300).map(i => (s"g${i % 3}", i)).toDF("grp", "key")
    val r = graft.stats.Sketches.kmvMergeCheck(rows, "grp", "key", k = 64).head
    assert(r.getAs[Boolean]("merged_equals_direct"))
    assert(r.getAs[Long]("n_groups") == 3L)
    // below capacity the estimate is the exact count on both paths
    val small = graft.stats.Sketches
      .kmvMergeCheck(rows, "grp", "key", k = 512).head
    assert(small.getAs[Double]("est_merged") == 300.0 &&
      small.getAs[Double]("est_direct") == 300.0)
  }

  test("cupedReport: a perfectly predictive covariate reads theta 2, rho2 1") {
    // per user: even-id event with value v, odd-id event with value 2v
    val ev = (1L to 20L).flatMap { u =>
      Seq((u * 2, u, u.toDouble), (u * 2 + 1, u, u.toDouble * 2))
    }.toDF("event_id", "user_id", "value")
    val r = graft.analytics.Analytics.cupedReport(ev).head
    assert(r.getAs[Long]("n_users") == 20L)
    assert(r.getAs[Double]("theta") == 2.0)
    assert(r.getAs[Double]("rho2") == 1.0)
  }

  test("hashBootstrapCi: constant values collapse the interval to the point") {
    val df = (1L to 200L).map(i => (i, 7L)).toDF("id", "v")
    val r = graft.analytics.Analytics
      .hashBootstrapCi(df, col("id"), col("v")).head
    // every replica mean is exactly 7 -> zero bootstrap variance
    assert(r.getAs[Double]("mean_v") == 7.0)
    assert(r.getAs[Double]("boot_se") == 0.0)
    assert(r.getAs[Double]("ci_lo") == 7.0 && r.getAs[Double]("ci_hi") == 7.0)
    // varied values: a positive se and an interval that brackets the mean
    val df2 = (1L to 200L).map(i => (i, i % 10)).toDF("id", "v")
    val r2 = graft.analytics.Analytics
      .hashBootstrapCi(df2, col("id"), col("v")).head
    assert(r2.getAs[Double]("boot_se") > 0.0)
    assert(r2.getAs[Double]("ci_lo") < r2.getAs[Double]("mean_v") &&
      r2.getAs[Double]("mean_v") < r2.getAs[Double]("ci_hi"))
  }

  test("labelDiversity: closed form equals hand-computed pair means; singletons drop") {
    val embs = Seq(
      (1L, Seq(0.0, 0.0), 1), (2L, Seq(2.0, 0.0), 1),  // one pair, d2 = 4
      (3L, Seq(1.0, 1.0), 2), (4L, Seq(1.0, 1.0), 2), (5L, Seq(1.0, 1.0), 2),
      (6L, Seq(9.0, 9.0), 3)) // singleton: no pairs, must drop
      .toDF("vec_id", "embedding", "label")
    val out = graft.sim.Similarity.labelDiversity(embs)
      .collect().map(r => r.getInt(0) -> r.getDouble(2)).toMap
    assert(out(1) == 4.0)
    assert(out(2) == 0.0)
    assert(!out.contains(3))
  }

  test("vocabNovelty: per-slice new types and cumulative vocabulary") {
    val docs = Seq((0L, "a b"), (1L, "a b"), (2L, "a c"), (3L, "c d"))
      .toDF("doc_id", "text")
    val out = graft.text.TextOps.vocabNovelty(docs, bucket = 2)
      .orderBy("bucket")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(out.toSeq == Seq((0L, 2L, 2L), (1L, 2L, 4L)))
  }

  test("splitLeakageAudit: naive split leaks straddling groups; leak-free never") {
    // one 40-doc group: a per-doc 1-in-10 hash split straddles it with
    // probability ~1 - (0.9^40 + 0.1^40); the group-keyed rule cannot
    val uni = (1L to 40L).toDF("doc_id")
    val pairs = (1L until 40L).map(i => (i, i + 1)).toDF("ida", "idb")
    val out = graft.dedup.Dedup
      .splitLeakageAudit(Dedup.nearDupGroups(uni, pairs))
      .head()
    assert(out.getLong(0) == 1L)              // one group
    assert(out.getLong(1) == 1L)              // naive split straddles it
    assert(out.getLong(2) == 40L)             // all its docs are leaked
    assert(out.getLong(3) == 0L)              // leak-free: provably zero
  }

  test("qualityDrift: planted monotone trend recovers the OLS slope sign") {
    // source A: stop ratio rises with doc_id; source B: flat
    val docs = (0L until 40L).map { i =>
      val src = if (i < 20) "A" else "B"
      val nStops = if (src == "A") (i % 20).toInt else 5
      val text = (Seq.fill(nStops)("the") ++ Seq.fill(20 - nStops)(s"w$i"))
        .mkString(" ")
      (i, text, src)
    }.toDF("doc_id", "text", "source")
    val out = graft.text.TextOps.qualityDrift(docs, Seq("the"))
      .collect().map(r => r.getString(0) -> r.getDouble(2)).toMap
    assert(out("A") > 0.0)
    assert(math.abs(out("B")) < 1e-12)
  }

  test("langPurity: mixed fires on a bilingual doc, not on pure ones") {
    val markers = Map("en" -> Seq("the", "a"), "de" -> Seq("der", "das"))
    val docs = Seq(
      (1L, "the cat a mat w1 w2"),         // pure en: s2 = 0
      (2L, "the a der das w3"),            // balanced: mixed
      (3L, "der das der w4"))              // pure de
      .toDF("doc_id", "text")
    val out = graft.text.TextOps.langPurity(docs, markers)
      .collect().map(r => r.getLong(0) ->
        ((r.getString(1), r.getInt(2), r.getInt(3), r.getBoolean(4)))).toMap
    assert(out(1L) == (("en", 2, 0, false)))
    assert(out(2L) == (("de", 2, 2, true)))  // tie: alphabetical winner
    assert(out(3L) == (("de", 3, 0, false)))
  }

  test("boilerplateTop: dominant gram, share, min-gram tie-break") {
    val docs = Seq(
      (1L, "x", "t1 t2 t3 t4 t5 w1"), (2L, "x", "t1 t2 t3 t4 t5 w2"),
      (3L, "y", "a b c d e"))
      .toDF("doc_id", "source", "text")
    val out = graft.text.TextOps.boilerplateTop(docs, n = 5)
      .collect().map(r => r.getString(0) ->
        ((r.getString(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(out("x") == (("t1 t2 t3 t4 t5", 2L, 0.5))) // 2 of 4 grams
    assert(out("y") == (("a b c d e", 1L, 1.0)))
  }

  test("bpeTrain: hand-computable merges; second-order merges use products; early stop") {
    // words: 'aaab' x2, 'ab' x1 -> pairs (a,a):4, (a,b):3 ... step 1
    // merges (a,a); step 2 sees (aa,a):2, (aa,b)... wait reprs:
    // 'a a a b' -> greedy L2R: 'aa a b' (one merge per occurrence pass)
    val docs = Seq((1L, "aaab aaab ab")).toDF("doc_id", "text")
    val out = graft.text.TextOps.bpeTrain(docs, merges = 10)
      .collect().map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3)))
    // step 1: pairs over {'a a a b' c2, 'a b' c1}: (a,a)=4, (a,b)=3 -> merge (a,a)
    assert(out(0) == ((1, "a", "a", 4L)))
    // step 2: reprs {'aa a b' c2, 'a b' c1}: (aa,a)=2, (a,b)=3 -> merge (a,b)
    assert(out(1) == ((2, "a", "b", 3L)))
    // step 3: {'aa a b' c2 -> after (a,b) merge: 'aa ab'... }
    assert(out.length <= 10) // early stop once words are fully merged
    assert(out.map(_._1).toSeq == (1 to out.length).toSeq)
  }

  test("bpeSegment: fertility under the trained merges, hand-checked") {
    // same corpus as bpeTrain: after all merges every word is 1 symbol
    val docs = Seq((1L, "aaab aaab ab"), (2L, "aaab")).toDF("doc_id", "text")
    val full = graft.text.TextOps.bpeSegment(docs, merges = 10)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(full(1L) == ((3L, 3L, 1.0)))
    assert(full(2L) == ((1L, 1L, 1.0)))
    // after ONE merge (a,a): 'aaab' -> 'aa a b' (3 syms), 'ab' -> 'a b' (2)
    val one = graft.text.TextOps.bpeSegment(docs, merges = 1)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(one(1L) == ((3L, 8L, 2.666667)))
    assert(one(2L) == ((1L, 3L, 3.0)))
  }

  test("wordpieceSegment: greedy diverges from BPE order on overlapping merges") {
    // (b,c) learned before (a,b): BPE segments 'abc' as 'a bc' (the (a,b)
    // merge finds no adjacent site), greedy longest-match takes 'ab c'
    val docs = Seq((1L, "bc bc bc ab ab abc")).toDF("doc_id", "text")
    val out = graft.text.TextOps.wordpieceSegment(docs, merges = 2)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    // 6 words; wp pieces: bc=1 x3, ab=1 x2, abc=2 -> 7; only abc differs
    assert(out(1L) == ((6L, 7L, 1L)))
    // with enough merges everything fully merges and both rules agree
    val full = graft.text.TextOps.wordpieceSegment(docs, merges = 10)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(full(1L) == ((6L, 6L, 0L)))
  }

  test("viterbiSegment: frequency-aware DP overrides BPE order; hand-scored") {
    // merges learned: (b,c) cnt 6, then (a,b) cnt 4. Final symbol counts:
    // bc=6, ab=4, c=10, a=1, b=0 (T=21, V=5). On 'abc':
    //   BPE order  -> 'a bc'   score ln(2*7) - 2ln26
    //   Viterbi    -> 'ab c'   score ln(5*11) - 2ln26  (wins)
    //   greedy     -> 'ab c'   (longest prefix)
    val docs = Seq(
      (1L, "bc bc bc bc bc ab ab ab ab abc"),
      (2L, "c c c c c c c c c c")).toDF("doc_id", "text")
    val out = graft.text.TextOps.viterbiSegment(docs, merges = 2)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(out(1L) == ((10L, 11L, 1L, 0L)))
    assert(out(2L) == ((10L, 10L, 0L, 0L)))
  }

  test("kCenters: farthest-point picks on a line, non-increasing radii") {
    // points at 0, 1, 10, 21 on a line (2-d to exercise the kernel)
    val vecs = Seq((0L, Array(0.0, 0.0)), (1L, Array(1.0, 0.0)),
      (2L, Array(10.0, 0.0)), (3L, Array(21.0, 0.0)))
      .toDF("vec_id", "embedding")
    val out = graft.sim.Similarity.kCenters(vecs, k = 4)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getDouble(2)))
    // start 0; farthest 21 (id 3, d 21); then 10 (min(10, 11) = 10);
    // then 1 (min(1, 9, 20) = 1)
    assert(out.toSeq == Seq((1, 0L, 0.0), (2, 3L, 21.0), (3, 2L, 10.0),
      (4, 1L, 1.0)))
    assert(out.drop(1).map(_._3).toSeq == out.drop(1).map(_._3).sorted.reverse.toSeq)
  }

  test("rocAuc: perfect separation 1.0, full tie 0.5, hand-computed mix") {
    def auc(rows: Seq[(Long, Boolean)]): Double =
      graft.text.TextOps.rocAuc(rows.toDF("score", "is_pos"))
        .head.getDouble(2)
    assert(auc(Seq((3L, true), (2L, true), (1L, false))) == 1.0)
    assert(auc(Seq((2L, true), (2L, false))) == 0.5)
    // pos {3, 1}, neg {2}: pairs won 1 of 2 -> 0.5; with tie pos {2,3},
    // neg {2}: (1 + 0.5)/2 = 0.75
    assert(auc(Seq((3L, true), (1L, true), (2L, false))) == 0.5)
    assert(auc(Seq((3L, true), (2L, true), (2L, false))) == 0.75)
  }

  test("curriculumOrder: exact deciles, round-robin interleave") {
    // 6 docs, lengths 1..6, 3 strata -> strata {0,0,1,1,2,2} by rank;
    // curriculum order visits one doc per stratum round-robin
    val docs = (1 to 6).map(i => (i.toLong, Seq.fill(i)("t").mkString(" ")))
      .toDF("doc_id", "text")
    val out = graft.text.Mix.curriculumOrder(docs, nStrata = 3)
      .orderBy("curriculum_pos")
      .collect().map(r => (r.getLong(0), r.getInt(2), r.getLong(4)))
    assert(out.toSeq == Seq((1L, 0, 0L), (3L, 1, 1L), (5L, 2, 2L),
      (2L, 0, 3L), (4L, 1, 4L), (6L, 2, 5L)))
  }

  test("snapshotDelta: all four change verdicts from a planted refresh") {
    val v1 = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("doc_id", "text")
    val v2 = Seq((1L, "a"), (2L, "B2"), (4L, "d")).toDF("doc_id", "text")
    val out = Dedup.snapshotDelta(v1, v2)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out == Map("unchanged" -> 1L, "modified" -> 1L,
      "removed" -> 1L, "added" -> 1L))
  }

  test("packCut: split counts by integer div; totals conserve") {
    // 3 docs of 4 tokens, window 5: concat order fixed by seed ranks.
    // starts 0,4,8 -> doc at 0: windows 0..0 (0 splits); at 4: 0..1
    // (1 split); at 8: 1..2 (1 split)
    val docs = Seq((1L, "a b c d"), (2L, "e f g h"), (3L, "i j k l"))
      .toDF("doc_id", "text")
    val out = graft.text.Mix.packCut(docs, windowLen = 5, seed = 1)
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(out.map(_._2).sorted.toSeq == Seq(0L, 4L, 8L))
    val byStart = out.sortBy(_._2)
    assert(byStart.map(x => (x._3, x._4)).toSeq ==
      Seq((0L, 0L), (0L, 1L), (1L, 1L)))
    // a doc never splits more than nt div L + 1 times
    assert(out.forall(_._4 <= 4 / 5 + 1))
  }

  test("packCut equals naive per-token window assignment on a varied corpus") {
    val lens = (1 to 50).map(i => 1 + (i * 13) % 17)
    val docs = lens.zipWithIndex.map { case (l, i) =>
      ((i + 1).toLong, Seq.fill(l)("t").mkString(" "))
    }.toDF("doc_id", "text")
    val out = graft.text.Mix.packCut(docs, windowLen = 7, seed = 3)
      .collect().map(r => r.getLong(0) -> ((r.getLong(2), r.getLong(4)))).toMap
    // driver-side replay of the same seeded order + naive window walk
    def md5hex(s: String) = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val order = lens.zipWithIndex
      .map { case (l, i) => ((i + 1).toLong, l.toLong) }
      .sortBy { case (id, _) => (md5hex(s"3:$id"), id) }
    var start = 0L
    order.foreach { case (id, nt) =>
      val windows = (start until start + nt).map(_ / 7).distinct
      assert(out(id) == ((start, (windows.size - 1).toLong)), s"doc $id")
      start += nt
    }
  }

  test("sourceEntropy: uniform beats skewed; hhi exact on hand counts") {
    // src u: 4 distinct tokens once each; src s: one token 4 times
    val docs = Seq((1L, "u", "a b c d"), (2L, "s", "x x x x"))
      .toDF("doc_id", "source", "text")
    val out = graft.text.TextOps.sourceEntropy(docs)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4)))).toMap
    assert(out("u")._1 == 4L && out("u")._2 == 4L)
    assert(out("s")._1 == 4L && out("s")._2 == 1L)
    assert(math.abs(out("u")._3 - math.log(4.0)) < 1e-5) // uniform: ln 4
    assert(out("s")._3 == 0.0)                           // degenerate: 0
    assert(out("u")._4 == 0.25 && out("s")._4 == 1.0)    // HHI exact
  }

  test("kCenterAssign: every point routes to its nearest center") {
    val vecs = Seq((0L, Array(0.0, 0.0)), (1L, Array(1.0, 0.0)),
      (2L, Array(10.0, 0.0)), (3L, Array(21.0, 0.0)))
      .toDF("vec_id", "embedding")
    // centers at k=2: {0, 3}; 1 -> 0 (d 1), 2 -> 3 (d 11 vs 10 ... 10 to 0)
    val out = graft.sim.Similarity.kCenterAssign(vecs, k = 2)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .sortBy(_._1)
    // 2 is closer to 0 (10) than to 21 (11) -> center 0 gets {0,1,2}
    assert(out.toSeq == Seq((1, 0L, 3L, 10.0), (2, 3L, 1L, 0.0)))
  }

  test("normalizedDedupGain: canonical digest catches case/space variants") {
    val docs = Seq((1L, "a b"), (2L, "A  B"), (3L, "c"))
      .toDF("doc_id", "text")
    val r = Dedup.normalizedDedupGain(docs).head
    assert(r.getLong(0) == 3L)                  // n_docs
    assert(r.getLong(1) == 0L && r.getLong(2) == 0L) // raw: none
    assert(r.getLong(3) == 2L && r.getLong(4) == 1L) // canon: 2 docs / 1 grp
    assert(r.getLong(5) == 2L)                  // gain
  }

  test("kmvSetOps: lossless below capacity, estimator tracks truth above it") {
    // A = {1..30}, B = {21..50}: |A∩B| = 10, |A∪B| = 50, J = 0.2
    val rows = ((1 to 30).map(("a", _)) ++ (21 to 50).map(("b", _)))
      .toDF("grp", "key")
    // k = 64 > 50: every sketch exhaustive -> estimates ARE the truth
    val exact = graft.stats.Sketches.kmvSetOps(rows, "grp", "key", k = 64).head
    assert(exact.getAs[Long]("inter_exact") == 10L &&
      exact.getAs[Long]("union_exact") == 50L)
    assert(exact.getAs[Double]("union_est") == 50.0)
    assert(exact.getAs[Double]("jaccard_est") == 0.2)
    assert(exact.getAs[Double]("inter_est") == 10.0)
    // k = 16 < 50: estimator branch; estimates finite and in a sane band
    val est = graft.stats.Sketches.kmvSetOps(rows, "grp", "key", k = 16).head
    val u = est.getAs[Double]("union_est")
    assert(u > 10.0 && u < 250.0)                 // order of magnitude
    assert(est.getAs[Long]("union_exact") == 50L) // exact columns intact
  }

  test("detectorPr: truth set is complete — misses count as fn, not silence") {
    val sh = Dedup.shingles(Seq(
      (1L, "w1 w2 w3 w4 w5"), (2L, "w1 w2 w3 w4 w5"),   // J = 1 pair
      (3L, "x1 x2 x3 x4 x5")).toDF("doc_id", "text"), 3)
    val ok = Dedup.detectorPr(sh, 8, 2, jacNum = 1, jacDen = 2)
      .orderBy("t").collect()
    // identical docs share every band: detected at all four thresholds
    assert(ok.forall(r => r.getAs[Long]("n_true") == 1L
      && r.getAs[Long]("tp") == 1L && r.getAs[Double]("recall") == 1.0))
    // bucketCap 0 kills every band bucket: the true pair is now a MISS —
    // fn = 1 with n_pred = 0 and a NULL precision, not an empty report
    val miss = Dedup.detectorPr(sh, 8, 2, jacNum = 1, jacDen = 2,
      bucketCap = 0).orderBy("t").collect()
    assert(miss.forall(r => r.getAs[Long]("fn") == 1L
      && r.getAs[Long]("n_pred") == 0L && r.isNullAt(r.fieldIndex("precision"))
      && r.getAs[Double]("recall") == 0.0))
  }

  test("gateAgreement: kappa 1 on identity, 0 on independence, NULL degenerate") {
    def run(rows: Seq[(Boolean, Boolean)]) = {
      val df = rows.toDF("ga", "gb")
      TextOps.gateAgreement(df, col("ga"), col("gb")).head
    }
    val perfect = run(Seq((true, true), (false, false)))
    assert(perfect.getAs[Double]("kappa") == 1.0)
    val indep = run(Seq((true, true), (true, false), (false, true), (false, false)))
    assert(indep.getAs[Double]("kappa") == 0.0 &&
      indep.getAs[Double]("agree_frac") == 0.5)
    val const = run(Seq((true, true), (true, true)))
    assert(const.isNullAt(const.fieldIndex("kappa")))  // pe = 1: undefined
  }

  test("consistentSampleAudit: id-keyed draw only moves with the corpus") {
    val v1 = (1L to 40L).toDF("doc_id")
    val v2 = (1L to 40L).filter(_ % 5 != 0).toDF("doc_id")
      .unionByName(Seq(100L, 101L).toDF("doc_id"))
    val rows = graft.text.Mix.consistentSampleAudit(v1, v2, mod = 2)
      .collect().map(r => r.getString(0) -> r).toMap
    val c = rows("consistent")
    assert(c.getAs[Long]("reshuffled") == 0L)
    // every entry is a corpus add, every exit is a corpus remove
    assert(c.getAs[Long]("entered") == c.getAs[Long]("entered_new"))
    assert(c.getAs[Long]("exited") == c.getAs[Long]("exited_removed"))
    val s = rows("size_salted")
    assert(s.getAs[Long]("reshuffled") > 0L)  // 40 -> 34 docs reseeds the draw
  }

  test("chainContamination: A~B~C closure counts the A-C pair as chained") {
    // B shares its first half with A and its second half with C; A and
    // C share nothing. Candidates A-B and B-C co-group all three, and
    // the strict direct test must mark exactly the A-C pair as chained.
    val sh = Dedup.shingles(Seq(
      (1L, "a1 a2 a3 a4"), (2L, "a1 a2 a3 a4 c1 c2 c3 c4"),
      (3L, "c1 c2 c3 c4"), (9L, "z1 z2 z3 z4")).toDF("doc_id", "text"), 2)
    val pairs = Seq((1L, 2L), (2L, 3L)).toDF("ida", "idb")
    val r = Dedup.chainContamination(sh, pairs, jacNum = 1, jacDen = 3).head
    assert(r.getAs[Long]("n_groups") == 1L &&
      r.getAs[Long]("n_grouped_docs") == 3L)
    assert(r.getAs[Long]("n_pairs") == 3L)     // (1,2) (1,3) (2,3)
    assert(r.getAs[Long]("n_direct") == 2L)    // J(1,2)=J(2,3)=3/7 >= 1/3
    assert(r.getAs[Long]("n_chained") == 1L)   // (1,3): J = 0
  }

  test("dbscan: core/border/noise roles, min-label clusters, border election") {
    // 1-2-3 mutually ε-close (dense triangle), 4 hangs off 3, 9 isolated
    val uni = Seq(1L, 2L, 3L, 4L, 9L).toDF("cell_id")
    val und = Seq((1L, 2L), (1L, 3L), (2L, 3L), (3L, 4L))
    val pairs = (und ++ und.map(_.swap)).toDF("src", "dst")
    val out = graft.pipeline.Cluster.dbscan(uni, pairs, minPts = 3)
      .collect().map(r => r.getLong(0) ->
        ((r.getString(1), Option(r.get(2))))).toMap
    assert(out(1L) == (("core", Some(1L))))
    assert(out(2L) == (("core", Some(1L))))
    assert(out(3L) == (("core", Some(1L)))) // deg 3 + self >= 3
    assert(out(4L) == (("border", Some(1L)))) // 1 neighbor, but it's core
    assert(out(9L) == (("noise", None)))
  }

  test("clusterSizeStats: histogram over CC groups, keep-one yield") {
    val uni = (1L to 7L).toDF("doc_id")
    val pairs = Seq((1L, 2L), (2L, 3L), (5L, 6L)).toDF("ida", "idb")
    val out = Dedup.clusterSizeStats(Dedup.nearDupGroups(uni, pairs))
      .orderBy("cluster_size")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out.toSeq == Seq((1L, 2L, 2L, 0L), (2L, 1L, 2L, 1L), (3L, 1L, 3L, 2L)))
  }
}
