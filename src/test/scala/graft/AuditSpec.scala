package graft

import org.apache.spark.sql.functions._
import graft.analytics.Analytics
import graft.dedup.Dedup
import graft.text.TextOps
import graft.sim.Similarity

/** Specs for the round-6 ninth-tail audit operators (q187–q193): blocked
  * edit-distance near-dup, median/MAD outlier gating, association rules,
  * k-anonymity exposure, time-bounded funnels, RRF fusion, and HTML
  * boilerplate extraction. The driver's DuckDB oracles check full-corpus
  * values; these pin the semantic properties on hand-built inputs.
  */
class AuditSpec extends SparkSpec {
  import spark.implicits._

  test("editDistanceNearDup: same-prefix close pair found, prefix change blocks, cap drops hot block") {
    val near1 = (1L, "alpha beta gamma delta epsilon zeta")
    val near2 = (2L, "alpha beta gamma delta epsilon zetX") // dist 1, same block
    val farPrefix = (3L, "alphX beta gamma delta epsilon zeta") // dist 1 vs doc 1 but different block
    val hot = (10L to 15L).map(i => (i, "hot hot hot filler" + i)) // 6-member block
    val out = Dedup.editDistanceNearDup(
      (Seq(near1, near2, farPrefix) ++ hot).toDF("doc_id", "text"),
      maxDist = 5, prefixTokens = 3, blockCap = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(out.toSeq == Seq((1L, 2L, 1L))) // only the same-block pair; hot block capped away
  }

  test("editDistanceNearDup: distance gate filters a same-block far pair") {
    val a = (1L, "k k k completely different tail of words here")
    val b = (2L, "k k k xxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxx")
    val out = Dedup.editDistanceNearDup(Seq(a, b).toDF("doc_id", "text"),
      maxDist = 5, prefixTokens = 3, blockCap = 4).count()
    assert(out == 0L)
  }

  test("madOutliers: hand-computed median, MAD and flag count") {
    // group g: values 1,2,3,4,100 → median = rank ceil(2.5)=3 → 3
    // adev = 2,1,0,1,97 → MAD = rank 3 of sorted(0,1,1,2,97) → 1
    // k=3 → flag adev > 3 → only 97 → 1 outlier
    val df = Seq(("g", 1L), ("g", 2L), ("g", 3L), ("g", 4L), ("g", 100L))
      .toDF("src", "v")
    val r = Analytics.madOutliers(df, "src", "v", k = 3).collect().head
    assert(r.getAs[Long]("n") == 5L)
    assert(r.getAs[Long]("median") == 3L)
    assert(r.getAs[Long]("mad") == 1L)
    assert(r.getAs[Long]("n_outliers") == 1L)
  }

  test("associationRules: hand-computed support, confidence and lift") {
    // 4 docs; x in 1,2,3; y in 1,2,4; pair (x,y) in 1,2
    val docs = Seq((1L, "x y"), (2L, "y x"), (3L, "x z"), (4L, "y z"))
      .toDF("doc_id", "text")
    val out = TextOps.associationRules(docs, supNum = 1, supDen = 2)
      .collect().map(r => ((r.getString(0), r.getString(1)),
        (r.getLong(2), r.getLong(3), r.getLong(4),
          r.getDouble(5), r.getDouble(6), r.getDouble(7)))).toMap
    // support >= 1/2 keeps only (x,y): 2/4
    assert(out.keySet == Set(("x", "y")))
    val (na, nb, nab, sup, conf, lift) = out(("x", "y"))
    assert(na == 3L && nb == 3L && nab == 2L)
    assert(approx(sup, 0.5) && approx(conf, 2.0 / 3))
    assert(approx(lift, 2.0 * 4 / (3 * 3)))
  }

  test("associationRules: within-doc duplicate tokens count once") {
    val docs = Seq((1L, "a b a b a"), (2L, "a b")).toDF("doc_id", "text")
    val out = TextOps.associationRules(docs, supNum = 1, supDen = 1)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(4)))
    assert(out.toSeq == Seq(("a", "b", 2L)))
  }

  test("kAnonymity: exposure counts per k") {
    // classes: (a)×1, (b)×2, (c)×5
    val df = (Seq.fill(1)("a") ++ Seq.fill(2)("b") ++ Seq.fill(5)("c"))
      .toDF("q")
    val out = Analytics.kAnonymity(df, Seq(col("q")), Seq(2, 3, 10))
      .orderBy("k").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out.toSeq == Seq((2L, 3L, 1L, 1L), (3L, 3L, 2L, 3L),
      (10L, 3L, 3L, 8L)))
  }

  test("tCloseness: hand-computed TVD, integer thresholds, absent-value grid") {
    // global: 6×x, 2×y (N=8). class A = 3×x → p=(1,0), TVD = ½(¼+¼) = 0.25
    // (the absent y contributes — the grid materializes it); class B =
    // 3×x,2×y → p=(.6,.4), TVD = ½(.15+.15) = 0.15
    val df = (Seq.fill(3)(("A", "x")) ++ Seq.fill(3)(("B", "x"))
      ++ Seq.fill(2)(("B", "y"))).toDF("cls", "sv")
    val out = graft.analytics.Analytics.tCloseness(df, Seq(col("cls")),
        col("sv"), Seq((1, 10), (1, 5), (1, 2)))
      .orderBy(col("t_num").cast("double") / col("t_den")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getDouble(5)))
    assert(out.toSeq == Seq(
      (1L, 10L, 2L, 2L, 8L, 0.25),  // t=0.1: both classes above
      (1L, 5L, 2L, 1L, 3L, 0.25),   // t=0.2: only A (0.25 > 0.2 > 0.15)
      (1L, 2L, 2L, 0L, 0L, 0.25)))  // t=0.5: none
  }

  test("mmrRerank: diversity beats relevance at step 2; integer scores") {
    // candidates a(rel 100) b(90) c(80); b is near-duplicate of a
    // (sim 95), c is far from both (sim 10). λ=7/10, k=2:
    // step 1 → a (7·100 = 700); step 2 → c: 7·80 − 3·10 = 530 beats
    // b: 7·90 − 3·95 = 345 — the whole point of MMR
    val cand = Seq((1L, 10L, 100L), (1L, 11L, 90L), (1L, 12L, 80L))
      .toDF("qid", "dst", "rel")
    val sims = Seq(
      (1L, 10L, 11L, 95L), (1L, 11L, 10L, 95L),
      (1L, 10L, 12L, 10L), (1L, 12L, 10L, 10L),
      (1L, 11L, 12L, 10L), (1L, 12L, 11L, 10L)
    ).toDF("qid", "a", "b", "sim")
    val out = graft.sim.Similarity.mmrRerank(cand, sims, 7, 10, 2)
      .orderBy("rn").collect()
      .map(r => (r.getAs[Int]("rn"), r.getAs[Long]("dst"),
        r.getAs[Long]("score")))
    assert(out.toSeq == Seq((1, 10L, 700L), (2, 12L, 530L)))
  }

  test("mmrRerank: equal step scores tie-break on dst ascending") {
    // b and c tie at step 2 (same rel, same sim to a) → lower dst wins
    val cand = Seq((1L, 5L, 100L), (1L, 9L, 80L), (1L, 7L, 80L))
      .toDF("qid", "dst", "rel")
    val sims = Seq(
      (1L, 5L, 9L, 20L), (1L, 9L, 5L, 20L),
      (1L, 5L, 7L, 20L), (1L, 7L, 5L, 20L),
      (1L, 7L, 9L, 90L), (1L, 9L, 7L, 90L)
    ).toDF("qid", "a", "b", "sim")
    val out = graft.sim.Similarity.mmrRerank(cand, sims, 7, 10, 2)
      .orderBy("rn").collect().map(r => r.getAs[Long]("dst"))
    assert(out.toSeq == Seq(5L, 7L))
  }

  test("luhnValid: known vectors, odd length, audit separates plants") {
    import graft.text.TextOps
    val df = Seq("4532015112830366", "4532015112830367",
      "1234567890123456", "79927398713")
      .toDF("c").withColumn("v", TextOps.luhnValid(col("c")))
    val got = df.collect().map(r => r.getString(0) -> r.getBoolean(1)).toMap
    assert(got("4532015112830366") && !got("4532015112830367")
      && !got("1234567890123456") && got("79927398713"))
    val docs = Seq(
      (1L, "a", "pay with 4532015112830366 thanks"),
      (2L, "a", "order 1234567890123456 shipped"),
      (3L, "b", "no digits here")).toDF("doc_id", "source", "text")
    val out = TextOps.luhnAudit(docs, col("source")).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    assert(out == Map("a" -> ((2L, 2L, 1L))))
  }

  test("conformal: exact rank threshold, clamped k, held-out coverage") {
    // calibration scores 10..100 (n=10), test {5, 15, 95, 105}
    val df = ((1 to 10).map(i => (i * 10L, true))
      ++ Seq((5L, false), (15L, false), (95L, false), (105L, false)))
      .toDF("sc", "cal")
    val out = graft.analytics.Analytics.conformal(df, col("sc"), col("cal"),
        Seq((1, 5), (1, 100)))
      .orderBy("a_den").collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
        r.getLong(5), r.getLong(6), r.getDouble(7)))
    // α=1/5: k = ⌈11·0.8⌉ = 9 → q = 90; covered {5,15} of 4 → wait:
    // test ≤ 90 is {5, 15} plus nothing else? 95 > 90, 105 > 90 → 2/4
    assert(out(0) == (5L, 10L, 9L, 90L, 4L, 2L, 0.5))
    // α=1/100: k = ⌈11·0.99⌉ = 11 → clamped to n = 10 → q = 100;
    // covered {5, 15, 95} → 3/4
    assert(out(1) == (100L, 10L, 10L, 100L, 4L, 3L, 0.75))
  }

  test("funnelWithin: late step lands outside the window and does not count") {
    val h = 3600000000L // 1h in µs
    val ev = Seq(
      // user 1: click 30 min after view, purchase 30 min after click → 3
      (1L, "view", 0L), (1L, "click", h / 2), (1L, "purchase", h),
      // user 2: click 2h after view → window (1h) excludes it → 1
      (2L, "view", 0L), (2L, "click", 2 * h), (2L, "purchase", 3 * h),
      // user 3: purchase BEFORE the click → strict order → 2
      (3L, "view", 0L), (3L, "purchase", h / 4), (3L, "click", h / 2)
    ).toDF("user_id", "event_type", "ts_us")
    val out = Analytics.funnelWithin(ev, Seq("view", "click", "purchase"), h)
      .select("user_id", "steps_reached").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(out == Map(1L -> 3, 2L -> 1, 3L -> 2))
  }

  test("rrfFuse: both-list items outrank single-list items; exact coefficients") {
    val a = Seq((1L, 10L, 1), (1L, 11L, 2)).toDF("qid", "dst", "rn")
    val b = Seq((1L, 10L, 2), (1L, 12L, 1)).toDF("qid", "dst", "rn")
    val out = Similarity.rrfFuse(a, b, k0 = 60, depth = 10, topN = 5)
      .orderBy("rn").collect()
      .map(r => (r.getLong(2), r.getLong(3), r.getDouble(4)))
    // dst 10: 1/61 + 1/62; dst 12: 1/61; dst 11: 1/62
    assert(out.map(_._1).toSeq == Seq(10L, 12L, 11L))
    assert(out.head._2 == 2L)
    assert(approx(out(0)._3, 1.0 / 61 + 1.0 / 62, 1e-6))
    assert(approx(out(1)._3, 1.0 / 61, 1e-6))
    assert(approx(out(2)._3, 1.0 / 62, 1e-6))
  }

  test("rrfFuse: integer-score tie breaks by dst ascending") {
    val a = Seq((1L, 20L, 1), (1L, 5L, 1)).toDF("qid", "dst", "rn")
      .filter(col("dst") === 20L) // list a ranks only 20 at r1
    val b = Seq((1L, 5L, 1)).toDF("qid", "dst", "rn")
    val out = Similarity.rrfFuse(a, b).orderBy("rn").collect()
      .map(_.getLong(2))
    assert(out.toSeq == Seq(5L, 20L)) // equal scores → smaller dst first
  }

  test("maxCoverageSelect: greedy order, marginal gains, early stop at saturation") {
    val sh = Seq(
      (1L, "s1"), (1L, "s2"), (1L, "s3"),
      (2L, "s1"), (2L, "s2"),
      (3L, "s4"),
      (4L, "s2"), (4L, "s3")).toDF("doc_id", "shingle")
    val out = Dedup.maxCoverageSelect(sh, k = 4).orderBy("rank").collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // doc1 covers 3, then doc3 adds the only uncovered shingle; docs 2/4
    // add nothing → selection saturates and stops before k
    assert(out.toSeq == Seq((1, 1L, 3L, 3L), (2, 3L, 1L, 4L)))
  }

  test("lshPlanner: S-curve expectations at a hand-computed Jaccard") {
    // one pair: inter 2, union 4 → J = 0.5; true at the 2/5 threshold
    val sh = Seq((1L, "p"), (1L, "q"), (1L, "r"),
      (2L, "p"), (2L, "q"), (2L, "s")).toDF("doc_id", "shingle")
    val out = Dedup.lshPlanner(sh, Seq((4, 2), (2, 4))).collect()
      .map(r => (r.getInt(0), r.getInt(1)) ->
        ((r.getLong(2), r.getLong(3), r.getDouble(4), r.getDouble(5),
          r.getDouble(6)))).toMap
    // (4,2): 1 − (1 − 0.25)^4 = 0.68359375; (2,4): 1 − (1 − 0.0625)^2
    assert(out((4, 2)) == ((1L, 1L, 0.683594, 0.683594, 0.0)))
    assert(out((2, 4)) == ((1L, 1L, 0.121094, 0.121094, 0.0)))
  }

  test("ngramNovelty: shared grams counted once, short docs absent") {
    val docs = Seq(
      (1L, "a b c d e f"), // grams: 'a b c d e', 'b c d e f'
      (2L, "a b c d e x"), // shares 'a b c d e' with doc 1
      (3L, "z z z")        // < 5 tokens → no grams → absent
    ).toDF("doc_id", "text")
    val out = TextOps.ngramNovelty(docs, n = 5).orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(out.toSeq == Seq((1L, 2L, 1L, 0.5), (2L, 2L, 1L, 0.5)))
  }

  test("psiDrift: hand-computed two-bin PSI; identical distributions score 0") {
    // g1 both rows in bin 0, g2 both in bin 1 → per group:
    // 0.25·ln(1.5) + 0.25·ln(2) = 0.274653 (nano-quantized terms)
    val df = Seq(("g1", 1L), ("g1", 1L), ("g2", 2L), ("g2", 2L))
      .toDF("src", "v")
    val out = TextOps.psiDrift(df, "src", "v", bins = 2).collect()
      .map(r => r.getString(0) -> r.getDouble(2)).toMap
    assert(out == Map("g1" -> 0.274653, "g2" -> 0.274653))
    val unif = Seq(("g1", 1L), ("g1", 2L), ("g2", 1L), ("g2", 2L))
      .toDF("src", "v")
    val out2 = TextOps.psiDrift(unif, "src", "v", bins = 2).collect()
      .map(r => r.getDouble(2))
    assert(out2.forall(_ == 0.0))
  }

  test("incrementalNovelty: exact copy scores 0, fresh doc 1, bloom agrees on tiny corpus") {
    val oldD = Seq((1L, "sA", "a b c d e f")).toDF("doc_id", "source", "text")
    val newD = Seq(
      (10L, "sA", "a b c d e f"), // both grams seen
      (11L, "sB", "p q r s t")    // one gram, unseen
    ).toDF("doc_id", "source", "text")
    val out = TextOps.incrementalNovelty(oldD, newD, n = 5)
      .orderBy("source").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getDouble(6), r.getDouble(7)))
    assert(out.toSeq == Seq(
      ("sA", 1L, 2L, 0L, 0L, 0L, 0.0, 0.0),
      ("sB", 1L, 1L, 1L, 1L, 0L, 1.0, 1.0)))
  }

  test("bpeFertilitySweep: hand-computed cuts; exhausted training reuses the final table") {
    // words: 'aa'×2 ('a a'), 'ab'×1 ('a b') → merge 1 = (a,a), merge 2 = (a,b)
    val docs = Seq((1L, "aa aa ab")).toDF("doc_id", "text")
    val out = TextOps.bpeFertilitySweep(docs, Seq(1, 2, 5))
      .orderBy("merges").collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4), r.getDouble(5)))
    assert(out(0) == ((1, 3L, 3L, 4L, 1.333333, 1.5)))
    assert(out(1) == ((2, 2L, 3L, 3L, 1.0, 2.0)))
    assert(out(2) == ((5, 2L, 3L, 3L, 1.0, 2.0))) // exhausted at 2 merges
  }

  test("ndcgEval: perfect ranking scores 1; a BM25 tie misranking scores the hand value") {
    // query 'x y': d1 contains the phrase (rel 3), d2 all terms (rel 1).
    val good = Seq((1L, "x y"), (2L, "x b y")).toDF("doc_id", "text")
    val g = TextOps.ndcgEval(good, Seq((1, "x y")), topK = 10).collect().head
    assert(g.getAs[Double]("ndcg") == 1.0 && g.getAs[Long]("max_rel") == 3L)
    // 'y x' (rel 1) ties the phrase doc's BM25 score; the doc_id
    // tie-break puts it FIRST → dcg = 1·c1 + 3·c2 + 1·c3 < idcg
    val tied = Seq((1L, "y x"), (2L, "x y"), (3L, "x b y"))
      .toDF("doc_id", "text")
    val r = TextOps.ndcgEval(tied, Seq((1, "x y")), topK = 10).collect().head
    val c = graft.text.TextOps.ndcgCoeffs(10)
    val exp = BigDecimal((1L * c(0) + 3 * c(1) + 1 * c(2)).toDouble /
        (3L * c(0) + 1 * c(1) + 1 * c(2)).toDouble)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(r.getAs[Double]("ndcg") == exp)
    assert(r.getAs[Long]("n_rel") == 3L)
  }

  test("unigramEmTrain: hand-built EM flip — whole word at iter 1, parts at iter 2") {
    // 'qx'×8, 'zj'×8, 'qxzj'×1: iteration 1 keeps the rare whole word
    // (2/(T+V) = 2/68 > (10/68)²), the M-step collapses T to the piece
    // total, and iteration 2 flips it ((9/27)² > 2/27)
    val docs = Seq((1L,
      (Seq.fill(8)("qx") ++ Seq.fill(8)("zj") ++ Seq("qxzj")).mkString(" ")))
      .toDF("doc_id", "text")
    val out = TextOps.unigramEmTrain(docs, emIters = 2).orderBy("iter")
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    val (r1, r2) = (out(0), out(1))
    assert(r1._3 == 3L && r1._4 == 3L && r1._5 == 17L) // all whole words
    assert(r2._3 == 1L && r2._4 == 2L && r2._5 == 18L) // only qxzj flips
    assert(r2._2 > r1._2) // hard-EM total score improves
  }

  test("noveltyStream: map-only bloom gate — copy scores 0, disjoint doc scores 1") {
    import graft.streaming.Streaming
    implicit val sc = spark.sqlContext
    val base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val corpus = Seq((1L, base)).toDF("doc_id", "text")
    val input = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[Streaming.Doc]
    val q = Streaming.noveltyStream(input.toDS(), corpus, n = 5)
      .writeStream.format("memory").queryName("novelty_out")
      .outputMode("append").start()
    val t0 = java.sql.Timestamp.valueOf("2026-01-01 10:00:00")
    input.addData(
      Streaming.Doc(11L, t0, base), // full copy: every gram in the bloom
      Streaming.Doc(12L, t0, "one two three four five six seven"),
      Streaming.Doc(13L, t0, "too short"))
    q.processAllAvailable()
    val got = spark.sql(
        "SELECT doc_id, n_grams, n_hits, novelty_est FROM novelty_out")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), Option(r.get(3))))).toMap
    q.stop()
    assert(got(11L) == ((6L, 6L, Some(0.0))))
    assert(got(12L) == ((3L, 0L, Some(1.0))))
    assert(got(13L) == ((0L, 0L, None))) // < n tokens → no grams, NULL score
  }

  test("piiStream: map-only scrub gate counts, redacts, and flags 2+ types") {
    import graft.streaming.Streaming
    implicit val sc = spark.sqlContext
    val input = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[Streaming.Doc]
    val q = Streaming.piiStream(input.toDS())
      .writeStream.format("memory").queryName("pii_out")
      .outputMode("append").start()
    val t0 = java.sql.Timestamp.valueOf("2026-01-01 10:00:00")
    input.addData(
      Streaming.Doc(1L, t0, "clean text"),
      Streaming.Doc(2L, t0, "mail a@b.io now"),
      Streaming.Doc(3L, t0, "a@b.io or 555-123-4567 at 10.0.0.1"))
    q.processAllAvailable()
    val got = spark.sql(
        "SELECT doc_id, n_types, needs_review, redacted FROM pii_out")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getBoolean(2), r.getString(3)))).toMap
    q.stop()
    assert(got(1L) == ((0L, false, "clean text")))
    assert(got(2L) == ((1L, false, "mail <EMAIL> now")))
    assert(got(3L) == ((3L, true, "<EMAIL> or <PHONE> at <IP>")))
  }

  test("temperatureMix: hand-computed dyadic smoothing of a 16:1 split") {
    // strata a:16 tokens, b:1 → raw 16/17; a50: 4:1; a25: 2:1; a75: 8:1
    val docs = Seq(("a", ("w " * 16).trim), ("b", "w")).toDF("g", "text")
    val out = graft.text.Mix.temperatureMix(docs, col("g"))
      .orderBy("grp").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4), r.getDouble(5)))
    assert(out(0) == (("a", 16L, 0.941176, 0.666667, 0.8, 0.888889)))
    assert(out(1) == (("b", 1L, 0.058824, 0.333333, 0.2, 0.111111)))
  }

  test("rateAnomalyStream: spike window alerts against the static baseline, normal window silent") {
    import graft.streaming.Streaming
    implicit val sc = spark.sqlContext
    val baseline = Seq(("view", 2.0, 1.0)).toDF("event_type", "mean", "std")
    val input = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[Streaming.Event]
    val q = Streaming.rateAnomalyStream(input.toDF(), baseline,
        threshold = 3.0)
      .writeStream.format("memory").queryName("rate_out")
      .outputMode("append").start()
    val t0 = java.sql.Timestamp.valueOf("2026-01-01 10:00:00")
    def ts(m: Int) = new java.sql.Timestamp(t0.getTime + m * 60000L)
    // hour 10: 8 views (z = 6, alert); hour 11: 2 views (z = 0, silent)
    val spike = (1 to 8).map(i => Streaming.Event(i, ts(i), 1L, "view", 0.0))
    val calm = (1 to 2).map(i =>
      Streaming.Event(100 + i, ts(60 + i), 1L, "view", 0.0))
    input.addData(spike ++ calm: _*)
    q.processAllAvailable()
    // advance the watermark past both windows so they close and emit
    input.addData(Streaming.Event(999, ts(300), 1L, "view", 0.0))
    q.processAllAvailable()
    val got = spark.sql("SELECT event_type, n, z FROM rate_out").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
    q.stop()
    assert(got == Set(("view", 8L, 6.0)))
  }

  test("htmlExtract: strips blocks (incl '<' inside script), tags with attributes, collapses whitespace") {
    val html = """<html><head><style type="text/css">b{x:1}</style></head>
      <body><nav class="top">junk | junk</nav>
      <p>hello   <b>world</b></p>
      <script>if (1 < 2) { alert("x"); }</script>
      <footer>bye</footer></body></html>"""
    val out = Seq(html).toDF("h")
      .select(TextOps.htmlExtract(col("h")).as("x")).collect().head.getString(0)
    assert(out == "hello world")
  }
}
