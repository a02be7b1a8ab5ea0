package graft

import org.apache.spark.sql.functions._
import graft.analytics.Analytics
import graft.graph.GraphStats
import graft.text.{Mix, TextOps}

/** Specs for the round-6 eleventh tail (q213–q218): local clustering,
  * deterministic label propagation, IPF raking, the Benford digit gate,
  * cross-source quantile normalization, and char-level entropy. The
  * driver's DuckDB oracles check full-corpus values; these pin the
  * semantics on hand-computed inputs.
  */
class RakeNormSpec extends SparkSpec {
  import spark.implicits._

  test("localClustering: triangle corners 1.0, hub gets 1/3, pendant NULL") {
    // Triangle (1,2,3) + pendant (3,4): nodes 1,2 have cc 1; node 3 has
    // deg 3 → wedges 3, tri 1 → 1/3; node 4 deg 1 → NULL.
    val e = Seq((1L, 2L), (1L, 3L), (2L, 3L), (3L, 4L)).toDF("ida", "idb")
    val out = GraphStats.localClustering(e).collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(4)) None
        else Some(r.getDouble(4)))).toMap
    assert(out == Map(1L -> Some(1.0), 2L -> Some(1.0),
      3L -> Some(0.333333), 4L -> None))
  }

  test("labelPropagation: two cliques joined by a bridge keep two communities") {
    // Cliques {1,2,3} and {10,11,12} bridged by (3,10). CC closure would
    // merge them; LPA keeps two communities (min label wins per clique).
    val e = Seq((1L, 2L), (1L, 3L), (2L, 3L),
      (10L, 11L), (10L, 12L), (11L, 12L), (3L, 10L)).toDF("ida", "idb")
    val out = GraphStats.labelPropagation(e, rounds = 4).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out(1L) == 1L && out(2L) == 1L && out(3L) == 1L)
    assert(out(11L) == 10L && out(12L) == 10L)
    // the bridge endpoint is contested: 2 votes from its own clique
    // (+self) beat 1 from across the bridge
    assert(out(10L) == 10L)
    assert(out.values.toSet.size == 2)
  }

  test("labelPropagation: isolated edge converges via the self-vote") {
    // Textbook sync LPA oscillates on a single edge; the self-vote makes
    // both endpoints adopt the min label and stay there.
    val e = Seq((7L, 9L)).toDF("ida", "idb")
    val out = GraphStats.labelPropagation(e, rounds = 4).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out == Map(7L -> 7L, 9L -> 7L))
  }

  test("ipfRake: uniform targets on a skewed 2x2 table move both marginals toward 1/2") {
    val df = (Seq.fill(30)(("a", "x")) ++ Seq.fill(10)(("a", "y")) ++
      Seq.fill(10)(("b", "x")) ++ Seq.fill(10)(("b", "y")))
      .toDF("r", "c")
    val out = Mix.ipfRake(df, col("r"), col("c"), rounds = 4).collect()
    val rowShare = out.map(r => r.getString(0) -> r.getLong(4)).toMap
    val colShare = out.map(r => r.getString(1) -> r.getLong(5)).toMap
    // ppm shares within 1% of 500000 after 4 rounds (truncation-exact
    // arithmetic converges geometrically; exact equality is not the
    // contract, the marginal match is)
    assert(rowShare.values.forall(s => math.abs(s - 500000L) < 10000),
      s"row shares $rowShare")
    assert(colShare.values.forall(s => math.abs(s - 500000L) < 10000),
      s"col shares $colShare")
    // weights: the over-represented (a,x) cell must be down-weighted
    // below every other cell
    val w = out.map(r => (r.getString(0), r.getString(1)) -> r.getLong(3))
      .toMap
    assert(w(("a", "x")) < w(("a", "y")) && w(("a", "x")) < w(("b", "x")))
  }

  test("leadingDigitProfile: digits from integer cents, zero digits materialized, chi2 ~ 0 on exact Benford counts") {
    // 1000 events whose digit counts are EXACTLY round(1000·p_d): chi2
    // sums to ~0 (only quantization residue). Values d·10^k cents.
    val counts = Analytics.benfordPpt.map { case (d, p) =>
      d -> math.round(1000 * p).toInt }
    val rows = counts.flatMap { case (d, n) =>
      Seq.fill(n)(("e", d * 1.0)) } // value d.00 → cents d·100 → digit d
    val out = Analytics.leadingDigitProfile(rows.toDF("event_type", "value"))
      .collect()
    assert(out.length == 9)
    val chi2 = out.head.getDouble(5)
    assert(chi2 < 0.01, s"chi2 $chi2")
    // and a type with a single digit: 8 zero rows materialize
    val one = Analytics.leadingDigitProfile(
      Seq(("t", 5.0), ("t", 55.0)).toDF("event_type", "value")).collect()
    assert(one.length == 9)
    assert(one.count(_.getLong(2) == 0L) == 8)
  }

  test("quantileNormalize: small source maps onto pooled order statistics") {
    // Group g1 values 1,2 (n=2); g2 values 10,20,30,40 (n=4); N=6.
    // g1: r=1 → ceil(6/2)=3 → 3rd smallest of {1,2,10,20,30,40} = 10;
    //     r=2 → 6 → 40. g2: ranks 1..4 → ceil(6r/4) = 2,3,5,6 → 2,10,30,40.
    val df = Seq((1L, "g1", 1L), (2L, "g1", 2L), (3L, "g2", 10L),
      (4L, "g2", 20L), (5L, "g2", 30L), (6L, "g2", 40L))
      .toDF("id", "g", "v")
    val out = TextOps.quantileNormalize(df, col("id"), col("g"), col("v"))
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(out == Map(1L -> 10L, 2L -> 40L, 3L -> 2L, 4L -> 10L,
      5L -> 30L, 6L -> 40L))
  }

  test("quantileNormalize: ties share the min-rank target") {
    val df = Seq((1L, "g", 5L), (2L, "g", 5L), (3L, "g", 9L))
      .toDF("id", "g", "v")
    // within-group ranks: 5→1 (both), 9→3; N=n_g=3 → targets 1 and 3
    // → pooled 1st = 5, 3rd = 9
    val out = TextOps.quantileNormalize(df, col("id"), col("g"), col("v"))
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(out == Map(1L -> 5L, 2L -> 5L, 3L -> 9L))
  }

  test("modularity: two disjoint triangles score 1/2 as their own communities, 0 as one") {
    val e = Seq((1L, 2L), (1L, 3L), (2L, 3L),
      (10L, 11L), (10L, 12L), (11L, 12L)).toDF("ida", "idb")
    val nodes = Seq(1L, 2L, 3L, 10L, 11L, 12L)
    val split = nodes.map(n => (n, if (n < 10) 1L else 10L))
      .toDF("node", "community")
    val r1 = GraphStats.modularity(e, split).collect().head
    assert(r1.getLong(0) == 2L && r1.getDouble(2) == 0.5)
    val merged = nodes.map(n => (n, 1L)).toDF("node", "community")
    val r2 = GraphStats.modularity(e, merged).collect().head
    assert(r2.getLong(0) == 1L && r2.getDouble(2) == 0.0)
  }

  test("lDiversity: single-language class flags below l=2 even when k-large") {
    // class (s1, 0): 3 rows all lang 'en' → diverse below 2;
    // class (s2, 0): 2 rows, 2 langs → fine at 2, below 3.
    val df = Seq(("s1", 0L, "en"), ("s1", 0L, "en"), ("s1", 0L, "en"),
      ("s2", 0L, "en"), ("s2", 0L, "de")).toDF("src", "b", "lang")
    val out = Analytics.lDiversity(df, Seq(col("src"), col("b")),
        col("lang"), Seq(2, 3)).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    assert(out == Map(2L -> ((2L, 1L, 3L)), 3L -> ((2L, 2L, 5L))))
  }

  test("weightedJaccardPairs: shared boilerplate discounts below flat Jaccard") {
    // A/B/C share {x,y,z} (df 3 → weight 333333); tails w/q/r unique
    // (weight 10⁶). Flat J(A,B) = 3/5 = 0.6; weighted = 999999 /
    // (1999999·2 − 999999) = 0.333… — rare-content similarity.
    val sh = graft.dedup.Dedup.shingles(Seq(
      (1L, "x y z w"), (2L, "x y z q"), (3L, "x y z r"))
      .toDF("doc_id", "text"), n = 1)
    val out = graft.dedup.Dedup.weightedJaccardPairs(sh).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> (r.getLong(3), r.getLong(4)))
      .toMap
    assert(out.size == 3)
    assert(out((1L, 2L)) == ((600000L, 333333L)))
  }

  test("dedupBiasReport: exact-dup group weighted mean recovers the raw mean") {
    val meta = Seq((1L, "g", 10L), (2L, "g", 10L), (3L, "g", 4L))
      .toDF("doc_id", "grp", "x")
    val groups = graft.dedup.Dedup.nearDupGroups(
      Seq(1L, 2L, 3L).toDF("doc_id"), Seq((1L, 2L)).toDF("ida", "idb"))
    val r = graft.dedup.Dedup.dedupBiasReport(meta, groups).collect().head
    assert(r.getLong(1) == 3L)                 // n_raw
    assert(r.getDouble(2) == 8.0)              // mean_raw
    assert(r.getLong(3) == 2L)                 // n_kept (1 and 3)
    assert(r.getDouble(4) == 7.0)              // mean_kept (10+4)/2
    assert(r.getDouble(5) == 8.0)              // weighted == raw (exact dup)
  }

  test("cutEdges: exactly the bridge between the two LPA communities survives") {
    // Bridged cliques from the labelPropagation spec ({1,2,3} and
    // {10,11,12}): the vote keeps two communities, so the planted
    // bridge (3,10) is the one boundary edge.
    val e = Seq((1L, 2L), (1L, 3L), (2L, 3L),
      (10L, 11L), (10L, 12L), (11L, 12L), (3L, 10L)).toDF("ida", "idb")
    val mem = GraphStats.labelPropagation(e, rounds = 4)
    val cut = GraphStats.cutEdges(e, mem).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(cut == Set((3L, 10L)))
  }

  test("tokenGini: uniform counts score 0, dominated vocabulary approaches 1") {
    // s1: four tokens once each → G = 0 exactly.
    // s2: counts (1, 99), k=2: G = (2·(1·1+2·99) − 3·100)/(2·100) = 0.49
    val docs = Seq(("s1", "a b c d"),
      ("s2", ("x " * 99 + "y").trim)).toDF("source", "text")
    val out = TextOps.tokenGini(docs).collect()
      .map(r => r.getString(0) -> r.getDouble(3)).toMap
    assert(out("s1") == 0.0)
    assert(out("s2") == 0.49)
  }

  test("piiProfile: combinations counted with exact shares") {
    val docs = Seq(
      (1L, "clean text here"),
      (2L, "mail a@b.io now"),
      (3L, "mail a@b.io call 555-123-4567"),
      (4L, "host 10.0.0.1 mail a@b.io call 555-123-4567"))
      .toDF("doc_id", "text")
    val out = TextOps.piiProfile(docs).collect()
      .map(r => (r.getBoolean(0), r.getBoolean(1), r.getBoolean(2)) ->
        (r.getLong(3), r.getLong(4), r.getDouble(5))).toMap
    assert(out == Map(
      (false, false, false) -> ((0L, 1L, 0.25)),
      (true, false, false)  -> ((1L, 1L, 0.25)),
      (true, true, false)   -> ((2L, 1L, 0.25)),
      (true, true, true)    -> ((3L, 1L, 0.25))))
  }

  test("chunkDupStats: duplicate doc's chunks all collide cross-doc") {
    // Two identical 4-token docs, width 2 / stride 2 → 2 chunks each,
    // both digests shared cross-doc; one distinct doc adds 2 unique.
    val docs = Seq((1L, "a b c d"), (2L, "a b c d"), (3L, "p q r s"))
      .toDF("doc_id", "text")
    val r = Mix.chunkDupStats(docs, width = 2, stride = 2).collect().head
    assert((r.getLong(0), r.getLong(1), r.getLong(3), r.getLong(4))
      == ((6L, 4L, 2L, 4L)))
    assert(r.getDouble(2) == 0.333333 && r.getDouble(5) == 0.666667)
  }

  test("bigramCondEntropy: deterministic text reads 0, fair coin reads ln 2") {
    val docs = Seq(
      ("det", "a b a b a b a b a"),       // after a→b, after b→a: H = 0
      ("coin", "a a a b a a a b"))        // after a: {a×4, b×2}? compute below
      .toDF("source", "text")
    val out = TextOps.bigramCondEntropy(docs).collect()
      .map(r => r.getString(0) -> r.getDouble(3)).toMap
    assert(out("det") == 0.0)
    // 'a a a b a a a b': bigrams aa,aa,ab,ba,aa,aa,ab → c1(a)=6: aa×4,
    // ab×2 → H_a = (4·ln(6/4) + 2·ln(6/2))/7 ; ba×1 → 0
    val h = (4 * math.log(6.0 / 4) + 2 * math.log(3.0)) / 7
    assert(approx(out("coin"), h, 1e-5), s"got ${out("coin")} want $h")
  }

  test("shardFingerprints: replica-equal, single-doc change flips its shard and the root") {
    val a = (1L to 40L).map(i => (i, s"text number $i")).toDF("doc_id", "text")
    val b = (1L to 40L).map(i =>
      (i, if (i == 7L) "tampered" else s"text number $i")).toDF("doc_id", "text")
    val fa = Mix.shardFingerprints(a, 4).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val fb = Mix.shardFingerprints(b, 4).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val fa2 = Mix.shardFingerprints(a, 4).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(fa == fa2) // replica equality
    val diff = fa.keySet.filter(k => fa(k) != fb(k))
    assert(diff.contains(-1L) && diff.size == 2) // root + exactly one shard
    // counts unchanged — only fingerprints move
    assert(fa.view.mapValues(_._1).toMap == fb.view.mapValues(_._1).toMap)
  }

  test("fingerprintDiff: identical snapshots all-equal; one edit flags its shard and the root") {
    val a = (1L to 40L).map(i => (i, s"text number $i")).toDF("doc_id", "text")
    val same = Mix.fingerprintDiff(a, a, nShards = 4).collect()
    assert(same.forall(_.getBoolean(5)))
    val b = (1L to 40L).map(i =>
      (i, if (i == 7L) "tampered" else s"text number $i")).toDF("doc_id", "text")
    val diff = Mix.fingerprintDiff(a, b, nShards = 4).collect()
      .map(r => r.getLong(0) -> r.getBoolean(5)).toMap
    assert(diff.count(!_._2) == 2 && !diff(-1L)) // one shard + the root
  }

  test("rebalancePlan: ring moves match a driver-side reference; mod moves dominate") {
    val docs = (1L to 200L).map(i => (i, "x")).toDF("doc_id", "text")
    val r = Mix.rebalancePlan(docs, nShards = 4).collect().head
    // reference ring assignment computed independently in plain Scala
    def h60(s: String): Long = java.lang.Long.parseLong(
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString.take(15),
      16)
    def ring(n: Int, h: Long): Long = {
      val as = Mix.ringAnchors(n).sortBy(_._1)
      as.find(_._1 >= h).map(_._2).getOrElse(as.head._2)
    }
    val moved = (1L to 200L).count { i =>
      val h = h60(s"ring:$i"); ring(4, h) != ring(5, h)
    }
    assert(r.getLong(2) == moved.toLong)
    assert(r.getLong(1) > r.getLong(2)) // mod placement moves more
  }

  test("goodTuring: hand-computed singleton/doubleton profile and Chao1") {
    // tokens: a a a b b c → N=6, V=3, n1=1 (c), n2=1 (b)
    // unseen = 1/6; chao1 = 3 + 1/(2·1) = 3.5
    val docs = Seq(("s", "a a a b b c")).toDF("source", "text")
    val r = TextOps.goodTuring(docs, gramN = 1).collect().head
    assert((r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))
      == ((6L, 3L, 1L, 1L)))
    assert(r.getDouble(6) == 0.166667 && r.getDouble(7) == 3.5)
    // no doubletons → Chao1 NULL
    val r2 = TextOps.goodTuring(Seq(("s", "a b")).toDF("source", "text"))
      .collect().head
    assert(r2.isNullAt(7))
  }

  test("datasetCard: counts and rates on a hand-built corpus") {
    val docs = Seq(
      (1L, "a b c", "en", "s1", 5L),
      (2L, "a b c", "en", "s1", 5L), // exact dup of doc 1
      (3L, "d e mail@x.io", "de", "s2", 13L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val card = TextOps.datasetCard(docs).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(card("n_docs") == 3.0 && card("n_tokens") == 9.0)
    assert(card("vocab") == 6.0) // a b c d e mail@x.io
    assert(card("exact_dup_rate") == 0.333333)
    assert(card("hapax_rate") == 0.5) // d, e, mail@x.io once; a b c twice
    assert(card("top_lang_share") == 0.666667)
    assert(card("pii_doc_rate") == 0.333333)
  }

  test("w1Drift: point masses 10 apart read exactly 10; identical groups read 0") {
    val sep = Seq(("g1", 0L), ("g1", 0L), ("g2", 10L), ("g2", 10L))
      .toDF("g", "v")
    val d1 = TextOps.w1Drift(sep, col("g"), col("v")).collect()
      .map(r => r.getString(0) -> r.getDouble(2)).toMap
    assert(d1 == Map("g1" -> 10.0, "g2" -> 10.0))
    val same = Seq(("g1", 1L), ("g1", 9L), ("g2", 1L), ("g2", 9L))
      .toDF("g", "v")
    val d0 = TextOps.w1Drift(same, col("g"), col("v")).collect()
      .map(r => r.getDouble(2))
    assert(d0.forall(_ == 0.0))
  }

  test("mdeReport: hand-computed two-user MDE") {
    // User totals 0 and 10 cents: mean 5, population sd 5 →
    // mde = 2.801585·5·sqrt(2/2) = 14.007925; rel = 2.801585.
    val ev = Seq(("buy", 1L, 0.0), ("buy", 2L, 0.10))
      .toDF("event_type", "user_id", "value")
    val r = Analytics.mdeReport(ev).collect().head
    assert(r.getLong(1) == 2L)
    assert(r.getDouble(2) == 5.0 && r.getDouble(3) == 5.0)
    assert(r.getDouble(4) == 14.007925)
    assert(r.getDouble(5) == 2.801585)
  }

  test("charEntropy: hand-computed uniform entropy; repeat-char doc flags low") {
    val docs = Seq(
      (1L, "ab"),         // two chars once each → H = ln 2
      (2L, "aaaaaaaa")    // one char → H = 0 → low
    ).toDF("doc_id", "text")
    val out = TextOps.charEntropy(docs, thresholdMicro = 500000L).collect()
      .map(r => r.getLong(0) -> (r.getDouble(3), r.getBoolean(4))).toMap
    assert(approx(out(1L)._1, math.log(2.0), 1e-5) && !out(1L)._2,
      s"got ${out(1L)}")
    // single-char doc: H = 0 up to the micro-nat quantization residue
    // (μ(ln 8)·8 − μ(8·ln 8) = 4 micro → 5e-7 after the division)
    assert(approx(out(2L)._1, 0.0, 2e-6) && out(2L)._2)
  }
}
