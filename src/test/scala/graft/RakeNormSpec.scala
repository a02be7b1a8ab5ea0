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
