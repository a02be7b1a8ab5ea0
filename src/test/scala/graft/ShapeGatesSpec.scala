package graft

import graft.analytics.Analytics
import graft.text.TextOps

/** Specs for the round-6 distribution-shape gates (q210–q212):
  * hour-of-day seasonality, Heaps' law vocabulary-growth fit, and the
  * Flesch readability report. The driver's DuckDB oracles check the
  * full-corpus values; these pin the formulas on hand-computed inputs.
  */
class ShapeGatesSpec extends SparkSpec {
  import spark.implicits._

  test("hourProfile: integer hour bucketing, shares sum per type, peak flag") {
    // view: two events in hour 0, one in hour 1; click: one in hour 23.
    val h = 3600000000000L // ns per hour
    val ev = Seq(
      ("view", 0L), ("view", h - 1L), ("view", h),
      ("click", 23L * h + 42L))
      .toDF("event_type", "ts_ns")
    val out = Analytics.hourProfile(ev).collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        (r.getLong(2), r.getDouble(3), r.getBoolean(4))).toMap
    assert(out == Map(
      ("view", 0L)   -> ((2L, 0.666667, true)),
      ("view", 1L)   -> ((1L, 0.333333, false)),
      ("click", 23L) -> ((1L, 1.0, true))))
  }

  test("heapsFit: one-new-type-per-doc corpus fits beta = 1 exactly") {
    // Doc i contributes exactly one token, unique to it: V(n) = n and
    // tokens(n) = n at every prefix → ln V = ln n pointwise → slope 1.
    val docs = (1L to 16L).map(i => (i, s"tok$i")).toDF("doc_id", "text")
    val r = TextOps.heapsFit(docs, nPrefixes = 8, gramN = 1).collect().head
    assert(r.getAs[Long]("n_points") == 8L)
    assert(r.getAs[Long]("n_tokens") == 16L)
    assert(r.getAs[Long]("vocab") == 16L)
    assert(r.getAs[Double]("beta") == 1.0)
    assert(r.getAs[Double]("ln_k") == 0.0)
  }

  test("heapsFit: constant-vocabulary corpus fits beta = 0") {
    // Every doc repeats the same two tokens: V(n) = 2 at every prefix
    // → y constant → slope exactly 0, ln_k = ln 2.
    val docs = (1L to 16L).map(i => (i, "a b")).toDF("doc_id", "text")
    val r = TextOps.heapsFit(docs, nPrefixes = 8, gramN = 1).collect().head
    assert(r.getAs[Long]("vocab") == 2L)
    assert(r.getAs[Double]("beta") == 0.0)
    assert(approx(r.getAs[Double]("ln_k"), math.log(2.0), 1e-6))
  }

  test("readability: hand-computed Flesch; sentence count floors at 1") {
    // "Hello world. It works!" → 4 words, 2 terminator runs,
    // vowel groups: e,o | o | i | o → 5 syllables.
    // flesch = 206.835 − 1.015·2 − 84.6·1.25 = 99.055
    val docs = Seq(
      ("s1", "Hello world. It works!"),
      ("s2", "no terminator here")) // 3 words, 0 runs → floor 1 sentence
      .toDF("source", "text")
    val out = TextOps.readability(docs).collect()
      .map(r => r.getString(0) ->
        (r.getLong(2), r.getLong(3), r.getLong(4),
          r.getAs[Double]("flesch"))).toMap
    assert(out("s1")._1 == 4L && out("s1")._2 == 2L && out("s1")._3 == 5L)
    assert(approx(out("s1")._4, 99.055))
    assert(out("s2")._2 == 1L) // floored
  }
}
