package graft

import org.apache.spark.sql.functions._
import graft.text.{Mix, SuffixOps}

/** Specs for the suffix prefix-doubling operators (q219–q220) and
  * Neyman allocation (q221): hand-computed repeat structure on tiny
  * corpora; the driver oracles replay the full chains in DuckDB.
  */
class SuffixSpec extends SparkSpec {
  import spark.implicits._

  test("repeatSpectrum: hand-computed classes at lengths 1, 2, 4") {
    // doc1 = a b a b, doc2 = a b x (+ unique separators).
    // len 1: classes {a×3, b×3, x, sep1, sep2} → 5 classes, 6 repeated.
    // len 2: 'a b' ×3 (doc1 pos 0 and 2, doc2 pos 0); everything else
    // unique → 7 classes, 3 repeated.
    // len 4: the three 'a b …' sites diverge at token 3 (a / sep1 / x)
    // → all 9 positions unique.
    val docs = Seq((1L, "a b a b"), (2L, "a b x")).toDF("doc_id", "text")
    val out = SuffixOps.repeatSpectrum(docs, rounds = 2).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    assert(out == Map(
      1L -> ((5L, 6L, 3L)),
      2L -> ((7L, 3L, 3L)),
      4L -> ((9L, 0L, 1L))))
  }

  test("repeatCoverage: duplicate docs repeat only where the window avoids the separator") {
    // docs 1 and 2 identical (4 tokens); at window 4 (rounds=2) only
    // position 0 fits before the unique separator → coverage 1/4.
    val docs = Seq((1L, "a b c d"), (2L, "a b c d"), (3L, "z z q w"))
      .toDF("doc_id", "text")
    val out = SuffixOps.repeatCoverage(docs, rounds = 2).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toMap
    assert(out == Map(
      1L -> ((4L, 1L, 0.25)),
      2L -> ((4L, 1L, 0.25)),
      3L -> ((4L, 0L, 0.0))))
  }

  test("neymanAllocation: zero-variance stratum gets zero draws") {
    val df = Seq(("g1", 0L), ("g1", 0L), ("g1", 10L), ("g1", 10L),
      ("g2", 5L), ("g2", 5L), ("g2", 5L), ("g2", 5L))
      .toDF("g", "v")
    val out = Mix.neymanAllocation(df, col("g"), col("v"), total = 100L)
      .collect()
      .map(r => r.getString(0) -> (r.getDouble(2), r.getDouble(3),
        r.getLong(4))).toMap
    assert(out("g1") == ((5.0, 5.0, 100L)))
    assert(out("g2") == ((5.0, 0.0, 0L)))
  }
}
