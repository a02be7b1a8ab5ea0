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

  test("repeatAtLengths: non-power length 3 via the two-window decomposition") {
    // Two identical 4-token docs: length-3 windows 'a b c' and 'b c d'
    // each repeat across the pair; every window touching a separator
    // (unique per doc) is a singleton. 10 positions → 8 classes,
    // 4 repeated positions, max class 2.
    val docs = Seq((1L, "a b c d"), (2L, "a b c d")).toDF("doc_id", "text")
    val out = SuffixOps.repeatAtLengths(docs, Seq(3)).collect().head
    assert((out.getLong(0), out.getLong(1), out.getLong(2),
      out.getLong(3)) == ((3L, 8L, 4L, 2L)))
  }

  test("mutualTopPairs: isolated matches found, crowd asymmetry rejected, dup pair NULL margin") {
    // (1,2) isolated mutual pair at distance 1; (3,4) mutual at 1.5;
    // (5,6) exact duplicates → mutual with NULL margin.
    val vecs = Seq(
      (1L, Seq(0.0, 0.0)), (2L, Seq(0.0, 1.0)),
      (3L, Seq(30.0, 0.0)), (4L, Seq(30.0, 1.5)),
      (5L, Seq(60.0, 60.0)), (6L, Seq(60.0, 60.0)))
      .toDF("cell_id", "latent")
    val out = graft.pipeline.Knn.mutualTopPairs(vecs, k = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        (if (r.isNullAt(5)) None else Some(r.getLong(5)))).toMap
    assert(out.keySet == Set((1L, 2L), (3L, 4L), (5L, 6L)))
    assert(out((5L, 6L)).isEmpty)           // zero-distance → NULL margin
    assert(out((1L, 2L)).exists(_ > 1000000L)) // isolated → margin > 1
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
