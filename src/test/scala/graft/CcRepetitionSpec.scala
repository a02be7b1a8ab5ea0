package graft

import org.apache.spark.sql.functions._
import graft.dedup.Dedup
import graft.graph.ConnectedComponents
import graft.text.TextOps

class CcRepetitionSpec extends SparkSpec {
  import spark.implicits._

  test("connected components: chains, cliques and singles get min-id labels") {
    // components: {1,2,3,4} (chain), {10,11,12} (triangle), {20,21}
    val edges = Seq((2L, 1L), (2L, 3L), (4L, 3L), (10L, 11L), (11L, 12L),
      (10L, 12L), (21L, 20L)).toDF("src", "dst")
    val lbl = ConnectedComponents.labels(edges)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(lbl == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L, 12L -> 10L, 20L -> 20L, 21L -> 20L))
  }

  test("connected components: a long path converges within the round bound") {
    // path 0-1-2-...-99: diameter 99, but large/small-star needs O(log n)
    val edges = (0L until 99L).map(i => (i, i + 1)).toDF("src", "dst")
    val lbl = ConnectedComponents.labels(edges)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(lbl.size == 100 && lbl.values.forall(_ == 0L))
  }

  test("connected components: random graphs match a union-find reference") {
    val rnd = new scala.util.Random(11)
    (0 until 3).foreach { trial =>
      val n = 300
      val edges = (0 until 400).map { _ =>
        (rnd.nextInt(n).toLong, rnd.nextInt(n).toLong)
      }.filter { case (a, b) => a != b }
      // driver-side union-find ground truth
      val parent = Array.tabulate(n)(identity)
      def find(x: Int): Int = { var r = x; while (parent(r) != r) r = parent(r); r }
      edges.foreach { case (a, b) =>
        val (ra, rb) = (find(a.toInt), find(b.toInt))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      val want = edges.flatMap(e => Seq(e._1, e._2)).distinct
        .map(v => v -> {
          // component label = min node id reachable; chase to the root,
          // which union-by-min makes the minimum
          find(v.toInt).toLong
        }).toMap
      val got = ConnectedComponents.labels(edges.toDF("src", "dst"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == want, s"trial $trial")
    }
  }

  test("lshCandidatePairs bucketCap drops a degenerate bucket, keeps real pairs") {
    // 30 identical docs → every band bucket holds all 30 (435 pairs
    // uncapped); plus one genuine near-dup pair with distinct content
    val docs = ((0 until 30).map(i => (i.toLong, "all the same boilerplate text here")) ++
      Seq((100L, "a genuinely unique document about spark engines"),
        (101L, "a genuinely unique document about spark engines tweaked")))
      .toDF("doc_id", "text")
    val sig = Dedup.minHashSignature(Dedup.shingles(docs, 3), 8)
    val uncapped = Dedup.lshCandidatePairs(sig, 8, 2, bucketCap = 10000)
    assert(uncapped.filter(col("ida") < 30 && col("idb") < 30).count() == 435)
    val capped = Dedup.lshCandidatePairs(sig, 8, 2, bucketCap = 10)
    // degenerate bucket gone, the real near-dup pair survives
    assert(capped.filter(col("ida") < 30).count() == 0)
    assert(capped.filter(col("ida") === 100 && col("idb") === 101).count() == 1)
  }

  test("nearDupGroups: transitive closure + keep-one over the universe") {
    // pairs A~B, B~C (A~C never emitted) plus an untouched singleton D
    val universe = Seq(1L, 2L, 3L, 9L).toDF("doc_id")
    val pairs = Seq((1L, 2L), (2L, 3L)).toDF("ida", "idb")
    val out = Dedup.nearDupGroups(universe, pairs)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(3)))
      .sortBy(_._1)
    assert(out.toSeq == Seq((1L, 1L, 3L, true), (2L, 1L, 3L, false),
      (3L, 1L, 3L, false), (9L, 9L, 1L, true)))
  }

  test("nearDupGroups: keep-one survives a component min outside the universe") {
    // pairs span a broader corpus (doc 3 exists only there); the group id
    // must re-base to the universe minimum so exactly one doc keeps
    val universe = Seq(5L, 6L).toDF("doc_id")
    val pairs = Seq((3L, 5L), (5L, 6L)).toDF("ida", "idb")
    val out = Dedup.nearDupGroups(universe, pairs)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(3)))
      .sortBy(_._1)
    assert(out.toSeq == Seq((5L, 5L, 2L, true), (6L, 5L, 2L, false)))
  }

  test("stratifiedSample: deterministic, per-stratum, and near the asked fraction") {
    val docs = (0L until 2000L).map(i => (i, if (i % 2 == 0) "en" else "zh"))
      .toDF("doc_id", "lang")
    val fr = Map("en" -> 0.5, "zh" -> 0.0)
    val a = graft.text.Mix.stratifiedSample(docs, col("lang"), fr, seed = 7)
      .select("doc_id").as[Long].collect().sorted
    val b = graft.text.Mix.stratifiedSample(docs, col("lang"), fr, seed = 7)
      .select("doc_id").as[Long].collect().sorted
    assert(a.sameElements(b)) // replay-identical
    assert(a.forall(_ % 2 == 0)) // zh fraction 0 drops everything odd
    assert(math.abs(a.length - 500) < 80) // ~0.5 of the 1000 en docs
    // p = 1 keeps every row; unknown stratum drops
    val all = graft.text.Mix.stratifiedSample(docs, col("lang"),
      Map("en" -> 1.0), seed = 7).count()
    assert(all == 1000)
  }

  test("packChunks: offsets are the exclusive running total; straddlers flagged") {
    val docs = Seq((1L, "a b c"), (2L, "d e"), (3L, "f g h i")).toDF("doc_id", "text")
    val out = graft.text.Mix.packChunks(docs, budget = 4).orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getBoolean(5)))
    // tokens: 3, 2, 4 → starts 0, 3, 5; budget 4 chunks: [0,3] / [3,4] / [5,8]
    assert(out(0) == ((1L, 3L, 0L, 0L, 0L, false)))
    assert(out(1) == ((2L, 2L, 3L, 0L, 1L, true)))
    assert(out(2) == ((3L, 4L, 5L, 1L, 2L, true)))
  }

  test("decontaminate: planted copy flagged; df-capped shingle carries no signal") {
    val ev = Seq((100L, "alpha beta gamma delta")).toDF("doc_id", "text")
    val tr = Seq(
      (1L, "alpha beta gamma delta junk"), // contains the eval 4-gram
      (2L, "totally unrelated words here entirely"),
      (3L, "alpha beta something else again")).toDF("doc_id", "text")
    val out = Dedup.decontaminate(tr, ev, n = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(out.toSeq == Seq((1L, 1L, 1L)))
    // with dfCap 1 the shared 4-gram appears in 2 train docs? no — df is 1;
    // plant a second carrier so df = 2 > cap and the signal is suppressed
    val tr2 = tr.unionByName(Seq((4L, "alpha beta gamma delta junk2"))
      .toDF("doc_id", "text"))
    assert(Dedup.decontaminate(tr2, ev, n = 4, dfCap = 1).count() == 0)
  }

  test("prepareCorpus: each stage drops its case; survivors pack in id order") {
    val good1 = "the quick brown fox jumps over a lazy dog while many other animals" +
      " watch from nearby hills during sunset hours" // 20 distinct tokens, has stopwords
    val good2 = "a research engine processes tables with joins filters windows and" +
      " the aggregations needed for large scale statistical work today ok" // 20 tokens
    val docs = Seq(
      (1L, good1, "en"),
      (10L, good1, "en"), // exact dup of 1 → dedup drop (min id kept)
      (3L, Seq.fill(30)("spam").mkString(" "), "en"), // repetitive → drop
      (4L, "tiny doc", "en"), // < 20 tokens → quality drop
      (5L, good2, "en"),
      (6L, good2 + " extra", "zh") // stratum fraction 0 → sampling drop
    ).toDF("doc_id", "text", "lang")
    val out = graft.text.Mix.prepareCorpus(docs, Seq("the", "a"),
        Map("en" -> 1.0, "zh" -> 0.0), seed = 7, budget = 20)
      .orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getBoolean(5)))
    assert(out.map(_._1).toSeq == Seq(1L, 5L))
    assert(out(0) == ((1L, 20L, 0L, 0L, 0L, false)))  // exactly fills chunk 0
    assert(out(1) == ((5L, 20L, 20L, 1L, 1L, false))) // starts chunk 1 cleanly
  }

  test("dsirWeights: target-like docs outrank off-target; top-share cut is exact") {
    import graft.text.Mix
    // target = docs 1-4 (share the "alpha beta" bigram family); raw
    // background = docs 5-10 (disjoint bigrams). An unlabeled doc made
    // of TARGET bigrams (doc 11) must outweigh one made of background
    // bigrams (doc 12): its buckets carry high target counts.
    val docs = (
      (1 to 4).map(i => (i.toLong, "en", "alpha beta alpha beta gamma")) ++
      (5 to 10).map(i => (i.toLong, "xx", s"noise$i filler$i junk$i more$i")) ++
      Seq((11L, "xx", "alpha beta gamma"), (12L, "xx", "noise5 filler5 junk5"))
    ).toDF("doc_id", "lang", "text")
    val out = Mix.dsirWeights(docs, col("lang") === "en", 1, 4)
      .collect().map(r => r.getLong(0) -> (r.getLong(2), r.getBoolean(3))).toMap
    assert(out(11L)._1 > out(12L)._1,
      s"target-like doc 11 (${out(11L)._1}) must outweigh background doc 12 (${out(12L)._1})")
    // top-1/4 of 12 docs = exactly 3 selected
    assert(out.values.count(_._2) === 3)
    // the selected set is the 3 highest weights (doc_id tie-break)
    val byW = out.toSeq.sortBy { case (id, (w, _)) => (-w, id) }.map(_._1)
    assert(byW.take(3).forall(id => out(id)._2))
  }

  test("bandKeysOf: the Scala twin reproduces the lshBandKeys expression exactly") {
    import graft.streaming.Streaming
    // edge cases on purpose: duplicate shingles, multi-space runs,
    // leading/trailing whitespace (Spark's split keeps trailing
    // empties), exactly-n tokens, sub-n tokens (NULL band keys), empty
    val texts = Seq(
      "the quick brown fox jumps over the lazy dog again and again today",
      "a a a a a a a a",
      "  leading and trailing  spaces  here   ",
      "one two three",
      "one two",
      "",
      "x y z x y z x y z")
    for ((t, id) <- texts.zipWithIndex;
         (n, h, rpb) <- Seq((3, 8, 2), (2, 4, 2), (3, 6, 3))) {
      val viaExpr = Seq((id.toLong, t)).toDF("doc_id", "text")
        .select(explode(Streaming.lshBandKeys(n, h, rpb)).as("b"))
        .select(col("b.band_id"), col("b.band_key"))
        .collect()
        .collect { case r if !r.isNullAt(1) => (r.getInt(0), r.getString(1)) }
        .toSet
      val viaScala = Streaming.bandKeysOf(t, n, h, rpb)
        .zipWithIndex.map { case (k, b) => (b, k) }.toSet
      assert(viaScala == viaExpr,
        s"divergence on text '$t' (n=$n, h=$h, rpb=$rpb)")
    }
  }

  test("nearDupStream: near-identical docs pair across batches; unrelated stay apart") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.streaming.Streaming
    implicit val sc: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[Streaming.Doc]
    val q = Streaming.nearDupStream(input.toDS())
      .writeStream.format("memory").queryName("neardup_out")
      .outputMode("append").start()
    val t0 = java.sql.Timestamp.valueOf("2026-01-01 10:00:00")
    def ts(m: Int) = new java.sql.Timestamp(t0.getTime + m * 60000L)
    val base = "the quick brown fox jumps over the lazy dog again and again today"
    input.addData(
      Streaming.Doc(1L, ts(0), base),
      Streaming.Doc(3L, ts(1), "completely different words about query engines and shuffles"))
    q.processAllAvailable()
    input.addData(Streaming.Doc(2L, ts(2), base + " extra")) // near-dup, later batch
    // two unrelated SHORT docs (no 3-gram): NULL band keys must be
    // dropped, not collide into one shared bucket
    input.addData(Streaming.Doc(7L, ts(3), "hi there"),
      Streaming.Doc(8L, ts(4), "buy now"))
    q.processAllAvailable()
    val pairs = spark.sql("SELECT DISTINCT ida, idb FROM neardup_out").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    q.stop()
    assert(pairs.contains((1L, 2L)))
    assert(!pairs.exists { case (a, b) => a == 3L || b == 3L })
    assert(!pairs.contains((7L, 8L)))
  }

  test("nearDupStream: idle buckets expire past the watermark; history is forgotten") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.streaming.Streaming
    implicit val sc: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[Streaming.Doc]
    val q = Streaming.nearDupStream(input.toDS(), idleness = "10 minutes")
      .writeStream.format("memory").queryName("neardup_exp")
      .outputMode("append").start()
    val t0 = java.sql.Timestamp.valueOf("2026-01-01 10:00:00")
    def ts(m: Int) = new java.sql.Timestamp(t0.getTime + m * 60000L)
    val base = "the quick brown fox jumps over the lazy dog again and again today"
    input.addData(Streaming.Doc(1L, ts(0), base))
    q.processAllAvailable()
    // unrelated late traffic pushes the watermark far past doc 1 + idleness
    input.addData(Streaming.Doc(9L, ts(60), "completely different words about engines"))
    q.processAllAvailable()
    // doc 1's buckets have expired: its near-dup arriving now finds no history
    input.addData(Streaming.Doc(2L, ts(61), base + " extra"))
    q.processAllAvailable()
    val pairs = spark.sql("SELECT DISTINCT ida, idb FROM neardup_exp").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    q.stop()
    assert(!pairs.contains((1L, 2L)))
  }

  test("lmPerplexity: corpus-frequent bigrams score fluent; rare ones score high") {
    val docs = Seq(
      (1L, "alpha beta alpha beta alpha beta"),
      (2L, "alpha beta alpha beta gamma"),
      (3L, "zeta omega kappa")).toDF("doc_id", "text")
    val out = TextOps.lmPerplexity(docs).orderBy("doc_id").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(out(1L)._1 == 5 && out(3L)._1 == 2)
    // "alpha beta" dominates the corpus → doc 1 fluent, doc 3 surprising
    assert(out(1L)._2 < out(3L)._2)
  }

  test("lmPerplexityTrigram: longer context separates what bigrams cannot") {
    // by construction D1 and D2 have near-identical BIGRAM statistics
    // (same bigram multiset {pq/sq, qr, rs}, all corpus-frequent) but D2
    // contains the unseen trigram "r s q" — only the trigram model can
    // tell them apart
    val docs = ((1L to 10L).map(i => (i, "p q r s"))
      ++ (11L to 20L).map(i => (i, "s q r p"))
      ++ Seq((101L, "p q r s"), (102L, "r s q r"))).toDF("doc_id", "text")
    def nll(df: org.apache.spark.sql.DataFrame, id: Long) =
      df.filter(col("doc_id") === id).select("mean_nll").head().getDouble(0)
    val big = TextOps.lmPerplexity(docs)
    val tri = TextOps.lmPerplexityTrigram(docs)
    val bigSep = math.abs(nll(big, 102L) - nll(big, 101L))
    val triSep = nll(tri, 102L) - nll(tri, 101L)
    assert(bigSep < 0.05, s"bigram should be nearly blind here, sep=$bigSep")
    assert(triSep > 0.2, s"trigram must flag the unseen trigram, sep=$triSep")
    assert(triSep > 5 * bigSep)
  }

  test("lmPerplexityTrigram: repeated boilerplate scores more fluent than under the bigram") {
    val docs = ((1L to 20L).map(i => (i, "the cat sat on the mat"))
      ++ Seq((21L, "zyx wvu tsr qpo nml kji"))).toDF("doc_id", "text")
    def nll(df: org.apache.spark.sql.DataFrame, id: Long) =
      df.filter(col("doc_id") === id).select("mean_nll").head().getDouble(0)
    val big = TextOps.lmPerplexity(docs)
    val tri = TextOps.lmPerplexityTrigram(docs)
    // seen trigrams are near-deterministic → boilerplate drops; the
    // all-novel doc rises: the trigram gate keeps a different set
    assert(nll(tri, 1L) < nll(big, 1L))
    assert(nll(tri, 21L) > nll(big, 21L))
    assert(nll(tri, 21L) > nll(tri, 1L) + 1.0)
  }

  test("lmPerplexityKn: continuation counts fix the San-Francisco effect") {
    // "francisco" and "the" are equally frequent (10 each) and both test
    // bigrams are singletons after the same novel context, so the add-α
    // model scores them IDENTICALLY. KN backs off to how many distinct
    // contexts each word follows — francisco follows only {san, new},
    // "the" follows 11 — and penalizes the single-context word hard.
    val docs = ((1L to 10L).map(i => (i, "san francisco"))
      ++ (11L to 20L).map(i => (i, s"ctx$i the"))
      ++ Seq((101L, "new francisco"), (102L, "new the"))).toDF("doc_id", "text")
    def nll(df: org.apache.spark.sql.DataFrame, id: Long) =
      df.filter(col("doc_id") === id).select("mean_nll").head().getDouble(0)
    val addA = TextOps.lmPerplexity(docs)
    val kn = TextOps.lmPerplexityKn(docs)
    assert(math.abs(nll(addA, 101L) - nll(addA, 102L)) < 1e-9,
      "add-alpha should be exactly blind here")
    val knSep = nll(kn, 101L) - nll(kn, 102L)
    assert(knSep > 0.5, s"KN must penalize the single-context word, sep=$knSep")
  }

  test("lmPerplexity5: 5-gram context separates what trigrams cannot") {
    // D1 "a b c d z" copies the corpus; D2 "a b c d e" has corpus-
    // frequent trigrams (abc/bcd/cde) AND 4-grams (abcd from the X docs,
    // bcde from the Y docs) but its 5-gram abcde occurs nowhere else —
    // only the 5-gram model can flag it
    val docs = ((1L to 10L).map(i => (i, "a b c d z"))
      ++ (11L to 20L).map(i => (i, "b c d e z"))
      ++ Seq((101L, "a b c d z"), (102L, "a b c d e"))).toDF("doc_id", "text")
    def nll(df: org.apache.spark.sql.DataFrame, id: Long) =
      df.filter(col("doc_id") === id).select("mean_nll").head().getDouble(0)
    val tri = TextOps.lmPerplexityTrigram(docs)
    val five = TextOps.lmPerplexity5(docs)
    val triSep = math.abs(nll(tri, 102L) - nll(tri, 101L))
    val fiveSep = nll(five, 102L) - nll(five, 101L)
    assert(triSep < 0.05, s"trigram should be nearly blind here, sep=$triSep")
    assert(fiveSep > 0.2, s"5-gram must flag the unseen 5-gram, sep=$fiveSep")
    assert(fiveSep > 5 * triSep)
  }

  test("lmPerplexity5: boilerplate scores yet more fluent than under the trigram") {
    val docs = ((1L to 20L).map(i => (i, "the cat sat on the mat again"))
      ++ Seq((21L, "zyx wvu tsr qpo nml kji hgf"))).toDF("doc_id", "text")
    def nll(df: org.apache.spark.sql.DataFrame, id: Long) =
      df.filter(col("doc_id") === id).select("mean_nll").head().getDouble(0)
    val tri = TextOps.lmPerplexityTrigram(docs)
    val five = TextOps.lmPerplexity5(docs)
    // a fully-seen 5-gram context is near-deterministic: boilerplate
    // drops below even its trigram score, and the all-novel doc stays
    // clearly separated — the higher order sharpens the gate further
    assert(nll(five, 1L) < nll(tri, 1L))
    assert(nll(five, 21L) > nll(five, 1L) + 1.0)
  }

  test("repetitionStats: degenerate repetition spikes the signals; diverse text keeps") {
    val docs = Seq(
      (1L, "spam spam spam spam spam spam"),          // one bigram repeated
      (2L, "the quick brown fox jumps over a dog"),   // all n-grams unique
      (3L, "ab")                                      // < 2 tokens: no grams
    ).toDF("doc_id", "text")
    val out = TextOps.repetitionStats(docs).orderBy("doc_id").collect()
    val spamTop2 = out(0).getAs[Double]("top_frac_2")
    val spamDup3 = out(0).getAs[Double]("dup_frac_3")
    assert(spamTop2 == 1.0 && spamDup3 == 0.75) // 4 trigram occs, 1 distinct
    assert(!out(0).getAs[Boolean]("keep"))
    assert(out(1).getAs[Double]("dup_frac_2") == 0.0)
    assert(out(1).getAs[Boolean]("keep"))
    // short doc: zero-filled, keeps
    assert(out(2).getAs[Double]("top_frac_2") == 0.0)
    assert(out(2).getAs[Boolean]("keep"))
  }
}
