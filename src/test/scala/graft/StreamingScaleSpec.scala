package graft

import org.apache.spark.sql.functions._

/** The STREAMING twin of DedupScaleSpec's batch gate: ~100k documents
  * with planted structure driven through the real
  * `Streaming.nearDupStream` operator via MemoryStream, at a scale
  * where unbounded state or a quadratic bucket would be a wall-clock
  * failure, not a rounding error. The corpus mixes the three regimes
  * the operator's two state bounds exist for:
  *
  *  - 2,000 near-dup FAMILIES × 5 members (shared 30-token base, last
  *    token member-unique → pairwise Jaccard ≈ 25/31): every
  *    co-bucketed member pair must be emitted regardless of which
  *    micro-batch each member arrived in (state carries the bucket
  *    history across batches);
  *  - 90,000 unique background docs (tokens drawn per-doc from a ~1M
  *    vocabulary): singleton buckets, must emit ZERO background-only
  *    pairs — false candidate mass at this scale would swamp any
  *    downstream verifier;
  *  - one DEGENERATE boilerplate block of 500 byte-identical docs
  *    (the streaming analogue of the batch df-cap's target): all four
  *    bands collapse to one bucket each, and the `maxBucket` cap must
  *    hold emitted pairs to ≤ maxBucket·(maxBucket−1)/2 per band and
  *    stop state growth — not emit the ~125k quadratic pairs.
  *
  * Wall-clock and throughput print to stderr for PERF.md.
  */
@org.scalatest.tags.Slow
class StreamingScaleSpec extends SparkSpec {

  private val nFamilies = 2000
  private val famSize = 5
  private val nBackground = 90000
  private val nBoiler = 500
  private val maxBucket = 64

  // deterministic token draw — splitmix-style avalanche over (seed, i)
  private def mix(seed: Long, i: Long): Long = {
    var z = seed + i * 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }
  private def toks(seed: Long, n: Int, vocab: Long): Seq[String] =
    (0 until n).map(i => "w" + java.lang.Long.toUnsignedString(
      java.lang.Math.floorMod(mix(seed, i), vocab)))

  test("100k-doc nearDupStream: families pair across batches, background stays silent, boilerplate bucket caps") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.streaming.Streaming
    import spark.implicits._
    implicit val sc: org.apache.spark.sql.SQLContext = spark.sqlContext

    val t0 = java.sql.Timestamp.valueOf("2026-01-01 10:00:00")
    def ts(i: Int) = new java.sql.Timestamp(t0.getTime + (i / 100L) * 1000L)

    // id layout: [0, 90k) background; [90k, 100k) families (5 apart);
    // [200k, 200k + 500) boilerplate
    val bg = (0 until nBackground).map { d =>
      Streaming.Doc(d.toLong, ts(d),
        toks(0xB06L * 1000003L + d, 30, 1000000L).mkString(" "))
    }
    val fams = (0 until nFamilies).flatMap { f =>
      val base = toks(0xFA31L * 7919L + f, 30, 1000000L)
      (0 until famSize).map { m =>
        val id = nBackground.toLong + f * famSize + m
        // member-unique last token: 27 of 28 + 3 member-only shingles
        // → J ≈ 25/31 ≈ 0.81, band hit p ≈ 1 − (1 − 0.81²)⁴ ≈ 0.98
        Streaming.Doc(id, ts(id.toInt),
          (base.init :+ s"m$m").mkString(" "))
      }
    }
    val boilerText = toks(0xB01L, 30, 1000000L).mkString(" ")
    val boiler = (0 until nBoiler).map { b =>
      Streaming.Doc(200000L + b, ts(100000 + b), boilerText)
    }

    // docs deliberately SPREAD across micro-batches by doc_id mod 3
    // (family ids are 5 apart, so members land in different batches for
    // ~⅔ of pairs): most member pairs cross a batch boundary, so the
    // recall assertion exercises state carry, not within-batch pairing.
    // 3 batches, not one per member — each micro-batch pays a full
    // state-store maintenance pass over every live bucket (~370k), and
    // 5 passes measured 333 s for the same coverage.
    val all = fams ++ bg ++ boiler
    val batches: Seq[Seq[Streaming.Doc]] =
      (0 until 3).map(m => all.filter(_.doc_id % 3 == m))

    val input = MemoryStream[Streaming.Doc]
    val q = Streaming.nearDupStream(input.toDS(), maxBucket = maxBucket)
      .writeStream.format("memory").queryName("neardup_scale")
      .outputMode("append").start()
    val wall0 = System.nanoTime()
    batches.foreach { b => input.addData(b); q.processAllAvailable() }
    val wallS = (System.nanoTime() - wall0) / 1e9
    val nDocs = batches.map(_.size).sum
    System.err.println(
      f"STREAMSCALE nearDupStream 100k: $wallS%8.1f s (${nDocs / wallS}%.0f docs/s)")

    val pairs = spark.table("neardup_scale")
      .select("ida", "idb").distinct().cache()

    // (1) family recall across batches: of the 2000·C(5,2) = 20,000
    // true member pairs, ≥ 95% must surface (per-pair LSH hit
    // probability ≈ 0.98 over 4 bands at J ≈ 0.81)
    val famPairs = pairs.filter(
      col("ida") >= nBackground && col("ida") < 200000L &&
      col("idb") >= nBackground && col("idb") < 200000L &&
      expr(s"(ida - $nBackground) div $famSize") ===
        expr(s"(idb - $nBackground) div $famSize")).count()
    val truePairs = nFamilies.toLong * (famSize * (famSize - 1) / 2)
    assert(famPairs >= (truePairs * 0.95).toLong,
      s"family pair recall ${famPairs.toDouble / truePairs} below 0.95")

    // (2) unique background must stay silent — zero bg-bg candidates
    val bgPairs = pairs.filter(
      col("ida") < nBackground && col("idb") < nBackground).count()
    assert(bgPairs === 0L, s"$bgPairs false background pairs emitted")

    // (3) the 500-doc boilerplate bucket caps at maxBucket members:
    // ≤ 64·63/2 = 2016 distinct pairs, not C(500,2) = 124,750 — and no
    // boilerplate doc pairs outside its block
    val boilPairs = pairs.filter(col("ida") >= 200000L).count()
    val capPairs = maxBucket.toLong * (maxBucket - 1) / 2
    assert(boilPairs <= capPairs,
      s"boilerplate bucket emitted $boilPairs pairs > cap $capPairs — maxBucket not enforced")
    assert(boilPairs >= (maxBucket.toLong / 2) * (maxBucket / 2 - 1) / 2,
      s"boilerplate emitted only $boilPairs pairs — cap applied too early")
    val crossBoil = pairs.filter(
      col("ida") < 200000L && col("idb") >= 200000L).count()
    assert(crossBoil === 0L, s"$crossBoil boilerplate-to-corpus pairs")

    // (4) state is bounded by live buckets, not by emitted pairs: the
    // final progress reports per-bucket member lists capped at
    // maxBucket (the boilerplate bucket holds 64, not 500)
    val stateRows = Option(q.lastProgress)
      .map(_.stateOperators.apply(0).numRowsTotal).getOrElse(-1L)
    assert(stateRows > 0L, "no state operator progress recorded")
    System.err.println(s"STREAMSCALE state rows (live buckets): $stateRows")
    pairs.unpersist()
    q.stop()
  }
}
