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

  // GRAFT_SCALE_MULT scales the corpus for one-off slope measurements
  // (PERF.md scale rows); the boilerplate block stays fixed — its cap
  // geometry is the thing under test, not a function of corpus size
  private val mult = sys.env.getOrElse("GRAFT_SCALE_MULT", "1").toInt

  // Streaming STATE partitions = shuffle partitions at query start, and
  // the shared test session pins 4 — at mult=4 that squeezed ~1.37M live
  // LSH buckets through 4 state partitions on every micro-batch's
  // maintenance pass (measured 3.03x/doubling at the r12 4x gate, the
  // same fixed-partition regime DedupScaleSpec hit at 2x in r11). Scale
  // with the corpus; restored after the suite. Shared-session override —
  // sound only under sequential suite execution.
  private var savedPartitions: String = _
  override def beforeAll(): Unit = {
    super.beforeAll()
    savedPartitions = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", (4 * mult).toString)
  }
  override def afterAll(): Unit = {
    spark.conf.set("spark.sql.shuffle.partitions", savedPartitions)
    super.afterAll()
  }

  private val nFamilies = 2000 * mult
  private val famSize = 5
  private val nBackground = 90000 * mult
  private val nBoiler = 500
  private val maxBucket = 64
  // first id of the boilerplate block — strictly above every family id
  private val boilerBase = 2L * (nBackground + nFamilies * famSize)

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
      Streaming.Doc(boilerBase + b, ts(nBackground + nFamilies * famSize + b), boilerText)
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
      col("ida") >= nBackground && col("ida") < boilerBase &&
      col("idb") >= nBackground && col("idb") < boilerBase &&
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
    val boilPairs = pairs.filter(col("ida") >= boilerBase).count()
    val capPairs = maxBucket.toLong * (maxBucket - 1) / 2
    assert(boilPairs <= capPairs,
      s"boilerplate bucket emitted $boilPairs pairs > cap $capPairs — maxBucket not enforced")
    assert(boilPairs >= (maxBucket.toLong / 2) * (maxBucket / 2 - 1) / 2,
      s"boilerplate emitted only $boilPairs pairs — cap applied too early")
    val crossBoil = pairs.filter(
      col("ida") < boilerBase && col("idb") >= boilerBase).count()
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

  /** The O(users)-state close-out for the two per-user keyed operators:
    * 100k users, 6 events each, spread over 3 micro-batches so every
    * user's state carries across batch boundaries — the cross-batch
    * annotation (asof) and the monotone step advance (funnel) are the
    * behaviors a within-batch test cannot see. State must end at
    * exactly one row per user for each operator (the O(users) bound —
    * 600k events, 100k state rows), and the emitted rows must match the
    * per-user closed-form expectation in aggregate.
    */
  test("100k-user asofStream + funnelStream: state is one row per user, cross-batch semantics hold") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.streaming.Streaming
    import spark.implicits._
    implicit val sc: org.apache.spark.sql.SQLContext = spark.sqlContext

    val nUsers = 100000 * mult
    def ev(id: Long, ms: Long, u: Long, t: String, v: Double) =
      Streaming.Event(id, new java.sql.Timestamp(ms), u, t, v)
    // per user: b1 = view@50, purchase@100(v=u); b2 = click@120,
    // view@200; b3 = purchase@150(v=u+0.5, out-of-order but beats the
    // @100 state), view@300
    val b1 = (0 until nUsers).flatMap { u =>
      Seq(ev(u * 10L + 1, 50L, u, "view", 0.0),
        ev(u * 10L + 2, 100L, u, "purchase", u.toDouble))
    }
    val b2 = (0 until nUsers).flatMap { u =>
      Seq(ev(u * 10L + 3, 120L, u, "click", 0.0),
        ev(u * 10L + 4, 200L, u, "view", 0.0))
    }
    val b3 = (0 until nUsers).flatMap { u =>
      Seq(ev(u * 10L + 5, 150L, u, "purchase", u + 0.5),
        ev(u * 10L + 6, 300L, u, "view", 0.0))
    }

    // ---- asofStream
    val ain = MemoryStream[Streaming.Event]
    val aq = Streaming.asofStream(ain.toDS())
      .writeStream.format("memory").queryName("asof_scale")
      .outputMode("append").start()
    val w0 = System.nanoTime()
    Seq(b1, b2, b3).foreach { b => ain.addData(b); aq.processAllAvailable() }
    val asofS = (System.nanoTime() - w0) / 1e9
    val asof = spark.table("asof_scale").cache()
    // 3 views per user; the @50 view precedes any purchase
    assert(asof.count() === nUsers * 3L)
    assert(asof.filter(col("asof_value").isNull).count() === nUsers.toLong)
    // the @200 view (batch 2) must see batch 1's @100 purchase — the
    // cross-batch state carry — with value = u
    val v200 = asof.filter(col("ts_us") === 200000L)
    assert(v200.count() === nUsers.toLong)
    assert(v200.filter(col("asof_ts") === 100000L).count() === nUsers.toLong)
    assert(v200.agg(sum("asof_value")).head.getDouble(0)
      === (nUsers.toLong - 1) * nUsers / 2.0)
    // the @300 view must see the LATER @150 purchase absorbed from
    // batch 3 (state converges past the earlier best)
    val v300 = asof.filter(col("ts_us") === 300000L)
    assert(v300.filter(col("asof_ts") === 150000L).count() === nUsers.toLong)
    val aState = Option(aq.lastProgress)
      .map(_.stateOperators.apply(0).numRowsTotal).getOrElse(-1L)
    assert(aState === nUsers.toLong,
      s"asof state rows $aState != $nUsers — state is not one row per user")
    asof.unpersist()
    aq.stop()

    // ---- funnelStream
    val fin = MemoryStream[Streaming.Event]
    val fq = Streaming.funnelStream(fin.toDS())
      .writeStream.format("memory").queryName("funnel_scale")
      .outputMode("append").start()
    val w1 = System.nanoTime()
    Seq(b1, b2, b3).foreach { b => fin.addData(b); fq.processAllAvailable() }
    val funnelS = (System.nanoTime() - w1) / 1e9
    val fun = spark.table("funnel_scale").cache()
    // every batch advances every user exactly one step: view@50 →
    // click@120 → purchase@150 (the @100 purchase precedes the click
    // and must NOT count; the strict ordering rule)
    assert(fun.count() === nUsers * 3L)
    Seq(1, 2, 3).foreach { s =>
      assert(fun.filter(col("steps_reached") === s).count() === nUsers.toLong,
        s"step-$s emission count")
    }
    val done = fun.filter(col("steps_reached") === 3)
    assert(done.filter(col("t1") === 50000L && col("t2") === 120000L &&
      col("t3") === 150000L).count() === nUsers.toLong,
      "final funnel timestamps diverge from the strict-order expectation")
    val fState = Option(fq.lastProgress)
      .map(_.stateOperators.apply(0).numRowsTotal).getOrElse(-1L)
    assert(fState === nUsers.toLong,
      s"funnel state rows $fState != $nUsers — state is not one row per user")
    fun.unpersist()
    fq.stop()
    System.err.println(
      f"STREAMSCALE asofStream 100k users: $asofS%6.1f s; " +
        f"funnelStream: $funnelS%6.1f s (600k events each)")
  }
}
