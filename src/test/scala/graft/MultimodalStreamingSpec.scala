package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.multimodal.Multimodal
import graft.multimodal.Multimodal.Media
import graft.streaming.Streaming
import graft.streaming.Streaming.Event

class MultimodalStreamingSpec extends SparkSpec {
  import spark.implicits._

  lazy val media = Multimodal.packBinary(
    Seq((1L, "hello world"), (2L, "hello world"), (3L, "different bytes"))
      .toDF("doc_id", "text"), "video/fake").as[Media] // stub-codec path; real image/audio in RealCodecSpec

  test("decodeMeta: deterministic metadata, equal payloads equal digests") {
    val m = Multimodal.decodeMeta(media).collect().map(x => x.doc_id -> x).toMap
    assert(m(1L).n_bytes === 11)
    assert(m(1L).digest === m(2L).digest)
    assert(m(1L).digest !== m(3L).digest)
    assert(m(1L).width === m(2L).width && m(1L).width >= 64)
  }

  test("extractPatches fans out fixed-size features per payload") {
    val p = Multimodal.extractPatches(media, patches = 3, dim = 8).collect()
    assert(p.length === 9)
    assert(p.forall(_.feature.length === 8))
    // deterministic across runs
    val p2 = Multimodal.extractPatches(media, patches = 3, dim = 8).collect()
    assert(p.map(_.feature.toSeq).toSeq === p2.map(_.feature.toSeq).toSeq)
  }

  def ts(min: Int) = new java.sql.Timestamp(1700000000000L + min * 60000L)

  test("streaming hourlyCounts aggregates within watermarked windows") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Event]
    val q = Streaming.hourlyCounts(input.toDF())
      .writeStream.format("memory").queryName("hourly")
      .outputMode("update").start()
    input.addData(
      Event(1, ts(0), 1, "click", 1.0),
      Event(2, ts(10), 1, "click", 2.0),
      Event(3, ts(70), 2, "view", 5.0))
    q.processAllAvailable()
    val r = spark.table("hourly").collect()
      .map(x => (x.getAs[String]("event_type"), x.getAs[Long]("n"))).toMap
    q.stop()
    assert(r("click") === 2L && r("view") === 1L)
  }

  test("streaming sessionize keeps per-user state across batches") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Event]
    val q = Streaming.sessionize(input.toDS())
      .writeStream.format("memory").queryName("sessions")
      .outputMode("update").start()
    input.addData(Event(1, ts(0), 7, "click", 1.0), Event(2, ts(5), 7, "click", 2.0))
    q.processAllAvailable()
    input.addData(Event(3, ts(10), 7, "click", 4.0))   // same session continues
    q.processAllAvailable()
    input.addData(Event(4, ts(120), 7, "click", 8.0))  // 110-min gap -> new session
    q.processAllAvailable()
    val rs = spark.table("sessions").collect()
      .map(x => (x.getAs[Int]("n_events"), x.getAs[Double]("sum_value")))
    q.stop()
    assert(rs.contains((3, 7.0)))  // continued session saw 3 events
    assert(rs.contains((1, 8.0)))  // gap reset state
  }

  test("streaming asofStream carries purchase state across batches") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Event]
    val q = Streaming.asofStream(input.toDS())
      .writeStream.format("memory").queryName("asof")
      .outputMode("append").start()
    // batch 1: purchase then view (in-batch join); a view with nothing
    // preceding it emits None
    input.addData(
      Event(1, ts(5), 7, "view", 0.0),     // ts before any purchase
      Event(2, ts(10), 7, "purchase", 9.5),
      Event(3, ts(20), 7, "view", 0.0))
    q.processAllAvailable()
    // batch 2: view joins state from batch 1; an OLDER purchase must not
    // overwrite the state; a newer one must
    input.addData(
      Event(4, ts(30), 7, "view", 0.0),
      Event(5, ts(2), 7, "purchase", 1.1),  // late + older: ignored
      Event(6, ts(40), 7, "purchase", 7.7),
      Event(7, ts(50), 7, "view", 0.0))
    q.processAllAvailable()
    val rs = spark.table("asof").collect()
      .map(x => x.getAs[Long]("event_id") ->
        Option(x.getAs[Any]("asof_value")).map(_.asInstanceOf[Double])).toMap
    q.stop()
    assert(rs(1L).isEmpty)            // nothing precedes
    assert(rs(3L).contains(9.5))      // in-batch purchase visible
    assert(rs(4L).contains(9.5))      // state carried across batches
    assert(rs(7L).contains(7.7))      // newer purchase replaced state
  }

  test("streaming funnelStream advances strict steps across batches") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Event]
    val q = Streaming.funnelStream(input.toDS())
      .writeStream.format("memory").queryName("funnel")
      .outputMode("append").start()
    // batch 1: a purchase BEFORE any view must not count; view+click advance
    input.addData(
      Event(1, ts(0), 7, "purchase", 1.0),  // pre-view purchase: ignored
      Event(2, ts(5), 7, "view", 0.0),
      Event(3, ts(10), 7, "click", 0.0))
    q.processAllAvailable()
    // batch 2: purchase after the recorded click completes the funnel;
    // a second user stuck at step 1
    input.addData(
      Event(4, ts(20), 7, "purchase", 2.0),
      Event(5, ts(1), 8, "view", 0.0))
    q.processAllAvailable()
    // batch 3: no advance for user 7 (already complete) -> no new row
    input.addData(Event(6, ts(30), 7, "purchase", 3.0))
    q.processAllAvailable()
    val rs = spark.table("funnel").collect()
      .map(x => (x.getAs[Long]("user_id"), x.getAs[Int]("steps_reached")))
    q.stop()
    assert(rs.count(_._1 == 7L) == 2)        // one row per advancing batch
    assert(rs.filter(_._1 == 7L).map(_._2).sorted.toSeq == Seq(2, 3))
    assert(rs.filter(_._1 == 8L).map(_._2).toSeq == Seq(1))
  }

  test("HllAggregator: streaming windowed distinct estimate == batch estimate") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[Event]
    val q = input.toDF()
      .withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(graft.stats.HllAggregator.column(col("user_id").cast("string"))
        .as("hll_est"))
      .writeStream.format("memory").queryName("hll_stream")
      .outputMode("update").start()
    val evs = (1L to 40L).map(i => Event(i, ts(i.toInt % 50), i % 13, "view", 1.0))
    input.addData(evs.take(20): _*)
    q.processAllAvailable()
    input.addData(evs.drop(20): _*)   // same window: state must merge
    q.processAllAvailable()
    val streamed = spark.table("hll_stream")
      .orderBy(col("window.start")).collect()
      .map(r => r.getAs[Double]("hll_est")).last
    q.stop()
    val batch = evs.toDF()
      .agg(graft.stats.HllAggregator.column(col("user_id").cast("string")))
      .head().getDouble(0)
    assert(streamed == batch) // mergeable state converges to the batch answer
  }
}
