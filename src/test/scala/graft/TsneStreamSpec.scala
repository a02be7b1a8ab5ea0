package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.pipeline.TsneLayout
import graft.streaming.Streaming

/** Exact t-SNE layout and the streaming dedup twin. */
class TsneStreamSpec extends SparkSpec {

  test("tsne separates two tight latent clusters") {
    import spark.implicits._
    val rnd = new scala.util.Random(2)
    val pts = (0 until 20).map { i =>
      val c = i / 10
      (i.toLong, Array.tabulate(6)(_ => c * 8.0 + rnd.nextDouble() * 0.2))
    }
    val out = TsneLayout.layout(pts.toDF("cell_id", "latent"),
        perplexity = 5.0, nIter = 250)
      .collect().map(r => r.getLong(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    def dist(a: (Double, Double), b: (Double, Double)) =
      math.hypot(a._1 - b._1, a._2 - b._2)
    val intra = (for (i <- 0 until 10; j <- i + 1 until 10)
      yield dist(out(i.toLong), out(j.toLong))).max
    val inter = (for (i <- 0 until 10; j <- 10 until 20)
      yield dist(out(i.toLong), out(j.toLong))).min
    assert(intra < inter, s"clusters not separated: intra $intra vs inter $inter")
    out.values.foreach { case (a, b) => assert(!a.isNaN && !b.isNaN) }
  }

  test("tsne is deterministic for a fixed seed") {
    import spark.implicits._
    val pts = (0 until 8).map(i => (i.toLong, Array(i * 1.0, (i % 3) * 2.0)))
    val df = pts.toDF("cell_id", "latent")
    val a = TsneLayout.layout(df, perplexity = 3.0, nIter = 50).collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2))).sortBy(_._1).toSeq
    val b = TsneLayout.layout(df, perplexity = 3.0, nIter = 50).collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2))).sortBy(_._1).toSeq
    assert(a == b)
  }

  test("streaming dedup keeps the first occurrence of each digest") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val input = MemoryStream[Streaming.Doc]
    val q = Streaming.dedupStream(input.toDS())
      .writeStream.format("memory").queryName("dedup_out")
      .outputMode("append").start()
    val t0 = java.sql.Timestamp.valueOf("2026-01-01 10:00:00")
    def ts(m: Int) = new java.sql.Timestamp(t0.getTime + m * 60000L)
    input.addData(
      Streaming.Doc(1L, ts(0), "alpha"),
      Streaming.Doc(2L, ts(1), "beta"),
      Streaming.Doc(3L, ts(2), "alpha")) // dup of doc 1
    q.processAllAvailable()
    input.addData(
      Streaming.Doc(4L, ts(3), "beta"),  // dup of doc 2, later batch
      Streaming.Doc(5L, ts(4), "gamma"))
    q.processAllAvailable()
    val got = spark.sql("SELECT doc_id FROM dedup_out").collect()
      .map(_.getLong(0)).toSet
    q.stop()
    assert(got == Set(1L, 2L, 5L), s"got $got")
  }
}
