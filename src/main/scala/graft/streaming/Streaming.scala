package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming surface: the event-table operators (hourly
  * windows, sessionization) in their streaming form. The batch queries
  * q41/q42 verify the same computations against the SQL oracle; these
  * plans add watermarks + state so they run incrementally on unbounded
  * input (`readStream` → transform → `writeStream`).
  */
object Streaming {

  case class Event(event_id: Long, ts: java.sql.Timestamp, user_id: Long,
                   event_type: String, value: Double)
  case class SessionUpdate(user_id: Long, session_start_ms: Long,
                           n_events: Int, sum_value: Double)

  /** Tumbling 1-hour windowed counts with a 2-hour watermark — the
    * streaming twin of q41_event_window.
    */
  def hourlyCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("sum_value"))
      .select(col("window.start").as("hour_start"), col("event_type"),
        col("n"), col("sum_value"))

  case class Doc(doc_id: Long, ts: java.sql.Timestamp, text: String)

  /** Streaming exact dedup — the streaming twin of q33_exact_dedup: drop
    * every document whose content digest was already seen inside the
    * watermark horizon. State is the digest set Spark maintains for
    * dropDuplicates; the watermark bounds it, which is the only way a
    * dedup state survives an unbounded corpus (SURVEY §2 training-data
    * ops; same digest-only-shuffles design as the batch operator).
    */
  def dedupStream(docs: Dataset[Doc], watermark: String = "1 hour"): DataFrame =
    docs.toDF()
      .withColumn("digest", md5(col("text")))
      .withWatermark("ts", watermark)
      .dropDuplicates("digest")
      .select("doc_id", "ts", "digest")

  /** Gap-based sessionization with explicit keyed state — the streaming
    * twin of q42_sessionize (30-minute inactivity gap), emitting one
    * update per closed batch of a user's events.
    */
  def sessionize(events: Dataset[Event], gapMs: Long = 30 * 60 * 1000L): Dataset[SessionUpdate] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .mapGroupsWithState[(Long, Int, Double, Long), SessionUpdate](
        GroupStateTimeout.NoTimeout) {
        case (user, it, state: GroupState[(Long, Int, Double, Long)]) =>
          val evs = it.toSeq.sortBy(e => (e.ts.getTime, e.event_id))
          var (start, n, sum, last) =
            state.getOption.getOrElse((evs.head.ts.getTime, 0, 0.0, evs.head.ts.getTime))
          evs.foreach { e =>
            val t = e.ts.getTime
            if (t - last > gapMs) { start = t; n = 0; sum = 0.0 }
            n += 1; sum += e.value; last = t
          }
          state.update((start, n, sum, last))
          SessionUpdate(user, start, n, sum)
      }
  }
}
