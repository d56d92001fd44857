package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Event shape for the stateful operators. */
case class Ev(user_id: Long, ts: Timestamp, event_type: String, value: Double)

/** Open-session state kept per user (scales with active keys, not history). */
case class SessionState(startUs: Long, lastUs: Long, n: Int, totalValue: Double)

/** Emitted closed session. */
case class SessionOut(user_id: Long, session_start: Timestamp,
    session_end: Timestamp, n_events: Int, total_value: Double)

/** Structured Streaming operators (SURVEY.md §2 events/streaming row).
  *
  * The batch forms in graft.pipeline.Events share these semantics and feed
  * the DuckDB oracle; here the same logic runs incrementally: watermarked
  * windowed aggregation (bounded state) and gap-based sessionization via
  * flatMapGroupsWithState (explicit state machine).
  */
object StreamingOps {

  /** Watermarked tumbling-window aggregation — streaming form of
    * Events.windowAgg. State is bounded by the watermark horizon.
    */
  def windowedAgg(events: DataFrame, watermark: String = "1 hour",
      windowLen: String = "1 hour"): DataFrame = {
    import events.sparkSession.implicits._
    events
      .withWatermark("ts", watermark)
      .groupBy(window($"ts", windowLen), $"event_type")
      .agg(count(lit(1)).as("n"), round(sum($"value"), 2).as("total_value"))
  }

  /** Streaming ingest into the hash-dedup incremental store: each
    * micro-batch lands via IncrementalIngest.appendBatch, so replayed or
    * cross-batch duplicate content is dropped exactly as in the reference's
    * re-run semantics — but continuously. foreachBatch gives the batch id
    * for the deterministic store filename.
    */
  def ingestStream(docs: DataFrame, storeDir: String,
      queryName: String = "graft_ingest"): org.apache.spark.sql.streaming.StreamingQuery =
    docs.writeStream
      .queryName(queryName)
      .outputMode(OutputMode.Append)
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        graft.sources.IncrementalIngest.appendBatch(
          batch.toDF(), storeDir, f"batch$batchId%06d")
        ()
      }
      .start()

  val gapUs: Long = 1800L * 1000000L // 30 min, matches Events.sessionize

  /** Gap-based sessionization over a keyed event stream. Events within a
    * batch are processed in ts order; a closed session is emitted as soon
    * as a later event (or timeout) proves the gap. The open session rides
    * in GroupState — O(1) state per active user.
    */
  def sessionize(events: Dataset[Ev]): Dataset[SessionOut] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, SessionOut](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (userId: Long, evs: Iterator[Ev], state: GroupState[SessionState]) =>
          val sorted = evs.toSeq.sortBy(e => (e.ts.getTime, e.value))
          var cur = state.getOption.orNull
          val out = scala.collection.mutable.ArrayBuffer.empty[SessionOut]
          sorted.foreach { e =>
            val us = e.ts.getTime * 1000L
            if (cur == null) {
              cur = SessionState(us, us, 1, e.value)
            } else if (us - cur.lastUs > gapUs) {
              out += SessionOut(userId,
                new Timestamp(cur.startUs / 1000L), new Timestamp(cur.lastUs / 1000L),
                cur.n, math.round(cur.totalValue * 100).toDouble / 100)
              cur = SessionState(us, us, 1, e.value)
            } else {
              cur = SessionState(cur.startUs, us, cur.n + 1, cur.totalValue + e.value)
            }
          }
          if (cur != null) state.update(cur) else state.remove()
          out.iterator
      }
  }
}
