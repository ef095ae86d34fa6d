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

  /** File-based stream source over a parquet events directory. The source
    * schema may carry `ts` as TIMESTAMP_NTZ (the round-7 testdata ships
    * parquet `isAdjustedToUTC=false`) or as raw long nanos — normalize to
    * TimestampType here, because `withWatermark` requires it
    * (EVENT_TIME_IS_NOT_ON_TIMESTAMP_TYPE otherwise). Same one-place
    * normalization as the batch loader: `Tables.normalizeTs`. */
  def readEventStream(spark: SparkSession, dir: String,
      schema: org.apache.spark.sql.types.StructType): DataFrame =
    graft.Tables.normalizeTs(spark.readStream.schema(schema).parquet(dir))

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

  /** Windowed distinct-user ESTIMATES via the HLL register aggregate —
    * the streaming face of x99. Exact windowed COUNT(DISTINCT) is
    * unsupported in streaming aggregations precisely because its state is
    * the distinct set; the register vector is 2^p bytes per
    * (window, group) and merges by element-wise max across micro-batches,
    * so the sketch is the CORRECT streaming answer, not a compromise. The
    * estimate math is the identical exact-integer derivation as x99's
    * batch query (both faces pinned equal by StreamingSpec). */
  def tumblingDistinctUsers(events: DataFrame, p: Int = 4): DataFrame = {
    val m = 1 << p
    val alpha = m match {
      case 16 => 0.673; case 32 => 0.697; case 64 => 0.709
      case _  => 0.7213 / (1.0 + 1.079 / m)
    }
    events
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(graft.functions.HllAgg.hll_registers(col("user_id"), p).as("regs"))
      .select(col("window.start").as("window_start"), col("event_type"),
        expr(s"""CAST(FLOOR(${alpha}D * ${m.toLong * m}.0D * POWER(2.0D, ${64 - p + 1}) /
                |  CAST(aggregate(regs, CAST(0 AS DECIMAL(38,0)),
                |    (acc, r) -> CAST(acc + CAST(POWER(2.0D, ${64 - p + 1} - r) AS DECIMAL(38,0))
                |                     AS DECIMAL(38,0))) AS DOUBLE)
                |  * 1000000.0D) AS BIGINT)""".stripMargin).as("est_micro"))
  }

  /** Streaming exact dedup on event_id: duplicates arriving within the
    * watermark horizon are dropped across micro-batches with bounded state
    * (ids older than the watermark are evicted — the streaming twin of
    * Dedup.exactDedup for at-least-once upstream delivery). */
  def streamingDedup(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "1 hour")
      .dropDuplicatesWithinWatermark("event_id")

  /** Keyed windowed dedup — the streaming twin of
    * [[graft.ops.EventAnalytics.windowDedupSummary]] (x120): keep one event
    * per (key, type, tumbling slot). The dedup key INCLUDES the event-time
    * window, which is what lets `dropDuplicates` run on an unbounded
    * stream: with a watermark on `ts`, state for a (key, slot) pair is
    * evicted once the watermark passes the slot's end — bounded state, the
    * documented streaming-dedup-with-event-time pattern — whereas a dedup
    * key without event time would accumulate keys forever. */
  def windowedKeyDedup(events: DataFrame, slotSeconds: Long = 300L): DataFrame =
    events
      .withWatermark("ts", "1 hour")
      .withColumn("slot_window", window(col("ts"), s"$slotSeconds seconds"))
      // the derived window inherits the event-time tag; `ts` must go or the
      // plan carries TWO event-time columns (rejected by the planner)
      .drop("ts")
      .dropDuplicates("user_id", "event_type", "slot_window")

  /** Stream-stream interval join: attribute each purchase to every view by
    * the same user in the preceding hour. The canonical two-stream join —
    * both sides watermarked AND the join carrying an event-time range bound,
    * which is exactly what lets Spark evict state: a buffered view older
    * than `purchase watermark − 1 hour` can never match again and is
    * dropped, so state tracks the join window, not the stream's history.
    * (Without the time bound a stream-stream inner join must buffer both
    * sides forever — the unbounded-state trap this op exists to avoid.)
    *
    * Works unchanged on batch frames (watermarks are no-ops there): the
    * batch twin is x42's oracled query. */
  def viewPurchaseJoin(views: DataFrame, purchases: DataFrame): DataFrame = {
    val v = views
      .withWatermark("ts", "1 hour")
      .select(col("event_id").as("view_id"), col("user_id"), col("ts").as("view_ts"))
    val p = purchases
      .withWatermark("ts", "1 hour")
      .select(col("event_id").as("purchase_id"), col("user_id").as("p_user_id"),
        col("ts").as("purchase_ts"))
    v.join(p,
      col("user_id") === col("p_user_id") &&
        col("purchase_ts") >= col("view_ts") &&
        col("purchase_ts") <= col("view_ts") + expr("INTERVAL 1 HOUR"))
      .select(col("view_id"), col("purchase_id"), col("user_id"),
        col("view_ts"), col("purchase_ts"))
  }

  /** LEFT OUTER stream-stream interval join: every view, attributed to its
    * within-the-hour purchases when they exist, null-padded otherwise. The
    * outer side is what makes this a genuinely different operator from the
    * inner join ([[viewPurchaseJoin]]): an unmatched view can only be
    * emitted once the purchase-side WATERMARK has passed `view_ts + 1h` —
    * before that, a matching purchase could still arrive — so the null rows
    * surface with watermark latency, driven by event time, not wall clock.
    * Same state-eviction bound as the inner join: buffered rows die at
    * watermark − interval.
    *
    * Works unchanged on batch frames (watermarks no-op; the outer join is
    * just a left join): x54's oracled batch twin. */
  def viewPurchaseJoinOuter(views: DataFrame, purchases: DataFrame): DataFrame = {
    val v = views
      .withWatermark("ts", "1 hour")
      .select(col("event_id").as("view_id"), col("user_id"), col("ts").as("view_ts"))
    val p = purchases
      .withWatermark("ts", "1 hour")
      .select(col("event_id").as("purchase_id"), col("user_id").as("p_user_id"),
        col("ts").as("purchase_ts"))
    v.join(p,
      col("user_id") === col("p_user_id") &&
        col("purchase_ts") >= col("view_ts") &&
        col("purchase_ts") <= col("view_ts") + expr("INTERVAL 1 HOUR"),
      "leftOuter")
      .select(col("view_id"), col("purchase_id"), col("user_id"),
        col("view_ts"), col("purchase_ts"))
  }

  /** Stream-static enrichment join: attach a static dimension (the user/
    * customer catalog) to a live event stream. The static side is
    * BROADCAST — per micro-batch the stream side joins map-side with no
    * shuffle and no state (stream-static inner/left joins are stateless by
    * construction: the static side is re-resolvable, nothing needs
    * buffering). Unmatched users keep their events with NULL-coalesced
    * dimension columns — an enrichment must never drop facts.
    * Works unchanged on batch frames: x49's oracled batch twin. */
  def enrichEvents(events: DataFrame, users: DataFrame,
      userKey: String = "c_custkey"): DataFrame =
    events.join(
      broadcast(users.withColumnRenamed(userKey, "__uk")),
      col("user_id") === col("__uk"), "left")
      .drop("__uk")

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

  private def micros(e: Event): Long =
    e.ts.getTime / 1000 * 1000000L + e.ts.getNanos / 1000

  /** The shared gap fold: run `sorted` events through the session automaton
    * starting from `start` (an open session carried in from earlier
    * micro-batches, or None). Returns (closed sessions, the still-open
    * trailing session). Session ids continue across calls — the resumed
    * state keeps its sessionSeq, and a gap against the CARRIED lastUs closes
    * the prior session and increments the seq. */
  private def foldSessions(userId: Long, sorted: Seq[Event],
      start: Option[SessionState], gapUs: Long): (Seq[SessionAgg], Option[SessionState]) =
    foldSessionsUs(userId, sorted.map(e => (micros(e), e.value)), start, gapUs)

  /** Tuple core of the gap fold — `(us, value)` pairs already in scan
    * order — shared by the in-order, batch, and watermark-buffered
    * sessionizers so all three run the identical automaton. */
  private def foldSessionsUs(userId: Long, sorted: Seq[(Long, Double)],
      start: Option[SessionState], gapUs: Long): (Seq[SessionAgg], Option[SessionState]) = {
    val out = scala.collection.mutable.ArrayBuffer.empty[SessionAgg]
    var st = start
    sorted.foreach { case (us, value) =>
      st match {
        case None =>
          st = Some(SessionState(1L, us, us, 1L, value))
        case Some(s) if us - s.lastUs > gapUs =>
          out += SessionAgg(userId, s.sessionSeq, s.n, s.startUs, s.lastUs, s.total)
          st = Some(SessionState(s.sessionSeq + 1, us, us, 1L, value))
        case Some(s) =>
          st = Some(s.copy(lastUs = us, n = s.n + 1, total = s.total + value))
      }
    }
    (out.toSeq, st)
  }

  /** 30-minute-gap sessionization with explicit keyed state
    * (flatMapGroupsWithState) — the streaming twin of
    * Extensions.x13Sessionize, for UNBOUNDED input.
    *
    * Cross-batch semantics: a session is emitted when a later event closes
    * it (gap exceeded) or when the EVENT-TIME watermark passes its end plus
    * the gap (idle flush via timeout) — each session exactly once, with
    * session ids that continue across micro-batches (the open session rides
    * in state, never re-emitted). A watermark is applied here
    * (`watermarkDelay`) because EventTimeTimeout requires one; it also
    * bounds state: idle users' state is removed on flush.
    *
    * Identity caveat: `session_id` numbers sessions within one state
    * lifetime — after an idle flush evicts a user's state, that user's next
    * burst restarts at 1. The globally unique session key is
    * `(user_id, start_us)` (both emitted); retaining per-user counters
    * forever would grow state with every user EVER seen, defeating the
    * watermark bound that keeps state proportional to ACTIVE users.
    *
    * For complete batch input use [[sessionizeBatch]], which also emits the
    * trailing open sessions.
    *
    * IN-ORDER contract (audited r11): a late same-user event arriving in a
    * later micro-batch folds AFTER the carried state and regresses
    * `lastUs` — use [[sessionizeOoo]] when upstream arrival order is not
    * guaranteed; it buffers to the watermark and replays event-time
    * order. */
  def sessionize(events: Dataset[Event], gapUs: Long = 1800L * 1000000L,
      watermarkDelay: String = "1 hour"): Dataset[SessionAgg] = {
    import events.sparkSession.implicits._
    events
      .withWatermark("ts", watermarkDelay)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, SessionAgg](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        case (userId, it, state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            // watermark passed lastUs + gap with no new events: the held
            // session can never be extended — flush it and drop the state
            val s = state.get
            state.remove()
            Iterator.single(SessionAgg(userId, s.sessionSeq, s.n, s.startUs, s.lastUs, s.total))
          } else {
            val sorted = it.toSeq.sortBy(e => (micros(e), e.event_id))
            val (closed, open) = foldSessions(userId, sorted, state.getOption, gapUs)
            open.foreach { s =>
              state.update(s)
              state.setTimeoutTimestamp(s.lastUs / 1000 + gapUs / 1000)
            }
            closed.iterator
          }
      }
  }

  case class RateState(hours: Map[Long, Long], maxHourUs: Long)

  /** Streaming per-key hourly admission control — the stateful twin of
    * `EventAnalytics.rateLimit` (batch, oracled as x81): admit the first
    * `maxPerHour` events per (user, event-time hour), pass admitted rows
    * through unchanged, drop the rest.
    *
    * State is a per-user map hour→admitted-count. Bounds: entries more
    * than 3 hours behind the user's latest hour are pruned each batch
    * (the out-of-order horizon the watermark promises anyway), and the
    * whole user evicts via EventTimeTimeout once the watermark passes its
    * newest hour + 1h idle slack — so state tracks ACTIVE user-hours.
    *
    * Semantics vs the batch twin: each micro-batch is folded in
    * (event-time, event_id) order, so when arrival order respects event
    * time the admitted set is IDENTICAL to batch `rateLimit` (the parity
    * the spec pins). Under cross-batch disorder admission is first-seen
    * within the cap — the only causal choice, since already-admitted rows
    * are downstream and cannot be recalled; and after an idle eviction a
    * straggler hour restarts its count (at-most-N per state lifetime).
    * Exactly the trade every streaming limiter makes; the batch twin is
    * the reconciliation path. */
  def rateLimitStream(events: Dataset[Event], maxPerHour: Int,
      watermarkDelay: String = "1 hour"): Dataset[Event] = {
    import events.sparkSession.implicits._
    val hourUs = 3600L * 1000000L
    events
      .withWatermark("ts", watermarkDelay)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[RateState, Event](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        case (_, it, state: GroupState[RateState]) =>
          if (state.hasTimedOut) {
            state.remove(); Iterator.empty
          } else {
            val sorted = it.toSeq.sortBy(e => (micros(e), e.event_id))
            var st = state.getOption.getOrElse(RateState(Map.empty, 0L))
            val out = Seq.newBuilder[Event]
            sorted.foreach { e =>
              val h = micros(e) / hourUs * hourUs
              val c = st.hours.getOrElse(h, 0L)
              if (c < maxPerHour) {
                out += e
                st = RateState(st.hours.updated(h, c + 1), math.max(st.maxHourUs, h))
              } else st = st.copy(maxHourUs = math.max(st.maxHourUs, h))
            }
            st = st.copy(hours = st.hours.filter { case (h, _) =>
              h >= st.maxHourUs - 3 * hourUs })
            state.update(st)
            // evict the user once the watermark passes newest hour end + 1h idle
            state.setTimeoutTimestamp((st.maxHourUs + 2 * hourUs) / 1000L)
            out.result().iterator
          }
      }
  }

  /** Batch sessionization over COMPLETE per-user history: the same gap fold,
    * with the trailing session emitted (the input is the whole history, so
    * every session is closed). No state API involved — in batch there is
    * nothing to carry between invocations. */
  def sessionizeBatch(events: Dataset[Event], gapUs: Long = 1800L * 1000000L): Dataset[SessionAgg] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroups { (userId: Long, it: Iterator[Event]) =>
        val sorted = it.toSeq.sortBy(e => (micros(e), e.event_id))
        val (closed, open) = foldSessions(userId, sorted, None, gapUs)
        (closed ++ open.map(s =>
          SessionAgg(userId, s.sessionSeq, s.n, s.startUs, s.lastUs, s.total))).iterator
      }
  }

  // ---------------------------------------------------- transformWithState
  case class UserTotal(user_id: Long, n_events: Long, total_cents: Long)

  /** Per-user running totals via the Spark 4 `transformWithState` API —
    * the arbitrary-state successor to mapGroupsWithState: typed
    * `ValueState` through a `StatefulProcessor`, composable state
    * variables, per-state TTL, and timers, on the RocksDB state store
    * (the provider this API requires; the caller sets
    * `spark.sql.streaming.stateStore.providerClass`).
    *
    * Value is accumulated in integer CENTS (⌊v·100+0.5⌋) so the running
    * total is merge-order-free — the batch twin (a plain groupBy sum over
    * the same cents expression) lands on the identical number no matter
    * how the stream was micro-batched, which is the parity StreamingSpec
    * pins. Emits the running total per key on every batch that touches it
    * (Update mode). */
  class UserTotalsProcessor
      extends org.apache.spark.sql.streaming.StatefulProcessor[Long, Event, UserTotal] {
    @transient private var st: org.apache.spark.sql.streaming.ValueState[(Long, Long)] = _
    override def init(outputMode: OutputMode,
        timeMode: org.apache.spark.sql.streaming.TimeMode): Unit =
      st = getHandle.getValueState[(Long, Long)]("totals",
        org.apache.spark.sql.Encoders.product[(Long, Long)],
        org.apache.spark.sql.streaming.TTLConfig.NONE)
    override def handleInputRows(key: Long, rows: Iterator[Event],
        timerValues: org.apache.spark.sql.streaming.TimerValues): Iterator[UserTotal] = {
      val (n0, c0) = Option(st.get()).getOrElse((0L, 0L))
      var n = n0
      var c = c0
      rows.foreach { e =>
        n += 1
        c += math.floor(e.value * 100.0 + 0.5).toLong
      }
      st.update((n, c))
      Iterator.single(UserTotal(key, n, c))
    }
  }

  /** See [[UserTotalsProcessor]]; works on a stream (incremental running
    * totals) and is pinned equal to the batch groupBy twin in
    * StreamingSpec. */
  def runningUserTotals(events: Dataset[Event]): Dataset[UserTotal] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .transformWithState(new UserTotalsProcessor,
        org.apache.spark.sql.streaming.TimeMode.None(), OutputMode.Update())
  }

  case class IdleAlert(user_id: Long, last_seen_us: Long)

  /** Event-time TIMERS through transformWithState: alert when a user goes
    * quiet for `idleUs` of EVENT time. Each event re-arms the user's
    * single timer at (last event time + idleUs); when the WATERMARK passes
    * the timer — i.e. the stream itself proves no earlier event can still
    * arrive — `handleExpiredTimer` emits the alert and clears state. This
    * is the push-based complement of sessionize's timeout: state per user
    * is one (last_seen, timer) pair, evicted at alert time, so state
    * tracks currently-active users only. */
  class IdleUserProcessor(idleUs: Long)
      extends org.apache.spark.sql.streaming.StatefulProcessor[Long, Event, IdleAlert] {
    @transient private var lastSeen: org.apache.spark.sql.streaming.ValueState[Long] = _
    override def init(outputMode: OutputMode,
        timeMode: org.apache.spark.sql.streaming.TimeMode): Unit =
      lastSeen = getHandle.getValueState[Long]("last_seen",
        org.apache.spark.sql.Encoders.scalaLong,
        org.apache.spark.sql.streaming.TTLConfig.NONE)
    override def handleInputRows(key: Long, rows: Iterator[Event],
        timerValues: org.apache.spark.sql.streaming.TimerValues): Iterator[IdleAlert] = {
      val maxUs = rows.map(e => e.ts.getTime * 1000L).max
      val prev = Option(lastSeen.get()).getOrElse(0L)
      if (maxUs > prev) {
        lastSeen.update(maxUs)
        getHandle.listTimers().foreach(getHandle.deleteTimer)
        getHandle.registerTimer((maxUs + idleUs) / 1000L) // timers are ms
      }
      Iterator.empty
    }
    override def handleExpiredTimer(key: Long,
        timerValues: org.apache.spark.sql.streaming.TimerValues,
        expiredTimerInfo: org.apache.spark.sql.streaming.ExpiredTimerInfo): Iterator[IdleAlert] = {
      val last = Option(lastSeen.get()).getOrElse(0L)
      lastSeen.clear()
      Iterator.single(IdleAlert(key, last))
    }
  }

  /** See [[IdleUserProcessor]]; input must carry a watermark on `ts`
    * (event-time timers fire off watermark advancement). */
  def idleUserAlerts(events: Dataset[Event], idleUs: Long = 1800L * 1000000L): Dataset[IdleAlert] = {
    import events.sparkSession.implicits._
    events
      .withWatermark("ts", "0 seconds")
      .as[Event]
      .groupByKey(_.user_id)
      .transformWithState(new IdleUserProcessor(idleUs),
        org.apache.spark.sql.streaming.TimeMode.EventTime(), OutputMode.Append())
  }

  case class Transition(user_id: Long, from_type: String, to_type: String)

  /** Streaming twin of the x167 next-event transition matrix: per-user
    * `ValueState` carries the LAST event (us, event_id, type) across
    * micro-batches; each arriving batch sorts its rows by (us, event_id)
    * — the same total order the batch lag window uses — chains them onto
    * the carried state, and emits one [[Transition]] per consecutive
    * pair. Counts aggregated over the emitted stream equal the batch
    * twin EXACTLY when batches arrive in event-time order (the
    * rateLimitStream/sessionize in-order contract; a real deployment
    * puts a watermark-sort upstream). State per user is one event — the
    * chain's memory is O(1), not the stream. */
  class TransitionProcessor
      extends org.apache.spark.sql.streaming.StatefulProcessor[Long, Event, Transition] {
    @transient private var last: org.apache.spark.sql.streaming.ValueState[(Long, Long, String)] = _
    override def init(outputMode: OutputMode,
        timeMode: org.apache.spark.sql.streaming.TimeMode): Unit =
      last = getHandle.getValueState[(Long, Long, String)]("last_event",
        org.apache.spark.sql.Encoders.product[(Long, Long, String)],
        org.apache.spark.sql.streaming.TTLConfig.NONE)
    override def handleInputRows(key: Long, rows: Iterator[Event],
        timerValues: org.apache.spark.sql.streaming.TimerValues): Iterator[Transition] = {
      // true microseconds via the shared micros() helper — getTime*1000
      // would truncate to ms and diverge from the batch twin's
      // unix_micros ordering on same-millisecond events
      val sorted = rows.toSeq.sortBy(e => (micros(e), e.event_id))
      val out = scala.collection.mutable.ArrayBuffer.empty[Transition]
      var prev = Option(last.get())
      sorted.foreach { e =>
        prev.foreach { case (_, _, fromType) =>
          out += Transition(key, fromType, e.event_type)
        }
        prev = Some((micros(e), e.event_id, e.event_type))
      }
      prev.foreach(last.update)
      out.iterator
    }
  }

  /** See [[TransitionProcessor]]; StreamingSpec pins the aggregated
    * transition counts equal to the batch lag-window twin. */
  def transitionStream(events: Dataset[Event]): Dataset[Transition] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .transformWithState(new TransitionProcessor,
        org.apache.spark.sql.streaming.TimeMode.None(), OutputMode.Append())
  }

  /** Out-of-order-tolerant twin of [[TransitionProcessor]] (the r9 twin's
    * documented in-order caveat, closed): per-user `ListState` BUFFERS
    * events until the event-time watermark passes them, then finalizes in
    * (us, event_id) order, chaining onto the last FINALIZED event carried
    * in `ValueState`. An event is finalized only while `us <
    * watermark` — the watermark contract says nothing older can still
    * arrive, and a tie at exactly the watermark stays buffered so a
    * same-microsecond straggler with a smaller event_id can still slot in
    * before it. A timer at (max buffered us)+1ms guarantees the buffer
    * drains once the watermark passes it even if this user never speaks
    * again.
    *
    * Equality contract: aggregated transitions equal the batch lag-window
    * twin EXACTLY for any arrival order whose lateness stays within the
    * watermark delay (later stragglers are dropped by `withWatermark`
    * upstream, the standard discipline — same as sessionize). State per
    * user is one chain tail plus the ≤ watermark-delay window of
    * unfinalized events — bounded by the user's event rate × delay, not
    * the stream. Use [[transitionStream]] when arrival order is known
    * in-order (O(1) state, no emission latency). */
  class OooTransitionProcessor
      extends org.apache.spark.sql.streaming.StatefulProcessor[Long, Event, Transition] {
    @transient private var buf: org.apache.spark.sql.streaming.ListState[(Long, Long, String)] = _
    @transient private var tail: org.apache.spark.sql.streaming.ValueState[(Long, Long, String)] = _
    override def init(outputMode: OutputMode,
        timeMode: org.apache.spark.sql.streaming.TimeMode): Unit = {
      buf = getHandle.getListState[(Long, Long, String)]("pending",
        org.apache.spark.sql.Encoders.product[(Long, Long, String)],
        org.apache.spark.sql.streaming.TTLConfig.NONE)
      tail = getHandle.getValueState[(Long, Long, String)]("chain_tail",
        org.apache.spark.sql.Encoders.product[(Long, Long, String)],
        org.apache.spark.sql.streaming.TTLConfig.NONE)
    }
    /** Emit every buffered transition the watermark has sealed; re-arm
      * the drain timer if anything is still pending. */
    private def finalizeReady(key: Long, wmUs: Long): Iterator[Transition] = {
      val all = buf.get().toSeq
      val (ready, hold) = all.partition(_._1 < wmUs)
      val out = scala.collection.mutable.ArrayBuffer.empty[Transition]
      var prev = Option(tail.get())
      ready.sortBy(t => (t._1, t._2)).foreach { e =>
        prev.foreach { case (_, _, fromType) => out += Transition(key, fromType, e._3) }
        prev = Some(e)
      }
      prev.foreach(tail.update)
      buf.clear()
      getHandle.listTimers().foreach(getHandle.deleteTimer)
      if (hold.nonEmpty) {
        buf.put(hold.toArray)
        getHandle.registerTimer(hold.map(_._1).max / 1000L + 1L) // timers are ms
      }
      out.iterator
    }
    override def handleInputRows(key: Long, rows: Iterator[Event],
        timerValues: org.apache.spark.sql.streaming.TimerValues): Iterator[Transition] = {
      val wmUs = timerValues.getCurrentWatermarkInMs() * 1000L
      // Defensively drop rows already older than the watermark. The
      // `withWatermark` contract drops them upstream, but whether
      // transformWithState filters late rows before handleInputRows is
      // version-dependent; a leaked one would finalize immediately AFTER
      // the later-timestamped tail and then REPLACE it with an earlier
      // event, corrupting every subsequent transition for this user. The
      // documented semantics ("later stragglers are dropped") stay exact.
      buf.appendList(rows.map(e => (micros(e), e.event_id, e.event_type))
        .filter(_._1 >= wmUs).toArray)
      finalizeReady(key, wmUs)
    }
    override def handleExpiredTimer(key: Long,
        timerValues: org.apache.spark.sql.streaming.TimerValues,
        expiredTimerInfo: org.apache.spark.sql.streaming.ExpiredTimerInfo): Iterator[Transition] = {
      finalizeReady(key, timerValues.getCurrentWatermarkInMs() * 1000L)
    }
  }

  /** See [[OooTransitionProcessor]]; StreamingSpec pins stream ≡ batch
    * with a late same-user event arriving in a LATER micro-batch. */
  def transitionStreamOoo(events: Dataset[Event],
      watermarkDelay: String = "10 minutes"): Dataset[Transition] = {
    import events.sparkSession.implicits._
    events
      .withWatermark("ts", watermarkDelay)
      .groupByKey(_.user_id)
      .transformWithState(new OooTransitionProcessor,
        org.apache.spark.sql.streaming.TimeMode.EventTime(), OutputMode.Append())
  }

  /** Out-of-order-tolerant sessionizer — the [[OooTransitionProcessor]]
    * discipline applied to [[sessionize]]'s gap fold (whose in-order twin
    * REGRESSES its carried `lastUs` if a late same-user event arrives in a
    * later micro-batch: the fold sees `us < lastUs`, treats it as the same
    * session, and moves the session end backwards — the r11 audit finding).
    * Events buffer in `ListState` until the event-time watermark passes
    * them, then fold through the shared automaton ([[foldSessionsUs]]) in
    * exact (us, event_id) order against the carried open session.
    *
    * Close rules, each safe by the watermark contract (arrivals and held
    * rows are all ≥ wm):
    *  - GAP close happens inside the fold, exactly as in batch;
    *  - IDLE close (emit the trailing session, drop all state) fires only
    *    when the buffer is EMPTY and wm > lastUs + gap. If held events
    *    exist they are ≥ wm > lastUs + gap, so the open session is certain
    *    to gap-close when they finalize — waiting for the drain timer
    *    preserves sessionSeq continuity instead of resetting the lifetime.
    * Timers: a drain timer at (min held us)+1ms when the buffer is
    * non-empty, else an idle timer at (lastUs + gap)+1ms.
    *
    * Equality contract: for any arrival order whose lateness stays within
    * the watermark delay, emitted sessions equal [[sessionizeBatch]]
    * (including `session_id`, as long as a user's bursts don't straddle an
    * idle eviction — the same state-lifetime caveat [[sessionize]]
    * documents). State per user: one open session + the ≤ delay window of
    * unfinalized events. */
  class OooSessionProcessor(gapUs: Long)
      extends org.apache.spark.sql.streaming.StatefulProcessor[Long, Event, SessionAgg] {
    @transient private var buf: org.apache.spark.sql.streaming.ListState[(Long, Long, Double)] = _
    @transient private var open: org.apache.spark.sql.streaming.ValueState[SessionState] = _
    override def init(outputMode: OutputMode,
        timeMode: org.apache.spark.sql.streaming.TimeMode): Unit = {
      buf = getHandle.getListState[(Long, Long, Double)]("pending",
        org.apache.spark.sql.Encoders.product[(Long, Long, Double)],
        org.apache.spark.sql.streaming.TTLConfig.NONE)
      open = getHandle.getValueState[SessionState]("open_session",
        org.apache.spark.sql.Encoders.product[SessionState],
        org.apache.spark.sql.streaming.TTLConfig.NONE)
    }
    private def advance(key: Long, wmUs: Long): Iterator[SessionAgg] = {
      val all = buf.get().toSeq
      val (ready, hold) = all.partition(_._1 < wmUs)
      val sorted = ready.sortBy(t => (t._1, t._2))
      val (closed, newOpen) = foldSessionsUs(key,
        sorted.map(t => (t._1, t._3)), Option(open.get()), gapUs)
      val out = scala.collection.mutable.ArrayBuffer.empty[SessionAgg]
      out ++= closed
      buf.clear()
      getHandle.listTimers().foreach(getHandle.deleteTimer)
      newOpen match {
        case Some(s) if hold.isEmpty && wmUs > s.lastUs + gapUs =>
          // trailing session can never extend — flush it, end the lifetime
          out += SessionAgg(key, s.sessionSeq, s.n, s.startUs, s.lastUs, s.total)
          open.clear()
        case Some(s) =>
          open.update(s)
          if (hold.isEmpty)
            getHandle.registerTimer((s.lastUs + gapUs) / 1000L + 1L)
        case None =>
          open.clear()
      }
      if (hold.nonEmpty) {
        buf.put(hold.toArray)
        getHandle.registerTimer(hold.map(_._1).min / 1000L + 1L)
      }
      out.iterator
    }
    override def handleInputRows(key: Long, rows: Iterator[Event],
        timerValues: org.apache.spark.sql.streaming.TimerValues): Iterator[SessionAgg] = {
      val wmUs = timerValues.getCurrentWatermarkInMs() * 1000L
      // same defensive too-late drop as OooTransitionProcessor
      buf.appendList(rows.map(e => (micros(e), e.event_id, e.value))
        .filter(_._1 >= wmUs).toArray)
      advance(key, wmUs)
    }
    override def handleExpiredTimer(key: Long,
        timerValues: org.apache.spark.sql.streaming.TimerValues,
        expiredTimerInfo: org.apache.spark.sql.streaming.ExpiredTimerInfo): Iterator[SessionAgg] =
      advance(key, timerValues.getCurrentWatermarkInMs() * 1000L)
  }

  /** See [[OooSessionProcessor]]; StreamingSpec pins stream ≡
    * [[sessionizeBatch]] with a late mid-session event arriving in a
    * LATER micro-batch. */
  def sessionizeOoo(events: Dataset[Event], gapUs: Long = 1800L * 1000000L,
      watermarkDelay: String = "10 minutes"): Dataset[SessionAgg] = {
    import events.sparkSession.implicits._
    events
      .withWatermark("ts", watermarkDelay)
      .groupByKey(_.user_id)
      .transformWithState(new OooSessionProcessor(gapUs),
        org.apache.spark.sql.streaming.TimeMode.EventTime(), OutputMode.Append())
  }
}
