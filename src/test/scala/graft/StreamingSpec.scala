package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.streaming.EventStreams
import graft.streaming.EventStreams.Event

/** Structured Streaming operators: incremental results must match the batch
  * twins that the DuckDB oracle pins (Extensions x12/x13). */
class StreamingSpec extends SparkSpec {

  private def ts(min: Int): Timestamp = new Timestamp(1704067200000L + min * 60000L) // 2024-01-01 UTC

  private val sample = Seq(
    Event(1, ts(5), 1, "click", 10.0),
    Event(2, ts(20), 1, "click", 5.0),
    Event(3, ts(65), 1, "view", 2.0),    // 45-min gap → same session, new hour window
    Event(4, ts(200), 1, "click", 7.0),  // 135-min gap → new session
    Event(5, ts(10), 2, "view", 1.0),
    Event(6, ts(11), 2, "view", 1.5))

  test("tumbling window counts: streaming result equals batch result") {
    import spark.implicits._
    val input = MemoryStream[Event](spark)
    val q = EventStreams.tumblingCounts(input.toDF())
      .writeStream.format("memory").queryName("tumbling_test")
      .outputMode("complete").start()
    try {
      input.addData(sample.take(3))
      q.processAllAvailable()
      input.addData(sample.drop(3))
      q.processAllAvailable()
      val streamed = spark.table("tumbling_test")
        .orderBy($"window_start", $"event_type")
        .as[(Timestamp, String, Long, Double)].collect().toSeq
      val batch = EventStreams.tumblingCounts(sample.toDF())
        .orderBy($"window_start", $"event_type")
        .as[(Timestamp, String, Long, Double)].collect().toSeq
      assert(streamed == batch)
      assert(batch.map(_._3).sum == sample.size)
    } finally q.stop()
  }

  test("tumbling HLL distinct: micro-batch register merge equals batch, estimate sane") {
    import spark.implicits._
    // many events, few distinct users — the duplication HLL absorbs
    val users = Seq(1L, 2L, 3L, 4L, 5L, 6L, 7L, 8L)
    val events = (0 until 64).map { i =>
      Event(1000 + i, ts(i % 50), users(i % users.size), "click", 1.0)
    }
    val input = MemoryStream[Event](spark)
    val q = EventStreams.tumblingDistinctUsers(input.toDF())
      .writeStream.format("memory").queryName("hll_stream_test")
      .outputMode("complete").start()
    try {
      input.addData(events.take(20))
      q.processAllAvailable()
      input.addData(events.drop(20))
      q.processAllAvailable()
      val streamed = spark.table("hll_stream_test")
        .as[(Timestamp, String, Long)].collect().toSeq.sorted
      val batch = EventStreams.tumblingDistinctUsers(events.toDF())
        .as[(Timestamp, String, Long)].collect().toSeq.sorted
      // cross-micro-batch max-merge must land on the identical registers,
      // hence the identical estimate — not merely a close one
      assert(streamed == batch)
      assert(streamed.nonEmpty)
      // single window, 8 distinct users, m=16: estimate within the small-n
      // regime's generous band but never absurd
      streamed.foreach { case (_, _, estMicro) =>
        val est = estMicro.toDouble / 1e6
        assert(est > 1.0 && est < 40.0, s"estimate $est out of band for 8 distinct")
      }
    } finally q.stop()
  }

  test("sliding windows produce overlapping membership") {
    import spark.implicits._
    val out = EventStreams.slidingCounts(sample.toDF())
      .as[(Timestamp, Timestamp, String, Long)].collect()
    // each event falls in 4 sliding windows (1h window / 15m slide)
    assert(out.map(_._4).sum == sample.size * 4)
  }

  test("sessionizeBatch: gap splits match the batch oracle query") {
    import spark.implicits._
    val sessions = EventStreams.sessionizeBatch(sample.toDS())
      .collect().sortBy(s => (s.user_id, s.session_id))
    assert(sessions.map(s => (s.user_id, s.session_id, s.n_events)).toSeq ==
      Seq((1L, 1L, 2L), (1L, 2L, 1L), (1L, 3L, 1L), (2L, 1L, 2L)))
    val u1s1 = sessions.find(s => s.user_id == 1 && s.session_id == 1).get
    assert(u1s1.total_value == 15.0)
    assert(u1s1.start_us == ts(5).getTime * 1000 && u1s1.end_us == ts(20).getTime * 1000)
  }

  test("sessionize on the real events table matches the x13 SQL-shape result") {
    import spark.implicits._
    val events = Tables.events(spark, "/root/testdata/sf0.001")
      .select($"event_id", $"ts", $"user_id", $"event_type", $"value").as[Event]
    val oracle = graft.queries.Extensions.x13Sessionize(spark, "/root/testdata/sf0.001")
      .groupBy($"user_id").agg(count(lit(1)).as("n_sessions"))
      .as[(Long, Long)].collect().toMap
    // session boundaries identical → same per-user session counts
    val statefulCounts = EventStreams.sessionizeBatch(events)
      .groupBy($"user_id").agg(count(lit(1))).as[(Long, Long)].collect().toMap
    assert(statefulCounts == oracle)
  }

  test("sessionize (streaming): sessions span micro-batches, ids continue, idle flush via watermark") {
    import spark.implicits._
    val input = MemoryStream[Event](spark)
    val q = EventStreams.sessionize(input.toDS(), watermarkDelay = "0 seconds")
      .writeStream.format("memory").queryName("session_stream_test")
      .outputMode("append").start()
    def emitted(): Seq[(Long, Long, Long, Double)] =
      spark.table("session_stream_test")
        .select($"user_id", $"session_id", $"n_events", $"total_value")
        .as[(Long, Long, Long, Double)].collect().sortBy(r => (r._1, r._2)).toSeq
    def emittedFull(): Seq[(Long, Long, Long)] =
      spark.table("session_stream_test")
        .select($"user_id", $"session_id", $"start_us")
        .as[(Long, Long, Long)].collect().sortBy(r => (r._1, r._3)).toSeq
    try {
      // batch 1: user 1 opens a session (t5, t20); user 2 opens one (t10, t11)
      input.addData(Seq(sample(0), sample(1), sample(4), sample(5)))
      q.processAllAvailable()
      // open sessions are HELD, not emitted (the round-1 bug emitted them
      // every micro-batch and re-numbered them on the next)
      assert(emitted().isEmpty, s"open sessions must not be emitted: ${emitted()}")

      // batch 2: user 1 at t65 — 45-min gap closes session 1 exactly once,
      // and the CARRIED state numbers the new session 2 (not a reset to 1).
      // (The advanced watermark may also flush user 2's idle session in the
      // follow-up micro-batch — that's the timeout path working early.)
      input.addData(Seq(sample(2)))
      q.processAllAvailable()
      assert(emitted().contains((1L, 1L, 2L, 15.0)), s"session 1 must close once: ${emitted()}")
      assert(!emitted().exists(r => r._1 == 1L && r._2 == 2L), s"session 2 still open: ${emitted()}")

      // batch 3: user 3 far in the future pushes the watermark past every
      // held session's end+gap → idle sessions flush via event-time timeout
      input.addData(Seq(Event(7, ts(500), 3, "click", 1.0)))
      q.processAllAvailable()
      // one more batch so timeouts registered against the new watermark fire
      input.addData(Seq(Event(8, ts(501), 3, "click", 1.0)))
      q.processAllAvailable()
      val rows = emitted()
      assert(rows.contains((1L, 2L, 1L, 2.0)), s"user 1 session 2 must flush: $rows")
      assert(rows.contains((2L, 1L, 2L, 2.5)), s"user 2 session 1 must flush: $rows")
      // no duplicates: each emitted (user, session) appears exactly once
      assert(rows.map(r => (r._1, r._2)).distinct.size == rows.size, s"duplicate emissions: $rows")

      // documented identity caveat: after the idle flush evicted user 2's
      // state, a new burst restarts its numbering at session_id 1 — the
      // globally unique key is (user_id, start_us), not (user_id, session_id)
      input.addData(Seq(Event(9, ts(502), 2, "click", 4.0)))
      q.processAllAvailable()
      input.addData(Seq(Event(10, ts(600), 3, "click", 1.0)))
      q.processAllAvailable()
      input.addData(Seq(Event(11, ts(601), 3, "click", 1.0)))
      q.processAllAvailable()
      val u2 = emittedFull().filter(_._1 == 2L)
      assert(u2.map(_._2) == Seq(1L, 1L), s"post-flush numbering restarts at 1: $u2")
      assert(u2.map(_._3).distinct.size == 2, s"(user, start_us) stays unique: $u2")
    } finally q.stop()
  }

  test("windowedKeyDedup: streamed kept rows equal the batch x120 summary, state spans batches") {
    import spark.implicits._
    // minutes 0/1/2 share one 5-min slot; minute 6 starts the next
    val evts = Seq(
      Event(1, ts(0), 1, "click", 1.0),
      Event(2, ts(1), 1, "click", 1.0),  // in-slot dup of 1
      Event(3, ts(6), 1, "click", 1.0),  // next slot → kept
      Event(4, ts(0), 2, "click", 1.0),  // other user → kept
      Event(5, ts(0), 1, "view", 1.0),   // other type → kept
      Event(6, ts(2), 1, "click", 9.0))  // arrives in batch 2, dup of slot 0 → dropped
    val input = MemoryStream[Event](spark)
    val q = EventStreams.windowedKeyDedup(input.toDF())
      .writeStream.format("memory").queryName("wkd_test")
      .outputMode("append").start()
    try {
      input.addData(evts.take(5))
      q.processAllAvailable()
      input.addData(evts.drop(5)) // event 6 must hit batch-1 state
      q.processAllAvailable()
      val streamed = spark.table("wkd_test")
        .groupBy($"event_type").agg(count(lit(1)).as("n_kept"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      val batch = graft.ops.EventAnalytics.windowDedupSummary(
          evts.toDF(), "user_id", "event_type", "ts", slotSeconds = 300L)
        .collect().map(r => r.getString(0) -> r.getAs[Long]("n_kept")).toMap
      assert(streamed == batch)
      assert(streamed == Map("click" -> 3L, "view" -> 1L))
    } finally q.stop()
  }

  test("transformWithState running totals: state carries across batches, equals the batch twin") {
    import spark.implicits._
    val evts = Seq(
      Event(1, ts(0), 1, "click", 1.25),
      Event(2, ts(1), 1, "click", 2.50),
      Event(3, ts(2), 2, "view", 10.0),
      Event(4, ts(3), 1, "click", 0.255), // cents round-half-up → 26
      Event(5, ts(4), 2, "view", 0.004))  // → 0 cents, still counts
    val prior = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    // transformWithState requires the RocksDB state store provider
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val input = MemoryStream[Event](spark)
    val q = EventStreams.runningUserTotals(input.toDS())
      .writeStream.format("memory").queryName("tws_test")
      .outputMode("update").start()
    try {
      input.addData(evts.take(3))
      q.processAllAvailable()
      input.addData(evts.drop(3)) // batch 2 must see batch 1's state
      q.processAllAvailable()
      // update mode appends a row per touched key per batch — the LAST row
      // per key is the running total
      val finals = spark.table("tws_test")
        .groupBy($"user_id")
        .agg(max(struct($"n_events", $"total_cents")).as("m"))
        .select($"user_id", $"m.n_events", $"m.total_cents")
        .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
      val batch = evts.toDS()
        .groupBy($"user_id")
        .agg(count(lit(1)).as("n"),
          sum(expr("CAST(FLOOR(value * 100.0D + 0.5D) AS BIGINT)")).as("c"))
        .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
      assert(finals == batch)
      assert(finals(1L) == ((3L, 401L)) && finals(2L) == ((2L, 1000L)))
    } finally {
      q.stop()
      prior match {
        case Some(p) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", p)
        case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }

  test("transformWithState transitions: chain carries across batches, counts equal the batch lag twin") {
    import spark.implicits._
    val evts = Seq(
      Event(1, ts(0), 1, "view", 0.0),
      Event(2, ts(1), 1, "click", 0.0),
      Event(3, ts(2), 2, "view", 0.0),
      Event(4, ts(3), 1, "purchase", 0.0), // batch 2: chains onto batch 1's click
      Event(5, ts(4), 2, "view", 0.0))
    val prior = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val input = MemoryStream[Event](spark)
    val q = EventStreams.transitionStream(input.toDS())
      .writeStream.format("memory").queryName("trans_test")
      .outputMode("append").start()
    try {
      input.addData(evts.take(3))
      q.processAllAvailable()
      input.addData(evts.drop(3))
      q.processAllAvailable()
      val streamed = spark.table("trans_test")
        .groupBy($"from_type", $"to_type").agg(count(lit(1)).as("n"))
        .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy($"user_id").orderBy($"ts", $"event_id")
      val batch = evts.toDS()
        .withColumn("next_type", lead($"event_type", 1).over(w))
        .filter($"next_type".isNotNull)
        .groupBy($"event_type", $"next_type").agg(count(lit(1)).as("n"))
        .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
      assert(streamed == batch)
      assert(streamed == Map(("view", "click") -> 1L, ("click", "purchase") -> 1L,
        ("view", "view") -> 1L))
    } finally {
      q.stop()
      prior match {
        case Some(p) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", p)
        case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }

  test("out-of-order transitions: late same-user event in a later batch still yields stream ≡ batch") {
    import spark.implicits._
    // u1's addcart has ts BETWEEN its batch-1 events but arrives in batch 2
    // — the in-order twin would chain view→click→addcart; the batch lag
    // window (and the ooo twin) must order view→addcart→click.
    val b1 = Seq(Event(1, ts(0), 1, "view", 0.0), Event(2, ts(20), 1, "click", 0.0))
    val b2 = Seq(Event(3, ts(15), 1, "addcart", 0.0), // late: wm after b1 = t10 < t15
      Event(4, ts(40), 2, "view", 0.0))
    val b3 = Seq(Event(5, ts(60), 3, "view", 0.0))
    val b4 = Seq(Event(6, ts(80), 3, "view", 0.0))
    val b5 = Seq(Event(7, ts(200), 4, "view", 0.0)) // pushes wm past everything above
    val all = b1 ++ b2 ++ b3 ++ b4 ++ b5
    val prior = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val input = MemoryStream[Event](spark)
    val q = EventStreams.transitionStreamOoo(input.toDS(), "10 minutes")
      .writeStream.format("memory").queryName("trans_ooo_test")
      .outputMode("append").start()
    try {
      Seq(b1, b2, b3, b4, b5).foreach { b =>
        input.addData(b); q.processAllAvailable()
      }
      // one extra empty-progress cycle so the final watermark's timers fire
      input.addData(Seq(Event(8, ts(210), 4, "view", 0.0))); q.processAllAvailable()
      val streamed = spark.table("trans_ooo_test")
        .groupBy($"from_type", $"to_type").agg(count(lit(1)).as("n"))
        .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy($"user_id").orderBy($"ts", $"event_id")
      val batch = all.toDS()
        .withColumn("next_type", lead($"event_type", 1).over(w))
        .filter($"next_type".isNotNull)
        .groupBy($"event_type", $"next_type").agg(count(lit(1)).as("n"))
        .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
      assert(streamed == batch)
      // the recovered u1 chain is the EVENT-TIME order, not arrival order
      assert(streamed == Map(("view", "addcart") -> 1L, ("addcart", "click") -> 1L,
        ("view", "view") -> 1L))
    } finally {
      q.stop()
      prior match {
        case Some(p) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", p)
        case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }

  test("transformWithState event-time timers: idle alert fires when the watermark passes, re-arms on activity") {
    import spark.implicits._
    val prior = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val input = MemoryStream[Event](spark)
    // idle = 30 event-minutes
    val q = EventStreams.idleUserAlerts(input.toDS(), idleUs = 30L * 60000000L)
      .writeStream.format("memory").queryName("idle_test")
      .outputMode("append").start()
    try {
      // user 1 active at t=0 and t=10; user 2 active at t=5
      input.addData(Seq(Event(1, ts(0), 1, "click", 0.0),
        Event(2, ts(10), 1, "click", 0.0), Event(3, ts(5), 2, "view", 0.0)))
      q.processAllAvailable()
      assert(spark.table("idle_test").count() == 0) // watermark hasn't passed
      // user 2 keeps going at t=40 (re-arms); watermark → 40min: user 1's
      // timer at 10+30=40 has NOT passed (watermark must exceed it)... push
      // to t=50 in a third batch to fire user 1 only
      input.addData(Seq(Event(4, ts(40), 2, "view", 0.0)))
      q.processAllAvailable()
      input.addData(Seq(Event(5, ts(50), 2, "view", 0.0)))
      q.processAllAvailable()
      val alerts = spark.table("idle_test")
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(alerts.keySet == Set(1L)) // user 2 re-armed at 40, not idle yet
      assert(alerts(1L) == ts(10).getTime * 1000L)
    } finally {
      q.stop()
      prior match {
        case Some(p) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", p)
        case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }

  test("streamingDedup drops cross-batch duplicates within the watermark") {
    import spark.implicits._
    val input = MemoryStream[Event](spark)
    val q = EventStreams.streamingDedup(input.toDF())
      .writeStream.format("memory").queryName("dedup_test")
      .outputMode("append").start()
    try {
      input.addData(sample.take(3))
      q.processAllAvailable()
      // re-deliver an old event (duplicate) plus one new one
      input.addData(Seq(sample.head, sample(4)))
      q.processAllAvailable()
      val ids = spark.table("dedup_test").select($"event_id").as[Long].collect().sorted.toSeq
      assert(ids == Seq(1L, 2L, 3L, 5L), s"duplicate must be dropped, got $ids")
    } finally q.stop()
  }

  test("viewPurchaseJoinOuter: matches emit promptly; unmatched views wait for the watermark") {
    import spark.implicits._
    val views = MemoryStream[Event](spark)
    val purchases = MemoryStream[Event](spark)
    val q = EventStreams.viewPurchaseJoinOuter(views.toDF(), purchases.toDF())
      .select($"view_id", $"purchase_id")
      .writeStream.format("memory").queryName("outer_join_test")
      .outputMode("append").start()
    def rows() = spark.table("outer_join_test")
      .collect().map(r => (r.getLong(0), Option(r.get(1)).map(_.asInstanceOf[Long]))).toSet
    try {
      // view 1 gets a purchase in-window; view 2 never will
      views.addData(Seq(Event(1, ts(0), 1, "view", 1.0), Event(2, ts(0), 2, "view", 1.0)))
      purchases.addData(Seq(Event(10, ts(30), 1, "purchase", 5.0)))
      q.processAllAvailable()
      assert(rows().contains((1L, Some(10L))), s"matched pair must emit: ${rows()}")
      assert(!rows().exists(_._1 == 2L),
        s"view 2 must NOT emit yet - a purchase could still arrive: ${rows()}")
      // advance BOTH watermarks far past view 2's window end (+1h) — the
      // unmatched view can now never match and must surface null-padded
      views.addData(Seq(Event(3, ts(600), 9, "view", 1.0)))
      purchases.addData(Seq(Event(11, ts(600), 9, "purchase", 1.0)))
      q.processAllAvailable()
      views.addData(Seq(Event(4, ts(601), 9, "view", 1.0)))
      purchases.addData(Seq(Event(12, ts(601), 9, "purchase", 1.0)))
      q.processAllAvailable()
      assert(rows().contains((2L, None)),
        s"unmatched view must emit null-padded after the watermark: ${rows()}")
    } finally q.stop()
  }

  test("enrichEvents: stream-static broadcast join, stateless, facts never dropped") {
    import spark.implicits._
    val users = Seq((1L, "Alice", "BUILDING"), (2L, "Bob", "MACHINERY"))
      .toDF("c_custkey", "c_name", "c_mktsegment")
    val input = MemoryStream[Event](spark)
    val q = EventStreams.enrichEvents(input.toDF(), users)
      .select($"event_id", $"user_id", $"c_name")
      .writeStream.format("memory").queryName("enrich_test")
      .outputMode("append").start()
    try {
      input.addData(Seq(
        Event(1, ts(0), 1, "view", 1.0),
        Event(2, ts(1), 2, "view", 1.0),
        Event(3, ts(2), 99, "view", 1.0))) // no matching user — must survive
      q.processAllAvailable()
      val rows = spark.table("enrich_test")
        .collect().map(r => (r.getLong(0), r.getLong(1), Option(r.getString(2)))).toSet
      assert(rows == Set(
        (1L, 1L, Some("Alice")), (2L, 2L, Some("Bob")), (3L, 99L, None)))
    } finally q.stop()
    // batch plan: the static side must be a broadcast, never a shuffle join
    val batch = Seq((1L, new Timestamp(0L), 1L, "view", 1.0))
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    val plan = EventStreams.enrichEvents(batch, users)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"expected broadcast join:\n$plan")
  }

  test("availableNow trigger with checkpoint processes a parquet dir exactly once") {
    import spark.implicits._
    import org.apache.spark.sql.streaming.Trigger
    val batchDf = Tables.events(spark, "/root/testdata/sf0.001")
      .select($"event_id", $"ts", $"user_id", $"event_type", $"value")
    val dir = java.nio.file.Files.createTempDirectory("graft-an").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft-ckpt").toString
    val outDir = java.nio.file.Files.createTempDirectory("graft-out").toString
    batchDf.write.mode("overwrite").parquet(dir)
    def runOnce(): Unit = {
      val q = EventStreams.readEventStream(spark, dir, batchDf.schema)
        .writeStream.format("parquet")
        .option("path", outDir).option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination(120000)
    }
    runOnce()
    assert(spark.read.parquet(outDir).count() == batchDf.count())
    // restart from the checkpoint: nothing new to process, no duplication
    runOnce()
    assert(spark.read.parquet(outDir).count() == batchDf.count())
  }

  test("file-source stream: watermarked windowed agg over the events parquet") {
    import spark.implicits._
    val batchDf = Tables.events(spark, "/root/testdata/sf0.001")
      .select($"event_id", $"ts", $"user_id", $"event_type", $"value")
    // write a µs-normalized copy (the raw file is ns, unreadable by the stream reader)
    val dir = java.nio.file.Files.createTempDirectory("graft-stream").toString
    batchDf.write.mode("overwrite").parquet(dir)
    val stream = EventStreams.readEventStream(spark, dir, batchDf.schema)
    val q = EventStreams.tumblingCounts(stream)
      .writeStream.format("memory").queryName("file_stream_test")
      .outputMode("complete").start()
    try {
      q.processAllAvailable()
      val streamed = spark.table("file_stream_test")
        .agg(sum($"n_events")).as[Long].collect().head
      assert(streamed == batchDf.count())
    } finally q.stop()
  }

  test("stream-stream interval join: matches emit across batches, equals batch twin") {
    import spark.implicits._
    val viewEvents = Seq(
      Event(101, ts(10), 1, "view", 0.0),
      Event(102, ts(100), 1, "view", 0.0),
      Event(103, ts(5), 2, "view", 0.0))
    val purchaseEvents = Seq(
      Event(201, ts(30), 1, "purchase", 9.0),   // 20m after view 101 → match
      Event(202, ts(130), 1, "purchase", 5.0),  // 30m after view 102; 120m after 101 → only 102
      Event(203, ts(200), 2, "purchase", 3.0))  // 195m after view 103 → no match
    val views = MemoryStream[Event](spark)
    val purchases = MemoryStream[Event](spark)
    val q = EventStreams.viewPurchaseJoin(views.toDF(), purchases.toDF())
      .writeStream.format("memory").queryName("vp_join_test")
      .outputMode("append").start()
    try {
      views.addData(viewEvents)
      q.processAllAvailable()
      purchases.addData(purchaseEvents.take(1))
      q.processAllAvailable()
      purchases.addData(purchaseEvents.drop(1)) // second batch joins state buffered earlier
      q.processAllAvailable()
      val streamed = spark.table("vp_join_test")
        .select($"view_id", $"purchase_id").as[(Long, Long)].collect().toSet
      assert(streamed == Set((101L, 201L), (102L, 202L)))
      val batch = EventStreams.viewPurchaseJoin(viewEvents.toDF(), purchaseEvents.toDF())
        .select($"view_id", $"purchase_id").as[(Long, Long)].collect().toSet
      assert(batch == streamed)
    } finally q.stop()
  }

  test("sessionizeOoo: late mid-session event in a later batch still yields stream ≡ sessionizeBatch") {
    import spark.implicits._
    // u1's t15 event has ts BETWEEN its batch-1 events but arrives in
    // batch 2 — the in-order sessionize would fold it after t20 and
    // REGRESS the session end to t15; the ooo twin must replay event-time
    // order: session 1 = t0..t20 (n=3), then a gap >30min, session 2 =
    // t120 (n=1). u2 exercises the pure idle close (no held events).
    val b1 = Seq(Event(1, ts(0), 1, "view", 1.0), Event(2, ts(20), 1, "click", 2.0),
      Event(3, ts(0), 2, "view", 5.0))
    val b2 = Seq(Event(4, ts(15), 1, "addcart", 4.0), // late: wm after b1 = t10 < t15
      Event(5, ts(120), 1, "view", 8.0))
    val b3 = Seq(Event(6, ts(400), 3, "view", 0.0)) // pushes wm past t120+gap
    val b4 = Seq(Event(7, ts(900), 3, "view", 0.0)) // drains u3's own session
    val b5 = Seq(Event(8, ts(1500), 4, "view", 0.0))
    val all = b1 ++ b2 ++ b3 ++ b4 ++ b5
    val prior = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val input = MemoryStream[Event](spark)
    val q = EventStreams.sessionizeOoo(input.toDS(), watermarkDelay = "10 minutes")
      .writeStream.format("memory").queryName("sess_ooo_test")
      .outputMode("append").start()
    try {
      Seq(b1, b2, b3, b4, b5).foreach { b =>
        input.addData(b); q.processAllAvailable()
      }
      val streamed = spark.table("sess_ooo_test")
        .as[EventStreams.SessionAgg].collect().toSet
      val batch = EventStreams.sessionizeBatch(all.toDS())
        // u4's trailing session is still open in the stream (wm never
        // passes it) — compare on the sessions the watermark has sealed
        .filter($"user_id" =!= 4L)
        .as[EventStreams.SessionAgg].collect().toSet
      assert(streamed == batch, s"streamed=$streamed batch=$batch")
      val u1 = streamed.filter(_.user_id == 1L).toSeq.sortBy(_.session_id)
      assert(u1.map(s => (s.session_id, s.n_events, s.total_value)) ==
        Seq((1L, 3L, 7.0), (2L, 1L, 8.0)), s"u1=$u1")
    } finally {
      q.stop()
      prior match {
        case Some(p) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", p)
        case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }

  test("rateLimitStream: late event in a later batch gets first-seen admission (documented causal trade)") {
    import spark.implicits._
    // cap 2. u1's t5 event arrives AFTER t0,t10 already consumed the hour's
    // budget: the batch twin would admit (t0,t5) and drop t10, but a
    // streaming limiter cannot recall the already-emitted t10 — the
    // documented contract is first-seen-within-cap, pinned here so the
    // divergence stays a CHOICE, not an accident.
    val b1 = Seq(Event(1, ts(0), 1, "click", 0.0), Event(2, ts(10), 1, "click", 0.0))
    val b2 = Seq(Event(3, ts(5), 1, "click", 0.0), // late: within the 1h delay
      Event(4, ts(30), 2, "view", 0.0))
    val input = MemoryStream[Event](spark)
    val q = EventStreams.rateLimitStream(input.toDS(), maxPerHour = 2)
      .writeStream.format("memory").queryName("rate_limit_late_test")
      .outputMode("append").start()
    try {
      input.addData(b1); q.processAllAvailable()
      input.addData(b2); q.processAllAvailable()
      val streamed = spark.table("rate_limit_late_test")
        .select($"event_id").as[Long].collect().sorted.toSeq
      assert(streamed == Seq(1L, 2L, 4L), s"first-seen admission, got $streamed")
      // and the batch twin on the same data picks the event-time-first set
      val batch = graft.ops.EventAnalytics
        .rateLimit((b1 ++ b2).toDF(), "user_id", "ts", "event_id", maxPerHour = 2)
        .select($"event_id").as[Long].collect().sorted.toSeq
      assert(batch == Seq(1L, 3L, 4L))
    } finally q.stop()
  }

  test("rateLimitStream: cap counts span micro-batches and equal the batch twin in order") {
    import spark.implicits._
    // user 1: five events in hour 0 split 3+2 across batches → only first 3 admitted;
    // one in hour 1 → admitted (fresh counter). user 2: equal-ts tie → id order.
    val evts = Seq(
      Event(1, ts(0), 1, "click", 0.0), Event(2, ts(10), 1, "click", 0.0),
      Event(3, ts(20), 1, "click", 0.0), Event(4, ts(30), 1, "click", 0.0),
      Event(5, ts(40), 1, "click", 0.0), Event(6, ts(70), 1, "click", 0.0),
      Event(7, ts(50), 2, "view", 0.0), Event(8, ts(50), 2, "view", 0.0),
      Event(9, ts(50), 2, "view", 0.0), Event(10, ts(50), 2, "view", 0.0))
    val input = MemoryStream[Event](spark)
    val q = EventStreams.rateLimitStream(input.toDS(), maxPerHour = 3)
      .writeStream.format("memory").queryName("rate_limit_test")
      .outputMode("append").start()
    try {
      input.addData(evts.take(4))            // admits 1,2,3 (4 over cap)
      q.processAllAvailable()
      input.addData(evts.drop(4))            // 5 over cap; 6 new hour; 7-9 admitted, 10 over
      q.processAllAvailable()
      val streamed = spark.table("rate_limit_test")
        .select($"event_id").as[Long].collect().sorted.toSeq
      assert(streamed == Seq(1L, 2L, 3L, 6L, 7L, 8L, 9L))
      // arrival order respected event time → identical to the oracled batch twin
      val batch = graft.ops.EventAnalytics
        .rateLimit(evts.toDF(), "user_id", "ts", "event_id", maxPerHour = 3)
        .select($"event_id").as[Long].collect().sorted.toSeq
      assert(batch == streamed)
    } finally q.stop()
  }

  // ------------------------------------------------ crash recovery (r11 #8)
  // The other half of production streaming correctness: late-arrival
  // tolerance is pinned above; these pin CHECKPOINT RESTART — the query is
  // stopped with sessions/chains OPEN in state, a new query resumes from
  // the checkpoint, and the final output must equal the batch twin with no
  // session/transition lost (state recovered) and none duplicated (offsets
  // recovered). A fault-tolerant parquet sink accumulates output across
  // both query incarnations, unlike the memory sink which forgets on stop.

  private def withRocksDb[A](body: => A): A = {
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prior = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try body
    finally prior match {
      case Some(p) => spark.conf.set(key, p)
      case None => spark.conf.unset(key)
    }
  }

  test("sessionizeOoo: checkpoint restart mid-session loses nothing, duplicates nothing") {
    import spark.implicits._
    withRocksDb {
      val tmp = java.nio.file.Files.createTempDirectory("sess-restart").toString
      val input = MemoryStream[Event](spark)
      def start() = EventStreams.sessionizeOoo(input.toDS(), watermarkDelay = "10 minutes")
        .writeStream.format("parquet").option("path", s"$tmp/out")
        .option("checkpointLocation", s"$tmp/ckpt")
        .outputMode("append").start()
      // identical corpus to the late-arrival test: u1's session is OPEN at
      // the kill point and its LATE mid-session event (t15) arrives only
      // after the restart — recovery must fold it into recovered state
      val b1 = Seq(Event(1, ts(0), 1, "view", 1.0), Event(2, ts(20), 1, "click", 2.0),
        Event(3, ts(0), 2, "view", 5.0))
      val b2 = Seq(Event(4, ts(15), 1, "addcart", 4.0),
        Event(5, ts(120), 1, "view", 8.0))
      val b3 = Seq(Event(6, ts(400), 3, "view", 0.0))
      val b4 = Seq(Event(7, ts(900), 3, "view", 0.0))
      val b5 = Seq(Event(8, ts(1500), 4, "view", 0.0))
      val all = b1 ++ b2 ++ b3 ++ b4 ++ b5
      val q1 = start()
      try { input.addData(b1); q1.processAllAvailable() } finally q1.stop()
      val q2 = start() // resumes from the checkpoint, same source, same sink
      try {
        Seq(b2, b3, b4, b5).foreach { b => input.addData(b); q2.processAllAvailable() }
        val streamed = spark.read.parquet(s"$tmp/out")
          .as[EventStreams.SessionAgg].collect().toSeq
        assert(streamed.size == streamed.toSet.size,
          s"restart DUPLICATED a session: $streamed")
        val batch = EventStreams.sessionizeBatch(all.toDS())
          .filter($"user_id" =!= 4L) // trailing session never sealed by the wm
          .as[EventStreams.SessionAgg].collect().toSet
        assert(streamed.toSet == batch, s"streamed=${streamed.toSet} batch=$batch")
        // the session SPANNING the restart: opened in batch 1, late event
        // folded after recovery, sealed later — exactly once, correct agg
        val u1 = streamed.filter(_.user_id == 1L).sortBy(_.session_id)
        assert(u1.map(s => (s.session_id, s.n_events, s.total_value)) ==
          Seq((1L, 3L, 7.0), (2L, 1L, 8.0)), s"u1=$u1")
      } finally q2.stop()
    }
  }

  test("transitionStreamOoo: checkpoint restart mid-chain loses nothing, duplicates nothing") {
    import spark.implicits._
    withRocksDb {
      val tmp = java.nio.file.Files.createTempDirectory("trans-restart").toString
      val input = MemoryStream[Event](spark)
      def start() = EventStreams.transitionStreamOoo(input.toDS(), "10 minutes")
        .writeStream.format("parquet").option("path", s"$tmp/out")
        .option("checkpointLocation", s"$tmp/ckpt")
        .outputMode("append").start()
      // u1's chain is open at the kill; the late addcart (t15, event-time
      // BETWEEN the two batch-1 events) arrives only after restart — the
      // recovered buffer must still yield the event-time order
      val b1 = Seq(Event(1, ts(0), 1, "view", 0.0), Event(2, ts(20), 1, "click", 0.0))
      val b2 = Seq(Event(3, ts(15), 1, "addcart", 0.0), Event(4, ts(40), 2, "view", 0.0))
      val b3 = Seq(Event(5, ts(60), 3, "view", 0.0))
      val b4 = Seq(Event(6, ts(80), 3, "view", 0.0))
      val b5 = Seq(Event(7, ts(200), 4, "view", 0.0)) // wm past everything above
      val b6 = Seq(Event(8, ts(210), 4, "view", 0.0)) // final timers fire
      // b6 only advances the watermark; u4's own chain is never sealed, so
      // the batch twin compares the sealed prefix (b1..b5), like the
      // late-arrival test above
      val all = b1 ++ b2 ++ b3 ++ b4 ++ b5
      val q1 = start()
      try { input.addData(b1); q1.processAllAvailable() } finally q1.stop()
      val q2 = start()
      try {
        Seq(b2, b3, b4, b5, b6).foreach { b => input.addData(b); q2.processAllAvailable() }
        val streamed = spark.read.parquet(s"$tmp/out")
          .select($"user_id", $"from_type", $"to_type").collect()
          .map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSeq
        assert(streamed.size == streamed.toSet.size,
          s"restart DUPLICATED a transition: $streamed")
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy($"user_id").orderBy($"ts", $"event_id")
        val batch = all.toDS()
          .withColumn("next_type", lead($"event_type", 1).over(w))
          .filter($"next_type".isNotNull)
          .select($"user_id", $"event_type", $"next_type").collect()
          .map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSet
        assert(streamed.toSet == batch, s"streamed=${streamed.toSet} batch=$batch")
        // the chain spanning the restart recovered in EVENT-TIME order
        assert(streamed.toSet.filter(_._1 == 1L) ==
          Set((1L, "view", "addcart"), (1L, "addcart", "click")), s"$streamed")
      } finally q2.stop()
    }
  }

  test("streaming near-dup admission equals the batch incremental report") {
    import spark.implicits._
    import graft.streaming.DedupStreams
    // static lake: two near-dup docs (101/103) and one unrelated (102)
    val corpus = Seq(
      (101L, "the quick brown fox jumps over the lazy dog"),
      (102L, "completely different corpus content entirely unrelated words here"),
      (103L, "the quick brown fox jumps over the lazy dog today"))
      .toDF("doc_id", "text")
    val idxDir = java.nio.file.Files.createTempDirectory("admission-idx").toString
    val index = DedupStreams.buildAdmissionIndex(corpus, "doc_id", "text", idxDir)
    // arrivals across two micro-batches: a near-dup of the 101/103 family,
    // an exact copy of 102, and two novel documents
    val arrivals = Seq(
      DedupStreams.Arrival(1L, ts(0), "the quick brown fox jumps over the lazy dog again"),
      DedupStreams.Arrival(2L, ts(1), "novel arrival text with words never seen before anywhere"),
      DedupStreams.Arrival(3L, ts(2), "completely different corpus content entirely unrelated words here"),
      DedupStreams.Arrival(4L, ts(3), "another fresh document absent from the lake wholly"))
    val input = MemoryStream[DedupStreams.Arrival](spark)
    val q = DedupStreams.nearDupAdmission(input.toDF(), index,
      "doc_id", "ts", "text", watermarkDelay = "0 seconds")
      .writeStream.format("memory").queryName("admission_stream_test")
      .outputMode("append").start()
    try {
      input.addData(arrivals.take(2)); q.processAllAvailable()
      input.addData(arrivals.drop(2)); q.processAllAvailable()
      // far-future flushers advance the watermark past every real arrival;
      // two batches so the dedup→aggregate watermark propagation completes
      // (the flushers themselves stay held — excluded below)
      input.addData(Seq(DedupStreams.Arrival(99L, ts(500), "flusher doc zq1 zq2 zq3")))
      q.processAllAvailable()
      input.addData(Seq(DedupStreams.Arrival(98L, ts(501), "flusher doc zq4 zq5 zq6")))
      q.processAllAvailable()
      val got = spark.table("admission_stream_test")
        .filter($"doc_id" <= 4)
        .select($"doc_id", $"n_matches", $"admitted")
        .as[(Long, Long, Boolean)].collect().sortBy(_._1).toSeq
      val batch = graft.ops.Dedup.incrementalDedupReport(
        arrivals.toDF().select($"doc_id", $"text"), corpus, "doc_id", "text")
        .select($"doc_id", $"n_matches", $"admitted")
        .as[(Long, Long, Boolean)].collect().sortBy(_._1).toSeq
      assert(got == batch, s"stream=$got batch=$batch")
      // the BATCH TWIN (the x199 surface) runs the identical plan over the
      // same on-disk index and must agree row-for-row, ts included
      val twin = DedupStreams.nearDupAdmissionBatch(
        arrivals.toDF(), index, "doc_id", "ts", "text")
        .select($"doc_id", $"n_matches", $"admitted")
        .as[(Long, Long, Boolean)].collect().sortBy(_._1).toSeq
      assert(got == twin, s"stream=$got batchTwin=$twin")
      // the family exercises both outcomes, and n_matches counts are real
      assert(got == Seq((1L, 2L, false), (2L, 0L, true), (3L, 1L, false), (4L, 0L, true)),
        s"expected admissions: $got")
      // exactly one emission per arriving document
      assert(got.map(_._1).distinct.size == got.size, s"duplicate emissions: $got")
    } finally q.stop()
  }

  test("admission index reopens from disk after catalog loss — no re-index, same verdicts") {
    import spark.implicits._
    import graft.streaming.DedupStreams
    val corpus = Seq(
      (101L, "the quick brown fox jumps over the lazy dog"),
      (102L, "completely different corpus content entirely unrelated words here"),
      (103L, "the quick brown fox jumps over the lazy dog today"))
      .toDF("doc_id", "text")
    val idxDir = java.nio.file.Files.createTempDirectory("admission-reopen").toString
    val built = DedupStreams.buildAdmissionIndex(corpus, "doc_id", "text", idxDir)
    val arrivals = Seq(
      DedupStreams.Arrival(1L, ts(0), "the quick brown fox jumps over the lazy dog again"),
      DedupStreams.Arrival(2L, ts(1), "novel arrival text with words never seen before anywhere"))
      .toDF()
    def verdicts(idx: DedupStreams.AdmissionIndex) =
      DedupStreams.nearDupAdmissionBatch(arrivals, idx, "doc_id", "ts", "text")
        .select($"doc_id", $"n_matches", $"admitted")
        .as[(Long, Long, Boolean)].collect().sortBy(_._1).toSeq
    val before = verdicts(built)
    assert(before == Seq((1L, 2L, false), (2L, 0L, true)), s"built-index verdicts: $before")
    // simulate a driver bounce: the in-memory catalog loses both table
    // registrations; only the files under idxDir survive
    Seq("sets", "prefix").foreach { kind =>
      val t = spark.catalog.listTables().collect()
        .map(_.name).filter(n => n.startsWith(s"graft_adm_${kind}_"))
      t.foreach(n => spark.sql(s"DROP TABLE $n"))
    }
    val reopened = DedupStreams.openAdmissionIndex(spark, idxDir)
    assert(reopened.shingleK == built.shingleK
      && reopened.threshold == built.threshold
      && reopened.buckets == built.buckets, "meta round-trip")
    assert(verdicts(reopened) == before, "reopened index must score identically")
  }

  // ---- streaming ANN serving (AnnStreams) — fixture: two well-separated
  // directions; seeded quantizer = the two lowest-id vectors (one per
  // direction), so cell membership and every score are hand-computable.
  private def annCorpus = {
    import spark.implicits._
    Seq(
      (0L, Seq(1.0f, 0.0f, 0.0f, 0.0f)),   // seed → centroid 0
      (1L, Seq(0.0f, 1.0f, 0.0f, 0.0f)),   // seed → centroid 1
      (2L, Seq(0.9f, 0.1f, 0.0f, 0.0f)),   // cell 0
      (3L, Seq(0.1f, 0.9f, 0.0f, 0.0f)),   // cell 1
      (4L, Seq(0.8f, 0.0f, 0.2f, 0.0f)))   // cell 0
      .toDF("vec_id", "embedding")
  }
  private def annArrival(id: Long, t: java.sql.Timestamp, v: Seq[Float]) =
    graft.streaming.AnnStreams.Arrival(id, t, v)

  test("streaming ANN serve equals the batch twin; ranks match hand truth") {
    import spark.implicits._
    import graft.streaming.AnnStreams
    val idxDir = java.nio.file.Files.createTempDirectory("annserve-idx").toString
    val index = AnnStreams.buildServingIndex(
      annCorpus, "vec_id", "embedding", idxDir, nlist = 2, trained = false)
    // queries: one per cluster, across two micro-batches
    val arrivals = Seq(
      annArrival(100L, ts(0), Seq(1.0f, 0.05f, 0.0f, 0.0f)),  // x-cluster
      annArrival(101L, ts(1), Seq(0.05f, 1.0f, 0.0f, 0.0f)))  // y-cluster
    val input = MemoryStream[AnnStreams.Arrival](spark)
    val q = AnnStreams.annServe(input.toDF(), index,
      "query_id", "ts", "embedding", k = 2, nprobe = 1,
      watermarkDelay = "0 seconds")
      .writeStream.format("memory").queryName("ann_serve_test")
      .outputMode("append").start()
    try {
      input.addData(arrivals.take(1)); q.processAllAvailable()
      input.addData(arrivals.drop(1)); q.processAllAvailable()
      // watermark flushers (held themselves)
      input.addData(Seq(annArrival(998L, ts(500), Seq(0.5f, 0.5f, 0.0f, 0.0f))))
      q.processAllAvailable()
      input.addData(Seq(annArrival(999L, ts(501), Seq(0.5f, 0.5f, 0.0f, 0.0f))))
      q.processAllAvailable()
      val got = spark.table("ann_serve_test")
        .filter($"query_id" < 900)
        .select($"query_id", $"rank", $"item_id")
        .as[(Long, Int, Long)].collect().sortBy(r => (r._1, r._2)).toSeq
      // hand truth at nprobe=1: query 100 probes cell 0 = {0, 2, 4};
      // top-2 by cosine: item 2 (cos≈0.9985 — aligned with the query's
      // small y component) then item 0 (cos≈0.9988? no: cos(q,0)=
      // 1/|q|≈0.99875, cos(q,2)=(0.9+0.005)/(|q||v2|)≈0.99876) — assert
      // against the batch twin instead of fragile float hand-math, then
      // pin the MEMBERSHIP (both hits from cell 0).
      val twin = AnnStreams.annServeBatch(arrivals.toDF(), index,
        "query_id", "ts", "embedding", k = 2, nprobe = 1)
        .select($"query_id", $"rank", $"item_id")
        .as[(Long, Int, Long)].collect().sortBy(r => (r._1, r._2)).toSeq
      assert(got == twin, s"stream=$got batchTwin=$twin")
      assert(got.map(_._1).distinct == Seq(100L, 101L))
      assert(got.count(_._1 == 100L) == 2 && got.count(_._1 == 101L) == 2)
      // cell membership: query 100's hits ⊆ cell 0 = {0,2,4}; 101's ⊆ {1,3}
      assert(got.filter(_._1 == 100L).map(_._3).forall(Set(0L, 2L, 4L)))
      assert(got.filter(_._1 == 101L).map(_._3).forall(Set(1L, 3L)))
      // ranks are 1..k with the best-cosine item first (hand truth: 101's
      // nearest is item 1 — exact axis alignment beats (0.1, 0.9))
      assert(got.filter(_._1 == 101L).sortBy(_._2).map(_._3) == Seq(1L, 3L))
    } finally q.stop()
  }

  test("ANN serving index reopens from disk after catalog loss — same results; empty-candidate query still surfaces") {
    import spark.implicits._
    import graft.streaming.AnnStreams
    val idxDir = java.nio.file.Files.createTempDirectory("annserve-reopen").toString
    val built = AnnStreams.buildServingIndex(
      annCorpus, "vec_id", "embedding", idxDir, nlist = 2, trained = false)
    val arrivals = Seq(
      annArrival(100L, ts(0), Seq(1.0f, 0.05f, 0.0f, 0.0f)),
      annArrival(101L, ts(1), Seq(0.05f, 1.0f, 0.0f, 0.0f))).toDF()
    def serve(idx: AnnStreams.ServingIndex) =
      AnnStreams.annServeBatch(arrivals, idx, "query_id", "ts", "embedding",
        k = 3, nprobe = 2)
        .select($"query_id", $"rank", $"item_id")
        .as[(Long, Int, Long)].collect().sortBy(r => (r._1, r._2)).toSeq
    val before = serve(built)
    // nprobe=2 reaches both cells: each query sees all 5 corpus vectors
    assert(before.count(_._1 == 100L) == 3 && before.count(_._1 == 101L) == 3)
    spark.catalog.listTables().collect().map(_.name)
      .filter(_.startsWith("graft_ann_cells_"))
      .foreach(n => spark.sql(s"DROP TABLE $n"))
    val reopened = AnnStreams.openServingIndex(spark, idxDir)
    assert(reopened.nlist == built.nlist && reopened.buckets == built.buckets)
    assert(reopened.centroids.map(_._1).toSeq == built.centroids.map(_._1).toSeq)
    assert(reopened.centroids.map(_._2.toSeq).toSeq == built.centroids.map(_._2.toSeq).toSeq)
    assert(serve(reopened) == before, "reopened index must score identically")
    // a query that matches ONLY itself (self-exclusion) still surfaces,
    // with NULL rank/item — the every-arrival-gets-a-verdict contract
    val selfOnly = Seq(annArrival(0L, ts(0), Seq(1.0f, 0.0f, 0.0f, 0.0f))).toDF()
    val verdict = AnnStreams.annServeBatch(selfOnly,
      AnnStreams.buildServingIndex(
        annCorpus.filter($"vec_id" === 0L), "vec_id", "embedding",
        java.nio.file.Files.createTempDirectory("annserve-self").toString,
        nlist = 1, trained = false),
      "query_id", "ts", "embedding", k = 2, nprobe = 1)
      .select($"query_id", $"rank", $"item_id").collect()
    assert(verdict.length == 1 && verdict.head.getLong(0) == 0L
      && verdict.head.isNullAt(1) && verdict.head.isNullAt(2))
  }

  test("ANN index maintenance: streamed appends serve like a same-centroid rebuild; batch replay is idempotent") {
    import spark.implicits._
    import graft.streaming.AnnStreams
    val tmp = java.nio.file.Files.createTempDirectory("annserve-append").toString
    // base = ids 0..2 (seeds are ids 0,1 — present in BOTH the partial and
    // the full corpus, so the fixed-centroid contract makes the rebuilt
    // index's quantizer identical)
    val base = annCorpus.filter($"vec_id" <= 2)
    val idx = AnnStreams.buildServingIndex(
      base, "vec_id", "embedding", s"$tmp/idx", nlist = 2, trained = false)
    assert(idx.appends.isEmpty, "fresh index has no append tail")
    // stream ids 3,4 into the index across two micro-batches
    val late = annCorpus.filter($"vec_id" >= 3)
      .as[(Long, Seq[Float])].collect().toSeq
    val input = MemoryStream[(Long, Seq[Float])](spark)
    val q = AnnStreams.appendStream(
      input.toDF().toDF("vec_id", "embedding"), idx,
      "vec_id", "embedding", s"$tmp/ckpt")
    try {
      input.addData(late.take(1)); q.processAllAvailable()
      input.addData(late.drop(1)); q.processAllAvailable()
    } finally q.stop()
    // a handle opened AFTER the appends sees them (the visibility contract)
    val reopened = AnnStreams.openServingIndex(spark, s"$tmp/idx")
    assert(reopened.appends.count() == 2)
    val arrivals = Seq(
      annArrival(100L, ts(0), Seq(1.0f, 0.05f, 0.0f, 0.0f)),
      annArrival(101L, ts(1), Seq(0.05f, 1.0f, 0.0f, 0.0f))).toDF()
    def results(idx: AnnStreams.ServingIndex) =
      AnnStreams.annServeBatch(arrivals, idx, "query_id", "ts", "embedding",
        k = 3, nprobe = 2)
        .select($"query_id", $"rank", $"item_id")
        .as[(Long, Int, Long)].collect().sortBy(r => (r._1, r._2)).toSeq
    val viaAppends = results(reopened)
    // ground truth: a full rebuild over the whole corpus — same seeded
    // centroids (ids 0,1), so results must be IDENTICAL
    val rebuilt = AnnStreams.buildServingIndex(
      annCorpus, "vec_id", "embedding", s"$tmp/idx-full", nlist = 2, trained = false)
    assert(viaAppends == results(rebuilt),
      s"appends=$viaAppends rebuild=${results(rebuilt)}")
    // appended vectors actually answer queries (id 3 is the y-cluster's
    // second-best neighbor; it was absent from the base index)
    assert(viaAppends.filter(_._1 == 101L).map(_._3).contains(3L))
    // replay idempotence: a fresh checkpoint re-delivers the same data with
    // the same batchIds; batch=<id> overwrite must leave contents unchanged
    val input2 = MemoryStream[(Long, Seq[Float])](spark)
    val q2 = AnnStreams.appendStream(
      input2.toDF().toDF("vec_id", "embedding"), reopened,
      "vec_id", "embedding", s"$tmp/ckpt2")
    try {
      input2.addData(late.take(1)); q2.processAllAvailable()
      input2.addData(late.drop(1)); q2.processAllAvailable()
    } finally q2.stop()
    val replayed = AnnStreams.openServingIndex(spark, s"$tmp/idx")
    assert(replayed.appends.count() == 2,
      "replayed batches must overwrite their own output, not duplicate it")
    assert(results(replayed) == viaAppends)
    // compaction rolls base + tail forward to a fresh bucketed base
    // (blue/green) — empty tail, same vectors, identical results
    val compacted = AnnStreams.compactIndex(spark, s"$tmp/idx", s"$tmp/idx-compact")
    assert(compacted.appends.isEmpty && compacted.cells.count() == 5)
    assert(results(compacted) == viaAppends)
    assert(results(AnnStreams.openServingIndex(spark, s"$tmp/idx")) == viaAppends,
      "the old index must stay readable after compaction")
  }

  test("ANN serving survives a checkpoint restart without duplicate or lost answers") {
    import spark.implicits._
    import graft.streaming.AnnStreams
    val tmp = java.nio.file.Files.createTempDirectory("annserve-restart").toString
    AnnStreams.buildServingIndex(
      annCorpus, "vec_id", "embedding", s"$tmp/idx", nlist = 2, trained = false)
    val input = MemoryStream[AnnStreams.Arrival](spark)
    def start() = AnnStreams.annServe(input.toDF(),
      AnnStreams.openServingIndex(spark, s"$tmp/idx"),
      "query_id", "ts", "embedding", k = 2, nprobe = 1,
      watermarkDelay = "0 seconds")
      .writeStream.format("parquet").option("path", s"$tmp/out")
      .option("checkpointLocation", s"$tmp/ckpt")
      .outputMode("append").start()
    val q1 = start()
    try {
      input.addData(Seq(annArrival(100L, ts(0), Seq(1.0f, 0.05f, 0.0f, 0.0f))))
      q1.processAllAvailable()
    } finally q1.stop()
    val q2 = start()
    try {
      input.addData(Seq(annArrival(101L, ts(1), Seq(0.05f, 1.0f, 0.0f, 0.0f))))
      q2.processAllAvailable()
      input.addData(Seq(annArrival(998L, ts(500), Seq(0.5f, 0.5f, 0.0f, 0.0f))))
      q2.processAllAvailable()
      input.addData(Seq(annArrival(999L, ts(501), Seq(0.5f, 0.5f, 0.0f, 0.0f))))
      q2.processAllAvailable()
      val got = spark.read.parquet(s"$tmp/out")
        .filter($"query_id" < 900)
        .select($"query_id", $"rank", $"item_id")
        .as[(Long, Int, Long)].collect().sortBy(r => (r._1, r._2)).toSeq
      assert(got.map(r => (r._1, r._2)).distinct.size == got.size,
        s"duplicate (query, rank) emissions after restart: $got")
      assert(got.count(_._1 == 100L) == 2 && got.count(_._1 == 101L) == 2,
        s"restart must neither lose nor duplicate an answer: $got")
    } finally q2.stop()
  }

  test("admission index maintenance: streamed appends reject future near-dups like a rebuild; replay idempotent") {
    import spark.implicits._
    import graft.streaming.DedupStreams
    val tmp = java.nio.file.Files.createTempDirectory("admission-append").toString
    val corpusA = Seq(
      (101L, "the quick brown fox jumps over the lazy dog"),
      (102L, "completely different corpus content entirely unrelated words here"))
      .toDF("doc_id", "text")
    val idx = DedupStreams.buildAdmissionIndex(corpusA, "doc_id", "text", s"$tmp/idx")
    assert(idx.prefixAppends.isEmpty && idx.setsAppends.isEmpty)
    // stream two ADMITTED (novel) documents into the index
    val admitted = Seq(
      (201L, "a freshly admitted document about winter harvest schedules"),
      (202L, "unique prose concerning tidal measurement instruments"))
    val input = MemoryStream[(Long, String)](spark)
    val q = DedupStreams.appendToIndex(
      input.toDF().toDF("doc_id", "text"), idx, "doc_id", "text", s"$tmp/ckpt")
    try {
      input.addData(admitted.take(1)); q.processAllAvailable()
      input.addData(admitted.drop(1)); q.processAllAvailable()
    } finally q.stop()
    val reopened = DedupStreams.openAdmissionIndex(spark, s"$tmp/idx")
    assert(reopened.setsAppends.count() == 2 && reopened.prefixAppends.count() > 0)
    // new arrivals: a near-dup of an APPENDED doc (must now be rejected),
    // a near-dup of a base doc, and a novel one
    val arrivals = Seq(
      DedupStreams.Arrival(1L, ts(0), "a freshly admitted document about winter harvest schedules today"),
      DedupStreams.Arrival(2L, ts(1), "the quick brown fox jumps over the lazy dog again"),
      DedupStreams.Arrival(3L, ts(2), "wholly novel arrival text with words never seen anywhere"))
      .toDF()
    def verdicts(i: DedupStreams.AdmissionIndex) =
      DedupStreams.nearDupAdmissionBatch(arrivals, i, "doc_id", "ts", "text")
        .select($"doc_id", $"n_matches", $"admitted")
        .as[(Long, Long, Boolean)].collect().sortBy(_._1).toSeq
    val got = verdicts(reopened)
    assert(got == Seq((1L, 1L, false), (2L, 1L, false), (3L, 0L, true)),
      s"appended docs must reject future near-dups: $got")
    // ground truth: a full rebuild over corpusA ∪ admitted — the hot order
    // differs, but PPJoin exactness holds under ANY consistent order, so
    // the VERDICTS must be identical
    val rebuilt = DedupStreams.buildAdmissionIndex(
      corpusA.unionAll(admitted.toDF("doc_id", "text")), "doc_id", "text", s"$tmp/idx-full")
    assert(got == verdicts(rebuilt))
    // replay idempotence: fresh checkpoint, same data, same batchIds
    val input2 = MemoryStream[(Long, String)](spark)
    val q2 = DedupStreams.appendToIndex(
      input2.toDF().toDF("doc_id", "text"), reopened, "doc_id", "text", s"$tmp/ckpt2")
    try {
      input2.addData(admitted.take(1)); q2.processAllAvailable()
      input2.addData(admitted.drop(1)); q2.processAllAvailable()
    } finally q2.stop()
    val replayed = DedupStreams.openAdmissionIndex(spark, s"$tmp/idx")
    assert(replayed.setsAppends.count() == 2,
      "replayed batches must overwrite, not duplicate")
    assert(verdicts(replayed) == got)
    // compaction: fresh bucketed base at a new location, empty tail,
    // verdicts unchanged (hot order carried verbatim — exact under any
    // consistent order)
    val compacted = DedupStreams.compactAdmissionIndex(
      spark, s"$tmp/idx", s"$tmp/idx-compact")
    assert(compacted.setsAppends.isEmpty && compacted.prefixAppends.isEmpty)
    assert(compacted.sets.count() == 4)
    assert(verdicts(compacted) == got)
  }

  test("reindexAdmission keeps verdicts and restores pruning quality on a drifted corpus") {
    import spark.implicits._
    import graft.streaming.DedupStreams
    val tmp = java.nio.file.Files.createTempDirectory("admission-reindex").toString
    // base corpus: all-unique vocabularies — at build time NOTHING is hot,
    // so the persisted prefix order knows no boilerplate
    val base = Seq(
      (101L, "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda"),
      (102L, "crimson harbor lantern whistle granite meadow copper thistle ember willow anchor"))
      .toDF("doc_id", "text")
    val idx = DedupStreams.buildAdmissionIndex(
      base, "doc_id", "text", s"$tmp/idx", shingleK = 3, threshold = 0.8)
    // DRIFT: stream in a cluster sharing a 9-token boilerplate head (its
    // shingles reach df≈10 — boilerplate-hot — but the index's frozen
    // order still ranks them 0/unknown, so they keep entering prefixes)
    val boiler = "standard corporate disclaimer header applies to this entire document"
    val appended = (0 until 10).map(i => (200L + i, s"$boiler uniq${i}a uniq${i}b"))
    val input = MemoryStream[(Long, String)](spark)
    val q = DedupStreams.appendToIndex(
      input.toDF().toDF("doc_id", "text"),
      idx, "doc_id", "text", s"$tmp/ckpt")
    try { input.addData(appended); q.processAllAvailable() } finally q.stop()
    val drifted = DedupStreams.openAdmissionIndex(spark, s"$tmp/idx")
    assert(drifted.setsAppends.count() == 10)
    // arrivals: three boilerplate-headed novel docs (J = 7/11 < 0.8 vs any
    // appended doc — NOT near-dups) and one exact copy of an appended doc
    val arrivals = Seq(
      DedupStreams.Arrival(1L, ts(0), s"$boiler fresh0a fresh0b"),
      DedupStreams.Arrival(2L, ts(1), s"$boiler fresh1a fresh1b"),
      DedupStreams.Arrival(3L, ts(2), s"$boiler fresh2a fresh2b"),
      DedupStreams.Arrival(4L, ts(3), s"$boiler uniq0a uniq0b")).toDF()
    def verdicts(i: DedupStreams.AdmissionIndex) =
      DedupStreams.nearDupAdmissionBatch(arrivals, i, "doc_id", "ts", "text")
        .select($"doc_id", $"n_matches", $"admitted")
        .as[(Long, Long, Boolean)].collect().sortBy(_._1).toSeq
    val got = verdicts(drifted)
    assert(got == Seq((1L, 0L, true), (2L, 0L, true), (3L, 0L, true), (4L, 1L, false)),
      s"drifted-index verdicts: $got")
    val candBefore = DedupStreams.candidatePairCount(
      arrivals, drifted, "doc_id", "text")
    // re-index: same documents, hot order RECOMPUTED over base + tail —
    // the boilerplate shingles are now ranked last and leave the prefixes
    val reindexed = DedupStreams.reindexAdmission(spark, s"$tmp/idx", s"$tmp/idx-re")
    assert(reindexed.setsAppends.isEmpty && reindexed.prefixAppends.isEmpty)
    assert(reindexed.sets.count() == 12)
    // verdicts are ORDER-INVARIANT: exact PPJoin under any consistent order
    assert(verdicts(reindexed) == got,
      "re-indexing must never change an admission verdict")
    val candAfter = DedupStreams.candidatePairCount(
      arrivals, reindexed, "doc_id", "text")
    // pruning quality: under the stale order every boilerplate-headed
    // arrival collides with most of the drifted cluster; under the fresh
    // order only the true near-dup pair survives the prefix filter
    assert(candBefore > candAfter,
      s"re-index must cut candidates on a drifted corpus: $candBefore -> $candAfter")
    assert(candAfter <= 3,
      s"fresh order should leave only the true pair (+hash ties): $candAfter")
    // the old index stays readable (blue/green)
    assert(verdicts(DedupStreams.openAdmissionIndex(spark, s"$tmp/idx")) == got)
  }

  test("near-dup admission survives a checkpoint restart without duplicate or lost verdicts") {
    import spark.implicits._
    import graft.streaming.DedupStreams
    val corpus = Seq(
      (101L, "the quick brown fox jumps over the lazy dog"),
      (102L, "completely different corpus content entirely unrelated words here"))
      .toDF("doc_id", "text")
    val tmp = java.nio.file.Files.createTempDirectory("admission-restart").toString
    DedupStreams.buildAdmissionIndex(corpus, "doc_id", "text", s"$tmp/idx")
    val input = MemoryStream[DedupStreams.Arrival](spark)
    // each start() REOPENS the index from disk — the restart path a real
    // deployment takes (the catalog may or may not still hold the tables;
    // openAdmissionIndex handles both)
    def start() = DedupStreams.nearDupAdmission(input.toDF(),
      DedupStreams.openAdmissionIndex(spark, s"$tmp/idx"),
      "doc_id", "ts", "text", watermarkDelay = "0 seconds")
      .writeStream.format("parquet").option("path", s"$tmp/out")
      .option("checkpointLocation", s"$tmp/ckpt")
      .outputMode("append").start()
    val q1 = start()
    // batch 1 lands, then the query is killed mid-stream (its verdicts are
    // still held in state — the watermark hasn't passed them)
    try {
      input.addData(Seq(
        DedupStreams.Arrival(1L, ts(0), "the quick brown fox jumps over the lazy dog again"),
        DedupStreams.Arrival(2L, ts(1), "novel arrival text with words never seen before anywhere")))
      q1.processAllAvailable()
    } finally q1.stop()
    // restart from the checkpoint: held state recovers, later batches both
    // extend it and flush it
    val q2 = start()
    try {
      input.addData(Seq(
        DedupStreams.Arrival(3L, ts(2), "completely different corpus content entirely unrelated words here")))
      q2.processAllAvailable()
      input.addData(Seq(DedupStreams.Arrival(99L, ts(500), "flusher zq1 zq2 zq3")))
      q2.processAllAvailable()
      input.addData(Seq(DedupStreams.Arrival(98L, ts(501), "flusher zq4 zq5 zq6")))
      q2.processAllAvailable()
      val got = spark.read.parquet(s"$tmp/out")
        .filter($"doc_id" <= 4)
        .select($"doc_id", $"n_matches", $"admitted")
        .as[(Long, Long, Boolean)].collect().sortBy(_._1).toSeq
      assert(got == Seq((1L, 1L, false), (2L, 0L, true), (3L, 1L, false)),
        s"restart must neither lose nor duplicate a verdict: $got")
    } finally q2.stop()
  }
}
