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

  test("sliding windows produce overlapping membership") {
    import spark.implicits._
    val out = EventStreams.slidingCounts(sample.toDF())
      .as[(Timestamp, Timestamp, String, Long)].collect()
    // each event falls in 4 sliding windows (1h window / 15m slide)
    assert(out.map(_._4).sum == sample.size * 4)
  }

  test("sessionize (flatMapGroupsWithState): gap splits match the batch oracle query") {
    import spark.implicits._
    val sessions = EventStreams.sessionize(sample.toDS())
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
    val statefulCounts = EventStreams.sessionize(events)
      .groupBy($"user_id").agg(count(lit(1))).as[(Long, Long)].collect().toMap
    assert(statefulCounts == oracle)
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
}
