package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.streaming.StreamingCuration
import graft.streaming.StreamingCuration.DocIn

/** Streaming curation twins: the stateful per-source cap must behave like
  * the batch perGroupCap over the stream's lifetime, and the composed flow
  * must gate + dedup + cap across micro-batches. */
class StreamingCurationSpec extends SparkSpec {

  private def ts(min: Int): Timestamp = new Timestamp(1704067200000L + min * 60000L)

  // English-looking text that passes the default gates (stopwords present)
  private def txt(i: Int) = s"the quick brown fox $i is one of the animals in the story"

  test("perSourceCapStream: admission count carries across micro-batches") {
    import spark.implicits._
    val input = MemoryStream[DocIn](spark)
    val q = StreamingCuration.perSourceCapStream(input.toDS(), n = 3)
      .writeStream.format("memory").queryName("cap_stream_test")
      .outputMode("append").start()
    def ids(): Seq[Long] =
      spark.table("cap_stream_test").select($"doc_id").as[Long].collect().sorted.toSeq
    try {
      input.addData(Seq(
        DocIn(1, ts(1), "web", txt(1)), DocIn(2, ts(2), "web", txt(2)),
        DocIn(10, ts(1), "books", txt(10))))
      q.processAllAvailable()
      assert(ids() == Seq(1L, 2L, 10L), s"under cap, all pass: ${ids()}")
      // batch 2: web has 1 slot left of 3 — lowest doc_id wins, rest drop
      input.addData(Seq(
        DocIn(4, ts(3), "web", txt(4)), DocIn(3, ts(4), "web", txt(3)),
        DocIn(5, ts(5), "web", txt(5)), DocIn(11, ts(2), "books", txt(11))))
      q.processAllAvailable()
      assert(ids() == Seq(1L, 2L, 3L, 10L, 11L),
        s"web capped at 3 (doc 3 admitted, 4 and 5 dropped): ${ids()}")
      // batch 3: web stays closed forever
      input.addData(Seq(DocIn(6, ts(6), "web", txt(6))))
      q.processAllAvailable()
      assert(!ids().contains(6L), s"capped source must stay closed: ${ids()}")
    } finally q.stop()
  }

  test("curateStream: checkpointed AvailableNow restart is exactly-once (state recovered)") {
    import spark.implicits._
    import org.apache.spark.sql.streaming.Trigger
    val srcDir = java.nio.file.Files.createTempDirectory("graft-cur-src").toString
    val outDir = java.nio.file.Files.createTempDirectory("graft-cur-out").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft-cur-ckpt").toString
    val schema = Seq.empty[DocIn].toDS().schema
    def runOnce(): Unit = {
      val stream = spark.readStream.schema(schema).parquet(srcDir).as[DocIn]
      val q = StreamingCuration.curateStream(stream,
        watermarkDelay = "365 days", minStopRatio = 0.05, maxPerSource = 2)
        .writeStream.format("parquet")
        .option("path", outDir).option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination(120000)
    }
    // run 1: two web docs admitted (cap 2 reached), one duplicate-free books doc
    Seq(DocIn(1, ts(1), "web", txt(1)), DocIn(2, ts(2), "web", txt(2)),
      DocIn(10, ts(3), "books", txt(10)))
      .toDS().write.mode("append").parquet(srcDir)
    runOnce()
    val after1 = spark.read.parquet(outDir).select($"doc_id").as[Long].collect().sorted.toSeq
    assert(after1 == Seq(1L, 2L, 10L), s"run 1 admits all three: $after1")
    // run 2 (restart from checkpoint): a dup of doc 1's TEXT must be dropped
    // by recovered dedup state; web is at cap from run 1's recovered counter;
    // one genuinely new books doc passes
    Seq(DocIn(20, ts(4), "web", txt(1)),   // cross-RESTART duplicate text
      DocIn(21, ts(5), "web", txt(21)),    // web over recovered cap
      DocIn(22, ts(6), "books", txt(22)))
      .toDS().write.mode("append").parquet(srcDir)
    runOnce()
    val after2 = spark.read.parquet(outDir).select($"doc_id").as[Long].collect().sorted.toSeq
    assert(after2 == Seq(1L, 2L, 10L, 22L),
      s"restart must not re-emit, dup must drop, cap must persist: $after2")
  }

  test("upsertSink: micro-batches fold into a keep-latest snapshot; idempotent re-merge") {
    import spark.implicits._
    case class Upd(k: Long, v: String, version: Long)
    val input = MemoryStream[(Long, String, Long)](spark)
    val base = java.nio.file.Files.createTempDirectory("graft-upsink").toString
    val dir = s"$base/snap"; val ckpt = s"$base/ckpt"
    val q = StreamingCuration.upsertSink(
      input.toDF().toDF("k", "v", "version"), dir, "k", "version", ckpt)
    def snap(): Map[Long, (String, Long)] =
      spark.read.parquet(s"$dir/current")
        .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2)))).toMap
    try {
      input.addData(Seq((1L, "a", 1L), (2L, "b", 1L)))
      q.processAllAvailable()
      assert(snap() == Map(1L -> (("a", 1L)), 2L -> (("b", 1L))))
      // batch 2: update key 1, insert key 3; key 2 untouched survives
      input.addData(Seq((1L, "a2", 2L), (3L, "c", 2L)))
      q.processAllAvailable()
      assert(snap() == Map(1L -> (("a2", 2L)), 2L -> (("b", 1L)), 3L -> (("c", 2L))))
      // batch 3: stale version loses against the snapshot
      input.addData(Seq((1L, "a_old", 1L)))
      q.processAllAvailable()
      assert(snap()(1L) == (("a2", 2L)), s"stale update must lose: ${snap()}")
    } finally q.stop()
  }

  test("curateStream: gates filter, cross-batch exact dups drop, caps hold") {
    import spark.implicits._
    val input = MemoryStream[DocIn](spark)
    val q = StreamingCuration.curateStream(input.toDS(),
      watermarkDelay = "2 hours", minStopRatio = 0.05, maxPerSource = 2)
      .writeStream.format("memory").queryName("curate_stream_test")
      .outputMode("append").start()
    def ids(): Seq[Long] =
      spark.table("curate_stream_test").select($"doc_id").as[Long].collect().sorted.toSeq
    try {
      input.addData(Seq(
        DocIn(1, ts(1), "web", txt(1)),
        DocIn(2, ts(2), "web", "zzz qqq xxx"), // no stopwords → gated out
        DocIn(3, ts(3), "web", txt(3))))
      q.processAllAvailable()
      assert(ids() == Seq(1L, 3L), s"quality gate must drop doc 2: ${ids()}")
      input.addData(Seq(
        DocIn(4, ts(4), "web", txt(1)),       // exact dup of doc 1 (prior batch)
        DocIn(5, ts(5), "books", txt(5)),
        DocIn(6, ts(6), "web", txt(6))))      // web already at cap 2
      q.processAllAvailable()
      assert(ids() == Seq(1L, 3L, 5L),
        s"dup 4 dropped cross-batch, 6 over cap, 5 admitted: ${ids()}")
    } finally q.stop()
  }

  test("trendingTokens: streamed windowed counts equal the batch twin; top-k ranks on read") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, row_number}
    import org.apache.spark.sql.expressions.Window
    val batch1 = Seq(
      DocIn(1, ts(1), "web", "spark spark flink"),
      DocIn(2, ts(5), "web", "spark duck"))
    val batch2 = Seq(
      DocIn(3, ts(65), "web", "duck duck goose"),   // next hour window
      DocIn(4, ts(10), "web", "flink spark"))        // late, same first window
    val input = MemoryStream[DocIn](spark)
    val q = StreamingCuration.trendingTokens(input.toDS().toDF())
      .writeStream.format("memory").queryName("trend_test")
      .outputMode("complete").start()
    try {
      input.addData(batch1); q.processAllAvailable()
      input.addData(batch2); q.processAllAvailable()
      val streamed = spark.table("trend_test")
        .select($"window_start", $"token", $"n")
        .as[(java.sql.Timestamp, String, Long)].collect().sorted.toSeq
      val batchTwin = StreamingCuration.trendingTokens(
        (batch1 ++ batch2).toDF())
        .as[(java.sql.Timestamp, String, Long)].collect().sorted.toSeq
      assert(streamed == batchTwin, s"stream != batch:\n$streamed\n$batchTwin")
      // serve-side ranking: the hour-1 top token is spark (4 occurrences)
      val top = spark.table("trend_test")
        .withColumn("rk", row_number().over(
          Window.partitionBy($"window_start").orderBy($"n".desc, $"token")))
        .filter(col("rk") === 1)
        .select($"token", $"n").as[(String, Long)].collect().toSet
      assert(top.contains(("spark", 4L)), s"hour-1 top should be spark x4: $top")
    } finally q.stop()
  }

  test("bloomScreenStream: contaminated docs never admitted; clean docs pass across batches") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, explode}
    // eval set: two benchmark sentences; build the bloom batch-side
    val eval_ = Seq(
      (100L, "the capital of france is paris city"),
      (101L, "water boils at one hundred degrees celsius")
    ).toDF("doc_id", "text")
    val evalGrams = graft.ops.Dedup.shingleSets(eval_, "doc_id", "text", 5)
      .select(explode(col("shingles")).as("gram")).distinct()
    val bits: Array[Long] = evalGrams
      .agg(graft.functions.BloomAgg.bloom_agg(col("gram"), 1 << 17).as("b"))
      .head.getSeq[Long](0).toArray
    val input = MemoryStream[DocIn](spark)
    val q = StreamingCuration.bloomScreenStream(input.toDS(), bits, shingleK = 5)
      .writeStream.format("memory").queryName("bloom_stream_test")
      .outputMode("append").start()
    def ids(): Seq[Long] =
      spark.table("bloom_stream_test").select($"doc_id").as[Long].collect().sorted.toSeq
    try {
      input.addData(Seq(
        // shares the 5-gram "the capital of france is" with the eval set
        DocIn(1, ts(1), "web", "everyone knows the capital of france is paris indeed"),
        DocIn(2, ts(2), "web", txt(2))))
      q.processAllAvailable()
      assert(ids() == Seq(2L), s"leaked doc must drop, clean doc pass: ${ids()}")
      input.addData(Seq(
        DocIn(3, ts(3), "web", "as they say water boils at one hundred degrees celsius always"),
        DocIn(4, ts(4), "web", txt(4))))
      q.processAllAvailable()
      assert(ids() == Seq(2L, 4L), s"second-batch leak must drop too: ${ids()}")
    } finally q.stop()
  }
}
