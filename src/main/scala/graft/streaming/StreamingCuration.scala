package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming twins of the corpus-curation operators (ops.Curation /
  * ops.Dedup exact path) for a continuously-arriving documents stream.
  *
  * Composition mirrors the batch `Curation.curateFlow`:
  *  1. quality + language gates — STATELESS per-row filters, identical
  *     Columns as batch (nothing streaming-specific to do);
  *  2. exact dedup — `dropDuplicatesWithinWatermark` on the 128-bit text
  *     hash: state bounded by the watermark horizon, duplicates dropped
  *     across micro-batches;
  *  3. per-source cap — explicit keyed state (one counter per source):
  *     the first `n` admitted docs per source pass, everything after drops.
  *
  * State-size accounting at 100 TB/day: (2) holds one 16-byte hash per doc
  * inside the watermark window (the knob is the delay); (3) holds ONE LONG
  * per distinct source, forever — sources are a small closed set, so
  * NoTimeout is deliberate (evicting a counter would re-open a capped
  * source's quota).
  */
object StreamingCuration {

  case class DocIn(doc_id: Long, ts: Timestamp, source: String, text: String)

  /** First-n-per-source admission with explicit keyed state. Within a
    * micro-batch, docs are admitted in `doc_id` order (deterministic); the
    * admitted count carries across batches, so the cap is global over the
    * stream's lifetime — the streaming twin of `Curation.perGroupCap`. */
  def perSourceCapStream(docs: Dataset[DocIn], n: Int): Dataset[DocIn] = {
    import docs.sparkSession.implicits._
    docs
      .groupByKey(_.source)
      .flatMapGroupsWithState[Long, DocIn](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        case (_, it, state: GroupState[Long]) =>
          val admitted = state.getOption.getOrElse(0L)
          val room = math.max(0L, n.toLong - admitted)
          val kept = it.toSeq.sortBy(d => (d.doc_id, d.ts.getTime)).take(
            math.min(room, Int.MaxValue.toLong).toInt)
          state.update(admitted + kept.size)
          kept.iterator
      }
  }

  /** Streaming upsert sink — `foreachBatch` folding each micro-batch into a
    * keep-latest parquet snapshot (`Lake.upsertKeepLatest` + atomic-ish
    * directory swap): the streaming lake-maintenance loop that turns an
    * update stream into an always-current table without a transactional
    * format. foreachBatch is the escape hatch Structured Streaming provides
    * exactly for sinks with batch-only semantics; the checkpoint still
    * gives each batch an exactly-once identity (re-run batches overwrite
    * deterministically — upsert of the same delta is idempotent).
    *
    * Layout: `dir/current` is the readable snapshot; each batch writes a
    * complete new snapshot to `dir/v<batchId>` and repoints `dir/current`.
    * The swap is two FS metadata ops (delete + rename), so a reader landing
    * exactly between them misses the table for that instant — plain-FS
    * honesty; a transactional table format is the answer when that gap
    * matters. Readers never see a PARTIAL snapshot, though: the rename only
    * happens after the full write committed. */
  def upsertSink(updates: DataFrame, dir: String, keyCol: String,
      versionCol: String, checkpoint: String): org.apache.spark.sql.streaming.StreamingQuery =
    updates.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val spark = batch.sparkSession
        val fs = new org.apache.hadoop.fs.Path(dir)
          .getFileSystem(spark.sparkContext.hadoopConfiguration)
        val current = new org.apache.hadoop.fs.Path(s"$dir/current")
        val next = new org.apache.hadoop.fs.Path(s"$dir/v$batchId")
        val merged =
          if (fs.exists(current))
            graft.io.Lake.upsertKeepLatest(
              spark.read.parquet(current.toString), batch, keyCol, versionCol)
          else batch
        merged.write.mode("overwrite").parquet(next.toString)
        // repoint: delete the old pointer, rename the new snapshot in
        if (fs.exists(current)) fs.delete(current, true)
        fs.rename(next, current)
        ()
      }
      .start()

  /** The composed streaming curation flow: gates → cross-batch exact dedup
    * (watermark-bounded state) → per-source cap. Quality/language gates are
    * the same map-side predicates the batch flow fuses into the scan. */
  def curateStream(
      docs: Dataset[DocIn],
      watermarkDelay: String = "1 hour",
      minStopRatio: Double = 0.0,
      maxMeanWordLen: Double = 20.0,
      allowedLangs: Seq[String] = Seq("en", "de", "es", "fr", "zh"),
      maxPerSource: Int = 1000): Dataset[DocIn] = {
    import docs.sparkSession.implicits._
    val gated: DataFrame = graft.ops.Curation.applyGates(
      docs.toDF(), "text", minStopRatio, maxMeanWordLen, allowedLangs)
    val deduped = gated
      .withColumn("__text_hash", md5(col("text")))
      .withWatermark("ts", watermarkDelay)
      .dropDuplicatesWithinWatermark("__text_hash")
      .drop("__text_hash")
      .as[DocIn]
    perSourceCapStream(deduped, maxPerSource)
  }

  /** Windowed token counts over a documents stream — the trending-terms
    * feed behind corpus-drift monitoring. ONE streaming aggregation whose
    * state the watermark bounds (a (window, token) count lives only until
    * the watermark passes the window's end); the top-k RANKING runs on
    * read over the sink table, because per-window ranking inside the
    * stream would need a second stateful operator where a serve-side
    * `row_number` over the tiny emitted counts does the same job.
    * Works unchanged on batch frames (watermark no-ops) — the spec pins
    * stream == batch. */
  def trendingTokens(docs: DataFrame, windowDur: String = "1 hour",
      watermarkDelay: String = "1 hour"): DataFrame =
    docs
      .withWatermark("ts", watermarkDelay)
      .select(col("ts"), explode(graft.ops.Dedup.tokens(col("text"))).as("token"))
      .groupBy(window(col("ts"), windowDur), col("token"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("window_start"), col("token"), col("n"))

  /** Streaming decontamination screen: drop any arriving document whose
    * shingle set maybe-hits the benchmark bloom filter (built batch-side by
    * [[graft.functions.BloomAgg]] from the eval set, shipped in the task
    * binary). STATELESS and map-side — the same codegen'd probe as the
    * batch prefilter ([[graft.ops.Curation.bloomDecontaminate]] step 2), so
    * it composes into any stream with zero state and zero shuffle.
    *
    * Semantics trade, stated plainly: bloom negatives are DEFINITE
    * negatives, so no contaminated document is ever admitted; bloom FALSE
    * POSITIVES (rate set by the filter size) are over-dropped, because the
    * exact confirm join needs a per-doc aggregation a low-latency admission
    * path shouldn't pay. The batch operator is the reconciliation path —
    * exactly the rateLimitStream/batch-twin contract. */
  def bloomScreenStream(docs: Dataset[DocIn], bits: Array[Long],
      shingleK: Int = 5): Dataset[DocIn] = {
    import docs.sparkSession.implicits._
    docs.where(!graft.functions.Exprs.bloom_any(
      graft.functions.Exprs.shingle_hashes(
        graft.ops.Dedup.tokens(col("text")), shingleK), bits))
      .as[DocIn]
  }
}
