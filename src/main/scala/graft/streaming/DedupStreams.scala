package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.ops.Dedup
import graft.functions.Exprs.{shingle_hashes, sorted_intersect_count}

/** Streaming near-duplicate ADMISSION — the online twin of
  * [[graft.ops.Dedup.incrementalDedupReport]] (batch, oracled as x73): as
  * documents ARRIVE, score each against a STATIC corpus and emit
  * `(doc_id, ts, n_matches, admitted)` — admitted ⟺ the document
  * near-duplicates nothing the lake already holds. The daily-ingest shape
  * made continuous: dedup-at-the-door instead of dedup-after-landing.
  *
  * Scale design — what each side pays:
  *  - The CORPUS side is indexed ONCE at plan-build time: shingle sets, the
  *    hot-shingle prefix order (a driver-side top-k baked into a literal
  *    map-side expression — [[graft.ops.Dedup.hotPrefixExpr]]), and the
  *    PPJoin prefix relation. Every micro-batch reuses the same static
  *    plans; the 100 TB lake is never re-scanned per batch, exactly like
  *    the batch operator.
  *  - The STREAM side is map-side per batch: tokenize → shingle →
  *    prefix-explode under the SAME global order (one order across both
  *    relations = the PPJoin exactness precondition), then a STREAM-STATIC
  *    left join (no stream state) with the length and positional filters.
  *  - Statefulness is bounded to the watermark: one dropDuplicates row per
  *    surviving (doc, ts, corpus-match) and one aggregation row per
  *    arriving doc, both evicted once the event-time watermark passes —
  *    state is proportional to in-flight documents, never the corpus.
  *
  * Exactness: candidates ride the same prefix + length + positional
  * filters as the batch path; verification is the same exact shingle
  * Jaccard. A candidate that FAILS verification is converted to a NULL
  * match (not filtered) so a document whose every candidate fails still
  * surfaces with n_matches = 0 — matching the batch operator's left-join
  * semantics. Emission is append-mode: a document's row becomes final when
  * the watermark passes its event time.
  */
object DedupStreams {

  /** One arriving document — the typed stream row for tests and callers. */
  case class Arrival(doc_id: Long, ts: java.sql.Timestamp, text: String)

  /** @param arrivals streaming relation with (`idCol`, `tsCol`, `textCol`)
    * @param corpus   STATIC relation with (`idCol`, `textCol`)
    * @return streaming `(doc_id, ts, n_matches, admitted)` in append mode */
  def nearDupAdmission(arrivals: DataFrame, corpus: DataFrame,
      idCol: String, tsCol: String, textCol: String,
      shingleK: Int = 3, threshold: Double = 0.5,
      watermarkDelay: String = "10 minutes"): DataFrame = {
    require(!corpus.isStreaming, "corpus must be a static relation (the indexed lake)")
    // ---- static corpus index, built once at plan time
    val pdCor = Dedup.shingleSets(corpus, idCol, textCol, shingleK)
      .localCheckpoint() // one corpus pass; every micro-batch reuses it
    val prefixExpr = Dedup.hotPrefixExpr(pdCor)
    val pb = Dedup.prefixRows(pdCor, prefixExpr, threshold)
      .select(col("doc_id").as("cor_id"), col("shingle"),
        col("n_shingles").as("n_b"), col("pos").as("pos_b"))
    val full = pdCor.select(col("doc_id").as("cor_id"),
      col("shingles").as("sh_b"), col("n_shingles").as("n_b"))
    // ---- stream side: map-side shingle + prefix explode under the SAME
    // order (the baked expression reads a column named `shingles`, the
    // shingleSets convention — keep that name until ranking is applied)
    val arr = arrivals.select(
      col(idCol).cast("long").as("doc_id"),
      col(tsCol).as("ts"),
      shingle_hashes(Dedup.tokens(col(textCol)), shingleK).as("shingles"))
      .withColumn("n_a", size(col("shingles")))
      .withWatermark("ts", watermarkDelay)
    val pa = arr
      .withColumn("__ranked", prefixExpr)
      .select(col("doc_id"), col("ts"), col("shingles").as("sh_a"), col("n_a"),
        posexplode(expr(
          s"slice(__ranked, 1, cast(n_a - ceil($threshold * n_a) + 1 as int))"))
          .as(Seq("pos_a", "shingle")))
    // ---- stream-static LEFT join + PPJoin filters; failed length/position/
    // verify checks become NULL matches so every doc reaches the aggregate
    val alpha = ceil((col("n_a") + col("n_b"))
      * lit((threshold / (1.0 + threshold)) * (1.0 - 1e-12)) - lit(1e-9))
    val joined = pa.join(pb, Seq("shingle"), "left_outer")
      .join(full.withColumnRenamed("cor_id", "__vc")
          .withColumnRenamed("n_b", "__vn"),
        col("cor_id") === col("__vc"), "left_outer")
      .select(col("doc_id"), col("ts"),
        when(col("cor_id").isNotNull
            && col("n_a") * lit(threshold) <= col("n_b")
            && col("n_b") * lit(threshold) <= col("n_a")
            && lit(1) + least(col("n_a") - col("pos_a") - 1,
              col("n_b") - col("pos_b") - 1) >= alpha
            && sorted_intersect_count(col("sh_a"), col("sh_b")).cast("double")
              / (col("n_a") + col("__vn")
                - sorted_intersect_count(col("sh_a"), col("sh_b"))) >= threshold,
          col("cor_id")).as("match_id"))
    // one row per (doc, ts, matched corpus doc); NULL match_id collapses to
    // one row per doc — watermark-bounded dedup state
    joined.dropDuplicates("doc_id", "ts", "match_id")
      .groupBy(col("doc_id"), col("ts"))
      .agg(count(col("match_id")).as("n_matches"))
      .select(col("doc_id"), col("ts"), col("n_matches"),
        (col("n_matches") === 0L).as("admitted"))
  }
}
