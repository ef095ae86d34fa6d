package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ops.Similarity
import graft.functions.Exprs.cosine_sim

/** Streaming ANN SERVING — the similarity-search twin of
  * [[DedupStreams.nearDupAdmission]]: as query embeddings ARRIVE, answer
  * each with its top-k nearest corpus vectors through an IVF probe of a
  * STATIC corpus index, emitting `(query_id, ts, rank, item_id, cos_sim)`.
  * The retrieval-serving shape made continuous: the lake is indexed once,
  * arrivals pay only their own probe.
  *
  * Scale design mirrors the admission index (r14 verdict → r15): the index
  * lives ON DISK, not pinned in executors. [[buildServingIndex]] spends the
  * one corpus pass a static index always costs and persists under `dir`:
  *
  *  - `cells/` — the IVF cell assignment `(centroid_id, item_id, item_vec)`
  *    as a parquet table BUCKETED AND SORTED ON `centroid_id` (one bucket
  *    per cell): the stream-static join's static side arrives
  *    pre-partitioned, so a micro-batch shuffles only its own exploded
  *    probes — the corpus never moves, and a lost executor re-reads its
  *    buckets from disk.
  *  - `centroids/` + `meta/` — the (tiny, nlist-sized) coarse quantizer and
  *    the index parameters. [[openServingIndex]] rebuilds the probe
  *    expression from these after a driver bounce — restart never re-scans
  *    the corpus.
  *
  * Per micro-batch the STREAM side is pure map-side (nearest-`nprobe`
  * centroid ranking is a literal-array expression — no join, no shuffle;
  * same kernel as [[graft.ops.Similarity.ivfSearch]]), then one
  * stream-static join against the bucketed cells and ONE stateful
  * aggregation: per-(query, ts) top-k through the k-BOUNDED
  * [[graft.functions.TopKAgg]] heap aggregate — state is k entries per
  * in-flight query (never the candidate volume, never the corpus), and the
  * watermark bounds how many queries are in flight. Corpus item ids are
  * assumed unique (each vector lives in exactly ONE cell — IVF assignment
  * is a partition), so no dedup pass is needed between the join and the
  * top-k.
  *
  * Centroids: `trained = true` (default) trains the standard driver-local
  * Lloyd loop on a deterministic xxhash64 sample
  * ([[graft.ops.Similarity.buildIvfIndex]]'s discipline — recall/nprobe
  * behavior quantified by x188); `trained = false` uses the `nlist`
  * lowest-id corpus vectors VERBATIM as the quantizer — a seeded mode
  * whose every number is replayable in plain SQL (no float drift from
  * k-means means), which is what lets the batch twin carry a full
  * value-level DuckDB oracle (x201) over the exact serve path: probe
  * ranking, cell membership, cosine scores, ranks.
  */
object AnnStreams {

  /** One arriving query vector — the typed stream row for tests and callers. */
  case class Arrival(query_id: Long, ts: java.sql.Timestamp, embedding: Seq[Float])

  /** Handle over a built-or-opened on-disk serving index. `cells` is a
    * catalog-backed bucketed table (shuffle-free static join side);
    * `centroids` is the nlist-sized quantizer the probe expression bakes
    * in as literals; `appends` is the (possibly empty) tail of
    * [[appendStream]]-ingested vectors not yet folded into the bucketed
    * base — see the maintenance contract on [[appendStream]]. */
  final case class ServingIndex(
      dir: String, nlist: Int, buckets: Int,
      centroids: Array[(Int, Array[Float])], cells: DataFrame,
      appends: DataFrame)

  /** Location-derived catalog name (shared rule: [[DiskIndex.tableName]]). */
  private def tableName(spark: SparkSession, dir: String): String =
    DiskIndex.tableName(spark, "graft_ann_cells", dir)

  /** Index a static corpus for serving: ONE corpus pass (train/seed the
    * quantizer, assign every vector map-side, write bucketed), persisted
    * under `dir`. Returns the live handle. */
  def buildServingIndex(corpus: DataFrame, idCol: String, vecCol: String,
      dir: String, nlist: Int = 16, trained: Boolean = true,
      iters: Int = 3, trainSample: Int = 4096,
      spreadSeeds: Boolean = false): ServingIndex = {
    require(!corpus.isStreaming, "corpus must be a static relation (the indexed lake)")
    require(nlist >= 1, s"nlist must be positive, got $nlist")
    val spark = corpus.sparkSession
    import spark.implicits._
    // an empty quantizer would otherwise surface as an opaque analysis
    // error from the empty literal centroid array (or a "[1, 0]" nprobe
    // range) far from the actual cause — quantizerOf fails loudly instead
    val centroids = quantizerOf(corpus, idCol, vecCol, nlist, trained, iters,
      trainSample, spreadSeeds)
    // one bucket per cell: the probe join's static side is pre-partitioned
    // by exactly the key it is probed on
    Similarity.assignCells(corpus.select(col(idCol).cast("long").as(idCol),
        col(vecCol)), centroids, idCol, vecCol)
      .select(col("centroid_id"), col("item_id"), col("item_vec"))
      .repartition(nlist, col("centroid_id"))
      .write.mode("overwrite").format("parquet")
      .bucketBy(nlist, "centroid_id").sortBy("centroid_id")
      .option("path", s"$dir/cells")
      .saveAsTable(tableName(spark, dir))
    centroids.toSeq.map { case (cid, v) => (cid, v.toSeq) }
      .toDF("centroid_id", "centroid")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/centroids")
    Seq((nlist, centroids.length)).toDF("nlist", "n_centroids")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/meta")
    // a rebuild into a previously-used location must not resurrect a tail
    // assigned under the OLD centroids (DiskIndex.clearAppendTails doc)
    DiskIndex.clearAppendTails(spark, Seq(s"$dir/appends"))
    ServingIndex(dir, nlist, nlist, centroids, spark.table(tableName(spark, dir)),
      appendsOf(spark, dir))
  }

  /** The append tail under `dir/appends/batch=<id>/` — empty (with the
    * cells schema) when no [[appendStream]] batch has landed yet. */
  private def appendsOf(spark: SparkSession, dir: String): DataFrame =
    DiskIndex.appendTail(spark, s"$dir/appends",
      spark.table(tableName(spark, dir)).schema)

  /** Reopen a persisted serving index after a driver bounce: re-register
    * the bucketed cells table over the existing files and reload the
    * nlist-sized quantizer. No corpus work. */
  def openServingIndex(spark: SparkSession, dir: String): ServingIndex = {
    val nlist = spark.read.parquet(s"$dir/meta").head().getInt(0)
    val cells = DiskIndex.registerBucketed(
      spark, tableName(spark, dir), s"$dir/cells", "centroid_id", nlist)
    val centroids = spark.read.parquet(s"$dir/centroids")
      .orderBy(col("centroid_id"))
      .collect()
      .map(r => (r.getInt(0), r.getSeq[Float](1).toArray))
    ServingIndex(dir, nlist, nlist, centroids, cells, appendsOf(spark, dir))
  }

  /** Streaming index MAINTENANCE — the write path of a living vector lake:
    * arriving embeddings are assigned to their IVF cell MAP-SIDE against
    * the index's FIXED centroids (the standard IVF maintenance contract —
    * cells drift only as much as the data distribution does; retrain on a
    * schedule via [[retrainIndex]], never per batch) and landed under
    * `dir/appends/batch=<batchId>/`. Writing each micro-batch into its own
    * batchId-named directory with overwrite makes the sink IDEMPOTENT: a
    * crash-replayed batch overwrites its own output instead of duplicating
    * rows — exactly-once index contents over an at-least-once foreachBatch.
    *
    * Visibility contract: serve plans bind the append tail when the index
    * handle is built/opened, so appended vectors are seen by queries
    * (batch or streaming) whose handle was opened AFTER the append landed
    * — the restart/reopen picks them up; a mid-flight stream does not
    * re-list. Fold the tail into the bucketed base with [[compactIndex]]
    * (centroids fixed, results identical) and re-pick the cell boundaries
    * with [[retrainIndex]] as drift accumulates (the one corpus pass a
    * re-index always costs); until then the tail joins UNBUCKETED, which
    * is the small-fraction price of not rescanning the lake per arrival. */
  def appendStream(arrivals: DataFrame, index: ServingIndex,
      idCol: String, vecCol: String, checkpointDir: String,
      trigger: org.apache.spark.sql.streaming.Trigger =
        org.apache.spark.sql.streaming.Trigger.ProcessingTime(0L))
      : org.apache.spark.sql.streaming.StreamingQuery = {
    require(arrivals.isStreaming, "appendStream takes a streaming relation")
    arrivals
      .select(col(idCol).cast("long").as(idCol), col(vecCol))
      .writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      // the maintenance cadence: a longer trigger batches more vectors per
      // landed batch=<id> dir — fewer, bigger tail files between compactions
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        landAppendBatch(batch, index, idCol, vecCol, batchId)
      }
      .start()
  }

  /** Land ONE batch of new vectors into the append tail — the body of
    * [[appendStream]]'s foreachBatch, exposed so batch callers (a backfill
    * job, the x202 compaction twin) ride the IDENTICAL landing path the
    * stream does: map-side cell assignment against the index's FIXED
    * centroids, written idempotently under `batch=<batchId>` (re-landing a
    * batchId replaces its own output). */
  def landAppendBatch(batch: DataFrame, index: ServingIndex,
      idCol: String, vecCol: String, batchId: Long): Unit =
    Similarity.assignCells(
      batch.select(col(idCol).cast("long").as(idCol), col(vecCol)),
      index.centroids, idCol, vecCol)
      .select(col("centroid_id"), col("item_id"), col("item_vec"))
      .write.mode("overwrite")
      .parquet(s"${index.dir}/appends/batch=$batchId")

  /** Fold the append tail into a fresh bucketed base at `newDir` — the
    * scheduled maintenance step, blue/green rather than in-place: Spark
    * cannot overwrite a table it is reading from, and at lake scale the
    * union cannot be pinned in memory to break the cycle, so compaction
    * rolls the index FORWARD (old dir stays readable until the caller
    * drops it; serve handles opened on `newDir` see one bucketed base and
    * an empty tail). Centroids are carried over VERBATIM — compaction
    * reorganizes storage, it never moves a vector between cells — so
    * results are identical by construction (spec'd). */
  def compactIndex(spark: SparkSession, dir: String, newDir: String): ServingIndex = {
    require(DiskIndex.qualifiedUri(spark, dir) !=
      DiskIndex.qualifiedUri(spark, newDir),
      "compaction is blue/green: newDir must differ from dir")
    val old = openServingIndex(spark, dir)
    old.cells.unionByName(old.appends)
      .repartition(old.nlist, col("centroid_id"))
      .write.mode("overwrite").format("parquet")
      .bucketBy(old.nlist, "centroid_id").sortBy("centroid_id")
      .option("path", s"$newDir/cells")
      .saveAsTable(tableName(spark, newDir))
    spark.read.parquet(s"$dir/centroids")
      .coalesce(1).write.mode("overwrite").parquet(s"$newDir/centroids")
    spark.read.parquet(s"$dir/meta")
      .coalesce(1).write.mode("overwrite").parquet(s"$newDir/meta")
    // newDir may have hosted an index before — clear any stale tail
    DiskIndex.clearAppendTails(spark, Seq(s"$newDir/appends"))
    openServingIndex(spark, newDir)
  }

  /** RETRAIN the quantizer over the grown corpus and rebuild at `newDir` —
    * the scheduled drift-management step [[compactIndex]] deliberately is
    * not (r16 verdict #1). Compaction reorganizes storage under FIXED
    * centroids (results identical by construction); retrain moves the CELL
    * BOUNDARIES to where the data now lives: it re-derives the quantizer
    * over base ∪ tail (the same trained-Lloyd / seeded discipline as
    * [[buildServingIndex]]), reassigns every vector map-side, and writes a
    * fresh bucketed base — exactly what [[DedupStreams.reindexAdmission]]
    * does for the admission family's hot order. Equivalent by construction
    * (and by spec) to a fresh [[buildServingIndex]] over the combined
    * corpus at the same parameters (including `spreadSeeds`):
    * fold-then-build IS the implementation, so retrain can never drift
    * from the build path.
    *
    * Cost model: one corpus pass (read cells + tail, one map-side
    * reassignment, one bucketed rewrite) plus the driver-local Lloyd over
    * a `trainSample`-bounded sample — the price of the original build,
    * which is the point: drift erodes the index's PRUNING (appended
    * vectors pile into the few cells nearest the old centroids — the
    * ScaleStress skew sweep measured one cell at 27% of the corpus), and
    * the only fix is re-picking the cell boundaries on a SCHEDULE, never
    * per batch. Retrain subsumes compaction — the tail is folded and
    * empties — so a deployment alternates cheap compactions with
    * occasional retrains as drift accumulates.
    *
    * Blue/green like compaction: the corpus is re-read from the live index
    * at `dir`, which therefore cannot be rewritten in place; `dir` stays
    * readable until the caller drops it.
    *
    * @param newNlist re-pick the cell count as the corpus grows (√N rule);
    *                 `0` (default) keeps the old index's nlist.
    * @param spreadSeeds trained-mode Lloyd seeding; defaults to TRUE here
    *                 (unlike the builders) because retrain exists for the
    *                 drifted case: farthest-first seeding guarantees a
    *                 seed near every mode of the grown sample, where the
    *                 default lowest-id seeding can move at most one
    *                 centroid into a region the old quantizer never saw —
    *                 a drifted cluster would retrain into one giant cell
    *                 (spec'd in RetrainSpec; [[graft.ops.Similarity
    *                 .localLloyd]] documents the trade). */
  def retrainIndex(spark: SparkSession, dir: String, newDir: String,
      trained: Boolean = true, iters: Int = 3, trainSample: Int = 4096,
      newNlist: Int = 0, spreadSeeds: Boolean = true): ServingIndex = {
    // (scheduling: indexHealth + maintenanceDue answer WHEN to call this)
    require(DiskIndex.qualifiedUri(spark, dir) !=
      DiskIndex.qualifiedUri(spark, newDir),
      "retrain is blue/green: newDir must differ from dir")
    val old = openServingIndex(spark, dir)
    val nlist = if (newNlist > 0) newNlist else old.nlist
    buildServingIndex(
      old.cells.unionByName(old.appends).select(col("item_id"), col("item_vec")),
      "item_id", "item_vec", newDir, nlist, trained, iters, trainSample, spreadSeeds)
  }

  /** One-pass HEALTH report over a serving index — the observability the
    * maintenance contract needs: [[compactIndex]] and [[retrainIndex]] are
    * the actions, this is the signal for WHICH one is due. One row per
    * branch (`base`, `tail`), totally ordered:
    *
    *  - `n_rows`, `n_cells` — branch sizes. The tail is broadcast-joined
    *    by serve plans and accumulates one directory per maintenance
    *    batch, so it must stay a small fraction of the base — the
    *    COMPACTION trigger.
    *  - `avg_assign_cos_ppm` — mean cosine between each stored vector and
    *    its OWN cell centroid, floored to ppm (integer arithmetic —
    *    exactly replayable). Tail vectors were assigned under the same
    *    fixed centroids as the base, so arrivals that fit the quantizer
    *    score ≈ the base; a DRIFTED tail scores materially lower (the
    *    quantizer has no resolution where it lives) — the RETRAIN trigger.
    *  - `max_cell_share_ppm` — the hottest cell's share of the branch
    *    (the pruning-skew signal: drifted appends pile into few cells).
    *
    * Cost: one scan of cells + tail against the nlist-sized broadcast
    * centroid relation and two tiny aggregations — the stored
    * `centroid_id` IS the assignment, no reassignment pass. Oracled
    * value-level by x208. */
  def indexHealth(index: ServingIndex): DataFrame =
    healthReport(index.cells, index.appends, index.centroids,
      cosine_sim(col("item_vec"), col("centroid")))

  /** The ONE health pipeline both families ride (r17 review: the float and
    * quantized reports feed the same [[maintenanceDue]] contract, so their
    * ppm arithmetic must not be able to drift apart): per-branch broadcast
    * join against the nlist-sized centroid relation, per-cell partial
    * counts/sums, per-leg rollup. `assignCos` is the family's own serve
    * metric over (`centroid`, the branch's payload columns). */
  private def healthReport(base: DataFrame, tail: DataFrame,
      centroids: Array[(Int, Array[Float])], assignCos: org.apache.spark.sql.Column): DataFrame = {
    val spark = base.sparkSession
    import spark.implicits._
    val centDf = broadcast(centroids.toSeq
      .map { case (cid, v) => (cid, v.toSeq) }.toDF("centroid_id", "centroid"))
    def legOf(df: DataFrame, leg: String): DataFrame =
      df.join(centDf, Seq("centroid_id"))
        .select(lit(leg).as("leg"), col("centroid_id"),
          floor(assignCos * 1e6).cast("long").as("cos_ppm"))
    legOf(base, "base").unionByName(legOf(tail, "tail"))
      .groupBy(col("leg"), col("centroid_id"))
      .agg(count(lit(1)).as("n"), sum(col("cos_ppm")).as("s"))
      .groupBy(col("leg"))
      .agg(sum(col("n")).as("n_rows"),
        count(lit(1)).as("n_cells"),
        // TRUNCATE-toward-zero (Spark DIV), deliberately — the r17 ADVICE
        // asked for floor "matching DuckDB //", but DuckDB `//` MEASURED
        // (r18, this container): -7 // 2 = -3 on INTEGER and HUGEINT
        // alike — `//` truncates exactly like DIV, in every regime
        // including the negative-sum one the near-orthogonal-corpus
        // comment below describes. An r18 interim commit switched this to
        // pmod-adjusted floor on the ADVICE's stated premise; that was the
        // only spelling that could diverge from the `sum(s) // sum(n)`
        // replays (x208/x209/x211), so it is reverted with the receipt
        // pinned in RetrainSpec's negative-regime test.
        expr("sum(s) DIV sum(n)").as("avg_assign_cos_ppm"),
        expr("max(n) * 1000000 DIV sum(n)").as("max_cell_share_ppm"))
      .orderBy(col("leg"))
  }

  /** The scheduling decision over an [[indexHealth]] report — pure
    * threshold logic, split out so a deployment's maintenance job is
    * exactly `if (retrainDue) retrainIndex(...) else if (compactDue)
    * compactIndex(...)` (retrain subsumes compaction, so it wins when
    * both fire):
    *
    *  - `compactDue`: the tail exceeds `maxTailFraction` of the base —
    *    storage-shape maintenance, results identical by construction.
    *  - `retrainDue`: the tail's mean assignment cosine trails the
    *    base's by more than `maxDriftDropPpm` OF THE BASE'S VALUE (a
    *    RELATIVE drop — an absolute gap does not transfer across
    *    corpora: a high-structure lake at 0.95 drifting to 0.85 and a
    *    diffuse one at 0.38 dropping to 0.28 are both material, but only
    *    one clears any fixed absolute threshold). The relative base is
    *    floored at 0.1 (100,000 ppm): without a floor the rule
    *    degenerates at tiny or non-positive base cosines — a base at
    *    1 ppm would retrain on a 1-ppm dip, and a base at ≤ 0 (possible:
    *    the per-row floor() biases slightly-negative cosines down, so a
    *    near-orthogonal corpus can average below zero) would NEVER
    *    retrain no matter how far the tail falls (r17 review finding).
    *    Arrivals that trail the base this much no longer fit the
    *    quantizer, so folding them under fixed centroids would keep
    *    serving them from the wrong cells.
    *
    * An absent/empty tail is healthy by definition. */
  final case class Maintenance(compactDue: Boolean, retrainDue: Boolean)
  def maintenanceDue(health: DataFrame, maxTailFraction: Double = 0.1,
      maxDriftDropPpm: Long = 100000L): Maintenance = {
    require(maxTailFraction > 0, s"maxTailFraction must be positive, got $maxTailFraction")
    val legs = health.select(col("leg"), col("n_rows"), col("avg_assign_cos_ppm"))
      .collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    val (baseRows, baseCos) = legs.getOrElse("base", (0L, 0L))
    val (tailRows, tailCos) = legs.getOrElse("tail", (0L, 0L))
    val relBase = math.max(baseCos.toDouble, 100000.0)
    Maintenance(
      compactDue = baseRows > 0L && tailRows.toDouble > maxTailFraction * baseRows,
      retrainDue = tailRows > 0L &&
        (baseCos - tailCos).toDouble > relBase * maxDriftDropPpm / 1e6)
  }

  /** The √N rule as a SCHEDULABLE function (r17 verdict #7): the nlist the
    * NEXT retrain should build at, read off the same health report
    * [[maintenanceDue]] decides from — so the maintenance job's whole loop
    * is `val h = indexHealth(idx); if (maintenanceDue(h).retrainDue)
    * retrainIndex(..., newNlist = scheduledNlist(h))` and a grown corpus
    * retrains into its right geometry automatically instead of freezing
    * the build-time cell count forever. Retrain folds the tail, so the
    * corpus it builds over is base + tail rows; √N balances probe cost
    * (∝ N/nlist per probed cell) against centroid-scan cost (∝ nlist) —
    * the classical IVF operating point, and 4× growth re-cells at 2×.
    * Works over [[indexHealth]] and [[quantizedIndexHealth]] alike (same
    * schema). Clamped to [minNlist, maxNlist]; empty report → minNlist. */
  def scheduledNlist(health: DataFrame, minNlist: Int = 1,
      maxNlist: Int = 1 << 16): Int = {
    require(minNlist >= 1 && maxNlist >= minNlist,
      s"bad nlist bounds: [$minNlist, $maxNlist]")
    val n = health.select(sum(col("n_rows"))).collect()(0) match {
      case r if r.isNullAt(0) => 0L
      case r => r.getLong(0)
    }
    math.max(minNlist.toLong,
      math.min(maxNlist.toLong, math.round(math.sqrt(n.toDouble)))).toInt
  }

  // ------------------------------------------------- quantized serving index

  /** Handle over an int8-quantized on-disk serving index (r15 verdict ask
    * #5 — the next 100 TB axis for ANN serving). Two bucketed tables:
    *
    *  - `cellsq/` — `(centroid_id, item_id, code BINARY)` bucketed on
    *    `centroid_id`: the HOT index the per-batch probe join scans, at
    *    ONE BYTE per dimension (4× fewer scan bytes than float32 cells —
    *    measured ~3.9× on-disk at sf0.1; the per-vector scale is not even
    *    stored, because cosine is scale-invariant). Probing ranks by the
    *    asymmetric distance `int8_cosine(query_float, code)`.
    *  - `vecs/` — `(item_id, item_vec)` bucketed on `item_id`: the exact
    *    re-rank side. Only the `k·refine` shortlisted rows per query join
    *    it, repartitioned on the bucket key — the corpus side never
    *    shuffles.
    *
    * Recall: quantization only coarsens the SHORTLIST cut; the served
    * scores are full-precision re-ranks, so with `refine` ≥ cell
    * population the results equal the float index exactly (spec'd), and
    * the nprobe/refine recall trade-off is quantified by the ScaleStress
    * `pq` leg.
    *
    * Maintenance parity with the other index families:
    * `cellsQAppends`/`vecsAppends` are the [[appendQuantizedStream]]-
    * ingested tails (landed in LOCKSTEP — codes without floats would
    * shortlist but never re-rank), joined as separate branches so the
    * bucketed bases keep their pre-partitioning;
    * [[compactQuantizedIndex]] folds both tails blue/green. */
  final case class QuantizedIndex(
      dir: String, nlist: Int, centroids: Array[(Int, Array[Float])],
      cellsQ: DataFrame, vecs: DataFrame,
      cellsQAppends: DataFrame, vecsAppends: DataFrame)

  private def qTableName(spark: SparkSession, dir: String, kind: String): String =
    DiskIndex.tableName(spark, s"graft_annq_$kind", dir)

  /** The quantizer half of [[buildServingIndex]], shared with
    * [[buildQuantizedIndex]]: trained Lloyd centroids (production) or the
    * nlist lowest-id corpus vectors verbatim (the SQL-replayable seeded
    * mode the oracles ride). */
  private def quantizerOf(corpus: DataFrame, idCol: String, vecCol: String,
      nlist: Int, trained: Boolean, iters: Int, trainSample: Int,
      spreadSeeds: Boolean): Array[(Int, Array[Float])] = {
    val centroids: Array[(Int, Array[Float])] =
      if (trained) Similarity.buildTrainedCentroids(
        corpus, idCol, vecCol, nlist, iters, trainSample, spreadSeeds)
      else corpus.select(col(idCol).cast("long").as("item_id"), col(vecCol))
        .orderBy(col("item_id")).limit(nlist)
        .collect().map(_.getSeq[Float](1).toArray)
        .zipWithIndex.map { case (v, i) => (i, v) }
    require(centroids.nonEmpty, "serving index: corpus must be non-empty")
    centroids
  }

  /** Index a static corpus for QUANTIZED serving: one corpus pass — train
    * or seed the quantizer, assign every vector map-side, int8-encode into
    * `cellsq/`, land the float vectors bucketed on `item_id` into `vecs/`
    * for the exact re-rank. Persisted under `dir` with the same
    * centroids/meta layout as [[buildServingIndex]]. */
  def buildQuantizedIndex(corpus: DataFrame, idCol: String, vecCol: String,
      dir: String, nlist: Int = 16, trained: Boolean = true,
      iters: Int = 3, trainSample: Int = 4096,
      spreadSeeds: Boolean = false): QuantizedIndex = {
    require(!corpus.isStreaming, "corpus must be a static relation (the indexed lake)")
    require(nlist >= 1, s"nlist must be positive, got $nlist")
    val spark = corpus.sparkSession
    import spark.implicits._
    val centroids = quantizerOf(corpus, idCol, vecCol, nlist, trained, iters,
      trainSample, spreadSeeds)
    Similarity.assignCells(corpus.select(col(idCol).cast("long").as(idCol),
        col(vecCol)), centroids, idCol, vecCol)
      .select(col("centroid_id"), col("item_id"),
        graft.functions.Exprs.int8_quantize(col("item_vec")).as("code"))
      .repartition(nlist, col("centroid_id"))
      .write.mode("overwrite").format("parquet")
      .bucketBy(nlist, "centroid_id").sortBy("centroid_id")
      .option("path", s"$dir/cellsq")
      .saveAsTable(qTableName(spark, dir, "cellsq"))
    corpus.select(col(idCol).cast("long").as("item_id"),
        col(vecCol).as("item_vec"))
      .repartition(nlist, col("item_id"))
      .write.mode("overwrite").format("parquet")
      .bucketBy(nlist, "item_id").sortBy("item_id")
      .option("path", s"$dir/vecs")
      .saveAsTable(qTableName(spark, dir, "vecs"))
    centroids.toSeq.map { case (cid, v) => (cid, v.toSeq) }
      .toDF("centroid_id", "centroid")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/centroids")
    Seq((nlist, centroids.length)).toDF("nlist", "n_centroids")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/meta")
    // same stale-tail guard as the float builder, for BOTH lockstep tails
    DiskIndex.clearAppendTails(spark,
      Seq(s"$dir/appends_cellsq", s"$dir/appends_vecs"))
    val cellsQ = spark.table(qTableName(spark, dir, "cellsq"))
    val vecs = spark.table(qTableName(spark, dir, "vecs"))
    QuantizedIndex(dir, nlist, centroids, cellsQ, vecs,
      DiskIndex.appendTail(spark, s"$dir/appends_cellsq", cellsQ.schema),
      DiskIndex.appendTail(spark, s"$dir/appends_vecs", vecs.schema))
  }

  /** Reopen a persisted quantized index after a driver bounce — same
    * discipline as [[openServingIndex]]: re-register the bucketed tables,
    * reload the nlist-sized quantizer, no corpus work. */
  def openQuantizedIndex(spark: SparkSession, dir: String): QuantizedIndex = {
    val nlist = spark.read.parquet(s"$dir/meta").head().getInt(0)
    val cellsQ = DiskIndex.registerBucketed(
      spark, qTableName(spark, dir, "cellsq"), s"$dir/cellsq", "centroid_id", nlist)
    val vecs = DiskIndex.registerBucketed(
      spark, qTableName(spark, dir, "vecs"), s"$dir/vecs", "item_id", nlist)
    val centroids = spark.read.parquet(s"$dir/centroids")
      .orderBy(col("centroid_id"))
      .collect()
      .map(r => (r.getInt(0), r.getSeq[Float](1).toArray))
    QuantizedIndex(dir, nlist, centroids, cellsQ, vecs,
      DiskIndex.appendTail(spark, s"$dir/appends_cellsq", cellsQ.schema),
      DiskIndex.appendTail(spark, s"$dir/appends_vecs", vecs.schema))
  }

  /** Land ONE batch of new vectors into the quantized index's append tail
    * — [[landAppendBatch]]'s discipline for the quantized family: map-side
    * cell assignment against the FIXED centroids, int8 codes into
    * `appends_cellsq/batch=<id>`, float vectors into
    * `appends_vecs/batch=<id>` (the exact-re-rank side must grow in
    * lockstep or appended items would shortlist but never re-rank).
    * Idempotent per batchId. Handles opened AFTER the append see it —
    * [[openQuantizedIndex]] binds both tails at open time. */
  def landQuantizedAppendBatch(batch: DataFrame, index: QuantizedIndex,
      idCol: String, vecCol: String, batchId: Long): Unit = {
    val b = batch.select(col(idCol).cast("long").as(idCol), col(vecCol))
    Similarity.assignCells(b, index.centroids, idCol, vecCol)
      .select(col("centroid_id"), col("item_id"),
        graft.functions.Exprs.int8_quantize(col("item_vec")).as("code"))
      .write.mode("overwrite")
      .parquet(s"${index.dir}/appends_cellsq/batch=$batchId")
    b.select(col(idCol).cast("long").as("item_id"),
        col(vecCol).as("item_vec"))
      .write.mode("overwrite")
      .parquet(s"${index.dir}/appends_vecs/batch=$batchId")
  }

  /** Streaming maintenance for the quantized index — the [[appendStream]]
    * twin over [[landQuantizedAppendBatch]]. */
  def appendQuantizedStream(arrivals: DataFrame, index: QuantizedIndex,
      idCol: String, vecCol: String, checkpointDir: String,
      trigger: org.apache.spark.sql.streaming.Trigger =
        org.apache.spark.sql.streaming.Trigger.ProcessingTime(0L))
      : org.apache.spark.sql.streaming.StreamingQuery = {
    require(arrivals.isStreaming, "appendQuantizedStream takes a streaming relation")
    arrivals
      .select(col(idCol).cast("long").as(idCol), col(vecCol))
      .writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        landQuantizedAppendBatch(batch, index, idCol, vecCol, batchId)
      }
      .start()
  }

  /** Blue/green compaction for the quantized family: fold both append
    * tails into fresh bucketed bases at `newDir`, centroids/meta verbatim
    * — same contract as [[compactIndex]]. */
  def compactQuantizedIndex(spark: SparkSession, dir: String,
      newDir: String): QuantizedIndex = {
    require(DiskIndex.qualifiedUri(spark, dir) !=
      DiskIndex.qualifiedUri(spark, newDir),
      "compaction is blue/green: newDir must differ from dir")
    val old = openQuantizedIndex(spark, dir)
    old.cellsQ.unionByName(old.cellsQAppends)
      .repartition(old.nlist, col("centroid_id"))
      .write.mode("overwrite").format("parquet")
      .bucketBy(old.nlist, "centroid_id").sortBy("centroid_id")
      .option("path", s"$newDir/cellsq")
      .saveAsTable(qTableName(spark, newDir, "cellsq"))
    old.vecs.unionByName(old.vecsAppends)
      .repartition(old.nlist, col("item_id"))
      .write.mode("overwrite").format("parquet")
      .bucketBy(old.nlist, "item_id").sortBy("item_id")
      .option("path", s"$newDir/vecs")
      .saveAsTable(qTableName(spark, newDir, "vecs"))
    Seq("centroids", "meta").foreach { kind =>
      spark.read.parquet(s"$dir/$kind")
        .coalesce(1).write.mode("overwrite").parquet(s"$newDir/$kind")
    }
    // newDir may have hosted an index before — clear any stale tails
    DiskIndex.clearAppendTails(spark,
      Seq(s"$newDir/appends_cellsq", s"$newDir/appends_vecs"))
    openQuantizedIndex(spark, newDir)
  }

  /** [[retrainIndex]] for the quantized family: re-derive the quantizer
    * over base ∪ tail, reassign, re-encode, rebuild both bucketed tables
    * at `newDir` blue/green. The retrain reads the stored FLOATS
    * (`vecs/` ∪ its tail) and re-quantizes them — never the int8 codes:
    * codes are lossy, and a code→decode→re-encode rebuild would compound
    * quantization error on every scheduled retrain (spec'd: retrained
    * codes equal a fresh build's codes byte-for-byte). Same cost model,
    * blue/green contract, fold-then-build equivalence, and drift-mode
    * `spreadSeeds = true` default as [[retrainIndex]]; `newNlist` re-picks
    * the cell count (0 keeps). */
  def retrainQuantizedIndex(spark: SparkSession, dir: String, newDir: String,
      trained: Boolean = true, iters: Int = 3, trainSample: Int = 4096,
      newNlist: Int = 0, spreadSeeds: Boolean = true): QuantizedIndex = {
    require(DiskIndex.qualifiedUri(spark, dir) !=
      DiskIndex.qualifiedUri(spark, newDir),
      "retrain is blue/green: newDir must differ from dir")
    val old = openQuantizedIndex(spark, dir)
    val nlist = if (newNlist > 0) newNlist else old.nlist
    buildQuantizedIndex(
      old.vecs.unionByName(old.vecsAppends).select(col("item_id"), col("item_vec")),
      "item_id", "item_vec", newDir, nlist, trained, iters, trainSample, spreadSeeds)
  }

  /** [[indexHealth]] for the quantized family. The byte-coded cells don't
    * store floats, so the assignment-quality signal is the asymmetric
    * `int8_cosine(own centroid, code)` — the same metric the probe ranks
    * by, which is the point: health measures fitness under the distance
    * the index actually serves with. Both tails are landed in lockstep
    * ([[landQuantizedAppendBatch]]), so the code tail IS the append
    * population and no float scan is needed. Same output schema and
    * [[maintenanceDue]] contract as the float report; oracled by x209. */
  def quantizedIndexHealth(index: QuantizedIndex): DataFrame =
    healthReport(index.cellsQ, index.cellsQAppends, index.centroids,
      graft.functions.Exprs.int8_cosine(col("centroid"), col("code")))

  /** Serve top-k through the QUANTIZED index: map-side nprobe centroid
    * ranking (identical to [[annServeBatch]]), probe join against the
    * byte-coded cells ranking by asymmetric int8 cosine, a k·`refine`
    * shortlist per query through the k-bounded heap aggregate, then an
    * EXACT full-precision re-rank of just the shortlist against the
    * `item_id`-bucketed float table. Output schema and every-query-gets-a-
    * verdict semantics match [[annServeBatch]]; served scores are exact
    * cosines, so quantization error can only reorder the shortlist CUT,
    * never a served score. */
  def annServeQuantizedBatch(arrivals: DataFrame, index: QuantizedIndex,
      idCol: String, tsCol: String, vecCol: String,
      k: Int = 10, nprobe: Int = 4, refine: Int = 4): DataFrame = {
    require(!arrivals.isStreaming, "quantized serve twin takes a batch relation")
    serveQuantizedPlan(arrivals, index, idCol, tsCol, vecCol, k, nprobe, refine, None)
  }

  /** STREAMING quantized serve — [[annServeQuantizedBatch]]'s plan over an
    * arrival stream. Structurally this chains TWO stateful aggregations in
    * append mode (the k·refine shortlist heap, then the exact-re-rank
    * top-k heap) with two stream-static joins between and after them —
    * the multiple-stateful-operator shape Spark supports when every
    * stateful step groups on the SAME watermarked event-time column, as
    * both heaps here do (query_id, ts). Rows finalize when the watermark
    * passes their event time, same as [[annServe]]. */
  def annServeQuantized(arrivals: DataFrame, index: QuantizedIndex,
      idCol: String, tsCol: String, vecCol: String,
      k: Int = 10, nprobe: Int = 4, refine: Int = 4,
      watermarkDelay: String = "10 minutes"): DataFrame = {
    require(arrivals.isStreaming,
      "arrivals must be a streaming relation; use annServeQuantizedBatch for the batch twin")
    serveQuantizedPlan(arrivals, index, idCol, tsCol, vecCol, k, nprobe,
      refine, Some(watermarkDelay))
  }

  private def serveQuantizedPlan(arrivals: DataFrame, index: QuantizedIndex,
      idCol: String, tsCol: String, vecCol: String,
      k: Int, nprobe: Int, refine: Int,
      watermarkDelay: Option[String]): DataFrame = {
    require(k >= 1, s"k must be positive, got $k")
    require(refine >= 1, s"refine must be positive, got $refine")
    require(nprobe >= 1 && nprobe <= index.centroids.length,
      s"nprobe must be in [1, ${index.centroids.length}], got $nprobe")
    val built = arrivals.select(
      col(idCol).cast("long").as("query_id"),
      col(tsCol).as("ts"),
      col(vecCol).as("query_vec"))
    val base = watermarkDelay.fold(built)(built.withWatermark("ts", _))
    val probes = base.select(col("query_id"), col("ts"), col("query_vec"),
      explode(slice(reverse(array_sort(
        Similarity.centroidScores(col("query_vec"), index.centroids))),
        1, nprobe)).as("probe"))
      .select(col("query_id"), col("ts"), col("query_vec"),
        (-col("probe.ncid")).as("centroid_id"))
    val ok = col("item_id").isNotNull && col("item_id") =!= col("query_id")
    // the append tail joins as a SECOND branch (same reasoning as the
    // float serve plan: a bucketed∪unbucketed union would strip the
    // bucket pre-partitioning from the whole probe join)
    def scoredAgainst(cells: DataFrame): DataFrame =
      probes.join(cells, Seq("centroid_id"), "left_outer")
        .select(col("query_id"), col("ts"), col("query_vec"),
          when(ok, graft.functions.Exprs.int8_cosine(
            col("query_vec"), col("code"))).as("aq"),
          when(ok, col("item_id")).as("cand_id"))
    val scoredQ = scoredAgainst(index.cellsQ)
      .unionByName(scoredAgainst(index.cellsQAppends))
    // the shortlist: k·refine candidates per query by (approx DESC, id) —
    // the ONLY pass over the (4× smaller) quantized cells
    val short = scoredQ.groupBy(col("query_id"), col("ts"))
      .agg(first(col("query_vec")).as("query_vec"),
        graft.functions.TopKBuffer.top_k(
          col("aq"), col("cand_id"), k * refine).as("shortk"))
    // exact re-rank of the probed slice: k·refine rows per query move to
    // the float table's buckets; the corpus side never shuffles. The tail
    // chains as a second LEFT join + coalesce — item ids are disjoint
    // between base and tail, so each shortlisted id resolves exactly once
    val vecsApp = index.vecsAppends.select(col("item_id"),
      col("item_vec").as("__tv"))
    val rer = short
      .select(col("query_id"), col("ts"), col("query_vec"),
        explode(col("shortk")).as("hit"))
      .select(col("query_id"), col("ts"), col("query_vec"),
        col("hit.id").as("item_id"))
      .join(index.vecs, Seq("item_id"), "left_outer")
      .join(vecsApp, Seq("item_id"), "left_outer")
      .select(col("query_id"), col("ts"),
        cosine_sim(col("query_vec"),
          coalesce(col("item_vec"), col("__tv"))).as("cs"), col("item_id"))
    val hits = rer.groupBy(col("query_id"), col("ts"))
      .agg(graft.functions.TopKBuffer.top_k(
        col("cs"), col("item_id"), k).as("topk"))
    base.select(col("query_id"), col("ts"))
      .join(hits, Seq("query_id", "ts"), "left_outer")
      .select(col("query_id"), col("ts"),
        posexplode_outer(col("topk")).as(Seq("pos", "hit")))
      .select(col("query_id"), col("ts"),
        (col("pos") + 1).as("rank"),
        col("hit.id").as("item_id"),
        col("hit.ord").as("cos_sim"))
  }

  /** @param arrivals streaming relation with (`idCol`, `tsCol`, `vecCol`)
    * @return streaming `(query_id, ts, rank, item_id, cos_sim)` in append
    *         mode — rows finalize when the watermark passes their event
    *         time. A query whose probed cells hold no candidates still
    *         surfaces, with NULL rank/item/score (the admission operator's
    *         every-arrival-gets-a-verdict contract). */
  def annServe(arrivals: DataFrame, index: ServingIndex,
      idCol: String, tsCol: String, vecCol: String,
      k: Int = 10, nprobe: Int = 4,
      watermarkDelay: String = "10 minutes"): DataFrame = {
    require(arrivals.isStreaming,
      "arrivals must be a streaming relation; use annServeBatch for the batch twin")
    servePlan(arrivals, index, idCol, tsCol, vecCol, k, nprobe, Some(watermarkDelay))
  }

  /** The BATCH twin: the identical plan over a batch `arrivals` relation —
    * what the streaming specs assert equality against, and the x201
    * oracle's DataFrame side. */
  def annServeBatch(arrivals: DataFrame, index: ServingIndex,
      idCol: String, tsCol: String, vecCol: String,
      k: Int = 10, nprobe: Int = 4): DataFrame = {
    require(!arrivals.isStreaming, "batch twin takes a batch relation")
    servePlan(arrivals, index, idCol, tsCol, vecCol, k, nprobe, None)
  }

  private def servePlan(arrivals: DataFrame, index: ServingIndex,
      idCol: String, tsCol: String, vecCol: String,
      k: Int, nprobe: Int, watermarkDelay: Option[String]): DataFrame = {
    require(k >= 1, s"k must be positive, got $k")
    require(nprobe >= 1 && nprobe <= index.centroids.length,
      s"nprobe must be in [1, ${index.centroids.length}], got $nprobe")
    val base = arrivals.select(
      col(idCol).cast("long").as("query_id"),
      col(tsCol).as("ts"),
      col(vecCol).as("query_vec"))
    val arr = watermarkDelay.fold(base)(base.withWatermark("ts", _))
    // map-side probe: rank the literal centroid set by (cosine desc, id
    // asc) — the ivfSearch kernel — and explode the nprobe best
    val probes = arr.select(col("query_id"), col("ts"), col("query_vec"),
      explode(slice(reverse(array_sort(
        Similarity.centroidScores(col("query_vec"), index.centroids))),
        1, nprobe)).as("probe"))
      .select(col("query_id"), col("ts"), col("query_vec"),
        (-col("probe.ncid")).as("centroid_id"))
    // stream-static LEFT join against the bucketed cells: a probed-empty
    // cell yields a NULL candidate (not a dropped query). Self-matches
    // (same id arriving as both query and corpus item) are NULLed too.
    // The append tail joins as a SECOND branch rather than a union into
    // the cells relation — unioning bucketed+unbucketed sides would strip
    // the bucket pre-partitioning from the whole join; this way the
    // lake-sized base keeps it and only the small tail joins plain.
    val ok = col("item_id").isNotNull && col("item_id") =!= col("query_id")
    def scoredAgainst(cells: DataFrame): DataFrame =
      probes.join(cells, Seq("centroid_id"), "left_outer")
        .select(col("query_id"), col("ts"),
          when(ok, cosine_sim(col("query_vec"), col("item_vec"))).as("s"),
          when(ok, col("item_id")).as("cand_id"))
    val scored = scoredAgainst(index.cells)
      .unionByName(scoredAgainst(index.appends))
    // ONE stateful aggregation with a HARD k-sized buffer — the existing
    // top_k TypedImperativeAggregate (graft.functions.TopKAgg, the x19
    // kernel): the collect_list spelling held EVERY candidate in state
    // until the watermark flush (measured 3.4 GB for 750k in-flight
    // queries at ~300 candidates each); top_k holds k entries per query
    // in the partial aggregate, the shuffle, and the state store alike.
    // NULLed candidates update nothing; an all-NULL group evaluates to an
    // empty array, which posexplode_outer surfaces as a NULL-rank verdict
    // row.
    scored
      .groupBy(col("query_id"), col("ts"))
      .agg(graft.functions.TopKBuffer.top_k(
        col("s"), col("cand_id"), k).as("topk"))
      .select(col("query_id"), col("ts"),
        posexplode_outer(col("topk")).as(Seq("pos", "hit")))
      .select(col("query_id"), col("ts"),
        (col("pos") + 1).as("rank"),
        col("hit.id").as("item_id"),
        col("hit.ord").as("cos_sim"))
  }
}
