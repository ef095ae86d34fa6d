package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.Exprs._

/** Deduplication operators for large-scale corpus curation.
  *
  * Scale design notes (the point of each choice at 100 TB):
  *  - Exact dedup groups on a 128-bit content hash, never on raw text: the
  *    shuffle carries 16-byte keys + ids, not documents.
  *  - MinHash/SimHash signatures are computed map-side by a single codegen'd
  *    expression; only (bucket-key, id) pairs shuffle — LSH banding turns the
  *    O(n²) pair problem into an equi-join.
  *  - Mega-buckets (degenerate boilerplate clusters) are capped before the
  *    self-join: a bucket of b docs yields b² candidate pairs, so one hot
  *    bucket can dominate the job; capping is standard practice and keeps
  *    the join skew-safe (AQE skew-join handles the remainder).
  */
object Dedup {

  def tokens(text: Column): Column = split(lower(text), "\\s+")

  // ------------------------------------------------------------------ exact
  /** One surviving row per distinct text content: group by md5(text), keep
    * the lowest id (deterministic keep-first — SURVEY.md §7.3.2: never
    * dropDuplicates' arbitrary-row semantics). */
  def exactDedupSummary(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.groupBy(md5(col(textCol)).as("text_hash"))
      .agg(min(col(idCol)).as("keep_doc_id"), count(lit(1)).as("n_copies"))

  /** The surviving rows themselves (all columns), keep-lowest-id.
    *
    * Spelled as `min_by(struct(row), id)` — an aggregate with O(1) state per
    * distinct text and a map-side partial merge, so duplicate texts collapse
    * BEFORE the shuffle: only one surviving row per (mapper, text) moves.
    * The row_number-window spelling shuffles every input row and cannot
    * combine. (Struct-valued min_by plans as SortAggregate, not
    * HashAggregate — the sort is by the 16-byte hash key; the shuffle-volume
    * win is the point at 100 TB.) ids are unique, so min_by is
    * deterministic. */
  def exactDedup(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val cols = docs.columns
    docs
      .groupBy(md5(col(textCol)).as("__text_hash"))
      .agg(min_by(struct(cols.map(col): _*), col(idCol)).as("__row"))
      .select(cols.map(c => col(s"__row.`$c`").as(c)): _*)
  }

  // ---------------------------------------------------------------- minhash
  /** MinHash + LSH near-duplicate pairs, verified with exact shingle Jaccard.
    *
    * shingle→minhash→band→bucket-join: each doc computes a `numHashes`
    * signature from its k-token shingles (one map-side expression), bands of
    * r = numHashes/bands hashes become bucket keys, docs sharing any bucket
    * are candidates, candidates are verified exactly. With 128 hashes and 16
    * bands the LSH S-curve crosses ~(1/16)^(1/8) ≈ 0.71 Jaccard.
    */
  def minhashNearDupPairs(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      shingleK: Int = 3,
      numHashes: Int = 128,
      bands: Int = 16,
      threshold: Double = 0.7,
      maxBucketSize: Int = 1000): DataFrame =
    bandedJaccardPairs(docs, idCol, textCol, shingleK,
      toks => minhash_sig(toks, shingleK, numHashes), bands, threshold, maxBucketSize)

  /** As [[minhashNearDupPairs]] with the ONE-PERMUTATION-HASHING signature
    * ([[graft.functions.Ops.ophSig]] — Li/Owen/Zhang NIPS'12, densification
    * Shrivastava & Li ICML'14): one hash evaluation per shingle instead of
    * `numBins`, so the map-side signature pass — the term that dominates
    * MinHash cost at corpus scale — drops ~numBins×. Statistically the
    * aligned-bin collision probability is the same J the classic rows
    * estimate, so the banded S-curve (and the verify stage, which computes
    * EXACT Jaccard either way) is unchanged for documents with ≥ numBins
    * shingles; short documents occupy few bins and densification correlates
    * the rest, so boundary-threshold recall on very short near-dup pairs is
    * weaker than the classic signature's — the x196 gate validates the
    * output against the exact pair set on this corpus family, and callers
    * with short-doc-heavy corpora at loose thresholds should prefer
    * [[minhashNearDupPairs]]. */
  def minhashNearDupPairsOph(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      shingleK: Int = 3,
      numBins: Int = 128,
      bands: Int = 16,
      threshold: Double = 0.7,
      maxBucketSize: Int = 1000): DataFrame =
    bandedJaccardPairs(docs, idCol, textCol, shingleK,
      toks => graft.functions.Exprs.oph_sig(toks, shingleK, numBins),
      bands, threshold, maxBucketSize)

  /** OPH-vs-classic candidate recall AND precision per document-length
    * bucket and band geometry — the numbers behind
    * [[minhashNearDupPairsOph]]'s short-doc caveat (r13 verdict ask #2: the
    * caveat was documented but no gate measured it). For every TRUE pair
    * (exact shingle Jaccard ≥ `threshold`), did each signature's banding
    * surface it — and how many candidates did each signature pay to do so?
    * Bucketed by the SHORTER side's shingle count, the axis the caveat
    * lives on: a doc with far fewer shingles than `numBins` leaves most OPH
    * bins empty, and rotation densification CORRELATES the borrowed values,
    * breaking the per-band independence the S-curve assumes. Measured
    * consequence (x198, sf0.01 short-doc family, J spread around 0.5):
    * correlation cuts toward OVER-collision, not misses — at the production
    * 64×2 geometry both signatures recall 10⁶ in every bucket, but OPH
    * surfaces 3–12× the candidates (precision 0.07–0.20 vs classic's
    * 0.37–0.83 — wasted verify work), and at tighter 16×8 OPH recall stays
    * 10⁶ where classic drops to 0.48 on sub-8-shingle pairs, again paid in
    * spurious candidates. So the practical short-doc rule: OPH is safe on
    * RECALL at production geometry; budget its verify stage for the extra
    * candidate volume, and prefer [[minhashNearDupPairs]] when short-doc
    * candidate cost dominates.
    *
    * Methodology mirrors [[lshTuningReport]] / [[simhashRecallReport]]:
    * banding keys are the signature SLICES themselves (SQL-replayable — no
    * band-hash collision term), truth is the exact pair set, and the
    * `*_micro = floor(n·10⁶ / d)` ratios are math both engines reproduce
    * bit-for-bit ([[ophRecallSql]] replays BOTH signatures in SQL). Both
    * signatures are `numBins` longs, so per geometry the delta is PURELY
    * the signature family. Scale shape: one map-side projection computes
    * both signatures and the shingle count; candidates ride the capped
    * one-shuffle bucket kernel; truth rides the exact PPJoin path. */
  def ophRecallReport(docs: DataFrame, idCol: String, textCol: String,
      shingleK: Int = 3, numBins: Int = 128, bandConfigs: Seq[Int] = Seq(64, 16),
      threshold: Double = 0.5, bucketEdges: Seq[Int] = Seq(8, 16, 32, 64, 128),
      maxBucketSize: Int = 1000): DataFrame = {
    require(bandConfigs.nonEmpty && bandConfigs.forall(b => b > 0 && numBins % b == 0),
      s"every bands value must divide numBins=$numBins, got $bandConfigs")
    require(bucketEdges.nonEmpty && bucketEdges.forall(_ > 0), s"bad edges $bucketEdges")
    // base stays NARROW (sigs + count only): checkpointed rows cannot be
    // column-pruned, and the four band-leg slices re-read this relation —
    // carrying the shingle arrays here was measured ~0.6 s SLOWER than
    // letting the truth leg keep its own small per-doc-sets checkpoint
    // (r19 A/B; the truth leg's extra corpus pass is the cheaper side)
    val base = docs.select(col(idCol).as("doc_id"), tokens(col(textCol)).as("toks"))
      .select(col("doc_id"),
        minhash_sig(col("toks"), shingleK, numBins).as("sig_c"),
        graft.functions.Exprs.oph_sig(col("toks"), shingleK, numBins).as("sig_o"),
        size(shingle_hashes(col("toks"), shingleK)).as("n_sh"))
      .localCheckpoint()
    val na = base.select(col("doc_id").as("doc_a"), col("n_sh").as("n_a"))
    val nb = base.select(col("doc_id").as("doc_b"), col("n_sh").as("n_b"))
    // lower edge of the bucket holding least(n_a, n_b); 0 below every edge
    val m = least(col("n_a"), col("n_b"))
    val bucketExpr = bucketEdges.sorted.foldLeft(lit(0L): Column)(
      (acc, e) => when(m >= e, lit(e.toLong)).otherwise(acc))
    val truth = ngramJaccardPairs(docs, idCol, textCol, shingleK, threshold)
      .select(col("doc_a"), col("doc_b"))
      .localCheckpoint()
    // ONE bucket pass + ONE flag aggregation for EVERY (config, signature)
    // leg — no per-leg candidate pipelines, no full-outer assembly joins.
    // Each leg gets a disjoint slice of the band-index space
    // (band_idx·nLegs + leg), so the capped-bucket kernel's semantics are
    // unchanged per leg (bucket key = (band_idx, band_key); the cap, the
    // singleton drop and the saturation NULL all stay per-(leg, band,
    // key)), while all legs ride one groupBy. Candidate pairs come out
    // tagged by leg, union with the truth pairs (one synthetic leg per
    // config), and a single (config, pair) aggregate replaces the two
    // full-outer joins per config: a pair's is_t/is_c/is_o flags are max()
    // over its tagged occurrences — identical to the joined spelling, with
    // the multi-band duplicate-pair dedup absorbed into the same
    // aggregate's map side. Plan: 19 exchanges → 8 for the x198 defaults.
    val nLegs = 2 * bandConfigs.size
    val legSlices = bandConfigs.zipWithIndex.flatMap { case (bands, ci) =>
      val r = numBins / bands
      Seq("sig_c", "sig_o").zipWithIndex.map { case (sigCol, si) =>
        val leg = ci * 2 + si
        base.select(col("doc_id"), posexplode(
          expr(s"transform(sequence(0, ${bands - 1}), b -> slice($sigCol, b * $r + 1, $r))")))
          .toDF("doc_id", "band_idx", "band_key")
          .select(col("doc_id"),
            (col("band_idx") * nLegs + leg).as("band_idx"), col("band_key"))
      }
    }
    val candTagged = pairsFromBucketsTagged(
      boundedBuckets(legSlices.reduce(_.unionByName(_)),
        "band_idx", "band_key", maxBucketSize), nLegs)
    val truthTagged = bandConfigs.indices.map { ci =>
      truth.select(col("doc_a"), col("doc_b"), lit(ci * 2 + nLegs).as("leg"))
    }.reduce(_.unionByName(_))
    // config index of any leg id: strip the truth offset, drop the
    // signature bit — a pure function of leg, so ONE aggregate dedups
    // multi-band pair repeats and assembles the three per-leg flags
    val flags = candTagged.unionByName(truthTagged)
      .groupBy(((col("leg") % nLegs).cast("int") / lit(2)).cast("int").as("ci"),
        col("doc_a"), col("doc_b"))
      .agg(max(when(col("leg") < nLegs && col("leg") % 2 === 0, 1L).otherwise(0L)).as("is_c"),
        max(when(col("leg") < nLegs && col("leg") % 2 === 1, 1L).otherwise(0L)).as("is_o"),
        max(when(col("leg") >= nLegs, 1L).otherwise(0L)).as("is_t"))
    def perCi(f: Int => Long): Column = bandConfigs.indices
      .foldLeft(lit(-1L): Column) { (acc, ci) =>
        when(col("ci") === ci, lit(f(ci))).otherwise(acc) }
    val bandsOfCi = perCi(ci => bandConfigs(ci).toLong)
    val rowsPerBandOfCi = perCi(ci => (numBins / bandConfigs(ci)).toLong)
    val assembled = flags
      .join(na, Seq("doc_a")).join(nb, Seq("doc_b"))
      .select(col("ci"), bucketExpr.as("bucket_lo"),
        col("is_t"), col("is_c"), col("is_o"))
      .groupBy(col("ci"), col("bucket_lo"))
      .agg(sum(col("is_t")).as("n_truth"),
        sum(col("is_c")).as("n_cand_classic"),
        sum(col("is_t") * col("is_c")).as("n_tp_classic"),
        sum(col("is_o")).as("n_cand_oph"),
        sum(col("is_t") * col("is_o")).as("n_tp_oph"))
      .select(bandsOfCi.as("bands"), rowsPerBandOfCi.as("rows_per_band"),
        col("bucket_lo"), col("n_truth"), col("n_cand_classic"), col("n_tp_classic"),
        col("n_cand_oph"), col("n_tp_oph"))
    def ratioMicro(num: String, den: String): String =
      s"CASE WHEN $den = 0 THEN NULL ELSE " +
        s"CAST(FLOOR(CAST($num AS DOUBLE) * 1000000.0D / CAST($den AS DOUBLE)) AS BIGINT) END"
    assembled
      .select(col("bands"), col("rows_per_band"), col("bucket_lo"),
        col("n_truth"), col("n_cand_classic"), col("n_tp_classic"),
        col("n_cand_oph"), col("n_tp_oph"),
        expr(ratioMicro("n_tp_classic", "n_truth")).as("recall_classic_micro"),
        expr(ratioMicro("n_tp_oph", "n_truth")).as("recall_oph_micro"),
        expr(ratioMicro("n_tp_classic", "n_cand_classic")).as("precision_classic_micro"),
        expr(ratioMicro("n_tp_oph", "n_cand_oph")).as("precision_oph_micro"))
      .orderBy(col("bands").desc, col("bucket_lo"))
  }

  /** Shared banded-signature pipeline: signature AND sorted shingle-hash
    * array in ONE map-side projection over the scan, materialized once
    * (three consumers: the banded pipeline and both verify sides).
    * Verification is a merge walk over the two precomputed arrays — the
    * earlier spelling carried raw token arrays to the verify join and
    * re-shingled BOTH docs PER PAIR (a doc in p pairs paid p re-hashings
    * of its whole text). */
  private def bandedJaccardPairs(docs: DataFrame, idCol: String, textCol: String,
      shingleK: Int, sigOf: Column => Column, bands: Int,
      threshold: Double, maxBucketSize: Int): DataFrame = {
    // Single-split inputs (guide §2.5 "input skew") serialize the signature
    // projection AND leave the checkpointed base 1-partitioned, so the band
    // explode and both verify joins all start serial. Par.widen repairs only
    // under-partitioned inputs — a no-op on a well-partitioned corpus; it
    // sits BELOW the tokenize/sig projections so they run post-exchange.
    val base = Par.widenBySize(docs.select(col(idCol).as("doc_id"), col(textCol).as("__t")))
      .select(col("doc_id"), tokens(col("__t")).as("toks"))
      .select(col("doc_id"),
        sigOf(col("toks")).as("sig"),
        shingle_hashes(col("toks"), shingleK).as("sh"))
      .withColumn("n_sh", size(col("sh")))
      .localCheckpoint()
    val banded = base
      .select(col("doc_id"), posexplode(band_hashes(col("sig"), bands)))
      .toDF("doc_id", "band_idx", "band_hash")
    val candidates = bucketCandidatePairs(banded, "band_idx", "band_hash", maxBucketSize)
    val ta = base.select(col("doc_id").as("doc_a"), col("sh").as("sh_a"), col("n_sh").as("n_a"))
    val tb = base.select(col("doc_id").as("doc_b"), col("sh").as("sh_b"), col("n_sh").as("n_b"))
    candidates
      .join(ta, Seq("doc_a"))
      .join(tb, Seq("doc_b"))
      .withColumn("n_inter", sorted_intersect_count(col("sh_a"), col("sh_b")))
      .select(col("doc_a"), col("doc_b"),
        (col("n_inter").cast("double") /
          (col("n_a") + col("n_b") - col("n_inter"))).as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }

  /** The shared LSH candidate-pair kernel: ONE shuffle. Bucket rows
    * `(bucketCols…, doc_id)` aggregate to capped id-lists (skipping
    * singleton and degenerate mega-buckets in the same pass), pairs are
    * generated map-side from each list, then de-duplicated. Compared to the
    * window-cap + self-join formulation this removes a full sort and a
    * second shuffle of the banded table — the difference between 2 and 5
    * exchanges on the 100 TB path.
    *
    * The aggregation uses `bounded_collect_set`, which saturates to NULL and
    * O(1) buffer state the moment a bucket exceeds `maxBucketSize` — so a
    * degenerate mega-bucket (boilerplate docs sharing one band hash) never
    * materializes an unbounded id list on any executor, in the partial
    * aggregate or the shuffle. */
  private[graft] def bucketCandidatePairs(banded: DataFrame, idxCol: String,
      hashCol: String, maxBucketSize: Int): DataFrame =
    pairsFromBuckets(boundedBuckets(banded, idxCol, hashCol, maxBucketSize))

  /** The capped bucket aggregation half of [[bucketCandidatePairs]]: one row
    * per (idx, hash) bucket with its id list, NULL where the bucket
    * saturated past `maxBucketSize`. Split out so audit paths that must
    * DETECT saturation (rather than silently skip — [[simhashRecallReport]]'s
    * truth leg) can inspect the bucket table before exploding it. */
  private[graft] def boundedBuckets(banded: DataFrame, idxCol: String,
      hashCol: String, maxBucketSize: Int): DataFrame =
    banded
      .groupBy(col(idxCol), col(hashCol))
      .agg(graft.functions.BoundedLongSet.bounded_collect_set(col("doc_id"), maxBucketSize).as("ids"))

  /** The pair-explosion half of [[bucketCandidatePairs]]: saturated (NULL)
    * and singleton buckets drop, surviving lists explode to their i<j pairs
    * map-side. */
  /** All i<j pairs of a bucket's id list, generated in-place (shared by
    * both pair generators below — r18 ADVICE: the two verbatim copies
    * could drift). */
  private val bucketPairExplosionSql: String =
    "flatten(transform(ids, (x, i) -> transform(slice(ids, i + 2, size(ids)), " +
      "y -> struct(least(x, y) AS a, greatest(x, y) AS b))))"

  private[graft] def pairsFromBuckets(buckets: DataFrame): DataFrame =
    buckets
      .filter(col("ids").isNotNull && size(col("ids")) >= 2)
      .select(explode(expr(bucketPairExplosionSql)).as("p"))
      .select(col("p.a").as("doc_a"), col("p.b").as("doc_b"))
      .distinct()

  /** [[pairsFromBuckets]] for a MULTI-LEG bucket relation whose band-index
    * space interleaves `nLegs` independent legs (`band_idx·nLegs + leg` —
    * [[ophRecallReport]]'s one-pass audit): pairs come out tagged with
    * their leg and WITHOUT the distinct — the caller's per-(leg, pair)
    * aggregate absorbs multi-band repeats, so the extra exchange a
    * distinct would cost here is pure overhead. */
  private[graft] def pairsFromBucketsTagged(buckets: DataFrame,
      nLegs: Int): DataFrame =
    buckets
      .filter(col("ids").isNotNull && size(col("ids")) >= 2)
      .select((col("band_idx") % nLegs).as("leg"),
        explode(expr(bucketPairExplosionSql)).as("p"))
      .select(col("p.a").as("doc_a"), col("p.b").as("doc_b"), col("leg"))

  /** LSH band-geometry tuning report: for each `bands` value over a
    * `sigLen`-hash signature, the CANDIDATE pair set (docs sharing at least
    * one band) scored against an exact-Jaccard truth pair set —
    * precision/recall per geometry, the table you read before committing a
    * 100 TB dedup run to one point on the S-curve.
    *
    * The banding key is the signature SLICE itself, not a hash of it: the
    * slice tuple is what banding semantically buckets on (the band hash is
    * a shuffle-key compaction), and keying on it makes the candidate stage
    * EXACTLY reproducible by the SQL oracle — no band-hash collision term.
    * Same one-shuffle capped-bucket kernel as production
    * ([[bucketCandidatePairs]]); the signature relation materializes once
    * and every geometry reuses it. */
  def lshTuningReport(docs: DataFrame, idCol: String, textCol: String,
      truthPairs: DataFrame, shingleK: Int = 3, sigLen: Int = 16,
      bandConfigs: Seq[Int] = Seq(16, 8, 4, 2),
      maxBucketSize: Int = 1000): DataFrame = {
    val base = docs
      .select(col(idCol).as("doc_id"),
        minhash_sig(tokens(col(textCol)), shingleK, sigLen).as("sig"))
      .localCheckpoint()
    val truth = truthPairs.select(col("doc_a"), col("doc_b")).distinct()
      .localCheckpoint()
    // ONE bucket pass + ONE pair aggregate for every geometry (the x198
    // one-pass audit shape): each config gets a disjoint slice of the
    // band-index space (band_idx·nCfg + ci), so the capped-bucket kernel's
    // per-(config, band, key) semantics are unchanged while all configs
    // ride one groupBy; tagged pairs dedup per (config, pair) in the same
    // aggregate that scores them. A config spine left-join preserves the
    // all-configs-present output row even when a geometry surfaces zero
    // candidates (the old per-config global agg always emitted its row).
    bandConfigs.foreach(bands => require(sigLen % bands == 0,
      s"bands=$bands must divide sigLen=$sigLen"))
    val nCfg = bandConfigs.size
    val bandedAll = bandConfigs.zipWithIndex.map { case (bands, ci) =>
      val r = sigLen / bands
      base.select(col("doc_id"), posexplode(
          expr(s"transform(sequence(0, ${bands - 1}), b -> slice(sig, b * $r + 1, $r))")))
        .toDF("doc_id", "band_idx", "band_key")
        .select(col("doc_id"),
          (col("band_idx") * nCfg + ci).as("band_idx"), col("band_key"))
    }.reduce(_.unionByName(_))
    val scored = pairsFromBucketsTagged(
      boundedBuckets(bandedAll, "band_idx", "band_key", maxBucketSize), nCfg)
      .groupBy(col("leg").as("ci"), col("doc_a"), col("doc_b")).agg(lit(1).as("__one"))
      // truth is the audited pair set — near-dup-density-sized, broadcast
      // (localCheckpoint drops size stats, so without the hint Spark
      // falls back to a sort-merge join of a tiny relation)
      .join(broadcast(truth.withColumn("is_tp", lit(1L))), Seq("doc_a", "doc_b"), "left")
      .groupBy(col("ci"))
      .agg(count(lit(1)).as("n_candidates"),
        coalesce(sum(col("is_tp")), lit(0L)).as("n_tp"))
    val spine = bandConfigs.zipWithIndex.map { case (bands, ci) =>
      truth.sparkSession.range(1).select(lit(ci).as("ci"),
        lit(bands.toLong).as("bands"), lit((sigLen / bands).toLong).as("rows_per_band"))
    }.reduce(_.unionByName(_))
    // scored is ≤ one row per geometry by construction — broadcast at any
    // scale (the post-agg stats are unknown to the planner, which would
    // otherwise SMJ a |bandConfigs|-row relation)
    spine.join(broadcast(scored), Seq("ci"), "left")
      .select(col("bands"), col("rows_per_band"),
        coalesce(col("n_candidates"), lit(0L)).as("n_candidates"),
        coalesce(col("n_tp"), lit(0L)).as("n_tp"))
      .crossJoin(broadcast(truth.agg(count(lit(1)).as("n_truth"))))
      .select(col("bands"), col("rows_per_band"),
        col("n_candidates"), col("n_truth"), col("n_tp"),
        expr("CASE WHEN n_candidates = 0 THEN NULL ELSE " +
          "CAST(FLOOR(CAST(n_tp AS DOUBLE) * 1000000.0D / CAST(n_candidates AS DOUBLE)) AS BIGINT) END")
          .as("precision_micro"),
        expr("CASE WHEN n_truth = 0 THEN NULL ELSE " +
          "CAST(FLOOR(CAST(n_tp AS DOUBLE) * 1000000.0D / CAST(n_truth AS DOUBLE)) AS BIGINT) END")
          .as("recall_micro"))
      .orderBy(col("bands").desc)
  }

  /** 32-bit-split (a·b) mod 2⁶⁴ over non-negative HUGEINTs — intermediates
    * < 2⁹⁶, inside signed INT128 (x99's technique; needed because the
    * MinHash permutation multipliers are ~2⁶⁴). */
  private def mulmodSql(a: String, b: String): String =
    s"""((($a % 4294967296::HUGEINT) * $b +
       |  ((($a // 4294967296::HUGEINT) * $b) % 4294967296::HUGEINT)
       |    * 4294967296::HUGEINT) % 18446744073709551616::HUGEINT)""".stripMargin

  /** The x101 oracle: rebuilds the ENTIRE MinHash candidate stage in DuckDB
    * — token FNV-1a, rolling k-gram shingle folds (whole-doc gram when
    * n < k, distinct set), per-permutation a·h+b in mod-2⁶⁴ HUGEINT with the
    * multiplier/addend constants baked from [[graft.functions.Ops
    * .splitmix64]] at generation time, SIGNED min (the kernel compares
    * longs), band slices per geometry, slice-equality pairs, and the same
    * precision/recall arithmetic against the x08 exact-Jaccard truth CTEs
    * (passed in as `truthCtes` ending in a relation named `truth`). */
  def lshTuningSql(truthCtes: String, shingleK: Int, sigLen: Int,
      bandConfigs: Seq[Int]): String = {
    val perms = (0 until sigLen).map { p =>
      val a = java.lang.Long.toUnsignedString(graft.functions.Ops.splitmix64(2L * p) | 1L)
      val b = java.lang.Long.toUnsignedString(graft.functions.Ops.splitmix64(2L * p + 1))
      s"($p, $a::HUGEINT, $b::HUGEINT)"
    }.mkString(", ")
    val cfgs = bandConfigs.map(b => s"($b, ${sigLen / b})").mkString(", ")
    val fnvFold = (items: String) =>
      s"""list_reduce(list_prepend(14695981039346656037::HUGEINT, $items),
         |  (a, b) -> (xor(a, b) * 1099511628211::HUGEINT) % 18446744073709551616::HUGEINT)""".stripMargin
    s"""WITH $truthCtes,
       |tw AS (SELECT doc_id, string_split_regex(lower(text), '\\s+') AS w FROM documents),
       |tth AS (
       |  SELECT doc_id, list_transform(w, t ->
       |    ${fnvFold("list_transform(range(1, length(t) + 1), i -> unicode(substr(t, i, 1))::HUGEINT)")}) AS th
       |  FROM tw),
       |shd AS (
       |  SELECT DISTINCT doc_id, unnest(CASE WHEN len(th) >= $shingleK
       |    THEN list_transform(range(1, len(th) - ${shingleK - 2}), i ->
       |      ${fnvFold(s"th[i:i+${shingleK - 1}]")})
       |    ELSE [${fnvFold("th")}] END) AS h
       |  FROM tth),
       |perms(p, a, b) AS (VALUES $perms),
       |sigs AS (
       |  SELECT doc_id, p,
       |    min(CAST(CASE WHEN v >= 9223372036854775808::HUGEINT
       |      THEN v - 18446744073709551616::HUGEINT ELSE v END AS BIGINT)) AS s
       |  FROM (
       |    SELECT doc_id, pm.p AS p,
       |      (${mulmodSql("pm.a", "shd.h")} + pm.b) % 18446744073709551616::HUGEINT AS v
       |    FROM shd, perms pm)
       |  GROUP BY doc_id, p),
       |sigv AS (SELECT doc_id, list(s ORDER BY p) AS sig FROM sigs GROUP BY doc_id),
       |cfg(bands, r) AS (VALUES $cfgs),
       |banded AS (
       |  SELECT cfg.bands, doc_id, bi.b AS band_idx,
       |    sig[bi.b * cfg.r + 1 : bi.b * cfg.r + cfg.r] AS band_key
       |  FROM sigv, cfg, (SELECT unnest(range(${bandConfigs.max})) AS b) bi
       |  WHERE bi.b < cfg.bands),
       |cands AS (
       |  SELECT DISTINCT x.bands, x.doc_id AS doc_a, y.doc_id AS doc_b
       |  FROM banded x JOIN banded y
       |    ON x.bands = y.bands AND x.band_idx = y.band_idx
       |    AND x.band_key = y.band_key AND x.doc_id < y.doc_id),
       |stats AS (
       |  SELECT c.bands, count(*) AS n_candidates,
       |    sum(CASE WHEN t.doc_a IS NOT NULL THEN 1 ELSE 0 END) AS n_tp
       |  FROM cands c LEFT JOIN truth t
       |    ON c.doc_a = t.doc_a AND c.doc_b = t.doc_b
       |  GROUP BY c.bands),
       |nt AS (SELECT count(*) AS n_truth FROM truth)
       |SELECT CAST(cfg.bands AS BIGINT) AS bands, CAST(cfg.r AS BIGINT) AS rows_per_band,
       |  CAST(coalesce(s.n_candidates, 0) AS BIGINT) AS n_candidates,
       |  CAST(nt.n_truth AS BIGINT) AS n_truth,
       |  CAST(coalesce(s.n_tp, 0) AS BIGINT) AS n_tp,
       |  CASE WHEN coalesce(s.n_candidates, 0) = 0 THEN NULL ELSE
       |    CAST(floor(CAST(coalesce(s.n_tp, 0) AS DOUBLE) * 1000000.0
       |      / CAST(s.n_candidates AS DOUBLE)) AS BIGINT) END AS precision_micro,
       |  CASE WHEN nt.n_truth = 0 THEN NULL ELSE
       |    CAST(floor(CAST(coalesce(s.n_tp, 0) AS DOUBLE) * 1000000.0
       |      / CAST(nt.n_truth AS DOUBLE)) AS BIGINT) END AS recall_micro
       |FROM cfg LEFT JOIN stats s ON s.bands = cfg.bands, nt
       |ORDER BY bands DESC""".stripMargin
  }

  /** DuckDB replay of [[ophRecallReport]] — generated from the same
    * parameters so the layouts cannot drift (the [[simhashShareSql]]
    * discipline). `corpusCtes` must end by defining a relation
    * `pl(doc_id BIGINT, text)` — the planted corpus both engines score.
    * Replays: shingle hashing (the [[lshTuningSql]] FNV spelling), the
    * classic `numBins`-permutation signature (baked splitmix64 constants,
    * 32-bit-split mulmod), the FULL OPH signature — per-shingle splitmix64
    * in HUGEINT-mod-2⁶⁴ arithmetic (the x99 spelling), unsigned bin pick,
    * SIGNED per-bin min, and the cyclic rotation-densification walk with
    * the distance-scaled offset — slice banding for both legs, exact
    * Jaccard truth, and the per-bucket recall algebra. */
  def ophRecallSql(corpusCtes: String, shingleK: Int, numBins: Int,
      bandConfigs: Seq[Int], threshold: Double, bucketEdges: Seq[Int],
      maxBucketSize: Int = 1000): String = {
    require(bandConfigs.nonEmpty && bandConfigs.forall(b => b > 0 && numBins % b == 0),
      s"every bands value must divide numBins=$numBins, got $bandConfigs")
    val U = "18446744073709551616::HUGEINT" // 2^64
    val S = "9223372036854775808::HUGEINT" // 2^63
    def toSigned(v: String): String =
      s"CAST(CASE WHEN $v >= $S THEN $v - $U ELSE $v END AS BIGINT)"
    def toUnsigned(v: String): String =
      s"(CASE WHEN $v < 0 THEN CAST($v AS HUGEINT) + $U ELSE CAST($v AS HUGEINT) END)"
    val perms = (0 until numBins).map { p =>
      val a = java.lang.Long.toUnsignedString(graft.functions.Ops.splitmix64(2L * p) | 1L)
      val b = java.lang.Long.toUnsignedString(graft.functions.Ops.splitmix64(2L * p + 1))
      s"($p, $a::HUGEINT, $b::HUGEINT)"
    }.mkString(", ")
    val fnvFold = (items: String) =>
      s"""list_reduce(list_prepend(14695981039346656037::HUGEINT, $items),
         |  (a, b) -> (xor(a, b) * 1099511628211::HUGEINT) % $U)""".stripMargin
    // splitmix64 over an unsigned HUGEINT h — the x99Sql chain verbatim
    val sm1 = s"(h + 11400714819323198485::HUGEINT) % $U"
    val sm2 = mulmodSql("xor(x, x // 1073741824::HUGEINT)", "13787848793156543929::HUGEINT")
    val sm3 = mulmodSql("xor(x, x // 134217728::HUGEINT)", "10723151780598845931::HUGEINT")
    val bucketCase = bucketEdges.sorted.reverse
      .map(e => s"WHEN least(sa.n_sh, sb.n_sh) >= $e THEN ${e}")
      .mkString("CASE ", " ", " ELSE 0 END")
    s"""WITH $corpusCtes,
       |tw AS (SELECT doc_id, string_split_regex(lower(text), '\\s+') AS w FROM pl),
       |tth AS (
       |  SELECT doc_id, list_transform(w, t ->
       |    ${fnvFold("list_transform(range(1, length(t) + 1), i -> unicode(substr(t, i, 1))::HUGEINT)")}) AS th
       |  FROM tw),
       |shd AS (
       |  SELECT DISTINCT doc_id, unnest(CASE WHEN len(th) >= $shingleK
       |    THEN list_transform(range(1, len(th) - ${shingleK - 2}), i ->
       |      ${fnvFold(s"th[i:i+${shingleK - 1}]")})
       |    ELSE [${fnvFold("th")}] END) AS h
       |  FROM tth),
       |sizes AS (SELECT doc_id, count(*) AS n_sh FROM shd GROUP BY doc_id),
       |perms(p, a, b) AS (VALUES $perms),
       |csig AS (
       |  SELECT doc_id, p, min(${toSigned("v")}) AS s
       |  FROM (SELECT doc_id, pm.p AS p,
       |          (${mulmodSql("pm.a", "shd.h")} + pm.b) % $U AS v
       |        FROM shd, perms pm)
       |  GROUP BY doc_id, p),
       |csigv AS (SELECT doc_id, list(s ORDER BY p) AS sig FROM csig GROUP BY doc_id),
       |om1 AS (SELECT doc_id, $sm1 AS x FROM shd),
       |om2 AS (SELECT doc_id, $sm2 AS x FROM om1),
       |om3 AS (SELECT doc_id, $sm3 AS x FROM om2),
       |ohh AS (SELECT doc_id, xor(x, x // 2147483648::HUGEINT) AS oh FROM om3),
       |obin AS (
       |  SELECT doc_id, CAST(oh % $numBins AS BIGINT) AS bin,
       |    min(${toSigned("oh")}) AS m
       |  FROM ohh GROUP BY 1, 2),
       |grid AS (
       |  SELECT d.doc_id, gs.b
       |  FROM (SELECT DISTINCT doc_id FROM pl) d,
       |       (SELECT unnest(range($numBins)) AS b) gs),
       |walk AS (
       |  SELECT g.doc_id, g.b,
       |    min(CASE WHEN o.bin >= g.b THEN o.bin - g.b
       |        ELSE o.bin - g.b + $numBins END) AS d
       |  FROM grid g JOIN obin o ON o.doc_id = g.doc_id
       |  GROUP BY 1, 2),
       |oval AS (
       |  SELECT w.doc_id, w.b,
       |    CASE WHEN w.d = 0 THEN o.m
       |    ELSE ${toSigned(s"((${toUnsigned("o.m")} + CAST(w.d AS HUGEINT) * 11400714819323198485::HUGEINT) % $U)")}
       |    END AS s
       |  FROM walk w JOIN obin o
       |    ON o.doc_id = w.doc_id AND o.bin = (w.b + w.d) % $numBins),
       |osigv AS (SELECT doc_id, list(s ORDER BY b) AS sig FROM oval GROUP BY doc_id),
       |inter AS (
       |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_inter
       |  FROM shd a JOIN shd b ON a.h = b.h AND a.doc_id < b.doc_id
       |  GROUP BY 1, 2),
       |truth AS (
       |  SELECT i.doc_a, i.doc_b, $bucketCase AS bucket_lo
       |  FROM inter i
       |  JOIN sizes sa ON sa.doc_id = i.doc_a
       |  JOIN sizes sb ON sb.doc_id = i.doc_b
       |  WHERE CAST(i.n_inter AS DOUBLE)
       |    / (sa.n_sh + sb.n_sh - i.n_inter) >= $threshold),
       |${bandConfigs.map { b => configCtes(b, numBins / b, bucketCase, maxBucketSize) }.mkString(",\n")}
       |SELECT CAST(bands AS BIGINT) AS bands,
       |  CAST(rows_per_band AS BIGINT) AS rows_per_band,
       |  CAST(bucket_lo AS BIGINT) AS bucket_lo,
       |  CAST(n_truth AS BIGINT) AS n_truth,
       |  CAST(n_cand_classic AS BIGINT) AS n_cand_classic,
       |  CAST(n_tp_classic AS BIGINT) AS n_tp_classic,
       |  CAST(n_cand_oph AS BIGINT) AS n_cand_oph,
       |  CAST(n_tp_oph AS BIGINT) AS n_tp_oph,
       |  ${ratioMicroSql("n_tp_classic", "n_truth")} AS recall_classic_micro,
       |  ${ratioMicroSql("n_tp_oph", "n_truth")} AS recall_oph_micro,
       |  ${ratioMicroSql("n_tp_classic", "n_cand_classic")} AS precision_classic_micro,
       |  ${ratioMicroSql("n_tp_oph", "n_cand_oph")} AS precision_oph_micro
       |FROM (${bandConfigs.map(b => s"SELECT * FROM rep$b").mkString(" UNION ALL ")})
       |ORDER BY bands DESC, bucket_lo""".stripMargin
  }

  private def ratioMicroSql(num: String, den: String): String =
    s"CASE WHEN $den = 0 THEN NULL ELSE " +
      s"CAST(FLOOR(CAST($num AS DOUBLE) * 1000000.0 / CAST($den AS DOUBLE)) AS BIGINT) END"

  /** Per-band-geometry CTE block of [[ophRecallSql]]: slice banding for
    * both signature legs, DISTINCT candidate pairs under the SAME bucket
    * cap the engine's `bounded_collect_set` applies (a bucket past
    * `maxBucketSize` contributes zero pairs — without the HAVING replay,
    * a saturated bucket would silently diverge the two engines), bucketed
    * truth/candidate aggregates, and the full-outer assembly `rep$bands`. */
  private def configCtes(bands: Int, r: Int, bucketCase: String, cap: Int): String =
    s"""bi$bands AS (SELECT unnest(range($bands)) AS b),
       |cband$bands AS (SELECT doc_id, bi$bands.b AS band_idx,
       |  sig[bi$bands.b * $r + 1 : bi$bands.b * $r + $r] AS key FROM csigv, bi$bands),
       |oband$bands AS (SELECT doc_id, bi$bands.b AS band_idx,
       |  sig[bi$bands.b * $r + 1 : bi$bands.b * $r + $r] AS key FROM osigv, bi$bands),
       |cbsz$bands AS (SELECT doc_id, band_idx, key,
       |  count(*) OVER (PARTITION BY band_idx, key) AS bsz FROM cband$bands),
       |obsz$bands AS (SELECT doc_id, band_idx, key,
       |  count(*) OVER (PARTITION BY band_idx, key) AS bsz FROM oband$bands),
       |ccand$bands AS (
       |  SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b
       |  FROM cbsz$bands x JOIN cbsz$bands y
       |    ON x.band_idx = y.band_idx AND x.key = y.key AND x.doc_id < y.doc_id
       |  WHERE x.bsz <= $cap),
       |ocand$bands AS (
       |  SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b
       |  FROM obsz$bands x JOIN obsz$bands y
       |    ON x.band_idx = y.band_idx AND x.key = y.key AND x.doc_id < y.doc_id
       |  WHERE x.bsz <= $cap),
       |ta$bands AS (
       |  SELECT t.bucket_lo, count(*) AS n_truth,
       |    sum(CASE WHEN c.doc_a IS NOT NULL THEN 1 ELSE 0 END) AS n_tp_classic,
       |    sum(CASE WHEN o.doc_a IS NOT NULL THEN 1 ELSE 0 END) AS n_tp_oph
       |  FROM truth t
       |  LEFT JOIN ccand$bands c ON c.doc_a = t.doc_a AND c.doc_b = t.doc_b
       |  LEFT JOIN ocand$bands o ON o.doc_a = t.doc_a AND o.doc_b = t.doc_b
       |  GROUP BY 1),
       |ca$bands AS (
       |  SELECT $bucketCase AS bucket_lo, count(*) AS n_cand_classic
       |  FROM ccand$bands c
       |  JOIN sizes sa ON sa.doc_id = c.doc_a
       |  JOIN sizes sb ON sb.doc_id = c.doc_b GROUP BY 1),
       |oa$bands AS (
       |  SELECT $bucketCase AS bucket_lo, count(*) AS n_cand_oph
       |  FROM ocand$bands c
       |  JOIN sizes sa ON sa.doc_id = c.doc_a
       |  JOIN sizes sb ON sb.doc_id = c.doc_b GROUP BY 1),
       |rep$bands AS (
       |  SELECT $bands AS bands, $r AS rows_per_band,
       |    coalesce(ta.bucket_lo, ca.bucket_lo, oa.bucket_lo) AS bucket_lo,
       |    coalesce(ta.n_truth, 0) AS n_truth,
       |    coalesce(ca.n_cand_classic, 0) AS n_cand_classic,
       |    coalesce(ta.n_tp_classic, 0) AS n_tp_classic,
       |    coalesce(oa.n_cand_oph, 0) AS n_cand_oph,
       |    coalesce(ta.n_tp_oph, 0) AS n_tp_oph
       |  FROM ta$bands ta
       |  FULL OUTER JOIN ca$bands ca ON ca.bucket_lo = ta.bucket_lo
       |  FULL OUTER JOIN oa$bands oa
       |    ON oa.bucket_lo = coalesce(ta.bucket_lo, ca.bucket_lo))""".stripMargin

  /** Corpus minus the lower-id-loses side of every verified near-dup pair.
    * LSH parameters pass through to [[minhashNearDupPairs]]; callers that
    * need oracle-able determinism (pair set == exact-Jaccard pair set)
    * should pick a band geometry whose miss probability at the threshold is
    * negligible — e.g. 64 bands of r=2 at threshold 0.5 miss a boundary
    * pair with p = (1−0.5²)^64 ≈ 1e-8 (the x06 regime). */
  def minhashDedup(docs: DataFrame, idCol: String, textCol: String,
      shingleK: Int = 3, numHashes: Int = 128, bands: Int = 16,
      threshold: Double = 0.7, maxBucketSize: Int = 1000): DataFrame = {
    // TWO consumers (the pair kernel's signature base and the anti-join
    // left side) — when the input carries its own exchanges (x18's
    // gates → exact-dedup chain), materialize it once instead of running
    // that whole lineage twice (the multi-consumer checkpoint rule every
    // kernel here follows). A plain scan stays un-checkpointed: both
    // consumers then just re-read the file, which is cheaper than holding
    // a second copy of the corpus in block storage.
    val d = if (Par.hasExchange(docs)) docs.localCheckpoint() else docs
    val losers = minhashNearDupPairs(d, idCol, textCol,
      shingleK, numHashes, bands, threshold, maxBucketSize)
      .select(col("doc_b").as(idCol)).distinct()
    d.join(losers, Seq(idCol), "left_anti")
  }

  // ---------------------------------------------------------------- simhash
  /** Near-equal contiguous block layout of the 64-bit signature: `blocks`
    * bit ranges as (offset, width), the wider ones first. */
  private def blockLayout(blocks: Int): Seq[(Int, Int)] = {
    require(blocks >= 2 && blocks <= 64, s"simhash blocks must be in [2, 64], got $blocks")
    val base = 64 / blocks
    val extra = 64 % blocks
    val widths = Seq.tabulate(blocks)(i => base + (if (i < extra) 1 else 0))
    widths.scanLeft(0)(_ + _).zip(widths) // (offset, width) per block
  }

  /** The block-combination bucket family over a `(doc_id, sig)` relation —
    * Manku/Jain/Das Sarma, WWW'07 "Detecting Near-Duplicates for Web
    * Crawling" (public knowledge): split the signature into `blocks`
    * near-equal bit blocks and key one table on EACH `keyBlocks`-subset's
    * concatenated bits, C(blocks, keyBlocks) tables total. Any pair within
    * hamming h ≤ blocks − keyBlocks flips at most h blocks, leaving a
    * fully-untouched key subset ⇒ candidacy is GUARANTEED (pigeonhole),
    * while the key space is 2^(keyBlocks·64/blocks) — the knob that keeps
    * bucket occupancy from crowding as the corpus grows. The r13 sf1 stress
    * made this concrete: single 16-bit chunks (blocks=4, keyBlocks=1,
    * 262k buckets total) saturated organically at a mere 50k docs and
    * silently cost ~1% of qualifying pairs; the (6,3) family's ~2³³ key
    * space held max occupancy at 140. Emits `(doc_id, chunk_idx,
    * chunk_val)` — the [[bucketCandidatePairs]] input shape. */
  private[graft] def simhashBandRel(sigs: DataFrame, blocks: Int, keyBlocks: Int): DataFrame = {
    val layout = blockLayout(blocks)
    require(keyBlocks >= 1 && keyBlocks <= blocks,
      s"simhash keyBlocks must be in [1, blocks], got $keyBlocks of $blocks")
    val combos = layout.indices.combinations(keyBlocks).toSeq
    require(combos.forall(_.map(layout(_)._2).sum <= 63),
      s"simhash key of $keyBlocks×${64 / blocks}-bit blocks overflows a signed long")
    val keyExprs = combos.map { combo =>
      var shift = 0
      combo.map { b =>
        val (off, w) = layout(b)
        val e = s"((sig >> $off) & ${(1L << w) - 1}L)"
        val shifted = if (shift == 0) e else s"($e << $shift)"
        shift += w
        shifted
      }.mkString(" | ")
    }
    sigs.select(col("doc_id"),
      posexplode(array(keyExprs.map(expr): _*)).as(Seq("chunk_idx", "chunk_val")))
  }

  /** The same block-combination candidacy test as [[simhashBandRel]], as a
    * SQL predicate over two signature expressions — what lets a plain SQL
    * engine replay a given geometry's candidate stage exactly (the x192
    * oracle). */
  def simhashShareSql(aSig: String, bSig: String, blocks: Int, keyBlocks: Int): String = {
    val layout = blockLayout(blocks)
    layout.indices.combinations(keyBlocks).map { combo =>
      combo.map { b =>
        val (off, w) = layout(b)
        val m = (1L << w) - 1
        s"((($aSig >> $off) & $m) = (($bSig >> $off) & $m))"
      }.mkString("(", " AND ", ")")
    }.mkString("(", " OR ", ")")
  }

  /** SimHash near-duplicate pairs: 64-bit signature, bucketed by the
    * [[simhashBandRel]] block-combination family (default 6 blocks keyed in
    * triples — exhaustive for hamming ≤ 6−3 by pigeonhole, ~2³³-value keys
    * so buckets don't crowd with corpus size; `blocks = 4, keyBlocks = 1`
    * reproduces the classic 4×16-bit single-chunk geometry, whose recall
    * BEYOND its exhaustive range is actually higher — fewer clean blocks
    * required — at the price of a 2¹⁶ key space that saturates early),
    * verified with bit_count(xor) ≤ maxHamming. Exhaustive iff
    * `maxHamming ≤ blocks − keyBlocks`; beyond that the output is the
    * partial-recall candidate∩threshold set ([[simhashRecallReport]]
    * quantifies the decay). The non-exhaustive regime is OPT-IN: with the
    * geometry left at its default (pass `blocks`/`keyBlocks` < 0), a
    * `maxHamming` beyond the default's exhaustive range (6 − 3 = 3) throws
    * instead of silently returning a smaller pair set — the r13 geometry
    * change ((4,1) chunks → Manku (6,3)) shrank exactly that regime, and a
    * caller must see it, not inherit it. */
  def simhashNearDupPairs(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      maxHamming: Int = 3,
      maxBucketSize: Int = 1000,
      blocks: Int = -1,
      keyBlocks: Int = -1): DataFrame =
    hammingNearDupPairs(
      docs.select(col(idCol).as("doc_id"), simhash64(tokens(col(textCol))).as("sig")),
      maxHamming, maxBucketSize, blocks, keyBlocks)

  /** Exact Hamming-≤h pairs over an ARBITRARY `(doc_id, sig)` 64-bit
    * signature relation — the banded pigeonhole kernel behind
    * [[simhashNearDupPairs]], factored out because the guarantee is a
    * property of 64-bit signatures, not of text: any perceptual signature
    * with the "near-duplicates land within a few bits" contract (text
    * SimHash, image dHash — [[graft.ops.Multimodal.imageNearDupPairs]])
    * rides the same capped one-shuffle bucket family. Exhaustive iff
    * `maxHamming ≤ blocks − keyBlocks` (pigeonhole); the default (6,3)
    * geometry covers h ≤ 3 and a defaulted-geometry call beyond that
    * throws rather than silently under-returning. */
  def hammingNearDupPairs(
      sigRel: DataFrame,
      maxHamming: Int = 3,
      maxBucketSize: Int = 1000,
      blocks: Int = -1,
      keyBlocks: Int = -1): DataFrame = {
    // geometry is all-or-nothing: a half-specified call (blocks given,
    // keyBlocks defaulted, or vice versa) would resolve to a MIXED geometry
    // the caller never named, and the guard below would then report the
    // wrong exhaustive range for it (r14 ADVICE) — reject it outright
    require((blocks < 0) == (keyBlocks < 0),
      s"hamming pairs: blocks and keyBlocks must be passed together or both " +
        s"left defaulted — got blocks=$blocks, keyBlocks=$keyBlocks (a mixed " +
        s"explicit/default geometry has no documented exhaustive range)")
    val geometryDefaulted = blocks < 0
    val b = if (blocks < 0) 6 else blocks
    val kb = if (keyBlocks < 0) 3 else keyBlocks
    require(!(geometryDefaulted && maxHamming > b - kb),
      s"hamming pairs: maxHamming=$maxHamming exceeds the default ($b,$kb) geometry's " +
        s"exhaustive range (h <= ${b - kb}); recall beyond it is partial and " +
        s"geometry-dependent — pass blocks/keyBlocks explicitly to opt in " +
        s"(e.g. blocks=8, keyBlocks=1 is exhaustive through h=7)")
    // (id, sig) is 16 bytes/doc; materialize it once or all three consumers
    // (chunk explode + both verify sides) re-run the upstream signature
    // computation (for text: a full corpus re-scan and re-MD5 of every
    // token; for images: a full re-decode).
    val sigs = sigRel.select(col("doc_id"), col("sig")).localCheckpoint()
    val chunked = simhashBandRel(sigs, b, kb)
    val candidates = bucketCandidatePairs(chunked, "chunk_idx", "chunk_val", maxBucketSize)
    candidates
      .join(sigs.select(col("doc_id").as("doc_a"), col("sig").as("sig_a")), Seq("doc_a"))
      .join(sigs.select(col("doc_id").as("doc_b"), col("sig").as("sig_b")), Seq("doc_b"))
      .select(col("doc_a"), col("doc_b"),
        bit_count(col("sig_a").bitwiseXOR(col("sig_b"))).as("hamming"))
      .filter(col("hamming") <= maxHamming)
  }

  /** SimHash pigeonhole-geometry RECALL report — the [[lshTuningReport]] /
    * IVF-recall (x188) discipline applied to the SimHash leg: how much of
    * the true hamming-≤h pair set does a given block-combination geometry
    * (`blocks` keyed in `keyBlocks`-subsets; default the classic 4×16-bit
    * single-chunk family, the production geometry until r13) actually
    * surface, per threshold h? For h ≤ blocks − keyBlocks the pigeonhole is
    * provably exhaustive (h flipped bits cannot touch enough blocks);
    * beyond that recall decays — this table is what you read before
    * trusting a looser threshold to a geometry.
    *
    * The TRUTH leg is itself a pigeonhole, just finer: 8×8-bit chunks are
    * exhaustive for every h ≤ 7 (7 flips cannot touch all 8 chunks), so
    * ground truth costs one more pass of the same capped one-shuffle bucket
    * kernel — never an all-pairs join, which keeps the audit 100 TB-shaped
    * exactly like the production path it grades. Counts are cumulative per
    * threshold; `recall_micro = (n_candidates·10⁶) DIV n_truth` is exact
    * integer math both engines reproduce bit-for-bit.
    *
    * Truth-leg honesty: the 8-bit chunk key space is only 8×256 buckets, so
    * truth-bucket sizes grow LINEARLY with corpus size (≈ n/256 per chunk on
    * random signatures) — exhaustive hamming truth is inherently quadratic
    * per bucket and belongs on a sampled corpus, not the full 100 TB run.
    * The truth leg therefore carries its OWN cap (`truthBucketCap`,
    * independent of the production-geometry `maxBucketSize`) and FAILS
    * LOUDLY if any truth bucket saturates: a silently-NULLed truth bucket
    * would drop truth pairs, break the "exhaustive for h ≤ 7" claim, and let
    * recall_micro drift past 10⁶ with no visible symptom. */
  def simhashRecallReport(docs: DataFrame, idCol: String, textCol: String,
      maxHammings: Seq[Int] = Seq(1, 2, 3, 4, 5, 6, 7),
      maxBucketSize: Int = 1000,
      truthBucketCap: Int = 8192,
      blocks: Int = 4,
      keyBlocks: Int = 1): DataFrame = {
    require(maxHammings.nonEmpty && maxHammings.forall(h => h >= 0 && h <= 7),
      s"simhash recall: thresholds must be in [0, 7] (8-chunk truth bound), got $maxHammings")
    val spark = docs.sparkSession
    val sigs = docs
      .select(col(idCol).as("doc_id"), simhash64(tokens(col(textCol))).as("sig"))
      .localCheckpoint()
    def verified(pairs: DataFrame): DataFrame = pairs
      .join(sigs.select(col("doc_id").as("doc_a"), col("sig").as("sig_a")), Seq("doc_a"))
      .join(sigs.select(col("doc_id").as("doc_b"), col("sig").as("sig_b")), Seq("doc_b"))
      .select(bit_count(col("sig_a").bitwiseXOR(col("sig_b"))).as("hamming"))
    // CANDIDATE leg: the graded geometry under the production cap —
    // saturation here is exactly the production behavior being graded.
    val candPairs = bucketCandidatePairs(
      simhashBandRel(sigs, blocks, keyBlocks), "chunk_idx", "chunk_val", maxBucketSize)
    // TRUTH leg: 8×8-bit pigeonhole under its own cap, saturation = error.
    // The bucket table is ≤ 2048 rows; materializing it for the check is
    // one tiny job, and the pair explosion below reuses the stored blocks.
    val truthBuckets = boundedBuckets(
      simhashBandRel(sigs, 8, 1), "chunk_idx", "chunk_val", truthBucketCap)
      .localCheckpoint()
    val nSaturated = truthBuckets.filter(col("ids").isNull).count()
    require(nSaturated == 0L,
      s"simhash recall: $nSaturated truth bucket(s) exceeded truthBucketCap=$truthBucketCap — " +
        "the 8×8-bit truth leg would silently drop pairs and the report's " +
        "'exhaustive for h ≤ 7' guarantee would break. Raise truthBucketCap " +
        "or run the audit on a sampled corpus (exhaustive hamming truth is " +
        "inherently quadratic per bucket).")
    val truthPairs = pairsFromBuckets(truthBuckets)
    // per-hamming-distance histograms: ≤ 8 rows each, so the per-threshold
    // cumulative counts are a driver-free broadcast-sized crossJoin away
    val candHist = verified(candPairs).filter(col("hamming") <= maxHammings.max)
      .groupBy(col("hamming")).agg(count(lit(1)).as("c"))
    val truthHist = verified(truthPairs).filter(col("hamming") <= maxHammings.max)
      .groupBy(col("hamming")).agg(count(lit(1)).as("c"))
    import spark.implicits._
    val hs = maxHammings.distinct.sorted.toDF("max_hamming")
    def cumul(hist: DataFrame, as: String): DataFrame = hs
      .join(broadcast(hist), col("hamming") <= col("max_hamming"), "left")
      .groupBy(col("max_hamming"))
      .agg(coalesce(sum(col("c")), lit(0L)).as(as))
    cumul(candHist, "n_candidates")
      .join(cumul(truthHist, "n_truth"), Seq("max_hamming"))
      .select(col("max_hamming").cast("long").as("max_hamming"),
        col("n_candidates"), col("n_truth"),
        expr("CASE WHEN n_truth = 0 THEN NULL ELSE (n_candidates * 1000000) DIV n_truth END")
          .as("recall_micro"))
      .orderBy(col("max_hamming"))
  }

  // ----------------------------------------------------------- n-gram jaccard
  /** Per-doc DISTINCT shingle-hash sets, built entirely map-side: the shingle
    * array (64-bit xxhash of each k-token window; whole-token-list hash when
    * the doc is shorter than k) is a single projection over the scan — no
    * explode+distinct shuffle. Joining/intersecting on the 8-byte hash
    * instead of the string keeps every downstream shuffle narrow (collision
    * odds at 64 bits are negligible against any realistic shingle count). */
  private[graft] def shingleSets(docs: DataFrame, idCol: String, textCol: String,
      shingleK: Int): DataFrame =
    docs.select(
      col(idCol).as("doc_id"),
      shingle_hashes(tokens(col(textCol)), shingleK).as("shingles"))
      .withColumn("n_shingles", size(col("shingles")))

  /** Only this many of the globally hottest shingles get an explicit rank
    * in the prefix order; everything else ties at rank 0 (hash order). The
    * skew bomb is the TOP of the df distribution — a shingle of df ~10³
    * beyond the cap contributes at most df² ~10⁶ candidate rows spread
    * across partitions, which the verify join absorbs; the cap keeps the
    * literal map (and the plan) small. */
  private val MaxHotShingles = 4096

  /** PPJoin-style prefix-filtered candidate pairs (Xiao/Wang/Lin/Yu,
    * WWW'08 — public knowledge): fix a global total order on shingles and
    * join each doc only on its first `n - ceil(t*n) + 1` shingles in that
    * order. Any pair with Jaccard ≥ t has overlap ≥ ceil(t·max(n_a, n_b)),
    * so the prefixes are guaranteed to share a shingle — EXACT for ANY
    * fixed global order; the order choice only controls how many candidates
    * survive. The classic choice is full df-ascending, which costs a
    * df join + a per-doc re-sort — THREE wide shuffles of the exploded
    * (doc, shingle) relation before pair generation even starts.
    *
    * This implementation keeps the skew-defusing property at a fraction of
    * the cost: ONE aggregate computes global document frequencies, the top
    * [[MaxHotShingles]] land in a literal hash map, and the prefix order is
    * (hot-df-or-0 ASC, hash ASC) — computed MAP-SIDE per document by an
    * `array_sort` comparator over the already-materialized shingle array.
    * A boilerplate shingle in f docs ranks LAST and enters almost no
    * prefixes (the round-2/3 verdicts' standing skew finding), while the
    * long df=1..few tail — where ordering buys nothing measurable — rides
    * hash order for free. Net: the df join and the per-doc ranked-rebuild
    * shuffle disappear from the 100 TB path; what remains is one count
    * aggregate over 8-byte keys, a driver-side top-k of it, and a map-side
    * explode. */
  /** The prefix ORDER as a map-side expression: collect the top hot
    * shingles of `perDoc` and bake them into a [[graft.functions.Exprs.PrefixRankSort]].
    * Any single expression applied to every participating relation defines
    * one consistent global order — the exactness precondition. */
  private[graft] def hotPrefixExpr(perDoc: DataFrame): Column =
    prefixExprOf(hotShingles(perDoc))

  /** The (shingle, df) hot table behind [[hotPrefixExpr]], as driver-side
    * rows — split out so a persisted index ([[graft.streaming.DedupStreams]])
    * can write it once and rebuild the identical order expression from disk
    * on any later session. */
  private[graft] def hotShingles(perDoc: DataFrame): Array[(Long, Long)] =
    perDoc.select(explode(col("shingles")).as("shingle"))
      .groupBy("shingle").agg(count(lit(1)).as("df"))
      .filter(col("df") >= 2)
      .orderBy(col("df").desc, col("shingle"))
      .limit(MaxHotShingles)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)))

  /** The prefix ORDER expression for a given hot table. The comparator
    * ranks by df VALUE (hash-map lookup), so any hot array holding the same
    * (shingle, df) pairs defines the same total order — persisting the
    * pairs and rebuilding later is exact. */
  private[graft] def prefixExprOf(hot: Array[(Long, Long)]): Column =
    if (hot.isEmpty) col("shingles")
    else prefix_rank_sort(col("shingles"), hot.map(_._1), hot.map(_._2))

  /** Explode each doc's length-`n - ceil(t*n) + 1` prefix under the given
    * rank order: (doc_id, n_shingles, pos, shingle) rows, map-side. `pos`
    * is the shingle's 0-based index in the ranked array — the positional
    * filter's input. */
  private[graft] def prefixRows(perDoc: DataFrame, prefixExpr: Column,
      threshold: Double): DataFrame =
    perDoc
      .withColumn("__ranked", prefixExpr)
      .select(col("doc_id"), col("n_shingles"), posexplode(expr(
        s"slice(__ranked, 1, cast(n_shingles - ceil($threshold * n_shingles) + 1 as int))"))
        .as(Seq("pos", "shingle")))

  private[graft] def prefixCandidates(perDoc: DataFrame, threshold: Double): DataFrame = {
    val prefixes = prefixRows(perDoc, hotPrefixExpr(perDoc), threshold)
    // Pair generation is a plain self-join on the prefix shingle. A
    // groupBy(shingle)+collect_list with in-place pair expansion was
    // measured against this (sf0.1, warm): 4.3 s vs 3.3 s for the whole
    // query — the hash join is codegen'd and the self-join does NOT
    // re-evaluate the prefix pipeline (the exchange is reused), while the
    // collect_list spelling pays list materialization plus a non-codegen
    // quadratic expansion expression.
    // PPJoin's second filter alongside the prefix: the LENGTH filter.
    // J(a,b) ≥ t forces t·max(n_a,n_b) ≤ min(n_a,n_b), so any pair whose
    // set sizes differ by more than 1/t can't qualify — applied INSIDE the
    // self-join it prunes candidates before they ever reach the verify
    // join (measured: 409k → fewer candidate rows at t=0.5, sf0.1).
    val a = prefixes.select(col("doc_id").as("doc_a"), col("shingle"),
      col("n_shingles").as("n_a"), col("pos").as("pos_a"))
    val b = prefixes.select(col("doc_id").as("doc_b"), col("shingle"),
      col("n_shingles").as("n_b"), col("pos").as("pos_b"))
    // PPJoin's THIRD filter: the POSITIONAL filter. J ≥ t ⟺ overlap ≥
    // α = ceil(t/(1+t)·(n_a+n_b)); a match row at 0-based ranked positions
    // (pos_a, pos_b) bounds the overlap by 1 + min(n_a−pos_a−1,
    // n_b−pos_b−1). Exact as a per-row prune even though only the FIRST
    // shared shingle's bound is tight: shared shingles appear in the same
    // relative order in both ranked arrays (one global order), so the first
    // shared one minimizes BOTH positions — if its row fails, every later
    // row's bound is smaller and the pair genuinely cannot reach α; if it
    // passes, the pair survives through that row. Net effect at 10× scale:
    // near-dup pairs stop emitting one candidate row per shared LATE prefix
    // shingle — the duplicated volume the distinct below must chew through.
    // The slack keeps double rounding of t/(1+t)·(n) from ever rounding
    // the ceil UP past the true integer α (over-pruning would cost true
    // pairs; under-pruning only keeps a few extra rows for the verify
    // join). It must scale with the product: a fixed 1e-9 stops covering
    // the ~(n_a+n_b)·2⁻⁵² rounding error once n_a+n_b exceeds ~10⁷
    // shingles, so the factor carries a 1e-12 RELATIVE slack (≫ the few-ulp
    // real error, and under-pruning stays < 1 for any corpus with
    // n_a+n_b < 10¹²) plus the absolute 1e-9 for small products.
    val alpha = ceil((col("n_a") + col("n_b"))
      * lit((threshold / (1.0 + threshold)) * (1.0 - 1e-12)) - lit(1e-9))
    a.join(b, Seq("shingle"))
      .filter(col("doc_a") < col("doc_b") &&
        col("n_a") * lit(threshold) <= col("n_b") &&
        col("n_b") * lit(threshold) <= col("n_a") &&
        lit(1) + least(col("n_a") - col("pos_a") - 1, col("n_b") - col("pos_b") - 1) >= alpha)
      .select(col("doc_a"), col("doc_b"))
      // Explicit-count repartition by the pair key BEFORE the distinct: the
      // r13 10× stress read 77–184 s run-to-run because the join stage's
      // (AQE-coalesced, few, fat) tasks ran the distinct's partial hash
      // aggregate over the full duplicated candidate stream — per-task maps
      // of millions of entries, spill/GC-bound in an 8 GiB JVM. With the
      // exchange first, the join stage only STREAMS rows into shuffle
      // writers (bounded buffers), duplicates of a pair co-locate, and each
      // dedup task holds exactly its hash range — distinct_pairs/P entries,
      // deterministic memory. The explicit count keeps AQE from coalescing
      // the dedup side back into fat tasks.
      .repartition(perDoc.sparkSession.sessionState.conf.numShufflePartitions,
        col("doc_a"), col("doc_b"))
      .distinct()
  }

  /** Exact n-gram Jaccard pairs — fully relational (SQL-expressible, so it
    * carries a DuckDB oracle). Candidates come from the exactness-preserving
    * prefix filter above; only candidates pay the set intersection, computed
    * from the two docs' sorted hash arrays (bounded by doc length). */
  def ngramJaccardPairs(docs: DataFrame, idCol: String, textCol: String,
      shingleK: Int = 3, threshold: Double = 0.5): DataFrame = {
    // Eagerly materialize the per-doc shingle sets once: three consumers
    // (prefix pipeline, verify side a, verify side b) would otherwise each
    // re-run the scan + shingle-hash projection. Same move nearDupClusters
    // makes with its edges; the relation is (id, hash-array, n) —
    // megabytes per million docs. Together with the length filter and the
    // merge-walk verify kernel: 2.45s → 1.59s on the sf0.1 kernel.
    val perDoc = shingleSets(docs, idCol, textCol, shingleK).localCheckpoint()
    jaccardVerifiedPairs(perDoc, threshold)
  }

  /** The candidate + exact-verify phase of [[ngramJaccardPairs]] over an
    * ALREADY-MATERIALIZED `(doc_id, shingles, n_shingles)` relation —
    * factored out so callers that have the shingle sets in hand
    * ([[ophRecallReport]]'s truth leg reads them off its signature base)
    * skip the second corpus scan + shingle pass + checkpoint. `perDoc`
    * must be materialized (checkpointed/persisted): it feeds the
    * hot-shingle collect, the prefix explode and both verify sides. */
  private[graft] def jaccardVerifiedPairs(perDoc: DataFrame,
      threshold: Double): DataFrame = {
    val candidates = prefixCandidates(perDoc, threshold)
    val a = perDoc.select(col("doc_id").as("doc_a"), col("shingles").as("sh_a"),
      col("n_shingles").as("n_a"))
    val b = perDoc.select(col("doc_id").as("doc_b"), col("shingles").as("sh_b"),
      col("n_shingles").as("n_b"))
    candidates.join(a, Seq("doc_a")).join(b, Seq("doc_b"))
      // merge-walk count over the sorted hash arrays (custom codegen'd
      // expression) — no per-pair hash set or intersection array; the
      // verify stage is exactly this expression over every candidate
      .withColumn("n_inter",
        graft.functions.Exprs.sorted_intersect_count(col("sh_a"), col("sh_b")).cast("int"))
      .select(col("doc_a"), col("doc_b"),
        (col("n_inter").cast("double") / (col("n_a") + col("n_b") - col("n_inter"))).as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }

  /** Incremental near-dup ADMISSION: score a NEW batch against an EXISTING
    * corpus — the daily-ingest shape, where the question is never "which
    * pairs exist inside the lake" but "which arriving documents duplicate
    * something we already hold". Per new document: how many corpus
    * documents it near-duplicates (exact shingle Jaccard ≥ `threshold`)
    * and whether it is admitted (zero matches). Within-batch duplicates
    * are deliberately NOT considered — that is [[ngramJaccardPairs]] /
    * [[keepBestPerCluster]]'s job before admission.
    *
    * Scale shape: the candidate join is the PPJoin prefix filter applied
    * ACROSS the two relations — the prefix order comes from the CORPUS
    * side's hot-shingle table (one fixed global order applied to both
    * sides keeps the filter exact), which is how a real deployment runs:
    * the corpus index is built once and amortized over every arriving
    * batch, so per-batch cost scales with the BATCH, not the lake — the
    * corpus pays one count aggregate for its hot table and one prefix
    * explode, never an all-pairs pass. */
  def incrementalDedupReport(newDocs: DataFrame, corpus: DataFrame,
      idCol: String, textCol: String,
      shingleK: Int = 3, threshold: Double = 0.5): DataFrame = {
    val pdNew = shingleSets(newDocs, idCol, textCol, shingleK).localCheckpoint()
    val pdCor = shingleSets(corpus, idCol, textCol, shingleK).localCheckpoint()
    val prefixExpr = hotPrefixExpr(pdCor)
    val pa = prefixRows(pdNew, prefixExpr, threshold)
      .select(col("doc_id").as("new_id"), col("shingle"),
        col("n_shingles").as("n_a"), col("pos").as("pos_a"))
    val pb = prefixRows(pdCor, prefixExpr, threshold)
      .select(col("doc_id").as("cor_id"), col("shingle"),
        col("n_shingles").as("n_b"), col("pos").as("pos_b"))
    // same positional filter as [[prefixCandidates]] (r14) — exact by the
    // identical first-shared-shingle argument, since BOTH sides rank under
    // the one corpus-derived global order; it prunes the duplicated
    // candidate rows the per-batch distinct would otherwise chew through
    val alpha = ceil((col("n_a") + col("n_b"))
      * lit((threshold / (1.0 + threshold)) * (1.0 - 1e-12)) - lit(1e-9))
    val candidates = pa.join(pb, Seq("shingle"))
      .filter(col("n_a") * lit(threshold) <= col("n_b") &&
        col("n_b") * lit(threshold) <= col("n_a") &&
        lit(1) + least(col("n_a") - col("pos_a") - 1, col("n_b") - col("pos_b") - 1) >= alpha)
      .select(col("new_id"), col("cor_id"))
      .distinct()
    val a = pdNew.select(col("doc_id").as("new_id"), col("shingles").as("sh_a"),
      col("n_shingles").as("n_a"))
    val b = pdCor.select(col("doc_id").as("cor_id"), col("shingles").as("sh_b"),
      col("n_shingles").as("n_b"))
    val matches = candidates.join(a, Seq("new_id")).join(b, Seq("cor_id"))
      .withColumn("n_inter", sorted_intersect_count(col("sh_a"), col("sh_b")))
      .filter(col("n_inter").cast("double") /
        (col("n_a") + col("n_b") - col("n_inter")) >= threshold)
      .groupBy(col("new_id")).agg(count(lit(1)).as("n_matches"))
    newDocs.select(col(idCol).as("doc_id"))
      .join(matches.withColumnRenamed("new_id", "doc_id"), Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_matches"), lit(0L)).as("n_matches"),
        col("n_matches").isNull.as("admitted"))
  }

  // ------------------------------------------------- duplicate span statistics
  /** Exact duplicated-span statistics — the ExactSubstr diagnostic from the
    * dedup literature (Lee et al., "Deduplicating Training Data Makes
    * Language Models Better", ACL'22 — public knowledge): for every
    * document, how much of it is covered by ≥`spanTokens`-token runs that
    * appear verbatim in OTHER documents. Where near-dup ops find whole-doc
    * copies, this finds the quoted paragraph / syndicated passage INSIDE
    * otherwise-distinct documents — the duplication mode whole-doc dedup
    * can't see.
    *
    * Method, fully relational (SQL-expressible ⟹ x56's oracle): every
    * position i emits the hash of its L-token window (stride 1, positions
    * kept — unlike [[shingleSets]]' distinct sets); a window duplicated ⟺
    * present in ≥2 distinct docs; per doc, duplicated positions merge into
    * maximal covered intervals via the gap rule (next_pos − pos > L starts
    * a new run; a run from p₁..p₂ covers p₂ − p₁ + L tokens — interval
    * union without interval types). All counts integer; `dup_frac` is one
    * exact-integer division.
    *
    * Scale shape: the wide shuffle is (hash, doc) pairs — 8-byte keys,
    * stride-1 volume ≈ corpus token count, the honest cost every ExactSubstr
    * implementation pays (suffix arrays pay it in sort form). The per-doc
    * run merge shuffles only the DUPLICATED positions. The document-
    * frequency aggregate collapses map-side (docs repeat a window rarely;
    * count_distinct partials stay tiny). */
  def duplicateSpanStats(docs: DataFrame, idCol: String, textCol: String,
      spanTokens: Int = 5): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val L = spanTokens
    val base = docs.select(col(idCol).as("doc_id"), tokens(col(textCol)).as("w"))
      .withColumn("n_tokens", size(col("w")).cast("long"))
    val wOrd = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
    val runs = dupSpanStarts(base, L)
      .withColumn("__newrun",
        when(col("pos") - lag(col("pos"), 1).over(wOrd) > L, 1L).otherwise(0L))
      .withColumn("__run", sum(col("__newrun")).over(
        wOrd.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("doc_id"), col("__run"))
      .agg((max(col("pos")) - min(col("pos")) + L).as("__covered"),
        count(lit(1)).as("__npos"))
      .groupBy(col("doc_id"))
      .agg(sum(col("__covered")).as("dup_tokens"),
        sum(col("__npos")).as("n_dup_positions"))
    base.select(col("doc_id"), col("n_tokens"))
      .join(runs, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_tokens"),
        coalesce(col("n_dup_positions"), lit(0L)).as("n_dup_positions"),
        coalesce(col("dup_tokens"), lit(0L)).as("dup_tokens"),
        (coalesce(col("dup_tokens"), lit(0L)).cast("double") /
          col("n_tokens").cast("double")).as("dup_frac"))
  }

  /** Duplicated window START positions — the shared detection stage of
    * [[duplicateSpanStats]] and [[exactSubstrStrip]]: stride-1 `L`-token
    * window hashes, document-frequency ≥ 2 semi-join. */
  private def dupSpanStarts(base: DataFrame, L: Int): DataFrame = {
    // guarded: Spark's sequence() auto-reverses when stop < start, so the
    // short-doc case must short-circuit to an empty array explicitly
    val spans = base.select(col("doc_id"), explode(expr(
      s"""CASE WHEN size(w) >= $L
         |  THEN transform(sequence(0, size(w) - $L),
         |         i -> struct(CAST(i AS LONG) AS pos,
         |                     xxhash64(array_join(slice(w, i + 1, $L), ' ')) AS h))
         |  ELSE array() END""".stripMargin)).as("s"))
      .select(col("doc_id"), col("s.pos").as("pos"), col("s.h").as("h"))
    val dupHashes = spans.groupBy("h")
      .agg(count_distinct(col("doc_id")).as("ndocs"))
      .filter(col("ndocs") >= 2)
      .select("h")
    spans.join(dupHashes, Seq("h"), "left_semi")
  }

  /** ExactSubstr dedup as a TRANSFORM (Lee et al., ACL'22 — the removal
    * step, where [[duplicateSpanStats]] only reports): every token position
    * covered by an `L`-token window that recurs in ≥2 distinct docs is
    * stripped; the surviving tokens rebuild the document in order.
    *
    * Scale shape: detection is the shared [[dupSpanStarts]] stage (stride-1
    * hash volume ≈ corpus tokens — the honest ExactSubstr cost). The
    * REBUILD never explodes tokens: duplicated starts collapse to merged
    * `(start, end)` intervals per doc (shuffle = duplicated positions only,
    * then one row per affected doc), and the strip itself is a single
    * index-aware `filter` higher-order expression over the token array —
    * docs with no duplicated spans join to NULL and pass through untouched,
    * so the common case costs one hash-join probe and zero rewriting. */
  def exactSubstrStrip(docs: DataFrame, idCol: String, textCol: String,
      spanTokens: Int = 5): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val L = spanTokens
    val base = docs.select(col(idCol).as("doc_id"), tokens(col(textCol)).as("w"))
    val wOrd = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
    val intervals = dupSpanStarts(base, L)
      .withColumn("__newrun",
        when(col("pos") - lag(col("pos"), 1).over(wOrd) > L, 1L).otherwise(0L))
      .withColumn("__run", sum(col("__newrun")).over(
        wOrd.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("doc_id"), col("__run"))
      .agg(min(col("pos")).as("s"), (max(col("pos")) + L - 1).as("e"))
      .groupBy(col("doc_id"))
      .agg(sort_array(collect_list(struct(col("s"), col("e")))).as("iv"))
    base.join(intervals, Seq("doc_id"), "left")
      .select(col("doc_id"), size(col("w")).cast("long").as("n_tokens"),
        expr(s"""CASE WHEN iv IS NULL THEN w
                |  ELSE filter(w, (t, i) ->
                |    NOT exists(iv, r -> i >= r.s AND i <= r.e))
                |END""".stripMargin).as("kept"))
      .select(col("doc_id"), col("n_tokens"),
        size(col("kept")).cast("long").as("n_kept"),
        array_join(col("kept"), " ").as("clean_text"))
  }

  // ----------------------------------------------------- near-dup clustering
  /** Connected components over a near-dup pair graph: every document that
    * appears in a pair gets a `cluster_id` = the minimum doc id reachable
    * through the pairs (the canonical representative a dedup pipeline keeps;
    * pair-finding alone under-deletes — A~B and B~C must collapse to ONE
    * survivor even when A~C was never emitted as a pair).
    *
    * Algorithm: iterative min-label propagation to a fixpoint — each round,
    * every node takes the min of its own label and its neighbors' labels
    * (one shuffle per round: edges ⋈ labels, then a min-agg). Rounds are
    * driver-sequenced with a convergence count, exactly like Pregel-style
    * iteration; each round's labels are persisted and the previous round
    * freed. Converges in O(graph diameter) rounds — near-dup graphs are
    * piles of small dense cliques, so diameter is small by construction
    * (the alternating large-star/small-star formulation [Kiveris et al.,
    * "Connected Components in MapReduce and Beyond", SoCC'14 — public
    * knowledge] drops in here if a corpus ever produces long chains).
    * Throws if `maxIters` rounds don't converge rather than returning
    * silently-partial clusters.
    *
    * Hybrid execution: the EDGE set of a near-dup graph is the near-dup
    * population itself — orders of magnitude smaller than the corpus that
    * produced it (it is already the output of a capped LSH / SNM candidate
    * stage). When the edges fit under `driverEdgeCap` (default 2²⁰ edges
    * ≈ 16 MB of packed longs, scaled DOWN on small drivers by
    * [[graft.ops.Graph.memoryScaledCap]]'s ~2 KiB-per-edge transient
    * budget) and ids are LONG, the components are computed by a
    * driver-local union–find in ONE collect job instead of O(diameter)
    * join+agg rounds each paying the fixed per-job cost — identical output
    * (min member id per component) by construction. Over the cap, or for
    * non-long ids, the distributed loop runs unchanged; the cap probe is a
    * CollectLimit (cap+1 rows max cross the wire, never the full relation),
    * so the probe itself is scale-safe. */
  def nearDupClusters(pairs: DataFrame, aCol: String = "doc_a",
      bCol: String = "doc_b", maxIters: Int = 25,
      driverEdgeCap: Int = graft.ops.Graph.memoryScaledCap(1 << 20)): DataFrame = {
    val fwd = pairs.select(col(aCol).as("src"), col(bCol).as("dst"))
    val longIds = fwd.schema("src").dataType ==
      org.apache.spark.sql.types.LongType &&
      fwd.schema("dst").dataType == org.apache.spark.sql.types.LongType
    if (longIds) {
      val probe = fwd.limit(driverEdgeCap + 1).collect()
      if (probe.length <= driverEdgeCap) {
        val parent = new java.util.HashMap[Long, Long]()
        def find(x: Long): Long = {
          var r = x
          while (parent.getOrDefault(r, r) != r) r = parent.get(r)
          // path compression
          var c = x
          while (parent.getOrDefault(c, c) != c) {
            val n = parent.get(c); parent.put(c, r); c = n
          }
          r
        }
        probe.foreach { row =>
          val a = row.getLong(0); val b = row.getLong(1)
          val ra = find(a); val rb = find(b)
          // union by MIN id — the root is always the smallest member seen,
          // so the final root IS the component's min label
          if (ra != rb) {
            if (ra < rb) parent.put(rb, ra) else parent.put(ra, rb)
          } else { parent.putIfAbsent(a, ra); parent.putIfAbsent(b, rb) }
        }
        val nodes = scala.collection.mutable.LinkedHashSet.empty[Long]
        probe.foreach { row => nodes += row.getLong(0); nodes += row.getLong(1) }
        val out: java.util.List[org.apache.spark.sql.Row] =
          new java.util.ArrayList[org.apache.spark.sql.Row](nodes.size)
        nodes.foreach(id => out.add(org.apache.spark.sql.Row(id, find(id))))
        val spark = pairs.sparkSession
        // LocalRelation (not parallelize): downstream joins against the
        // label table plan as broadcasts with zero extra jobs
        return spark.createDataFrame(out,
          org.apache.spark.sql.types.StructType(Seq(
            org.apache.spark.sql.types.StructField("doc_id",
              org.apache.spark.sql.types.LongType, nullable = false),
            org.apache.spark.sql.types.StructField("cluster_id",
              org.apache.spark.sql.types.LongType, nullable = false))))
      }
    }
    // Eager localCheckpoint per round, NOT persist: each round's plan nests
    // the previous round's inside a join+union+agg, so without lineage
    // TRUNCATION Catalyst re-analyzes a plan that grows superlinearly and
    // the loop dies in the optimizer long before the data is a problem
    // (persist caches data but keeps the logical plan). Checkpointed blocks
    // are dropped as each round's frame is replaced.
    val edges = fwd.union(fwd.select(col("dst").as("src"), col("src").as("dst")))
      .localCheckpoint()
    var labels = edges.select(col("src").as("id")).distinct()
      .select(col("id"), col("id").as("comp")).localCheckpoint()
    // Convergence probe: labels only ever DECREASE under min-propagation and
    // the id set is fixed, so the label sum strictly decreases until the
    // fixpoint — sum(next) == sum(prev) ⟺ no label changed. One map-side
    // aggregate per round instead of the next⋈prev join+shuffle a
    // changed-row count would cost. sum(DECIMAL) over longs can't overflow
    // short of 10^20 label mass.
    def labelSum(df: DataFrame): java.math.BigDecimal = {
      // sum over zero rows is NULL — an empty pair graph is already converged
      val s = df.agg(sum(col("comp").cast("decimal(38,0)"))).head.getDecimal(0)
      if (s == null) java.math.BigDecimal.ZERO else s
    }
    var prevSum = labelSum(labels)
    var converged = false
    var iter = 0
    while (!converged && iter < maxIters) {
      val next = edges.join(labels, edges("src") === labels("id"))
        .select(col("dst").as("id"), col("comp"))
        .union(labels.select(col("id"), col("comp")))
        .groupBy(col("id")).agg(min(col("comp")).as("comp"))
        .localCheckpoint()
      val nextSum = labelSum(next)
      labels = next
      converged = nextSum.compareTo(prevSum) == 0
      prevSum = nextSum
      iter += 1
    }
    require(converged, s"nearDupClusters did not converge in $maxIters rounds")
    labels.select(col("id").as("doc_id"), col("comp").as("cluster_id"))
  }

  // -------------------------------------------------------- survivor selection
  /** Policy-driven survivor selection over a near-dup pair graph: within
    * each connected component, keep the row with the HIGHEST `scoreCol`
    * (ties → lowest id); rows in no pair survive untouched. The curation
    * semantics keep-lowest-id can't express — of three copies of an
    * article, keep the longest / highest-quality one, not the one that
    * happened to be crawled first.
    *
    * Scale shape: [[nearDupClusters]] labels only the PAIRED docs (a tiny
    * set next to the corpus); the labels join back as a broadcast-sized
    * relation, the per-cluster argmax is a window over paired rows only,
    * and unpaired rows pass through a left-anti-free path (label NULL ⟹
    * keep). The corpus never shuffles on the cluster key. */
  def keepBestPerCluster(docs: DataFrame, pairs: DataFrame, idCol: String,
      scoreCol: Column): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val labels = nearDupClusters(pairs)
      .withColumnRenamed("doc_id", idCol)
    // two disjoint paths, NOT a left join + guarded window: unpaired rows
    // (the overwhelming majority) would otherwise all share one NULL
    // cluster_id window partition — a single-task skew bomb
    val w = Window.partitionBy(col("cluster_id"))
      .orderBy(scoreCol.desc_nulls_last, col(idCol))
    val survivors = docs.join(labels, Seq(idCol))
      .withColumn("__rk", row_number().over(w))
      .filter(col("__rk") === 1)
      .drop("__rk", "cluster_id")
    val unpaired = docs.join(labels.select(col(idCol)), Seq(idCol), "left_anti")
    unpaired.unionByName(survivors)
  }

  // ------------------------------------------------------- embedding near-dup
  /** Probability that an UNRELATED (≈orthogonal) vector pair shares at least
    * one band bucket under random-hyperplane LSH: 1 − (1 − 2^−bits)^bands.
    * Depends only on the band geometry, not the data — it is the expected
    * fraction of ALL pairs that band-blocking enumerates as candidates. When
    * it approaches 1 the parameters cannot discriminate: LSH degrades to
    * all-pairs enumeration with banding overhead (explode, capped-bucket
    * aggregation, pair distinct) stacked on top. */
  def lshRandomPairCollisionProb(bands: Int, bitsPerBand: Int): Double =
    1.0 - math.pow(1.0 - math.pow(0.5, bitsPerBand.toDouble), bands.toDouble)

  /** Exact all-pairs cosine: every i<j pair with cos_sim ≥ threshold.
    * Quadratic by definition — the right plan only when the vector set is
    * bounded (one IVF cell, one LSH bucket, one partition's day) or when the
    * requested threshold sits below the band geometry's discrimination
    * regime, where candidate generation would enumerate ~all pairs anyway
    * (see [[lshRandomPairCollisionProb]]). Plan shape: one broadcast of the
    * (bounded) vector set, a nested-loop pair stream filtered map-side by
    * the codegen'd cosine kernel — the corpus side never shuffles and no
    * candidate list ever materializes. */
  def cosineAllPairs(emb: DataFrame, idCol: String, vecCol: String,
      threshold: Double): DataFrame = {
    val a = emb.select(col(idCol).as("id_a"), col(vecCol).as("vec_a"))
    val b = emb.select(col(idCol).as("id_b"), col(vecCol).as("vec_b"))
    a.join(broadcast(b), col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        cosine_sim(col("vec_a"), col("vec_b")).as("cos_sim"))
      .filter(col("cos_sim") >= threshold)
  }

  /** Cost-based embedding near-dup: thresholded pairs via hyperplane LSH
    * when the band geometry discriminates, exact all-pairs when it cannot.
    *
    * The selection rule is the planner move a human would make: compute the
    * geometry's random-pair candidate fraction; if band-blocking would admit
    * more than `maxCandidateFraction` of all pairs as candidates, the LSH
    * machinery is pure overhead — skip straight to the exact kernel. (A
    * θ=0.45 request with 64×4-bit bands — LSH's hardest regime, per-band
    * collision 0.18 even for qualifying pairs — admits 98% of random pairs;
    * a θ=0.9 corpus with 8×16-bit bands admits 0.01%.) Output is identical
    * either way: the LSH path's verify step computes the same exact cosine
    * on candidates, and its miss probability is driven below 1e-5 by the
    * same geometry check. */
  def embeddingNearDup(emb: DataFrame, idCol: String, vecCol: String,
      threshold: Double, bands: Int = 4, bitsPerBand: Int = 8,
      maxBucketSize: Int = 2000,
      maxCandidateFraction: Double = 0.25): DataFrame =
    if (lshRandomPairCollisionProb(bands, bitsPerBand) > maxCandidateFraction)
      cosineAllPairs(emb, idCol, vecCol, threshold)
    else
      embeddingNearDupPairs(emb, idCol, vecCol, bands, bitsPerBand, maxBucketSize)
        .filter(col("cos_sim") >= threshold)

  /** Embedding-cosine near-duplicate candidates via random-hyperplane LSH:
    * vectors sharing a sign-bucket under `bands` independent 8-bit hyperplane
    * sets are candidates; exact cosine verifies. Returns all candidate pairs
    * with their cosine, highest first — thresholding is the caller's policy.
    * Prefer [[embeddingNearDup]], which drops to the exact kernel when these
    * parameters cannot discriminate at the requested threshold. */
  def embeddingNearDupPairs(
      emb: DataFrame,
      idCol: String,
      vecCol: String,
      bands: Int = 4,
      bitsPerBand: Int = 8,
      maxBucketSize: Int = 2000): DataFrame = {
    val base = emb.select(col(idCol).as("vec_id"), col(vecCol).as("vec"))
    val banded = base.select(
      col("vec_id").as("doc_id"),
      explode(array((0 until bands).map(b =>
        struct(lit(b).as("band"), hyperplane_bucket(col("vec"), bitsPerBand, 42L + b).as("bucket"))): _*)).as("bb"))
      .select(col("doc_id"), col("bb.band").as("band"), col("bb.bucket").as("bucket"))
    val candidates = bucketCandidatePairs(banded, "band", "bucket", maxBucketSize)
      .select(col("doc_a").as("id_a"), col("doc_b").as("id_b"))
    candidates
      .join(base.select(col("vec_id").as("id_a"), col("vec").as("vec_a")), Seq("id_a"))
      .join(base.select(col("vec_id").as("id_b"), col("vec").as("vec_b")), Seq("id_b"))
      .select(col("id_a"), col("id_b"), cosine_sim(col("vec_a"), col("vec_b")).as("cos_sim"))
  }

  /** Fixed-iteration integer random-walk mass propagation over an undirected
    * pair graph — the PageRank shape, used on a near-dup graph to rank each
    * document by how CENTRAL it is to its duplication neighborhood (template
    * hubs score high; incidental one-off near-dups stay near the teleport
    * floor). `iters` is fixed, not run-to-convergence: authority ranking
    * stabilizes in a few rounds and a fixed trip count keeps the result a
    * pure function of the graph.
    *
    * All arithmetic is 64-bit integer — floor division for the per-neighbor
    * share (`mass div deg`) and the damped inflow (`inflow·dampNum div
    * dampDen`) — so the result is bit-deterministic under any partitioning
    * and re-spellable exactly in another engine (addition order never
    * matters; there is no floating point anywhere). With per-node mass ≤
    * `initMass`, total system mass is ≤ n·initMass; the damped product
    * inflow·dampNum stays below 2⁶³ for corpora up to ~10¹⁰ docs at the
    * defaults.
    *
    * Scale shape: one shuffle join (edges ⋈ mass on src, both hash-
    * partitionable) plus one aggregate (sum by dst) per iteration, over the
    * EDGE relation — node- and edge-sized, never corpus-sized. The edge list
    * is materialized once and reused every round; with K fixed and small the
    * nested plan stays shallow, so no per-round checkpoint is needed. */
  def walkAuthority(pairs: DataFrame, aCol: String = "doc_a",
      bCol: String = "doc_b", iters: Int = 3, initMass: Long = 1000000L,
      dampNum: Long = 85L, dampDen: Long = 100L): DataFrame = {
    require(iters >= 1 && dampNum >= 0 && dampNum <= dampDen)
    val fwd = pairs.select(col(aCol).cast("long").as("src"), col(bCol).cast("long").as("dst"))
    val edges = fwd.union(fwd.select(col("dst").as("src"), col("src").as("dst")))
      .localCheckpoint()
    // teleport floor: the (1−d) share of one node's initial mass, floored
    val base = initMass * (dampDen - dampNum) / dampDen
    val deg = edges.groupBy(col("src")).agg(count(lit(1)).as("deg"))
    var mass = deg.select(col("src").as("id"), col("deg"), lit(initMass).as("mass"))
    for (_ <- 1 to iters) {
      // every node of a symmetrized graph has deg ≥ 1 and ≥ 1 in-edge, so
      // the inner joins below lose no nodes and inflow is never NULL
      val inflow = mass
        .select(col("id"), expr("mass div deg").as("share"))
        .join(edges, col("id") === col("src"))
        .groupBy(col("dst")).agg(sum(col("share")).as("inflow"))
      mass = mass.select(col("id"), col("deg"))
        .join(inflow, col("id") === col("dst"))
        .select(col("id"), col("deg"),
          (lit(base) + expr(s"(inflow * ${dampNum}L) div ${dampDen}L")).as("mass"))
    }
    mass.select(col("id").as("doc_id"), col("deg"), col("mass").as("authority"))
  }

  /** Asymmetric containment near-dup pairs: every ordered pair (a, b) with
    * |shingles(a) ∩ shingles(b)| / |shingles(a)| ≥ `threshold` — the QUOTE
    * detector. A short document lifted verbatim into a long one has
    * containment ≈ 1 while its Jaccard is tiny (the union is dominated by
    * the container), so symmetric near-dup mining ([[ngramJaccardPairs]])
    * structurally cannot see it; both metrics are returned so callers can
    * select the quote regime (high containment, low Jaccard) directly.
    *
    * Prefix filter, containment variant: C(a→b) ≥ t forces overlap ≥
    * ⌈t·n_a⌉, which depends only on the CONTAINED side — so a's first
    * n_a − ⌈t·n_a⌉ + 1 shingles in any fixed global order must hit b, and
    * only the contained side can be pruned: candidates = prefix(a) ⋈
    * full(b). Exact for any order; the hot-shingle rank ([[hotPrefixExpr]])
    * again keeps boilerplate shingles out of prefixes, which is what
    * defuses the full side's skew — a hot shingle on b's side meets almost
    * no prefixes. The full-side explode is the honest extra cost over the
    * symmetric miner; the length filter n_b ≥ t·n_a (containment needs that
    * much overlap to exist in b at all) prunes the worst of it. */
  def containmentPairs(docs: DataFrame, idCol: String, textCol: String,
      shingleK: Int = 3, threshold: Double = 0.9): DataFrame = {
    val perDoc = shingleSets(docs, idCol, textCol, shingleK).localCheckpoint()
    val prefixes = prefixRows(perDoc, hotPrefixExpr(perDoc), threshold)
    val full = perDoc.select(col("doc_id").as("doc_b"),
      col("n_shingles").as("n_b"), explode(col("shingles")).as("shingle"))
    val candidates = prefixes
      .select(col("doc_id").as("doc_a"), col("n_shingles").as("n_a"), col("shingle"))
      .join(full, Seq("shingle"))
      .filter(col("doc_a") =!= col("doc_b") &&
        col("n_b") >= lit(threshold) * col("n_a"))
      .select(col("doc_a"), col("doc_b")).distinct()
    val a = perDoc.select(col("doc_id").as("doc_a"), col("shingles").as("sh_a"),
      col("n_shingles").as("n_a"))
    val b = perDoc.select(col("doc_id").as("doc_b"), col("shingles").as("sh_b"),
      col("n_shingles").as("n_b"))
    candidates.join(a, Seq("doc_a")).join(b, Seq("doc_b"))
      .withColumn("n_inter",
        graft.functions.Exprs.sorted_intersect_count(col("sh_a"), col("sh_b")).cast("int"))
      .select(col("doc_a"), col("doc_b"), col("n_inter"),
        col("n_a").as("n_shingles_a"), col("n_b").as("n_shingles_b"),
        (col("n_inter").cast("double") / col("n_a")).as("containment"),
        (col("n_inter").cast("double") / (col("n_a") + col("n_b") - col("n_inter")))
          .as("jaccard"))
      .filter(col("containment") >= threshold)
  }

  /** Weighted (multiset) Jaccard over token frequencies for an EXISTING pair
    * list: Σ_t min(tf_a, tf_b) / Σ_t max(tf_a, tf_b). Set Jaccard counts a
    * token once no matter how often it repeats, so a document that is one
    * paragraph pasted fifty times scores identically to the single
    * paragraph; the weighted metric sees the repetition. Run over the
    * near-dup candidate graph, it separates true near-dups from
    * repetition-inflated ones.
    *
    * The identity Σmax = tot_a + tot_b − Σmin (max = a + b − min per shared
    * token; unshared tokens contribute their own tf to Σmax only) means only
    * the SHARED-token min-sum is computed pairwise: tf relation joined to
    * the pair list on (pair, token), one aggregate. All-integer sufficient
    * statistics; the final division is the only double.
    *
    * Scale shape: the tf relation collapses the corpus map-side to
    * (doc, token, tf); the pair join shuffles tf rows only for documents
    * that APPEAR in the pair list — pair-graph-sized, not corpus-sized. */
  def weightedJaccardPairs(docs: DataFrame, idCol: String, textCol: String,
      pairs: DataFrame): DataFrame = {
    val tf = docs.select(col(idCol).as("doc_id"),
        explode(tokens(col(textCol))).as("token"))
      .groupBy(col("doc_id"), col("token")).agg(count(lit(1)).as("tf"))
      .localCheckpoint()
    val tot = tf.groupBy(col("doc_id")).agg(sum(col("tf")).as("tot"))
    val p = pairs.select(col("doc_a"), col("doc_b"))
    val minSum = p
      .join(tf.select(col("doc_id").as("doc_a"), col("token"), col("tf").as("tf_a")),
        Seq("doc_a"))
      .join(tf.select(col("doc_id").as("doc_b"), col("token"), col("tf").as("tf_b")),
        Seq("doc_b", "token"))
      .groupBy(col("doc_a"), col("doc_b"))
      .agg(sum(least(col("tf_a"), col("tf_b"))).as("min_sum"))
    p.join(minSum, Seq("doc_a", "doc_b"), "left")
      // a pair sharing no token has min_sum NULL → 0 (weighted Jaccard 0)
      .withColumn("min_sum", coalesce(col("min_sum"), lit(0L)))
      .join(tot.select(col("doc_id").as("doc_a"), col("tot").as("tot_a")), Seq("doc_a"))
      .join(tot.select(col("doc_id").as("doc_b"), col("tot").as("tot_b")), Seq("doc_b"))
      .select(col("doc_a"), col("doc_b"), col("min_sum"),
        (col("tot_a") + col("tot_b") - col("min_sum")).as("max_sum"),
        (col("min_sum").cast("double") /
          (col("tot_a") + col("tot_b") - col("min_sum"))).as("weighted_jaccard"))
  }

  /** Sorted-neighborhood entity blocking (Hernández & Stolfo, SIGMOD'95):
    * normalize the name, sort within a prefix block, and compare each
    * record only against its next `window` neighbors in sort order —
    * candidate pairs with Levenshtein ≤ `maxDist` survive.
    *
    * The scale story is what SNM was invented for: all-pairs matching is
    * O(n²); here the only wide operation is ONE sort partitioned by the
    * block prefix (a shuffle Spark executes as hash-partition + in-
    * partition sort), and the neighbor probe is `window` lead() calls in a
    * single window pass — O(n·window) comparisons total, hotspot-free
    * because blocks split the keyspace. Pairs spanning a block boundary
    * are out of scope by construction (the standard multi-pass answer is a
    * second run with a different block key). Levenshtein on the short
    * normalized key is exact integer — cross-engine reproducible. */
  def sortedNeighborhoodPairs(df: DataFrame, idCol: String, nameCol: String,
      blockLen: Int = 4, window: Int = 3, maxDist: Int = 4, topK: Int = 100): DataFrame = {
    val base = df
      .select(col(idCol).as("id"), lower(trim(col(nameCol))).as("key"))
      .filter(col("key").isNotNull && length(col("key")) > 0)
      .withColumn("blk", substring(col("key"), 1, blockLen))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("blk")).orderBy(col("key"), col("id"))
    val neighbors = array((1 to window).map(i =>
      struct(lead(col("id"), i).over(w).as("id_b"),
        lead(col("key"), i).over(w).as("name_b"))): _*)
    base
      .withColumn("nb", neighbors)
      .select(col("id").as("id_a"), col("key").as("name_a"), explode(col("nb")).as("p"))
      .filter(col("p.id_b").isNotNull)
      .select(col("id_a"), col("p.id_b").as("id_b"),
        col("name_a"), col("p.name_b").as("name_b"),
        // thresholded levenshtein: banded DP with early exit (returns −1
        // beyond maxDist) — O(maxDist·len) per pair instead of O(len²)
        levenshtein(col("name_a"), col("p.name_b"), maxDist).cast("long").as("lev"))
      .filter(col("lev") >= 0L)
      .orderBy(col("lev"), col("id_a"), col("id_b"))
      .limit(topK)
  }

  /** DuckDB respell of [[sortedNeighborhoodPairs]]. */
  def sortedNeighborhoodSql(table: String, idCol: String, nameCol: String,
      blockLen: Int = 4, window: Int = 3, maxDist: Int = 4, topK: Int = 100): String = {
    val legs = (1 to window).map(i =>
      s"""SELECT id AS id_a, key AS name_a,
         |  lead(id, $i) OVER win$i AS id_b, lead(key, $i) OVER win$i AS name_b
         |FROM b WINDOW win$i AS (PARTITION BY blk ORDER BY key, id)""".stripMargin)
      .mkString("\nUNION ALL\n")
    s"""WITH b AS (
       |  SELECT $idCol AS id, lower(trim($nameCol)) AS key,
       |    substr(lower(trim($nameCol)), 1, $blockLen) AS blk
       |  FROM $table
       |  WHERE $nameCol IS NOT NULL AND length(lower(trim($nameCol))) > 0),
       |u AS (
       |$legs)
       |SELECT id_a, id_b, name_a, name_b,
       |  CAST(levenshtein(name_a, name_b) AS BIGINT) AS lev
       |FROM u WHERE id_b IS NOT NULL AND levenshtein(name_a, name_b) <= $maxDist
       |ORDER BY lev, id_a, id_b LIMIT $topK""".stripMargin
  }

  /** Fellegi–Sunter probabilistic record linkage (1969 — the model behind
    * Splink and every census-style matcher): score each
    * [[sortedNeighborhoodPairs]]-shape candidate pair by the sum of
    * per-field log Bayes factors. Agreement on field f is worth
    * ln(m/u_f), disagreement ln((1−m)/(1−u_f)): m is the baked
    * match-probability prior (ppm), u_f the DATA-ESTIMATED chance two
    * random records agree on f — Σ c_v(c_v−1)/(N(N−1)) over the field's
    * value counts. A rare shared brand therefore outscores a common one.
    *
    * Determinism: u_f stays a (num, den) integer pair all the way into the
    * plan; every ln takes an integer-valued argument (x94's discipline) and
    * — the x74/x63 grid contract — each ln is INDIVIDUALLY quantized to the
    * e6 integer grid (`⌊ln(arg)·10⁶⌋` as int64) before any addition, so the
    * score is a pure int64 sum of per-component grid points, never the floor
    * of a multi-term double sum whose last ulp can differ across engines.
    * Zero/degenerate frequencies clamp to 1 so no ln(0) leaks ±Infinity.
    * N(N−1) and c(c−1) are int64-safe to ~3·10⁹ rows per table (beyond,
    * the stats legs move to DECIMAL).
    *
    * Scale shape: candidates come from the SNM window (O(n·w), block-
    * parallel, no all-pairs); each field's u-statistic is one
    * partial-aggregable groupBy bounded by the field's value cardinality,
    * folded to a 1-row relation that rides back as a broadcast cross join —
    * the scoring itself is map-side on the candidate stream. */
  def linkageScores(df: DataFrame, idCol: String, nameCol: String,
      fields: Seq[String], mPpm: Long = 950000L, blockLen: Int = 4,
      window: Int = 3, maxDist: Int = 4, topK: Int = 50): DataFrame =
    linkageScored(df, idCol, nameCol, fields, mPpm, blockLen, window, maxDist)
      .orderBy(col("score_e6").desc, col("id_a"), col("id_b"))
      .limit(topK)

  /** The scored SNM candidate relation behind [[linkageScores]] (top-k) and
    * [[entityResolution]] (threshold): (id_a, id_b, n_agree, score_e6). */
  private[graft] def linkageScored(df: DataFrame, idCol: String, nameCol: String,
      fields: Seq[String], mPpm: Long = 950000L, blockLen: Int = 4,
      window: Int = 3, maxDist: Int = 4): DataFrame = {
    require(fields.nonEmpty && mPpm > 0 && mPpm < 1000000L)
    val base = df
      .select((col(idCol).as("id") +: lower(trim(col(nameCol))).as("key") +:
        fields.map(f => col(f).cast("string").as(f))): _*)
      .filter(col("key").isNotNull && length(col("key")) > 0)
      .withColumn("blk", substring(col("key"), 1, blockLen))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("blk")).orderBy(col("key"), col("id"))
    val neighbors = array((1 to window).map(i =>
      struct((lead(col("id"), i).over(w).as("id_b") +:
        lead(col("key"), i).over(w).as("key_b") +:
        fields.map(f => lead(col(f), i).over(w).as(s"${f}_b"))): _*)): _*)
    val cands = base
      .withColumn("nb", neighbors)
      .select((col("id").as("id_a") +: col("key").as("key_a") +:
        fields.map(f => col(f).as(s"${f}_a")) :+ explode(col("nb")).as("p")): _*)
      .filter(col("p.id_b").isNotNull &&
        // thresholded: banded DP, early exit at maxDist (−1 = beyond)
        levenshtein(col("key_a"), col("p.key_b"), maxDist) >= 0)
    // one (num, den) u-statistic row per field, each bounded by the field's
    // value cardinality; GREATEST(1, ·) clamps degenerate frequencies
    val uStats = fields.map { f =>
      df.groupBy(col(f).cast("string").as("v")).agg(count(lit(1)).as("c"))
        .agg(greatest(lit(1L), sum(col("c") * (col("c") - 1L))).as(s"__un_$f"),
          greatest(lit(1L), sum(col("c")) * (sum(col("c")) - 1L)).as(s"__ud_$f"))
    }
    val scored = uStats.foldLeft(cands)((acc, u) => acc.crossJoin(broadcast(u)))
    // ⌊ln(x)·10⁶⌋ as int64 — every log-Bayes component lands on the e6 grid
    // BEFORE summation; the only float op per component is one ln of an
    // integer-valued argument.
    def lnE6(c: org.apache.spark.sql.Column) =
      floor(log(c.cast("double")) * lit(1e6)).cast("long")
    val lnM = math.floor(math.log(mPpm.toDouble) * 1e6).toLong
    val ln1m = math.floor(math.log((1000000L - mPpm).toDouble) * 1e6).toLong
    val lnMil = math.floor(math.log(1000000.0) * 1e6).toLong
    val fieldTerms = fields.map { f =>
      val agree = col(s"${f}_a") <=> col(s"p.${f}_b")
      when(agree,
        lit(lnM - lnMil) - (lnE6(col(s"__un_$f")) - lnE6(col(s"__ud_$f"))))
        .otherwise(
          lit(ln1m - lnMil) -
            (lnE6(greatest(lit(1L), col(s"__ud_$f") - col(s"__un_$f"))) -
              lnE6(col(s"__ud_$f"))))
    }
    val nAgree = fields.map(f =>
      when(col(s"${f}_a") <=> col(s"p.${f}_b"), 1L).otherwise(0L)).reduce(_ + _)
    scored
      .select(col("id_a"), col("p.id_b").as("id_b"),
        nAgree.as("n_agree"),
        fieldTerms.reduce(_ + _).as("score_e6"))
  }

  /** End-to-end entity resolution: the [[linkageScored]] Fellegi–Sunter
    * pairs at or above `minScoreE6` become edges, [[nearDupClusters]]'
    * min-label propagation groups them into entities, and survivorship
    * picks each entity's representative record by (longest normalized
    * name, then lowest id) — the deterministic two-step argmax both
    * engines can spell exactly (max length per entity, then min id among
    * records at that length). Output: one row per MULTI-record entity —
    * (entity_id = min member id, n_records, rep_id, rep_name_len).
    *
    * Scale shape: candidates are SNM-bounded (O(n·w)), the u-statistics
    * broadcast, CC runs O(diameter) label rounds over only the MATCHED
    * ids (a tiny set next to the input), and survivorship is two
    * entity-keyed aggregates over that same matched set. The input
    * relation never shuffles beyond the SNM window sort. */
  def entityResolution(df: DataFrame, idCol: String, nameCol: String,
      fields: Seq[String], minScoreE6: Long, mPpm: Long = 950000L,
      blockLen: Int = 4, window: Int = 3, maxDist: Int = 4): DataFrame = {
    val pairs = linkageScored(df, idCol, nameCol, fields, mPpm, blockLen,
      window, maxDist)
      .filter(col("score_e6") >= minScoreE6)
      .select(col("id_a"), col("id_b"))
    val labels = nearDupClusters(pairs, "id_a", "id_b")
      .select(col("doc_id").as("id"), col("cluster_id").as("entity_id"))
    val named = df.select(col(idCol).cast("long").as("id"),
      length(lower(trim(col(nameCol)))).as("name_len"))
    val members = labels.join(named, Seq("id"))
    val lens = members.groupBy(col("entity_id"))
      .agg(count(lit(1)).as("n_records"), max(col("name_len")).as("rep_name_len"))
    members.join(lens, Seq("entity_id"))
      .filter(col("name_len") === col("rep_name_len"))
      .groupBy(col("entity_id"), col("n_records"), col("rep_name_len"))
      .agg(min(col("id")).as("rep_id"))
      .select(col("entity_id"), col("n_records"), col("rep_id"), col("rep_name_len"))
      .orderBy(col("entity_id"))
  }

  /** Shared CTE body + expressions for the linkage oracles: returns
    * (ctes, termsExpr, agreesExpr, uJoinList). */
  private def linkageCandSql(table: String, idCol: String, nameCol: String,
      fields: Seq[String], mPpm: Long, blockLen: Int, window: Int,
      maxDist: Int): (String, String, String, String) = {
    val lnM = math.floor(math.log(mPpm.toDouble) * 1e6).toLong
    val ln1m = math.floor(math.log((1000000L - mPpm).toDouble) * 1e6).toLong
    val lnMil = math.floor(math.log(1000000.0) * 1e6).toLong
    val fieldSel = fields.map(f => s"CAST($f AS VARCHAR) AS $f").mkString(", ")
    val legs = (1 to window).map { i =>
      val fb = fields.map(f => s"lead($f, $i) OVER win$i AS ${f}_b").mkString(", ")
      s"""SELECT id AS id_a, key AS key_a, ${fields.map(f => s"$f AS ${f}_a").mkString(", ")},
         |  lead(id, $i) OVER win$i AS id_b, lead(key, $i) OVER win$i AS key_b, $fb
         |FROM b WINDOW win$i AS (PARTITION BY blk ORDER BY key, id)""".stripMargin
    }.mkString("\nUNION ALL\n")
    val uCtes = fields.map { f =>
      s"""u_$f AS (
         |  SELECT greatest(1, sum(c * (c - 1))) AS un, greatest(1, sum(c) * (sum(c) - 1)) AS ud
         |  FROM (SELECT CAST($f AS VARCHAR) AS v, count(*) AS c FROM $table GROUP BY 1))""".stripMargin
    }.mkString(",\n")
    def lnE6(x: String) = s"CAST(floor(ln(CAST($x AS DOUBLE)) * 1000000.0) AS BIGINT)"
    val terms = fields.map { f =>
      s"""CASE WHEN ${f}_a IS NOT DISTINCT FROM ${f}_b
         |  THEN ${lnM - lnMil} - (${lnE6(s"u_$f.un")} - ${lnE6(s"u_$f.ud")})
         |  ELSE ${ln1m - lnMil}
         |    - (${lnE6(s"greatest(1, u_$f.ud - u_$f.un)")} - ${lnE6(s"u_$f.ud")})
         |END""".stripMargin
    }.mkString("\n + ")
    val agrees = fields.map(f =>
      s"CASE WHEN ${f}_a IS NOT DISTINCT FROM ${f}_b THEN 1 ELSE 0 END").mkString(" + ")
    val ctes =
      s"""b AS (
         |  SELECT $idCol AS id, lower(trim($nameCol)) AS key, $fieldSel,
         |    substr(lower(trim($nameCol)), 1, $blockLen) AS blk
         |  FROM $table
         |  WHERE $nameCol IS NOT NULL AND length(lower(trim($nameCol))) > 0),
         |$uCtes,
         |cand AS (
         |  SELECT * FROM ($legs)
         |  WHERE id_b IS NOT NULL AND levenshtein(key_a, key_b) <= $maxDist)""".stripMargin
    (ctes, terms, agrees, fields.map(f => s"u_$f").mkString(", "))
  }

  /** DuckDB respell of [[linkageScores]] — SNM legs, per-field u CTEs, and
    * the identical per-component e6 grid: each ⌊ln·10⁶⌋ lands on the int
    * grid before summation, and the m-prior constants are baked as JVM-
    * computed literals so only the data-dependent ln(un)/ln(ud) components
    * are evaluated by DuckDB at all. */
  def linkageScoresSql(table: String, idCol: String, nameCol: String,
      fields: Seq[String], mPpm: Long = 950000L, blockLen: Int = 4,
      window: Int = 3, maxDist: Int = 4, topK: Int = 50): String = {
    val (ctes, terms, agrees, uJoin) =
      linkageCandSql(table, idCol, nameCol, fields, mPpm, blockLen, window, maxDist)
    s"""WITH $ctes
       |SELECT id_a, id_b,
       |  CAST($agrees AS BIGINT) AS n_agree,
       |  CAST(($terms) AS BIGINT) AS score_e6
       |FROM cand, $uJoin
       |ORDER BY score_e6 DESC, id_a, id_b LIMIT $topK""".stripMargin
  }

  /** The [[entityResolution]] oracle: the identical scored-pair CTEs, a
    * threshold filter, the x28-shape recursive transitive closure, and the
    * two-step survivorship aggregates. */
  def entityResolutionSql(table: String, idCol: String, nameCol: String,
      fields: Seq[String], minScoreE6: Long, mPpm: Long = 950000L,
      blockLen: Int = 4, window: Int = 3, maxDist: Int = 4): String = {
    val (ctes, terms, _, uJoin) =
      linkageCandSql(table, idCol, nameCol, fields, mPpm, blockLen, window, maxDist)
    s"""WITH RECURSIVE $ctes,
       |pairs AS (
       |  SELECT id_a, id_b FROM cand, $uJoin
       |  WHERE CAST(($terms) AS BIGINT) >= $minScoreE6),
       |edges AS (
       |  SELECT id_a AS a, id_b AS b FROM pairs
       |  UNION SELECT id_b, id_a FROM pairs),
       |nodes AS (SELECT DISTINCT a AS id FROM edges),
       |reach(x, y) AS (
       |  SELECT id, id FROM nodes
       |  UNION
       |  SELECT r.x, e.b FROM reach r JOIN edges e ON e.a = r.y),
       |comp AS (SELECT x AS id, min(y) AS entity_id FROM reach GROUP BY x),
       |named AS (
       |  SELECT CAST($idCol AS BIGINT) AS id,
       |    CAST(length(lower(trim($nameCol))) AS BIGINT) AS name_len
       |  FROM $table),
       |members AS (SELECT comp.entity_id, comp.id, named.name_len
       |            FROM comp JOIN named USING (id)),
       |lens AS (
       |  SELECT entity_id, CAST(count(*) AS BIGINT) AS n_records,
       |    max(name_len) AS rep_name_len
       |  FROM members GROUP BY entity_id)
       |SELECT m.entity_id, l.n_records, min(m.id) AS rep_id, l.rep_name_len
       |FROM members m JOIN lens l ON m.entity_id = l.entity_id
       |  AND m.name_len = l.rep_name_len
       |GROUP BY m.entity_id, l.n_records, l.rep_name_len
       |ORDER BY m.entity_id""".stripMargin
  }
}
