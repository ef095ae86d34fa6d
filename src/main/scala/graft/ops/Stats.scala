package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributional statistics over groups — outlier/anomaly flagging for
  * data-quality monitoring (reference has no analogue; extension per the
  * build brief's training-data-pipeline mandate).
  */
object Stats {

  /** Per-group z-score outlier flags, spelled with EXPLICIT exact-integer
    * sums instead of built-in `stddev_samp`.
    *
    * Why spell it out: for an integer-valued `valueCol`, `sum(v)` and
    * `sum(v*v)` are exact in IEEE double (every partial and merge adds
    * integers < 2^53), so `mean = s/n`, `sd = sqrt((ssq - s*s/n)/(n-1))`
    * and the `abs(v - mean) > sigma*sd` test evaluate to bit-identical
    * doubles on ANY engine and ANY partitioning. Built-in stddev aggregates
    * (Welford/merge-based) are merge-order-dependent — correct, but not
    * cross-engine reproducible, which is what lets this op carry a DuckDB
    * oracle.
    *
    * Scale shape: one partial-aggregable groupBy collapses the fact table
    * to (group, s, ssq, n) — group cardinality is tiny next to the rows —
    * and the stats table joins back as a BROADCAST, so the fact table
    * itself never shuffles. Two scans, zero wide exchanges.
    */
  def groupAnomalies(df: DataFrame, groupCol: String, valueCol: String,
      sigma: Double): DataFrame = {
    val v = col(valueCol).cast("double")
    val stats = df.groupBy(col(groupCol)).agg(
      sum(v).as("__s"),
      sum(v * v).as("__ssq"),
      count(lit(1)).cast("double").as("__n"))
    val mean = col("__s") / col("__n")
    val sd = sqrt((col("__ssq") - col("__s") * col("__s") / col("__n")) /
      (col("__n") - lit(1.0)))
    df.join(broadcast(stats), Seq(groupCol))
      .filter(col("__n") > lit(1.0) && abs(v - mean) > lit(sigma) * sd)
      .drop("__s", "__ssq", "__n")
  }

  /** Fixed-width histogram: bin index = floor(value / binWidth), with the
    * bin's inclusive lower bound alongside. One partial-aggregable groupBy
    * on a small key domain — bins collapse map-side, the shuffle carries
    * |bins| rows per partition no matter how many input rows. NULLs are
    * excluded (they have no bin; count them via [[columnProfile]]). */
  def histogram(df: DataFrame, valueCol: String, binWidth: Double): DataFrame =
    df.filter(col(valueCol).isNotNull)
      .groupBy(floor(col(valueCol).cast("double") / lit(binWidth)).cast("long").as("bin"))
      .agg(count(lit(1)).as("n"))
      .withColumn("bin_lo", col("bin").cast("double") * lit(binWidth))

  /** Per-group sufficient statistics — (n, sum, min, max) over an
    * integer-valued column — as a MERGEABLE state table: the incremental-
    * maintenance primitive. A lake that stores this table per partition
    * never rescans history to refresh a dashboard: a new ingest computes
    * stats over ITS rows only and [[mergeStats]] folds them in — commutative
    * and associative, so any merge tree (per-file, per-day, per-region)
    * yields identical totals. Integer sums are exact in any engine, which
    * is what lets x47 oracle merged-incremental against full-recompute
    * bit-for-bit. */
  def mergeableStats(df: DataFrame, groupCol: String, valueCol: String): DataFrame = {
    val v = col(valueCol).cast("long")
    df.groupBy(col(groupCol).as("grp")).agg(
      count(lit(1)).as("n"),
      sum(v).as("s"),
      min(v).as("mn"),
      max(v).as("mx"))
  }

  /** Fold any number of [[mergeableStats]] tables into one: union + re-agg
    * with the same combinators (count→sum, sum→sum, min→min, max→max).
    * The shuffle carries |groups| rows per input table — catalog-sized,
    * never data-sized. */
  def mergeStats(tables: DataFrame*): DataFrame = {
    require(tables.nonEmpty, "mergeStats needs at least one stats table")
    tables.reduce(_.unionByName(_))
      .groupBy(col("grp")).agg(
        sum(col("n")).as("n"),
        sum(col("s")).as("s"),
        min(col("mn")).as("mn"),
        max(col("mx")).as("mx"))
  }

  /** Per-group ROBUST outlier screen: median / MAD (median absolute
    * deviation) instead of mean / stddev — the screen that survives the
    * exact pathology it exists to find, since one extreme value drags a
    * mean + inflates a stddev but moves neither median. The z-score variant
    * ([[groupAnomalies]]) and this one are the classic complementary pair.
    *
    * Two aggregation passes by necessity (MAD is a median OF deviations
    * from a median — not mergeable into one pass): pass 1 collapses to
    * (group, median), broadcast-joins back, pass 2 collapses deviations to
    * (group, mad). The fact table is scanned twice but never shuffled —
    * both joins broadcast the tiny group-stats side. Exact interpolated
    * medians over integer inputs produce doubles on the 0.25 grid, exact
    * in IEEE — cross-engine oracle-able. */
  def robustOutliers(df: DataFrame, groupCol: String, valueCol: String,
      k: Double = 3.0): DataFrame = {
    val v = col(valueCol).cast("double")
    val med = df.groupBy(col(groupCol))
      .agg(percentile(v, lit(0.5)).as("med"))
    val withMed = df.join(broadcast(med), Seq(groupCol))
    val mad = withMed.groupBy(col(groupCol))
      .agg(percentile(abs(v - col("med")), lit(0.5)).as("mad"))
    withMed.join(broadcast(mad), Seq(groupCol))
      .groupBy(col(groupCol), col("med"), col("mad"))
      .agg(
        count(lit(1)).as("n_rows"),
        sum(when(abs(v - col("med")) > lit(k) * col("mad"), 1L).otherwise(0L))
          .as("n_outliers"))
  }

  /** Per-column data-quality profile: row count, null count, exact distinct
    * count — the profile table a lake publishes next to each dataset.
    *
    * One logical pass; the exact multi-column countDistinct makes Catalyst
    * plan an Expand (one duplicated row per distinct aggregate), so cost is
    * |cols| × scan. That is the EXACT spelling — at 100 TB, profile either
    * a column subset (the `cols` parameter) or swap approx_count_distinct
    * into `distinctExpr` if ±2% is acceptable; the contract here stays
    * exact so it can carry a DuckDB oracle. */
  def columnProfile(df: DataFrame, cols: Seq[String]): DataFrame = {
    val aggs = count(lit(1)).as("n_rows") +: cols.flatMap { c =>
      Seq(sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"__null_$c"),
        countDistinct(col(c)).as(s"__dist_$c"))
    }
    val stacked = cols.map(c => s"'$c', `__null_$c`, `__dist_$c`").mkString(", ")
    df.agg(aggs.head, aggs.tail: _*)
      .selectExpr("n_rows",
        s"stack(${cols.size}, $stacked) AS (column_name, n_null, n_distinct)")
      .select("column_name", "n_rows", "n_null", "n_distinct")
  }

  /** Per-dimension profile of an embedding column — count, mean, variance,
    * min, max for each vector position. The vector-column health check a
    * feature store runs before training: a dead dimension (var≈0), a
    * scale-exploded one, or a count mismatch (ragged vectors) all surface
    * here.
    *
    * Determinism discipline: values are quantized to exact integers
    * (floor·1e6 — same contract as x40's centroids and x68's int8 path),
    * so every aggregate is an order-free INTEGER sum/min/max in
    * DECIMAL(38,0); mean and variance (E[q²]−E[q]² on the quantized grid)
    * are then a fixed sequence of exact IEEE ops. Bit-stable on any
    * engine/partitioning without a final-quantize step.
    *
    * Scale shape: posexplode inflates rows ×dim but collapses MAP-SIDE on
    * the integer `pos` key — the shuffle carries dim × partials, not
    * dim × rows. One scan, one narrow exchange. */
  def embeddingProfile(embs: DataFrame, vecCol: String): DataFrame = {
    embs
      .select(posexplode(col(vecCol)).as(Seq("pos0", "v")))
      .select((col("pos0") + 1).as("pos"),
        expr("CAST(floor(CAST(v AS DOUBLE) * 1000000.0) AS BIGINT)").as("q"))
      .groupBy(col("pos"))
      .agg(count(lit(1)).as("n"),
        sum(col("q").cast("decimal(38,0)")).as("__s"),
        sum((col("q") * col("q")).cast("decimal(38,0)")).as("__s2"),
        min(col("q")).as("__mn"), max(col("q")).as("__mx"))
      .select(col("pos"), col("n"),
        (col("__s").cast("double") / col("n").cast("double") / lit(1e6)).as("mean"),
        ((col("__s2").cast("double") / col("n").cast("double") / lit(1e12)) -
          (col("__s").cast("double") / col("n").cast("double") / lit(1e6)) *
          (col("__s").cast("double") / col("n").cast("double") / lit(1e6))).as("variance"),
        (col("__mn").cast("double") / lit(1e6)).as("min_v"),
        (col("__mx").cast("double") / lit(1e6)).as("max_v"))
  }

  /** Log-bucketed histogram quantiles — the mergeable fixed-state sketch
    * for latency/size percentiles over an unbounded stream (HDR-histogram
    * family). Values e6-quantize to int64; the bucket key is (bit-length,
    * top-2-sub-bits) of the quantized value — ≤ 64·4 buckets per group
    * REGARDLESS of cardinality, pure integer derivation (`length(bin(q))`
    * — no log2, no libm), merge = count addition. The quantile estimate is
    * the lower bound of the first bucket whose cumulative count reaches
    * ⌈n·pct/100⌉, in e6 units (`est_q_micro`); relative error is bounded by
    * the bucket width, < 25% of the value. Non-positive values clamp into
    * the q=1 bucket.
    *
    * vs q29's exact percentile: that sorts the group (or holds it in a
    * percentile agg buffer); this never holds more than the bucket grid —
    * the difference between a per-group sort and 256 counters at 100 TB. */
  def logBucketQuantiles(df: DataFrame, groupCol: String, valueCol: String,
      pcts: Seq[Int] = Seq(50, 90, 99)): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val bucketed = df
      .select(col(groupCol),
        expr(s"GREATEST(CAST(FLOOR(CAST($valueCol AS DOUBLE) * 1000000.0D) AS BIGINT), 1L)")
          .as("q"))
      .withColumn("blen", length(expr("bin(q)")))
      .withColumn("lb", expr(
        """CASE WHEN blen >= 3
          |  THEN SHIFTLEFT(1L, blen - 1) + ((q DIV SHIFTLEFT(1L, blen - 3)) % 4) * SHIFTLEFT(1L, blen - 3)
          |  ELSE q END""".stripMargin))
      .groupBy(col(groupCol), col("lb"))
      .agg(count(lit(1)).as("c"))
    val w = Window.partitionBy(col(groupCol)).orderBy(col("lb"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val cum = bucketed
      .withColumn("cum", sum(col("c")).over(w))
      .withColumn("n_vals", sum(col("c")).over(Window.partitionBy(col(groupCol))))
    val pctDf = df.sparkSession.sql(
      s"SELECT * FROM VALUES ${pcts.map(p => s"($p)").mkString(", ")} AS t(pct)")
    cum.crossJoin(broadcast(pctDf))
      .filter(col("cum") >= expr("CAST((n_vals * pct + 99) DIV 100 AS BIGINT)"))
      .groupBy(col(groupCol), col("pct"))
      .agg(min(col("lb")).as("est_q_micro"), min(col("n_vals")).as("n_vals"))
      .select(col(groupCol), col("pct").cast("long").as("pct"), col("n_vals"),
        col("est_q_micro"))
      .orderBy(col(groupCol), col("pct"))
  }

  /** Exact covariance matrix of an embedding column on the 10⁻³ quantized
    * grid — the PCA/whitening precursor over a feature store. The outer
    * product flattens map-side into one d²-long array per row and
    * [[graft.functions.VecSumAgg]] folds them — shuffle volume is
    * #partitions·d² longs, never n·d² exploded rows. Products are ≤ ~10⁶
    * per cell so the int64 accumulator holds ~10¹² rows; the final
    * n·S_ij − S_i·S_j leaves int64 range at larger n, so it is computed in
    * DECIMAL(38,0) and emitted as a canonical digit STRING (`cov_num`,
    * covariance·n²·10⁶ — the x63 lesson: DECIMAL hashes are not
    * driver-portable, digit strings are). Upper triangle only. */
  def covarianceMatrix(embs: DataFrame, vecCol: String): DataFrame = {
    val agg = embs
      .select(expr(s"transform($vecCol, v -> CAST(FLOOR(CAST(v AS DOUBLE) * 1000.0D) AS BIGINT))")
        .as("qv"))
      .agg(count(lit(1)).as("n_vecs"),
        graft.functions.VecSumAgg.vec_sum(col("qv")).as("s"),
        graft.functions.VecSumAgg.vec_sum(
          expr("flatten(transform(qv, x -> transform(qv, y -> x * y)))")).as("sxy"))
    agg
      .select(col("n_vecs"), col("s"), posexplode(col("sxy")).as(Seq("pos", "s_ij")))
      .select(col("n_vecs"),
        expr("CAST(pos DIV size(s) + 1 AS BIGINT)").as("i"),
        expr("CAST(pos % size(s) + 1 AS BIGINT)").as("j"),
        expr("element_at(s, CAST(pos DIV size(s) + 1 AS INT))").as("s_i"),
        expr("element_at(s, CAST(pos % size(s) + 1 AS INT))").as("s_j"),
        col("s_ij"))
      .filter(col("i") <= col("j"))
      .select(col("i"), col("j"), col("n_vecs"), col("s_i"), col("s_j"), col("s_ij"),
        expr("""CAST(CAST(n_vecs AS DECIMAL(38,0)) * CAST(s_ij AS DECIMAL(38,0))
               |  - CAST(s_i AS DECIMAL(38,0)) * CAST(s_j AS DECIMAL(38,0)) AS STRING)""".stripMargin)
          .as("cov_num"))
  }

  /** Exact ROC-AUC of a score against a boolean label — the classifier-eval
    * primitive behind every quality-filter threshold decision (does the
    * fastText-shape score actually separate the classes before we gate
    * 100 TB on it?).
    *
    * Formulation: the Mann-Whitney pair count, but NEVER as a pair join —
    * scores e9-quantize to int64, the relation collapses to per-distinct-
    * score (n_pos, n_neg) counts (one shuffle, cardinality = #distinct
    * scores, ≤ a few million after quantization no matter the corpus), and
    * a running negative count turns the pair sum into
    * Σ_s n_pos(s)·(2·n_neg(<s) + n_neg(=s)) — ties count half, kept
    * integer by the ×2 scaling. `auc_num` is exact; `auc_micro` =
    * ⌊10⁶·num/(2·P·N)⌋ is one int-derived double division, identical on
    * both engines. The running negative count is [[Par.exclusivePrefix]]'s
    * distributed two-pass scan on sq asc (sq is the distinct-score group
    * key, so the order is total) — at 100 TB the distinct-score relation
    * is ≈n rows, and the r8 single-partition `Window.orderBy(sq)` was the
    * scale bottleneck here. NULL scores are excluded (undefined rank). */
  def scoreAuc(df: DataFrame, scoreCol: String, labelCol: String): DataFrame = {
    val g = df
      .filter(col(scoreCol).isNotNull)
      .select(expr(s"CAST(FLOOR(CAST($scoreCol AS DOUBLE) * 1000000000.0D) AS BIGINT)").as("sq"),
        col(labelCol).cast("boolean").as("pos"))
      .groupBy(col("sq"))
      .agg(sum(when(col("pos"), 1L).otherwise(0L)).as("np"),
        sum(when(col("pos"), 0L).otherwise(1L)).as("nn"))
    Par.exclusivePrefix(g, col("sq").asc, Seq("nn" -> "nn_below"))
      .agg(sum(col("np")).as("n_pos"), sum(col("nn")).as("n_neg"),
        sum(col("np") * (lit(2L) * col("nn_below") + col("nn"))).as("auc_num"))
      .select(col("n_pos"), col("n_neg"), col("auc_num"),
        expr("""CASE WHEN n_pos = 0 OR n_neg = 0 THEN NULL ELSE
               |  CAST(FLOOR(CAST(auc_num AS DOUBLE) * 1000000.0D /
               |    (2.0D * CAST(n_pos AS DOUBLE) * CAST(n_neg AS DOUBLE))) AS BIGINT)
               |END""".stripMargin).as("auc_micro"))
  }

  /** Precision–recall curve of an INTEGER score against a boolean label at
    * `grid`+1 evenly spaced thresholds over the observed score range —
    * the threshold-picking companion to [[scoreAuc]] (AUC says the score
    * ranks; this says what precision a concrete gate buys at what recall).
    * Thresholds are integer arithmetic on broadcast min/max; all counts
    * exact; precision/recall are integer ppm divisions (NULL when nothing
    * is predicted positive). Scale shape: one min/max aggregate broadcast
    * back, a ×(grid+1) map-side fan of per-row flags, one (grid+1)-key
    * rollup — the corpus shuffles only partial aggregates. */
  def prCurve(df: DataFrame, scoreCol: String, labelCol: String,
      grid: Int = 10): DataFrame = {
    val q = df.filter(col(scoreCol).isNotNull)
      .select(col(scoreCol).cast("long").as("sq"),
        col(labelCol).cast("boolean").as("pos"))
    val bounds = q.agg(min(col("sq")).as("mn"), max(col("sq")).as("mx"))
    val ts = df.sparkSession.createDataFrame(
      (0 to grid).map(i => Tuple1(i))).toDF("i")
    q.crossJoin(broadcast(bounds)).crossJoin(broadcast(ts))
      .withColumn("t", expr(s"mn + (i * (mx - mn + 1)) DIV $grid"))
      .groupBy(col("i").cast("long").as("i"), col("t"))
      .agg(sum(when(col("sq") >= col("t") && col("pos"), 1L).otherwise(0L)).as("tp"),
        sum(when(col("sq") >= col("t") && !col("pos"), 1L).otherwise(0L)).as("fp"),
        sum(when(col("sq") < col("t") && col("pos"), 1L).otherwise(0L)).as("fn"))
      .select(col("i"), col("t").as("threshold"), col("tp"), col("fp"), col("fn"),
        expr("(tp * 1000000) DIV nullif(tp + fp, 0)").as("precision_ppm"),
        expr("(tp * 1000000) DIV nullif(tp + fn, 0)").as("recall_ppm"))
      .orderBy(col("i"))
  }

  /** DuckDB respell of [[prCurve]] — `scoredRelSql` emits (sq, pos). */
  def prCurveSql(scoredRelSql: String, grid: Int = 10): String =
    s"""WITH sc AS ($scoredRelSql),
       |b AS (SELECT CAST(min(sq) AS BIGINT) AS mn, CAST(max(sq) AS BIGINT) AS mx FROM sc),
       |g AS (SELECT unnest(range(0, ${grid + 1})) AS i),
       |f AS (
       |  SELECT g.i, b.mn + (g.i * (b.mx - b.mn + 1)) // $grid AS t, sc.sq, sc.pos
       |  FROM sc, b, g)
       |SELECT CAST(i AS BIGINT) AS i, t AS threshold,
       |  CAST(sum(CASE WHEN sq >= t AND pos THEN 1 ELSE 0 END) AS BIGINT) AS tp,
       |  CAST(sum(CASE WHEN sq >= t AND NOT pos THEN 1 ELSE 0 END) AS BIGINT) AS fp,
       |  CAST(sum(CASE WHEN sq < t AND pos THEN 1 ELSE 0 END) AS BIGINT) AS fn,
       |  CAST((CAST(sum(CASE WHEN sq >= t AND pos THEN 1 ELSE 0 END) AS BIGINT) * 1000000)
       |    // nullif(sum(CASE WHEN sq >= t THEN 1 ELSE 0 END), 0) AS BIGINT) AS precision_ppm,
       |  CAST((CAST(sum(CASE WHEN sq >= t AND pos THEN 1 ELSE 0 END) AS BIGINT) * 1000000)
       |    // nullif(sum(CASE WHEN pos THEN 1 ELSE 0 END), 0) AS BIGINT) AS recall_ppm
       |FROM f GROUP BY i, t ORDER BY i""".stripMargin

  /** Reliability diagram (calibration curve) of a score against a boolean
    * label — the companion eval to [[scoreAuc]]: AUC says the score RANKS,
    * calibration says whether its magnitude MEANS anything, which decides
    * whether a fixed gate threshold transfers across corpus snapshots.
    *
    * Equal-WIDTH buckets over the observed e9-quantized score range (not
    * ntile: equal-width is order-free, so there is no tie-break protocol to
    * keep in sync across engines — `(sq−min)·B div (max−min+1)` is pure
    * integer arithmetic on both sides). Per bucket: row count, positives,
    * mean score (µ-scale) and positive rate (ppm), both via int-derived
    * double division (exact IEEE parity). Empty buckets are absent rows on
    * both engines.
    *
    * Scale shape: one min/max aggregate (map-side collapsible), broadcast
    * back; bucketing is a map-side projection; the final groupBy carries
    * `buckets` keys. The corpus shuffles nothing but partial aggregates. */
  def calibrationCurve(df: DataFrame, scoreCol: String, labelCol: String,
      buckets: Int = 10): DataFrame = {
    val q = df.filter(col(scoreCol).isNotNull)
      .select(expr(s"CAST(FLOOR(CAST($scoreCol AS DOUBLE) * 1000000000.0D) AS BIGINT)").as("sq"),
        col(labelCol).cast("boolean").as("pos"))
    val bounds = q.agg(min(col("sq")).as("mn"), max(col("sq")).as("mx"))
    q.crossJoin(broadcast(bounds))
      .select(expr(s"((sq - mn) * $buckets) DIV (mx - mn + 1)").as("bucket"),
        col("sq"), col("pos"))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n"),
        sum(when(col("pos"), 1L).otherwise(0L)).as("n_pos"),
        sum(col("sq")).as("__ssq"))
      .select(col("bucket"), col("n"), col("n_pos"),
        floor(col("__ssq").cast("double") / (col("n").cast("double") * lit(1000.0)))
          .cast("long").as("mean_score_micro"),
        floor(col("n_pos").cast("double") * lit(1000000.0) / col("n").cast("double"))
          .cast("long").as("pos_rate_ppm"))
      .orderBy(col("bucket"))
  }

  /** DuckDB respell of [[calibrationCurve]] given SQL for the scored
    * relation (columns `sq`, `pos` pre-quantization is NOT expected —
    * pass raw score/label SQL and this wraps the same e9 quantization). */
  def calibrationSql(scoredRelSql: String, scoreExpr: String, labelExpr: String,
      buckets: Int = 10): String =
    s"""WITH scored AS ($scoredRelSql),
       |q AS (
       |  SELECT CAST(floor(CAST($scoreExpr AS DOUBLE) * 1000000000.0) AS BIGINT) AS sq,
       |    CAST($labelExpr AS BOOLEAN) AS pos
       |  FROM scored WHERE $scoreExpr IS NOT NULL),
       |b AS (SELECT min(sq) AS mn, max(sq) AS mx FROM q),
       |bk AS (SELECT ((sq - mn) * $buckets) // (mx - mn + 1) AS bucket, sq, pos FROM q, b),
       |agg AS (
       |  SELECT bucket, CAST(count(*) AS BIGINT) AS n,
       |    CAST(sum(CASE WHEN pos THEN 1 ELSE 0 END) AS BIGINT) AS n_pos,
       |    CAST(sum(sq) AS BIGINT) AS ssq
       |  FROM bk GROUP BY bucket)
       |SELECT bucket, n, n_pos,
       |  CAST(floor(CAST(ssq AS DOUBLE) / (CAST(n AS DOUBLE) * 1000.0)) AS BIGINT)
       |    AS mean_score_micro,
       |  CAST(floor(CAST(n_pos AS DOUBLE) * 1000000.0 / CAST(n AS DOUBLE)) AS BIGINT)
       |    AS pos_rate_ppm
       |FROM agg ORDER BY bucket""".stripMargin

  /** Dominant eigenvector of the embedding covariance by fixed-point power
    * iteration — the top principal direction, the first step of every
    * PCA/whitening/spectral pass over an embedding corpus.
    *
    * Shape: the CORPUS contributes exactly one aggregate — the same
    * (n, Σq, Σ outer-product) sufficient statistics as [[covarianceMatrix]],
    * folded by [[graft.functions.VecSumAgg]] so the shuffle carries
    * #partitions·(d+d²) longs, never n·d rows. Everything after is O(d²)
    * DRIVER math (d=64 here; bounded by the embedding width, independent of
    * corpus size — the IVF build makes the same move with its Lloyd sample).
    *
    * All-integer so the DuckDB oracle ([[eigenSql]]) replays it bit-for-bit:
    * covariance numerators C = n·S_ij − S_i·S_j in BigInt; C truncation-
    * shifted (sign·(|C|>>s)) so max|c| < 2^cbits with cbits sized from d to
    * keep every later product inside int64; v₀ = all-ones at 2^14 scale;
    * each round w = c·v then renormalizes by m = max(1, max|w|) via
    * sign·(|w|·2^14 div m) — truncation toward zero, spelled identically in
    * both engines (floor-div only ever sees non-negatives). Sign convention:
    * power iteration from the all-ones start is deterministic, so the
    * orientation is pinned too. Degenerate inputs (empty corpus → empty
    * result; constant corpus → C=0 → zero vector) fall out of m's ≥1 guard.
    */
  def dominantEigenvector(embs: DataFrame, vecCol: String, iters: Int = 8): DataFrame = {
    val spark = embs.sparkSession
    import spark.implicits._
    val agg = embs
      .select(expr(s"transform($vecCol, v -> CAST(FLOOR(CAST(v AS DOUBLE) * 1000.0D) AS BIGINT))")
        .as("qv"))
      .agg(count(lit(1)).as("n"),
        graft.functions.VecSumAgg.vec_sum(col("qv")).as("s"),
        graft.functions.VecSumAgg.vec_sum(
          expr("flatten(transform(qv, x -> transform(qv, y -> x * y)))")).as("sxy"))
      .collect()(0)
    val n = agg.getLong(0)
    if (n == 0L) return Seq.empty[(Long, Long)].toDF("i", "v_q")
    val s = agg.getSeq[Long](1)
    val sxy = agg.getSeq[Long](2)
    val d = s.length
    val cbits = cShiftBits(d)
    val cov = Array.tabulate(d, d)((i, j) => BigInt(n) * sxy(i * d + j) - BigInt(s(i)) * s(j))
    val maxAbs = cov.flatten.map(_.abs).max
    val sh = if (maxAbs.signum == 0) 0 else math.max(maxAbs.bitLength - cbits, 0)
    val c = cov.map(_.map(x => ((x.abs >> sh) * x.signum).toLong))
    var v = Array.fill(d)(16384L)
    for (_ <- 1 to iters) {
      val w = Array.tabulate(d)(i => (0 until d).map(j => c(i)(j) * v(j)).sum)
      val m = math.max(w.map(math.abs).max, 1L)
      v = w.map(x => if (x >= 0) x * 16384L / m else -(-x * 16384L / m))
    }
    v.zipWithIndex.map { case (vq, i) => ((i + 1).toLong, vq) }.toSeq.toDF("i", "v_q")
  }

  /** Width of the shifted covariance entries: the renormalization product
    * |w·2^14| ≤ d·2^cbits·2^14·2^14 must stay strictly inside int64, so
    * cbits ≤ 34 − ⌈log2 d⌉ (28 at d=64, 22 at d=4096). */
  private def cShiftBits(d: Int): Int =
    math.min(28, 34 - (32 - Integer.numberOfLeadingZeros(d - 1)))

  /** DuckDB respell of [[dominantEigenvector]] — the iteration unrolled as a
    * CTE chain (the x98 kmeansSql pattern), matching bit-for-bit. */
  def eigenSql(table: String, vecCol: String, dims: Int, iters: Int = 8): String = {
    val cbits = cShiftBits(dims)
    val header =
      s"""WITH q AS (
         |  SELECT list_transform($vecCol, v -> CAST(floor(CAST(v AS DOUBLE) * 1000.0) AS BIGINT)) AS qv
         |  FROM $table),
         |d AS (SELECT unnest(range(1, ${dims + 1})) AS i),
         |sums AS (SELECT di.i AS i, CAST(sum(qv[di.i]) AS BIGINT) AS s_i FROM q, d di GROUP BY 1),
         |cells AS (
         |  SELECT di.i AS i, dj.i AS j, CAST(sum(qv[di.i] * qv[dj.i]) AS BIGINT) AS s_ij
         |  FROM q, d di, d dj GROUP BY 1, 2),
         |nn AS (SELECT count(*) AS n FROM q),
         |cov AS (
         |  SELECT c.i, c.j,
         |    CAST(nn.n AS HUGEINT) * CAST(c.s_ij AS HUGEINT)
         |      - CAST(sa.s_i AS HUGEINT) * CAST(sb.s_i AS HUGEINT) AS cn
         |  FROM cells c JOIN sums sa ON sa.i = c.i JOIN sums sb ON sb.i = c.j, nn),
         |mxc AS (SELECT max(abs(cn)) AS ma FROM cov),
         |shf AS (
         |  SELECT CASE WHEN ma = 0 THEN 0
         |              ELSE greatest(length(bin(CAST(ma AS BIGINT))) - $cbits, 0)
         |         END AS s FROM mxc),
         |cs AS (
         |  SELECT i, j, CAST(CASE WHEN cn >= 0 THEN cn // (1::HUGEINT << shf.s)
         |                         ELSE -((-cn) // (1::HUGEINT << shf.s)) END AS BIGINT) AS c
         |  FROM cov, shf),
         |v0 AS (SELECT i, CAST(16384 AS BIGINT) AS v FROM d)""".stripMargin
    val rounds = (1 to iters).map { t =>
      s"""w$t AS (
         |  SELECT cs.i AS i, CAST(sum(cs.c * v${t - 1}.v) AS BIGINT) AS w
         |  FROM cs JOIN v${t - 1} ON v${t - 1}.i = cs.j GROUP BY 1),
         |m$t AS (SELECT greatest(max(abs(w)), 1) AS m FROM w$t),
         |v$t AS (
         |  SELECT i, CASE WHEN w >= 0 THEN (w * 16384) // m
         |                 ELSE -(((-w) * 16384) // m) END AS v
         |  FROM w$t, m$t)""".stripMargin
    }.mkString(",\n")
    s"""$header,
       |$rounds
       |SELECT CAST(i AS BIGINT) AS i, CAST(v AS BIGINT) AS v_q
       |FROM v$iters ORDER BY i""".stripMargin
  }

  /** Exact single-changepoint detection per group over a daily count
    * series: the split day t* maximizing the between-segment mean gap
    * |mean(1..t) − mean(t+1..n)| — the two-segment special case of
    * binary-segmentation changepoint search, evaluated EXHAUSTIVELY with
    * prefix sums so no candidate is missed.
    *
    * One shuffle (the daily groupBy collapses the event stream to
    * (group, day, cnt) — ≤ #groups·#days rows regardless of input size),
    * then bounded per-group windows: prefix sum + totals in one pass, and
    * the gap for EVERY candidate split is pure arithmetic on (S_i, i, S_n,
    * n). All-integer: gap_ppm = ⌊10⁶·|S_i·(n−i) − (S_n−S_i)·i| /
    * (i·(n−i))⌋ (|…| ≤ S_n·n ≤ ~4e8 at sf0.1, ×10⁶ inside int64), ties →
    * earliest day, so the oracle reproduces the argmax bit-for-bit. */
  def meanSplitChangepoint(df: DataFrame, groupCol: String, tsCol: String): DataFrame = {
    val daily = df
      .groupBy(col(groupCol).as("g"), to_date(col(tsCol)).as("day"))
      .agg(count(lit(1)).as("cnt"))
    val wOrd = org.apache.spark.sql.expressions.Window
      .partitionBy(col("g")).orderBy(col("day"))
    val wAll = org.apache.spark.sql.expressions.Window.partitionBy(col("g"))
    val cand = daily
      .withColumn("i", row_number().over(wOrd))
      .withColumn("si", sum(col("cnt")).over(wOrd))
      .withColumn("n", count(lit(1)).over(wAll))
      .withColumn("sn", sum(col("cnt")).over(wAll))
      .filter(col("i") < col("n"))
      .withColumn("gap_ppm",
        expr("(abs(si * (n - i) - (sn - si) * i) * 1000000) DIV (i * (n - i))"))
    val wBest = org.apache.spark.sql.expressions.Window
      .partitionBy(col("g")).orderBy(col("gap_ppm").desc, col("day").asc)
    cand.withColumn("rk", row_number().over(wBest)).filter(col("rk") === 1)
      .select(col("g").as(groupCol), col("day").as("split_day"),
        col("n").as("n_days"), col("gap_ppm"),
        expr("(si * 1000000) DIV i").as("left_mean_ppm"),
        expr("((sn - si) * 1000000) DIV (n - i)").as("right_mean_ppm"))
      .orderBy(col(groupCol))
  }

  /** DuckDB respell of [[meanSplitChangepoint]]. */
  def meanSplitChangepointSql(table: String, groupCol: String, tsCol: String): String =
    s"""WITH daily AS (
       |  SELECT $groupCol AS g, CAST($tsCol AS DATE) AS day,
       |    CAST(count(*) AS BIGINT) AS cnt
       |  FROM $table GROUP BY 1, 2),
       |pref AS (
       |  SELECT g, day, cnt,
       |    CAST(row_number() OVER (PARTITION BY g ORDER BY day) AS BIGINT) AS i,
       |    CAST(sum(cnt) OVER (PARTITION BY g ORDER BY day
       |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS si,
       |    CAST(count(*) OVER (PARTITION BY g) AS BIGINT) AS n,
       |    CAST(sum(cnt) OVER (PARTITION BY g) AS BIGINT) AS sn
       |  FROM daily),
       |cand AS (
       |  SELECT *, (abs(si * (n - i) - (sn - si) * i) * 1000000)
       |              // (i * (n - i)) AS gap_ppm
       |  FROM pref WHERE i < n),
       |best AS (
       |  SELECT *, row_number() OVER (PARTITION BY g
       |    ORDER BY gap_ppm DESC, day ASC) AS rk FROM cand)
       |SELECT g AS $groupCol, day AS split_day, n AS n_days, gap_ppm,
       |  (si * 1000000) // i AS left_mean_ppm,
       |  ((sn - si) * 1000000) // (n - i) AS right_mean_ppm
       |FROM best WHERE rk = 1 ORDER BY $groupCol""".stripMargin

  /** Exact ordinary-least-squares trend per group over a (date, value)
    * series, all-integer: slope_e2 = ⌊100·(n·Σxy − Σx·Σy) / (n·Σx² −
    * (Σx)²)⌋ (truncated toward zero on BOTH engines — Spark `DIV` is
    * truncating, so the oracle spells `//` with a sign split).
    *
    * The input collapses to a per-(group, day) aggregate first (ONE
    * shuffle; the series is ≤ #groups·#days regardless of fact-table
    * size), x is days since the GROUP's first day (window min — keeps
    * every product inside int64 by construction: x ≤ series span, y ≤
    * daily total), and the five sufficient statistics are one
    * partial-aggregable groupBy. The slope math is then driver-free
    * per-group arithmetic. Groups need ≥ 2 distinct days (den > 0) or
    * they are dropped. */
  def olsTrend(df: DataFrame, groupCol: String, dateCol: String,
      valueCentsCol: Column): DataFrame = {
    val daily = df
      .groupBy(col(groupCol).as("g"), to_date(col(dateCol)).as("day"))
      .agg(sum(valueCentsCol).as("cents"))
      .withColumn("y", expr("cents DIV 100")) // whole units, bounds products
    val wMin = org.apache.spark.sql.expressions.Window.partitionBy(col("g"))
    val xy = daily
      .withColumn("x", datediff(col("day"), min(col("day")).over(wMin)).cast("long"))
    xy.groupBy(col("g"))
      .agg(count(lit(1)).as("n"), sum(col("x")).as("sx"), sum(col("y")).as("sy"),
        sum(col("x") * col("y")).as("sxy"), sum(col("x") * col("x")).as("sx2"))
      .filter(col("n") >= 2 && expr("n * sx2 - sx * sx") > 0)
      .select(col("g").as(groupCol), col("n").as("n_days"), col("sy").as("total_units"),
        expr("((n * sxy - sx * sy) * 100) DIV (n * sx2 - sx * sx)").as("slope_e2"))
      .orderBy(col(groupCol))
  }

  /** DuckDB respell of [[olsTrend]] — `valueCentsSql` must be the exact
    * integer-cents expression the Spark side used. */
  def olsTrendSql(table: String, groupCol: String, dateCol: String,
      valueCentsSql: String): String =
    s"""WITH daily AS (
       |  SELECT $groupCol AS g, CAST($dateCol AS DATE) AS day,
       |    CAST(sum($valueCentsSql) AS BIGINT) AS cents
       |  FROM $table GROUP BY 1, 2),
       |d2 AS (
       |  SELECT g, day,
       |    CASE WHEN cents >= 0 THEN cents // 100 ELSE -((-cents) // 100) END AS y,
       |    CAST(datediff('day', min(day) OVER (PARTITION BY g), day) AS BIGINT) AS x
       |  FROM daily),
       |s AS (
       |  SELECT g, CAST(count(*) AS BIGINT) AS n, CAST(sum(x) AS BIGINT) AS sx,
       |    CAST(sum(y) AS BIGINT) AS sy, CAST(sum(x * y) AS BIGINT) AS sxy,
       |    CAST(sum(x * x) AS BIGINT) AS sx2
       |  FROM d2 GROUP BY g)
       |SELECT g AS $groupCol, n AS n_days, sy AS total_units,
       |  CASE WHEN (n * sxy - sx * sy) >= 0
       |       THEN ((n * sxy - sx * sy) * 100) // (n * sx2 - sx * sx)
       |       ELSE -((-(n * sxy - sx * sy) * 100) // (n * sx2 - sx * sx)) END AS slope_e2
       |FROM s WHERE n >= 2 AND n * sx2 - sx * sx > 0
       |ORDER BY $groupCol""".stripMargin

  /** Time-decayed popularity with a ONE-DAY HALF-LIFE, exactly: the decay
    * factor 2^(-age_days) is a right shift of a 2²⁰ fixed-point unit weight
    * (ages past 20 days contribute 0), so the decayed score is an integer
    * SUM — partial-aggregable, merge-order-free, and bit-identical in the
    * oracle, where float exp-decay would be neither. Anchor = the corpus
    * max day (one broadcast scalar). */
  def decayedPopularity(df: DataFrame, groupCol: String, tsCol: String): DataFrame = {
    val daily = df
      .groupBy(col(groupCol).as("g"), to_date(col(tsCol)).as("day"))
      .agg(count(lit(1)).as("cnt"))
    val anchor = daily.agg(max(col("day")).as("maxd"))
    daily.crossJoin(broadcast(anchor))
      .withColumn("age", datediff(col("maxd"), col("day")))
      .withColumn("w", expr(
        "CASE WHEN age BETWEEN 0 AND 20" +
          " THEN shiftright(CAST(1048576 AS BIGINT), age) ELSE CAST(0 AS BIGINT) END"))
      .groupBy(col("g").as(groupCol))
      .agg(sum(col("cnt") * col("w")).as("decayed_q"), sum(col("cnt")).as("n_events"))
      .orderBy(col(groupCol))
  }

  /** DuckDB respell of [[decayedPopularity]]. */
  def decayedPopularitySql(table: String, groupCol: String, tsCol: String): String =
    s"""WITH daily AS (
       |  SELECT $groupCol AS g, CAST($tsCol AS DATE) AS day,
       |    CAST(count(*) AS BIGINT) AS cnt
       |  FROM $table GROUP BY 1, 2),
       |a AS (SELECT max(day) AS maxd FROM daily),
       |w AS (
       |  SELECT g, cnt,
       |    CASE WHEN datediff('day', day, maxd) BETWEEN 0 AND 20
       |         THEN 1048576 >> datediff('day', day, maxd) ELSE 0 END AS w
       |  FROM daily, a)
       |SELECT g AS $groupCol, CAST(sum(cnt * w) AS BIGINT) AS decayed_q,
       |  CAST(sum(cnt) AS BIGINT) AS n_events
       |FROM w GROUP BY g ORDER BY $groupCol""".stripMargin

  /** Exact LOWER weighted median per group: the smallest value whose
    * cumulative weight (in value order, ties by value only — cum is taken
    * after collapsing equal values) reaches ⌈W/2⌉. All-integer, one
    * shuffle to (group, value) with summed weights, then a bounded window
    * cumsum — no global sort, no sketch error (contrast x102's buckets:
    * this is the exact answer when the per-group distinct-value set is
    * window-sized). */
  def weightedMedian(df: DataFrame, groupCol: String, valueCol: String,
      weightCol: String): DataFrame = {
    val byVal = df
      .filter(col(weightCol).isNotNull && col(weightCol) > 0 && col(valueCol).isNotNull)
      .groupBy(col(groupCol).as("g"), col(valueCol).cast("long").as("v"))
      .agg(sum(col(weightCol).cast("long")).as("wv"))
    val wOrd = org.apache.spark.sql.expressions.Window
      .partitionBy(col("g")).orderBy(col("v"))
    val wAll = org.apache.spark.sql.expressions.Window.partitionBy(col("g"))
    byVal
      .withColumn("cum", sum(col("wv")).over(wOrd))
      .withColumn("tot", sum(col("wv")).over(wAll))
      .filter(col("cum") * 2 >= col("tot"))
      .groupBy(col("g").as(groupCol))
      .agg(min(col("v")).as("weighted_median"), max(col("tot")).as("total_weight"))
      .orderBy(col(groupCol))
  }

  /** Exact-scan decision stump (CART root split by Gini): the e9-quantized
    * score threshold minimizing the weighted Gini impurity of
    * (score ≤ t) vs (score > t), evaluated at EVERY distinct score via
    * prefix sums — same machinery as [[scoreAuc]]: the stream collapses to
    * per-distinct-score (n, npos), then each candidate is window
    * arithmetic. The impurity 2·posL·negL/nL + 2·posR·negR/nR is assembled
    * from EXACT integer counts in one pinned double shape (products < 2⁵³,
    * two correctly-rounded divisions, one sum — identical IEEE on both
    * engines), floored to an e9 grid; ties → smallest threshold. */
  def giniStump(df: DataFrame, scoreCol: String, labelCol: String): DataFrame = {
    val g = df
      .filter(col(scoreCol).isNotNull)
      .select(expr(s"CAST(FLOOR(CAST($scoreCol AS DOUBLE) * 1000000000.0D) AS BIGINT)").as("sq"),
        col(labelCol).cast("boolean").as("pos"))
      .groupBy(col("sq"))
      .agg(count(lit(1)).as("n"), sum(when(col("pos"), 1L).otherwise(0L)).as("np"))
    // inclusive prefix = exclusive prefix + own bucket; the class totals
    // come from the prefix kernel's own offsets collect (r19) — the
    // aggregate job + broadcast exchange that re-derived them from the
    // scanned relation were pure job-floor overhead, values identical
    val (pre, totals) = Par.exclusivePrefixWithTotals(
      g, col("sq").asc, Seq("n" -> "nb", "np" -> "pb"))
    val Seq(ntV, ptV) = totals
    val cand = pre
      .withColumn("nl", col("nb") + col("n"))
      .withColumn("pl", col("pb") + col("np"))
      .withColumn("nt", lit(ntV)).withColumn("pt", lit(ptV))
      .filter(col("nl") < col("nt")) // a split must leave a right side
      .withColumn("gini_e9", expr(
        """CAST(FLOOR((
          |  2.0D * CAST(pl AS DOUBLE) * CAST(nl - pl AS DOUBLE) / CAST(nl AS DOUBLE)
          |  + 2.0D * CAST(pt - pl AS DOUBLE) * CAST((nt - nl) - (pt - pl) AS DOUBLE)
          |      / CAST(nt - nl AS DOUBLE)
          |) * 1000000000.0D) AS BIGINT)""".stripMargin))
    cand.orderBy(col("gini_e9").asc, col("sq").asc).limit(1)
      .select(col("sq").as("threshold_e9"), col("gini_e9"),
        col("nl").as("n_left"), col("pl").as("pos_left"),
        (col("nt") - col("nl")).as("n_right"), (col("pt") - col("pl")).as("pos_right"))
  }

  /** Pearson chi-square test of independence between two categorical
    * columns, in the N·Σ O²/(r·c) − N spelling: every O, r, c is an exact
    * integer count, each cell contributes one pinned double term
    * (O²·N exact below 2⁵³ at these magnitudes, one correctly-rounded
    * division), and the statistic lands on the e6 grid — the x74 contract.
    * One groupBy builds the contingency table (cells ≤ |A|·|B| — catalog-
    * sized); marginals broadcast back. Emits dof = (|A|−1)(|B|−1). */
  def chiSquare(df: DataFrame, aCol: String, bCol: String): DataFrame = {
    val cells = df
      .filter(col(aCol).isNotNull && col(bCol).isNotNull)
      .groupBy(col(aCol).as("a"), col(bCol).as("b"))
      .agg(count(lit(1)).as("o"))
    val rm = cells.groupBy(col("a")).agg(sum(col("o")).as("ra"))
    val cm = cells.groupBy(col("b")).agg(sum(col("o")).as("cb"))
    val n = cells.agg(sum(col("o")).as("n"),
      countDistinct(col("a")).as("ka"), countDistinct(col("b")).as("kb"))
    cells
      .join(broadcast(rm), Seq("a"))
      .join(broadcast(cm), Seq("b"))
      .crossJoin(broadcast(n))
      .withColumn("term",
        expr("CAST(o AS DOUBLE) * CAST(o AS DOUBLE) * CAST(n AS DOUBLE)" +
          " / (CAST(ra AS DOUBLE) * CAST(cb AS DOUBLE))"))
      .groupBy(col("n"), col("ka"), col("kb"))
      .agg(sort_array(collect_list(struct(col("a"), col("b"), col("term")))).as("ts"))
      .select(col("n"),
        ((col("ka") - 1) * (col("kb") - 1)).as("dof"),
        expr("""CAST(FLOOR((aggregate(ts, CAST(0.0 AS DOUBLE), (acc, x) -> acc + x.term)
               |  - CAST(n AS DOUBLE)) * 1000000.0D) AS BIGINT)""".stripMargin)
          .as("chi2_e6"))
  }

  /** DuckDB respell of [[chiSquare]] — `relSql` emits (a, b) pairs. The
    * per-cell terms fold in SORTED (a, b) order on both engines, so the
    * double sum is order-pinned. */
  def chiSquareSql(relSql: String): String =
    s"""WITH r0 AS ($relSql),
       |cells AS (
       |  SELECT a, b, CAST(count(*) AS BIGINT) AS o FROM r0
       |  WHERE a IS NOT NULL AND b IS NOT NULL GROUP BY 1, 2),
       |rm AS (SELECT a, CAST(sum(o) AS BIGINT) AS ra FROM cells GROUP BY 1),
       |cm AS (SELECT b, CAST(sum(o) AS BIGINT) AS cb FROM cells GROUP BY 1),
       |nn AS (SELECT CAST(sum(o) AS BIGINT) AS n,
       |  CAST(count(DISTINCT a) AS BIGINT) AS ka,
       |  CAST(count(DISTINCT b) AS BIGINT) AS kb FROM cells),
       |t AS (
       |  SELECT cells.a, cells.b,
       |    CAST(o AS DOUBLE) * CAST(o AS DOUBLE) * CAST(n AS DOUBLE)
       |      / (CAST(ra AS DOUBLE) * CAST(cb AS DOUBLE)) AS term
       |  FROM cells JOIN rm USING (a) JOIN cm USING (b), nn)
       |SELECT nn.n, (nn.ka - 1) * (nn.kb - 1) AS dof,
       |  CAST(floor((list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
       |    (SELECT list(term ORDER BY a, b) FROM t)), (x, y) -> x + y)
       |    - CAST(nn.n AS DOUBLE)) * 1000000.0) AS BIGINT) AS chi2_e6
       |FROM nn""".stripMargin

  /** k-anonymity audit over quasi-identifier columns (Sweeney'02): group
    * rows into QI equivalence classes and report the dataset's k (the
    * smallest class), plus how many classes and rows sit below the target
    * `k` — the privacy gate a training-data release runs before shipping
    * anything derived from user attributes. One partial-aggregable
    * groupBy; class cardinality is bounded by the QI domain product. */
  def kAnonymity(df: DataFrame, qiCols: Seq[String], k: Long): DataFrame = {
    val classes = df
      .groupBy(qiCols.map(col): _*)
      .agg(count(lit(1)).as("cnt"))
    classes.agg(
      sum(col("cnt")).as("n_rows"),
      count(lit(1)).as("n_classes"),
      min(col("cnt")).as("k_anonymity"),
      sum(when(col("cnt") < k, 1L).otherwise(0L)).as("n_violating_classes"),
      sum(when(col("cnt") < k, col("cnt")).otherwise(0L)).as("n_rows_at_risk"))
      .withColumn("k_target", lit(k))
  }

  /** DuckDB respell of [[kAnonymity]] — `qiSql` are the quasi-identifier
    * expressions verbatim. */
  def kAnonymitySql(table: String, qiSql: Seq[String], k: Long): String =
    s"""WITH c AS (
       |  SELECT ${qiSql.mkString(", ")}, CAST(count(*) AS BIGINT) AS cnt
       |  FROM $table GROUP BY ${(1 to qiSql.size).mkString(", ")})
       |SELECT CAST(sum(cnt) AS BIGINT) AS n_rows,
       |  CAST(count(*) AS BIGINT) AS n_classes,
       |  CAST(min(cnt) AS BIGINT) AS k_anonymity,
       |  CAST(sum(CASE WHEN cnt < $k THEN 1 ELSE 0 END) AS BIGINT) AS n_violating_classes,
       |  CAST(sum(CASE WHEN cnt < $k THEN cnt ELSE 0 END) AS BIGINT) AS n_rows_at_risk,
       |  CAST($k AS BIGINT) AS k_target
       |FROM c""".stripMargin

  /** Day-of-week seasonal residuals: per (group, day) counts minus the
    * group's weekday mean (ppm grid — all-integer), fed to
    * [[robustOutliers]] for MAD-based anomaly flagging. Removing the
    * weekly cycle FIRST is what separates "weekend dip" from a real
    * incident — raw daily counts flag every Saturday. */
  def seasonalResiduals(df: DataFrame, groupCol: String, tsCol: String): DataFrame = {
    val daily = df
      .groupBy(col(groupCol).as("g"), to_date(col(tsCol)).as("day"))
      .agg(count(lit(1)).as("cnt"))
      .withColumn("dow", expr("weekday(day)")) // 0 = Monday, = DuckDB isodow-1
    val dowMean = daily.groupBy(col("g"), col("dow"))
      .agg(expr("(sum(cnt) * 1000000) DIV count(1)").as("dow_mean_ppm"))
    daily.join(dowMean, Seq("g", "dow"))
      .select(col("g"), col("day"),
        (col("cnt") * 1000000L - col("dow_mean_ppm")).as("resid_ppm"))
  }

  /** Exact nearest-rank quantile mapping (histogram matching, the
    * integer-exact cousin of scikit's quantile transform): each SOURCE row
    * at rank r of m maps to the TARGET distribution's value at rank
    * ⌈r·k/m⌉ — length-matched sampling across corpora without fitting any
    * parametric curve. Ranks order by (value, id) so ties are total; every
    * step is integer arithmetic.
    *
    * r9 de-globalization: the source rank is a distributed prefix scan
    * (no single-partition sort of the source relation), and the target's
    * idx→value function is rebuilt from its VALUE HISTOGRAM — ties in
    * target values map identically whatever their internal order, so
    * exploding each distinct value across its rank range
    * (below, below+cnt] reproduces row_number-by-value exactly — joined
    * on idx as a plain shuffle equi-join. No global window on either
    * side. r10 amortization: the source-rank and target-index scans are
    * BOTH per-value count prefixes ordered by value, so they union into
    * one side-tagged histogram and share a single
    * [[Par.exclusivePrefixBy]] pass (one exchange + checkpoint + driver
    * collect instead of two of each — the fixed job cost was 170× DuckDB
    * at sf0.1); the totals m and k read the checkpointed scan output, not
    * the corpora. */
  def quantileMap(source: DataFrame, target: DataFrame, idCol: String,
      valueCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val s = source.select(col(idCol), col(valueCol).cast("long").as("v"))
    val sHist = s.groupBy(col("v")).agg(count(lit(1)).as("cnt"))
      .withColumn("side", lit(0))
    val tHist = target.select(col(valueCol).cast("long").as("v"))
      .groupBy(col("v")).agg(count(lit(1)).as("cnt"))
      .withColumn("side", lit(1))
    // the totals m (source rows) and k (target rows) come from the prefix
    // kernel's own offsets collect — the two aggregate jobs + broadcast
    // exchanges that re-derived them from the scanned relation were pure
    // job-floor overhead (r19; the values are identical by construction)
    val (pre, totals) = Par.exclusivePrefixByWithTotals(
      sHist.unionByName(tHist), "side", col("v").asc, Seq("cnt" -> "below"))
    val sPre = pre.filter(col("side") === 0)
      .select(col("v").as("__prev"), col("below"))
    val ranked = s.join(sPre, col("v") <=> col("__prev"))
      .withColumn("r", col("below") + row_number()
        .over(Window.partitionBy(col("v")).orderBy(col(idCol))).cast("long"))
      .drop("__prev", "below")
    val m = totals.getOrElse(0, Seq(0L)).head
    val k = totals.getOrElse(1, Seq(0L)).head
    val tPre = pre.filter(col("side") === 1)
    val tIdx = tPre.select(col("v").as("tv"),
      explode(sequence(col("below") + 1, col("below") + col("cnt"))).as("idx"))
    ranked
      .withColumn("idx", expr(s"(r * ${k}L + ${m}L - 1) DIV ${m}L"))
      .join(tIdx, Seq("idx"))
      .select(col(idCol), col("v").as("value"), col("r").as("rank"),
        col("tv").as("mapped_value"))
      .orderBy(col(idCol))
  }

  /** DuckDB respell of [[quantileMap]] — `sourceSql`/`targetSql` emit
    * (id, v) relations. */
  def quantileMapSql(sourceSql: String, targetSql: String, idCol: String): String =
    s"""WITH s0 AS ($sourceSql),
       |t0 AS ($targetSql),
       |s AS (
       |  SELECT id, v,
       |    CAST(row_number() OVER (ORDER BY v, id) AS BIGINT) AS r,
       |    CAST(count(*) OVER () AS BIGINT) AS m
       |  FROM s0),
       |t AS (
       |  SELECT v AS tv,
       |    CAST(row_number() OVER (ORDER BY v, id) AS BIGINT) AS idx,
       |    CAST(count(*) OVER () AS BIGINT) AS k
       |  FROM t0)
       |SELECT s.id AS $idCol, s.v AS value, s.r AS rank, t.tv AS mapped_value
       |FROM s CROSS JOIN (SELECT max(k) AS k FROM t) kk
       |JOIN t ON t.idx = (s.r * kk.k + s.m - 1) // s.m
       |ORDER BY s.id""".stripMargin

  /** DuckDB respell of [[giniStump]] — `scoredRelSql` must emit (score,
    * pos) exactly as the Spark side computed them. */
  def giniStumpSql(scoredRelSql: String): String =
    s"""WITH sc AS ($scoredRelSql),
       |g AS (
       |  SELECT CAST(floor(CAST(score AS DOUBLE) * 1000000000.0) AS BIGINT) AS sq,
       |    CAST(count(*) AS BIGINT) AS n,
       |    CAST(sum(CASE WHEN pos THEN 1 ELSE 0 END) AS BIGINT) AS np
       |  FROM sc WHERE score IS NOT NULL GROUP BY 1),
       |c AS (
       |  SELECT sq,
       |    CAST(sum(n) OVER (ORDER BY sq ROWS UNBOUNDED PRECEDING) AS BIGINT) AS nl,
       |    CAST(sum(np) OVER (ORDER BY sq ROWS UNBOUNDED PRECEDING) AS BIGINT) AS pl,
       |    CAST(sum(n) OVER () AS BIGINT) AS nt,
       |    CAST(sum(np) OVER () AS BIGINT) AS pt
       |  FROM g),
       |k AS (
       |  SELECT *, CAST(floor((
       |      2.0 * CAST(pl AS DOUBLE) * CAST(nl - pl AS DOUBLE) / CAST(nl AS DOUBLE)
       |      + 2.0 * CAST(pt - pl AS DOUBLE) * CAST((nt - nl) - (pt - pl) AS DOUBLE)
       |          / CAST(nt - nl AS DOUBLE)
       |    ) * 1000000000.0) AS BIGINT) AS gini_e9
       |  FROM c WHERE nl < nt)
       |SELECT sq AS threshold_e9, gini_e9, nl AS n_left, pl AS pos_left,
       |  nt - nl AS n_right, pt - pl AS pos_right
       |FROM k ORDER BY gini_e9 ASC, sq ASC LIMIT 1""".stripMargin

  /** DuckDB respell of [[weightedMedian]]. */
  def weightedMedianSql(table: String, groupCol: String, valueSql: String,
      weightSql: String): String =
    s"""WITH base AS (
       |  SELECT $groupCol AS g, CAST($valueSql AS BIGINT) AS v,
       |    CAST($weightSql AS BIGINT) AS w
       |  FROM $table
       |  WHERE ($weightSql) IS NOT NULL AND ($weightSql) > 0
       |    AND ($valueSql) IS NOT NULL),
       |bv AS (SELECT g, v, CAST(sum(w) AS BIGINT) AS wv FROM base GROUP BY 1, 2),
       |c AS (
       |  SELECT g, v, wv,
       |    CAST(sum(wv) OVER (PARTITION BY g ORDER BY v
       |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum,
       |    CAST(sum(wv) OVER (PARTITION BY g) AS BIGINT) AS tot
       |  FROM bv)
       |SELECT g AS $groupCol, CAST(min(v) AS BIGINT) AS weighted_median,
       |  CAST(max(tot) AS BIGINT) AS total_weight
       |FROM c WHERE cum * 2 >= tot GROUP BY g ORDER BY $groupCol""".stripMargin

  /** Benford first-digit audit — the classic fabricated-numbers screen run
    * over any positive integer measure (here: order totals in cents). One
    * row per digit 1–9: observed count, observed frequency (ppm), Benford's
    * expected log₁₀(1+1/d) frequency as a BAKED ppm constant (no runtime
    * libm — the nine constants are mathematical, not data), and the signed
    * deviation. Exact integers end to end; cnt·10⁶ stays int64 below ~9·10¹²
    * rows per group, past which the obs_ppm leg moves to DECIMAL.
    *
    * Scale shape: first digit is a map-side substring of the cast value, the
    * digit rollup is a 9-row partial-aggregable groupBy, and the digit grid
    * joins broadcast — nothing here outgrows a single executor. */
  private val benfordPpm: Seq[(Int, Long)] = Seq(
    1 -> 301029L, 2 -> 176091L, 3 -> 124938L, 4 -> 96910L, 5 -> 79181L,
    6 -> 66946L, 7 -> 57991L, 8 -> 51152L, 9 -> 45757L)

  def benfordAudit(df: DataFrame, valueCents: Column): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val obs = df.select(valueCents.cast("long").as("v"))
      .filter(col("v") > 0L)
      .select(substring(col("v").cast("string"), 1, 1).cast("int").as("digit"))
      .groupBy(col("digit")).agg(count(lit(1)).as("n_obs"))
    val grid = benfordPpm.toDF("digit", "exp_ppm")
    val n = obs.agg(sum(col("n_obs")).as("n_total"))
    broadcast(grid).join(obs, Seq("digit"), "left")
      .select(col("digit"), coalesce(col("n_obs"), lit(0L)).as("n_obs"), col("exp_ppm"))
      .crossJoin(broadcast(n))
      .select(col("digit").cast("long").as("digit"), col("n_obs"),
        when(col("n_total").isNull || col("n_total") === 0L, 0L)
          .otherwise(expr("(n_obs * 1000000) div n_total")).as("obs_ppm"),
        col("exp_ppm"))
      .withColumn("dev_ppm", col("obs_ppm") - col("exp_ppm"))
      .orderBy(col("digit"))
  }

  /** The Benford oracle: same digit extraction, grid join, and integer ppm. */
  def benfordAuditSql(table: String, valueCentsSql: String): String = {
    val grid = benfordPpm.map { case (d, p) => s"($d, ${p})" }.mkString(", ")
    s"""WITH v AS (
       |  SELECT CAST($valueCentsSql AS BIGINT) AS v FROM $table),
       |obs AS (
       |  SELECT CAST(substr(CAST(v AS VARCHAR), 1, 1) AS INT) AS digit,
       |    CAST(count(*) AS BIGINT) AS n_obs
       |  FROM v WHERE v > 0 GROUP BY 1),
       |grid(digit, exp_ppm) AS (VALUES $grid),
       |n AS (SELECT sum(n_obs) AS n_total FROM obs)
       |SELECT CAST(g.digit AS BIGINT) AS digit,
       |  coalesce(o.n_obs, 0) AS n_obs,
       |  CAST(CASE WHEN n.n_total IS NULL OR n.n_total = 0 THEN 0
       |       ELSE (coalesce(o.n_obs, 0) * 1000000) // n.n_total END AS BIGINT) AS obs_ppm,
       |  CAST(g.exp_ppm AS BIGINT) AS exp_ppm,
       |  CAST(CASE WHEN n.n_total IS NULL OR n.n_total = 0 THEN 0
       |       ELSE (coalesce(o.n_obs, 0) * 1000000) // n.n_total END - g.exp_ppm
       |    AS BIGINT) AS dev_ppm
       |FROM grid g LEFT JOIN obs o ON g.digit = o.digit, n
       |ORDER BY digit""".stripMargin
  }

  /** Exact mutual information between two categorical columns, in nats —
    * the dependence MAGNITUDE companion to [[chiSquare]]'s yes/no test
    * (how much does knowing the source tell you about the language?).
    * MI = Σ_cells (c/N)·ln(c·N/(r·s)), assembled as Σ c·(ln c + ln N −
    * ln r − ln s) / N so every `ln` argument is an exact integer count
    * (x94's discipline); cells fold in sorted (a, b) order on both engines
    * and the result quantizes to e9. Output: one row per `a` value with its
    * MI contribution, plus a grand-total row labeled a = NULL — a label no
    * CAST-to-string data value can produce, so it cannot collide with a
    * real category (the r8 advice: 'TOTAL' could). Rows with a NULL in
    * either column are excluded up front — they'd otherwise inflate N
    * while the margin equi-joins dropped their cells, silently biasing
    * every probability (the r8 advice finding).
    *
    * Scale shape: cells/margins are partial-aggregable groupBys bounded by
    * the category cross product (catalog-sized); margins join broadcast. */
  def mutualInformation(df: DataFrame, aCol: String, bCol: String): DataFrame = {
    val cells = df.select(col(aCol).cast("string").as("a"), col(bCol).cast("string").as("b"))
      .filter(col("a").isNotNull && col("b").isNotNull)
      .groupBy(col("a"), col("b")).agg(count(lit(1)).as("c"))
    val ra = cells.groupBy(col("a")).agg(sum(col("c")).as("r"))
    val sb = cells.groupBy(col("b")).agg(sum(col("c")).as("s"))
    val n = cells.agg(sum(col("c")).as("n"))
    val terms = cells
      .join(broadcast(ra), Seq("a")).join(broadcast(sb), Seq("b"))
      .crossJoin(broadcast(n))
      .select(col("a"), col("b"), col("c"), col("n"),
        (col("c").cast("double") *
          (log(col("c").cast("double")) + log(col("n").cast("double")) -
            log(col("r").cast("double")) - log(col("s").cast("double")))).as("term"))
    val perA = terms.groupBy(col("a"), col("n"))
      .agg(count(lit(1)).as("n_cells"),
        sort_array(collect_list(struct(col("b"), col("term")))).as("e"))
      .select(col("a"), col("n_cells"),
        floor(expr("aggregate(e, CAST(0.0 AS DOUBLE), (acc, p) -> acc + p.term)") /
          col("n").cast("double") * 1e9).cast("long").as("mi_e9"))
    val total = terms.groupBy(col("n"))
      .agg(count(lit(1)).as("n_cells"),
        sort_array(collect_list(struct(col("a"), col("b"), col("term")))).as("e"))
      .select(lit(null).cast("string").as("a"), col("n_cells"),
        floor(expr("aggregate(e, CAST(0.0 AS DOUBLE), (acc, p) -> acc + p.term)") /
          col("n").cast("double") * 1e9).cast("long").as("mi_e9"))
    perA.unionByName(total).orderBy(col("a").asc_nulls_last)
  }

  /** The MI oracle over an arbitrary two-column relation `relSql`
    * (columns `a`, `b`). */
  def mutualInformationSql(relSql: String): String =
    s"""WITH rel AS ($relSql),
       |cells AS (
       |  SELECT CAST(a AS VARCHAR) AS a, CAST(b AS VARCHAR) AS b,
       |    CAST(count(*) AS BIGINT) AS c
       |  FROM rel WHERE a IS NOT NULL AND b IS NOT NULL GROUP BY 1, 2),
       |ra AS (SELECT a, CAST(sum(c) AS BIGINT) AS r FROM cells GROUP BY 1),
       |sb AS (SELECT b, CAST(sum(c) AS BIGINT) AS s FROM cells GROUP BY 1),
       |n AS (SELECT CAST(sum(c) AS BIGINT) AS n FROM cells),
       |terms AS (
       |  SELECT cells.a, cells.b, cells.c, n.n,
       |    CAST(cells.c AS DOUBLE) *
       |      (ln(CAST(cells.c AS DOUBLE)) + ln(CAST(n.n AS DOUBLE))
       |        - ln(CAST(ra.r AS DOUBLE)) - ln(CAST(sb.s AS DOUBLE))) AS term
       |  FROM cells JOIN ra USING (a) JOIN sb USING (b), n),
       |pa AS (
       |  SELECT a, CAST(count(*) AS BIGINT) AS n_cells,
       |    CAST(floor(list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
       |      list(term ORDER BY b, term)), (acc, x) -> acc + x)
       |      / CAST(any_value(n) AS DOUBLE) * 1000000000.0) AS BIGINT) AS mi_e9
       |  FROM terms GROUP BY a),
       |tot AS (
       |  SELECT CAST(NULL AS VARCHAR) AS a, CAST(count(*) AS BIGINT) AS n_cells,
       |    CAST(floor(list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
       |      list(term ORDER BY a, b, term)), (acc, x) -> acc + x)
       |      / CAST(any_value(n) AS DOUBLE) * 1000000000.0) AS BIGINT) AS mi_e9
       |  FROM terms)
       |SELECT a, n_cells, mi_e9 FROM pa
       |UNION ALL SELECT a, n_cells, mi_e9 FROM tot
       |ORDER BY a NULLS LAST""".stripMargin
}
