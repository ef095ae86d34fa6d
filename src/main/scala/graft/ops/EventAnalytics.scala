package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Behavioral analytics over the events stream table — funnel conversion and
  * cohort retention (reference has no analogue; extension per the build
  * brief's analytics mandate).
  *
  * Scale notes: both operators collapse the event log to per-user rows with
  * ONE partial-aggregable groupBy (conditional min/max aggregates merge
  * map-side), so the wide shuffle carries |users| rows, not |events|. All
  * time arithmetic is integer µs/epoch-seconds — exactly SQL-expressible.
  */
object EventAnalytics {

  /** Conversion funnel across an ordered stage sequence: stage i counts the
    * users whose earliest `stages(i)` event happened AFTER their earliest
    * `stages(i-1)` event (strict event-time progression — a purchase logged
    * before any view does not convert). Emits one row per stage with the
    * user count and the conversion rate numerator/denominator as exact
    * integers.
    *
    * One groupBy(user) with a conditional min per stage, then one tiny
    * aggregate over |users| rows — the event log itself shuffles once,
    * collapsed map-side to (user, min-ts per stage). */
  def conversionFunnel(events: DataFrame, userCol: String, typeCol: String,
      tsCol: String, stages: Seq[String]): DataFrame = {
    require(stages.size >= 2, "a funnel needs at least two stages")
    val mins = stages.zipWithIndex.map { case (st, i) =>
      min(when(col(typeCol) === st, col(tsCol))).as(s"__t$i")
    }
    val perUser = events.groupBy(col(userCol)).agg(mins.head, mins.tail: _*)
    // reached(i): every stage ≤ i present, strictly increasing first-times
    val reached = stages.indices.map { i =>
      (0 to i).map(j => col(s"__t$j").isNotNull)
        .reduce(_ && _) &&
        (1 to i).map(j => col(s"__t${j - 1}") < col(s"__t$j"))
          .foldLeft(lit(true))(_ && _)
    }
    // coalesce: a global agg over ZERO users yields NULL sums — an empty
    // log must report an all-zero funnel, not a null one
    val counts = reached.zipWithIndex.map { case (p, i) =>
      coalesce(sum(when(p, 1L).otherwise(0L)), lit(0L)).as(s"__n$i")
    }
    val one = perUser.agg(counts.head, counts.tail: _*)
    val stacked = stages.zipWithIndex
      .map { case (st, i) => s"$i, '$st', `__n$i`" }.mkString(", ")
    one.selectExpr(
      s"stack(${stages.size}, $stacked) AS (stage_idx, stage, n_users)")
  }

  /** Event-type transition matrix: counts of consecutive (prev → next)
    * event-type pairs along each user's event-time-ordered timeline — the
    * Markov-chain sufficient statistics behind "what do users do after X"
    * and anomaly screens (a transition that never occurs organically).
    * Ordering ties break on an id column so the lag is deterministic.
    * One per-user window shuffle of (user, type, ts, id); the transition
    * count is a partial-aggregable groupBy on a |types|² key domain. */
  def eventTransitions(events: DataFrame, userCol: String, typeCol: String,
      tsCol: String, idCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(userCol)).orderBy(col(tsCol), col(idCol))
    events
      .withColumn("__prev", lag(col(typeCol), 1).over(w))
      .filter(col("__prev").isNotNull)
      .groupBy(col("__prev").as("prev_type"), col(typeCol).as("next_type"))
      .agg(count(lit(1)).as("n_transitions"))
  }

  /** Dense hourly series per group with zero-filled gaps — the time-series
    * densification every downstream windowing/charting step assumes: a
    * (group, epoch-hour) grid spanning [min, max] of the OBSERVED hours,
    * left-joined with the actual counts, absent cells zero. Hours are
    * integer epoch-hour indexes (`unix_micros div 3_600_000_000`) — no
    * calendar/timezone semantics, exactly SQL-expressible.
    *
    * Scale shape: the observed counts are one partial-aggregable groupBy
    * (the event log collapses map-side to |groups|·|hours| cells); the
    * dense grid is GENERATED (groups × sequence(min,max) — a broadcast-
    * sized frame at any corpus scale, since both factors are domain-sized,
    * not row-sized), and the counts join it by hash. The raw log never
    * shuffles twice. */
  def gapFillHourly(events: DataFrame, groupCol: String, tsCol: String): DataFrame = {
    val hour = expr(s"unix_micros($tsCol) div 3600000000")
    val counts = events
      .groupBy(col(groupCol).as("grp"), hour.as("hour_idx"))
      .agg(count(lit(1)).as("n_events"))
    val bounds = counts.agg(
      min(col("hour_idx")).as("lo"), max(col("hour_idx")).as("hi"))
    val grid = counts.select(col("grp")).distinct()
      .crossJoin(broadcast(bounds))
      .select(col("grp"), explode(sequence(col("lo"), col("hi"))).as("hour_idx"))
    grid.join(counts, Seq("grp", "hour_idx"), "left")
      .select(col("grp"), col("hour_idx"),
        coalesce(col("n_events"), lit(0L)).as("n_events"))
  }

  /** Weekly cohort retention matrix: users are cohorted by the epoch week
    * (`unix_micros(ts) div 604_800_000_000` — pure integer µs division, no
    * calendar/timezone/float semantics to disagree on) of their FIRST event;
    * cell (cohort, offset) counts the cohort's distinct users active
    * `offset` weeks later. Offset 0 is the cohort size by construction.
    *
    * Two shuffles, both narrow: first-event-week per user (partial-agg
    * min over |users| rows), then the distinct-user count per
    * (cohort, offset) — the events relation joins the per-user cohort map
    * as a BROADCAST (users are catalog-sized next to the event log), so the
    * log itself never re-shuffles on the join key. */
  def retentionCohorts(events: DataFrame, userCol: String, tsCol: String): DataFrame = {
    val week = expr(s"unix_micros($tsCol) div 604800000000")
    val cohorts = events
      .groupBy(col(userCol).as("__u"))
      .agg(min(week).as("cohort_week"))
    events
      .select(col(userCol).as("__u"), week.as("__w"))
      .join(broadcast(cohorts), Seq("__u"))
      .groupBy(col("cohort_week"), (col("__w") - col("cohort_week")).as("week_offset"))
      .agg(countDistinct(col("__u")).as("n_active_users"))
  }

  /** Per-key hourly rate limiting: keep the first `maxPerHour` events per
    * (key, event-time hour), earliest-first with the unique event id as
    * tiebreak — the ingestion-admission op that stops one hot client from
    * flooding a window. Kept rows pass through unchanged.
    *
    * Scale shape: the window partitions on (key, hour) — bounded-size
    * partitions by construction (one client-hour), so no global sort and
    * no skew bomb; a rank-only window over a keyed partition is the
    * streaming-friendly spelling (its stateful twin is a per-key counter
    * with an hour-rollover watermark). */
  def rateLimit(events: DataFrame, keyCol: String, tsCol: String,
      idCol: String, maxPerHour: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window
      .partitionBy(col(keyCol), date_trunc("hour", col(tsCol)))
      .orderBy(col(tsCol), col(idCol))
    events
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= maxPerHour)
      .drop("__rn")
  }

  /** Keyed windowed dedup summary: collapse repeats of (key, type) inside
    * an epoch-aligned `slotSeconds` tumbling slot and report, per type, how
    * much of the stream was duplicate chatter. The slot id is integer
    * arithmetic on event-time micros (`⌊µs / slot·10⁶⌋` — epoch-aligned
    * exactly like Spark's `window()` buckets), so the whole summary is one
    * partial-aggregable groupBy + a distinct count on (key, slot) — no
    * window function, no sort, and the oracle reproduces it bit-for-bit.
    *
    * This is the BATCH TWIN of
    * [[graft.streaming.EventStreams.windowedKeyDedup]]: same key, same slot
    * arithmetic, so the streamed kept-count lands on the identical total —
    * the batch/stream parity contract (Dataflow-model style) that makes a
    * lambda-architecture reconciliation meaningful. */
  def windowDedupSummary(events: DataFrame, keyCol: String, typeCol: String,
      tsCol: String, slotSeconds: Long): DataFrame = {
    val slotMicros = slotSeconds * 1000000L
    events
      .select(col(typeCol).as("event_type"), col(keyCol).as("k"),
        unix_micros(col(tsCol)).as("__us"))
      .withColumn("slot", expr(s"__us DIV $slotMicros")) // integer div, not `/`
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        countDistinct(col("k"), col("slot")).as("n_kept"))
      .select(col("event_type"), col("n_events"), col("n_kept"),
        expr("((n_events - n_kept) * 1000000) DIV n_events").as("drop_ppm"))
      .orderBy(col("event_type"))
  }

  /** Linear multi-touch attribution: every `convType` event credits the
    * same user's `touchType` events in the preceding `windowSeconds`
    * EQUALLY, on an exact-integer ppm grid — each touch gets
    * ⌊10⁶/n⌋ ppm and the EARLIEST touch (ts, then id) absorbs the
    * remainder, so every conversion's credit sums to exactly 10⁶ and the
    * oracle reproduces the split bit-for-bit. Reported per touch
    * hour-of-day (the "when do converting touches happen" curve).
    *
    * Scale shape: the touch⋈conversion join is an equi-join on the user
    * key with the time range as a residual predicate (the x42 interval-
    * join kernel — state per key bounded by the window); the credit split
    * is a window partitioned by CONVERSION id, bounded by touches-per-
    * conversion, never global. */
  def linearAttribution(events: DataFrame, userCol: String, typeCol: String,
      tsCol: String, idCol: String, touchType: String, convType: String,
      windowSeconds: Long): DataFrame = {
    val wUs = windowSeconds * 1000000L
    val t = events.filter(col(typeCol) === touchType)
      .select(col(userCol).as("u"), col(tsCol).as("tts"),
        unix_micros(col(tsCol)).as("tus"), col(idCol).as("tid"))
    val c = events.filter(col(typeCol) === convType)
      .select(col(userCol).as("u"), unix_micros(col(tsCol)).as("cus"),
        col(idCol).as("cid"))
    val j = t.join(c, Seq("u"))
      .filter(col("tus") >= col("cus") - wUs && col("tus") < col("cus"))
    val wConv = org.apache.spark.sql.expressions.Window.partitionBy(col("cid"))
    val wRank = wConv.orderBy(col("tus"), col("tid"))
    j.withColumn("n", count(lit(1)).over(wConv))
      .withColumn("rk", row_number().over(wRank))
      .withColumn("credit_ppm",
        expr("1000000 DIV n + IF(rk = 1, 1000000 % n, 0)"))
      .groupBy(hour(col("tts")).cast("long").as("touch_hour"))
      .agg(count(lit(1)).as("n_credits"), sum(col("credit_ppm")).as("credit_ppm_sum"))
      .orderBy(col("touch_hour"))
  }

  /** DuckDB respell of [[linearAttribution]]. */
  def linearAttributionSql(table: String, userCol: String, typeCol: String,
      tsCol: String, idCol: String, touchType: String, convType: String,
      windowSeconds: Long): String =
    s"""WITH t AS (
       |  SELECT $userCol AS u, $tsCol AS tts, epoch_us($tsCol) AS tus,
       |    $idCol AS tid
       |  FROM $table WHERE $typeCol = '$touchType'),
       |c AS (
       |  SELECT $userCol AS u, epoch_us($tsCol) AS cus, $idCol AS cid
       |  FROM $table WHERE $typeCol = '$convType'),
       |j AS (
       |  SELECT t.*, c.cid FROM t JOIN c ON t.u = c.u
       |  AND t.tus >= c.cus - ${windowSeconds * 1000000L} AND t.tus < c.cus),
       |k AS (
       |  SELECT tts,
       |    CAST(count(*) OVER (PARTITION BY cid) AS BIGINT) AS n,
       |    row_number() OVER (PARTITION BY cid ORDER BY tus, tid) AS rk
       |  FROM j),
       |cr AS (
       |  SELECT tts, 1000000 // n
       |    + CASE WHEN rk = 1 THEN 1000000 % n ELSE 0 END AS credit_ppm
       |  FROM k)
       |SELECT CAST(hour(tts) AS BIGINT) AS touch_hour,
       |  CAST(count(*) AS BIGINT) AS n_credits,
       |  CAST(sum(credit_ppm) AS BIGINT) AS credit_ppm_sum
       |FROM cr GROUP BY 1 ORDER BY touch_hour""".stripMargin

  /** Linear-interpolation gap fill of a per-group daily integer series —
    * the VALUE cousin of [[gapFillHourly]]'s zero-fill (a count of zero is
    * the truth for missing COUNT data; for a metric, the truthful guess is
    * the line between its neighbors). Calendar days come from a
    * per-group `sequence(min, max)`; interior gaps get the exact integer
    * lerp v_p + ⌊(v_n − v_p)·(d − d_p) / (d_n − d_p)⌋ (sign-split so
    * truncation matches the oracle); edge gaps clamp to the nearest
    * observation. One shuffle to the daily grain, then per-group windows
    * bounded by the calendar span. */
  def gapFillLinear(events: DataFrame, groupCol: String, tsCol: String,
      valueCents: org.apache.spark.sql.Column): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val daily = events
      .groupBy(col(groupCol).as("g"), to_date(col(tsCol)).as("day"))
      .agg(sum(valueCents).as("v"))
    val cal = daily.groupBy(col("g"))
      .agg(min(col("day")).as("d0"), max(col("day")).as("d1"))
      .select(col("g"),
        explode(expr("sequence(d0, d1, interval 1 day)")).as("day"))
    val full = cal.join(daily, Seq("g", "day"), "left")
    val wPrev = Window.partitionBy(col("g")).orderBy(col("day"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val wNext = Window.partitionBy(col("g")).orderBy(col("day"))
      .rowsBetween(1, Window.unboundedFollowing)
    val obs = when(col("v").isNotNull, struct(col("day").as("d"), col("v").as("x")))
    full
      .withColumn("p", last(obs, ignoreNulls = true).over(wPrev))
      .withColumn("nx", first(obs, ignoreNulls = true).over(wNext))
      .withColumn("interp", expr(
        """CASE WHEN p IS NULL OR nx IS NULL THEN NULL ELSE
          |  p.x + (CASE WHEN nx.x >= p.x
          |    THEN ((nx.x - p.x) * datediff(day, p.d)) DIV datediff(nx.d, p.d)
          |    ELSE -(((p.x - nx.x) * datediff(day, p.d)) DIV datediff(nx.d, p.d))
          |  END) END""".stripMargin))
      .select(col("g").as(groupCol), col("day"),
        coalesce(col("v"), col("interp"), col("p.x"), col("nx.x")).as("filled_cents"),
        col("v").isNull.as("was_filled"))
      .orderBy(col(groupCol), col("day"))
  }

  /** DuckDB respell of [[gapFillLinear]] — `eventsSql` emits (g, day, v)
    * at the daily grain. */
  def gapFillLinearSql(dailySql: String, groupCol: String): String =
    s"""WITH daily AS ($dailySql),
       |cal AS (
       |  SELECT g, unnest(generate_series(min(day), max(day),
       |    INTERVAL 1 DAY))::DATE AS day
       |  FROM daily GROUP BY g),
       |full0 AS (
       |  SELECT cal.g, cal.day, daily.v
       |  FROM cal LEFT JOIN daily ON daily.g = cal.g AND daily.day = cal.day),
       |w AS (
       |  SELECT g, day, v,
       |    last_value(CASE WHEN v IS NOT NULL THEN day END IGNORE NULLS)
       |      OVER (PARTITION BY g ORDER BY day
       |            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pd,
       |    last_value(CASE WHEN v IS NOT NULL THEN v END IGNORE NULLS)
       |      OVER (PARTITION BY g ORDER BY day
       |            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pv,
       |    first_value(CASE WHEN v IS NOT NULL THEN day END IGNORE NULLS)
       |      OVER (PARTITION BY g ORDER BY day
       |            ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING) AS nd,
       |    first_value(CASE WHEN v IS NOT NULL THEN v END IGNORE NULLS)
       |      OVER (PARTITION BY g ORDER BY day
       |            ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING) AS nv
       |  FROM full0)
       |SELECT g AS $groupCol, day,
       |  CAST(coalesce(v,
       |    CASE WHEN pd IS NULL OR nd IS NULL THEN NULL ELSE
       |      pv + (CASE WHEN nv >= pv
       |        THEN ((nv - pv) * (day - pd)) // (nd - pd)
       |        ELSE -(((pv - nv) * (day - pd)) // (nd - pd)) END) END,
       |    pv, nv) AS BIGINT) AS filled_cents,
       |  v IS NULL AS was_filled
       |FROM w ORDER BY $groupCol, day""".stripMargin

  /** Frequent behavioral sequences: per-user event-type streams cut into
    * fixed-length sliding windows (length `winLen`, stride `stride` — the
    * sequence-model training-window shape), then the top-k window PATTERNS
    * by support. Per-user state is one bounded array (array_sort +
    * higher-order slices — no explode before the per-user fold), so the
    * heavy operation is the final pattern count, which map-side combines.
    * Deterministic: events order by (event time, id); ties on support
    * break by pattern text. */
  def sequenceWindows(events: DataFrame, userCol: String, typeCol: String,
      tsCol: String, idCol: String, winLen: Int = 8, stride: Int = 4,
      topK: Int = 20): DataFrame = {
    events
      .select(col(userCol).as("u"),
        struct(unix_micros(col(tsCol)).as("us"), col(idCol).as("eid"),
          col(typeCol).as("et")).as("e"))
      .groupBy(col("u"))
      .agg(array_sort(collect_list(col("e"))).as("es"))
      .withColumn("n", size(col("es")))
      .filter(col("n") >= winLen)
      .withColumn("pattern", explode(expr(
        s"""transform(sequence(0, (n - $winLen) DIV $stride),
           |  i -> array_join(transform(slice(es, i * $stride + 1, $winLen),
           |                            x -> x.et), '>'))""".stripMargin)))
      .groupBy(col("pattern")).agg(count(lit(1)).as("n_windows"))
      .orderBy(col("n_windows").desc, col("pattern"))
      .limit(topK)
  }

  /** DuckDB respell of [[sequenceWindows]]. */
  def sequenceWindowsSql(table: String, userCol: String, typeCol: String,
      tsCol: String, idCol: String, winLen: Int = 8, stride: Int = 4,
      topK: Int = 20): String =
    s"""WITH pu AS (
       |  SELECT $userCol AS u,
       |    list($typeCol ORDER BY epoch_us($tsCol), $idCol) AS es
       |  FROM $table GROUP BY 1),
       |f AS (SELECT es, len(es) AS n FROM pu WHERE len(es) >= $winLen),
       |w AS (
       |  SELECT unnest(list_transform(range(0, (n - $winLen) // $stride + 1),
       |    i -> array_to_string(es[CAST(i * $stride + 1 AS INT)
       |                          : CAST(i * $stride + $winLen AS INT)], '>')))
       |    AS pattern
       |  FROM f)
       |SELECT pattern, CAST(count(*) AS BIGINT) AS n_windows
       |FROM w GROUP BY 1 ORDER BY n_windows DESC, pattern LIMIT $topK""".stripMargin

  /** DuckDB respell of [[windowDedupSummary]]. */
  def windowDedupSummarySql(table: String, keyCol: String, typeCol: String,
      tsCol: String, slotSeconds: Long): String =
    s"""WITH k AS (
       |  SELECT $typeCol AS event_type, $keyCol AS k,
       |    epoch_us($tsCol) // ${slotSeconds * 1000000L} AS slot
       |  FROM $table),
       |d AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n_events
       |      FROM k GROUP BY 1),
       |u AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n_kept
       |      FROM (SELECT DISTINCT event_type, k, slot FROM k) GROUP BY 1)
       |SELECT event_type, n_events, n_kept,
       |  ((n_events - n_kept) * 1000000) // n_events AS drop_ppm
       |FROM d JOIN u USING (event_type) ORDER BY event_type""".stripMargin

  /** Multi-model conversion ATTRIBUTION: for every `convType` event, the
    * touchpoints the same user produced in the `lookbackUs` window before
    * it, credited three ways at once — first-touch (1 credit to the
    * earliest), last-touch (1 to the latest), and linear (10⁶ DIV n ppm to
    * each of the n touches; integer division, so credits are exact and the
    * remainder is deliberately dropped identically on both engines). Ties
    * on timestamp break by event id. Output: one row per touch event type
    * — (event_type, first_touch, last_touch, linear_ppm).
    *
    * Scale shape: the touch–conversion pairing is one user-keyed equi-join
    * with a range predicate (per-user activity × per-user conversions —
    * user-bounded fanout, the as-of-join family's shape, never a global
    * cross); the credit windows are partitioned per CONVERSION (window
    * size = touches in one lookback, bounded by user activity); the final
    * rollups carry |event types| keys. */
  def attributionReport(events: DataFrame, userCol: String, idCol: String,
      typeCol: String, tsCol: String, convType: String,
      lookbackUs: Long): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val base = events.select(col(userCol).as("u"), col(idCol).as("eid"),
      col(typeCol).as("et"), unix_micros(col(tsCol)).as("us"))
    val conv = base.filter(col("et") === convType)
      .select(col("u"), col("eid").as("conv_id"), col("us").as("cus"))
    val touch = base.filter(col("et") =!= convType)
      .select(col("u"), col("eid").as("tid"), col("et").as("ttype"), col("us").as("tus"))
    val j = touch.join(conv, Seq("u"))
      .filter(col("tus") < col("cus") && col("tus") >= col("cus") - lookbackUs)
    val wAsc = Window.partitionBy(col("conv_id")).orderBy(col("tus").asc, col("tid").asc)
    val wDesc = Window.partitionBy(col("conv_id")).orderBy(col("tus").desc, col("tid").desc)
    val wAll = Window.partitionBy(col("conv_id"))
    val credited = j
      .withColumn("rn_f", row_number().over(wAsc))
      .withColumn("rn_l", row_number().over(wDesc))
      .withColumn("n", count(lit(1)).over(wAll))
    val ft = credited.filter(col("rn_f") === 1)
      .groupBy(col("ttype")).agg(count(lit(1)).as("first_touch"))
    val lt = credited.filter(col("rn_l") === 1)
      .groupBy(col("ttype")).agg(count(lit(1)).as("last_touch"))
    val lin = credited.groupBy(col("ttype"))
      .agg(sum(expr("1000000 DIV n")).as("linear_ppm"))
    ft.join(lt, Seq("ttype"), "full_outer")
      .join(lin, Seq("ttype"), "full_outer")
      .select(col("ttype").as("event_type"),
        coalesce(col("first_touch"), lit(0L)).as("first_touch"),
        coalesce(col("last_touch"), lit(0L)).as("last_touch"),
        coalesce(col("linear_ppm"), lit(0L)).as("linear_ppm"))
      .orderBy(col("event_type"))
  }

  /** DuckDB respell of [[attributionReport]]. */
  def attributionReportSql(table: String, userCol: String, idCol: String,
      typeCol: String, tsCol: String, convType: String,
      lookbackUs: Long): String =
    s"""WITH base AS (
       |  SELECT $userCol AS u, $idCol AS eid, $typeCol AS et,
       |    epoch_us(CAST($tsCol AS TIMESTAMP)) AS us
       |  FROM $table),
       |conv AS (SELECT u, eid AS conv_id, us AS cus FROM base WHERE et = '$convType'),
       |touch AS (SELECT u, eid AS tid, et AS ttype, us AS tus FROM base WHERE et <> '$convType'),
       |j AS (
       |  SELECT touch.*, conv.conv_id FROM touch JOIN conv USING (u)
       |  WHERE tus < cus AND tus >= cus - $lookbackUs),
       |credited AS (
       |  SELECT *,
       |    row_number() OVER (PARTITION BY conv_id ORDER BY tus ASC, tid ASC) AS rn_f,
       |    row_number() OVER (PARTITION BY conv_id ORDER BY tus DESC, tid DESC) AS rn_l,
       |    count(*) OVER (PARTITION BY conv_id) AS n
       |  FROM j),
       |ft AS (SELECT ttype, CAST(count(*) AS BIGINT) AS first_touch
       |       FROM credited WHERE rn_f = 1 GROUP BY 1),
       |lt AS (SELECT ttype, CAST(count(*) AS BIGINT) AS last_touch
       |       FROM credited WHERE rn_l = 1 GROUP BY 1),
       |lin AS (SELECT ttype, CAST(sum(1000000 // n) AS BIGINT) AS linear_ppm
       |        FROM credited GROUP BY 1)
       |SELECT ttype AS event_type,
       |  coalesce(first_touch, 0) AS first_touch,
       |  coalesce(last_touch, 0) AS last_touch,
       |  coalesce(linear_ppm, 0) AS linear_ppm
       |FROM ft FULL OUTER JOIN lt USING (ttype) FULL OUTER JOIN lin USING (ttype)
       |ORDER BY event_type""".stripMargin
}
