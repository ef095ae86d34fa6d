package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Slowly-changing-dimension maintenance (Kimball SCD Type 2) — the lake-side
  * write pattern every long-lived dimension (source registry, license table,
  * domain metadata) needs once snapshots stop being append-only. The
  * reference pipeline overwrites its gold output wholesale
  * (`silver_to_gold.py:107-109`); SCD2 is the history-preserving upgrade of
  * that overwrite.
  */
object Scd {

  /** Merge a batch of dimension updates into an SCD2 history table.
    *
    * `current` carries the full history: `keyCol`, the tracked attribute
    * columns, and the bookkeeping triple (`valid_from: string`,
    * `valid_to: string` — NULL = open, `is_current: boolean`). `updates`
    * carries `keyCol` + the tracked columns, AT MOST ONE ROW PER KEY
    * (standard MERGE precondition; enforce upstream with keep-first dedup).
    *
    * Semantics per key:
    *   - update differs from the open row (any tracked column, null-safe):
    *     the open row closes at `effectiveDate`, a new open row appends;
    *   - update identical to the open row: no-op (idempotent re-delivery);
    *   - key unknown: the update inserts as a new open row;
    *   - no update: the open row passes through.
    * Closed history rows always pass through untouched.
    *
    * Scale shape: history splits on `is_current` (a scan-level filter —
    * at rest this is a partition column, so closed history is never even
    * read by the merge); open rows and updates meet in ONE equi-join on
    * the key. A daily update batch is orders of magnitude smaller than the
    * dimension, so AQE broadcasts it and the open side never shuffles; the
    * three output legs are unions of projections over that single join —
    * no second exchange anywhere.
    */
  def scd2Merge(current: DataFrame, updates: DataFrame, keyCol: String,
      trackedCols: Seq[String], effectiveDate: String): DataFrame = {
    val meta = Seq("valid_from", "valid_to", "is_current")
    val outCols = (keyCol +: trackedCols) ++ meta
    val closedHistory = current.filter(!col("is_current"))
    val open = current.filter(col("is_current"))

    val u = updates.select((keyCol +: trackedCols).map(c => col(c).as(s"__u_$c")): _*)
    val joined = open.join(u, col(keyCol) === col(s"__u_$keyCol"), "full_outer")

    val hasOpen = col(keyCol).isNotNull
    val hasUpd = col(s"__u_$keyCol").isNotNull
    // null-safe attribute comparison: a NULL→value (or value→NULL) flip is a change
    val changed = trackedCols
      .map(c => !(col(c) <=> col(s"__u_$c")))
      .reduceOption(_ || _)
      .getOrElse(lit(false))

    val unchangedOpen = joined
      .filter(hasOpen && (!hasUpd || !changed))
      .select(outCols.map(col): _*)
    val closedOut = joined
      .filter(hasOpen && hasUpd && changed)
      .select((keyCol +: trackedCols).map(col) ++ Seq(
        col("valid_from"), lit(effectiveDate).as("valid_to"),
        lit(false).as("is_current")): _*)
    val newOpen = joined
      .filter(hasUpd && (!hasOpen || changed))
      .select((keyCol +: trackedCols).map(c => col(s"__u_$c").as(c)) ++ Seq(
        lit(effectiveDate).as("valid_from"),
        lit(null).cast("string").as("valid_to"),
        lit(true).as("is_current")): _*)

    closedHistory.select(outCols.map(col): _*)
      .unionByName(unchangedOpen)
      .unionByName(closedOut)
      .unionByName(newOpen)
  }

  /** Snapshot diff — the "data diff" report between two versions of the
    * same keyed table (yesterday's published snapshot vs today's): how many
    * rows appeared, vanished, changed, stayed identical, and — for the
    * changed set — WHICH columns drifted. The pre-publish gate that catches
    * an upstream rewrite ("why did 40% of customer addresses change
    * overnight?") before it ships.
    *
    * Output is a tall (metric, n) relation: the four status counts plus one
    * `col:<name>` row per compared column counting rows where that column
    * changed (null-safe `<=>` on both sides).
    *
    * Scale shape: ONE full-outer equi-join on the key (both sides shuffle
    * once on the same key — with bucketed snapshots, zero shuffle), then a
    * single map-side flag projection feeding one partial-aggregable global
    * aggregate; the tall report is a literal-map explode of that 1-row
    * aggregate. Column comparisons never leave the join row — no per-column
    * passes over the data. */
  def snapshotDiff(oldDf: DataFrame, newDf: DataFrame, keyCol: String,
      cols: Seq[String]): DataFrame = {
    val o = oldDf.select(
      (col(keyCol).as("__k") +: lit(1L).as("__op") +:
        cols.map(c => col(c).as(s"__o_$c"))): _*)
    val n = newDf.select(
      (col(keyCol).as("__k") +: lit(1L).as("__np") +:
        cols.map(c => col(c).as(s"__n_$c"))): _*)
    val j = o.join(n, Seq("__k"), "full_outer")
    val anyChanged = cols.map(c => !(col(s"__o_$c") <=> col(s"__n_$c")))
      .reduce(_ || _)
    val status = when(col("__op").isNull, "added")
      .when(col("__np").isNull, "removed")
      .when(anyChanged, "changed")
      .otherwise("unchanged")
    val statusAggs = Seq("added", "removed", "changed", "unchanged")
      .map(st => coalesce(sum(when(status === st, 1L).otherwise(0L)), lit(0L)).as(st))
    val colAggs = cols.map(c =>
      coalesce(sum(when(col("__op").isNotNull && col("__np").isNotNull &&
        !(col(s"__o_$c") <=> col(s"__n_$c")), 1L).otherwise(0L)), lit(0L)).as(s"col:$c"))
    val one = j.agg(statusAggs.head, (statusAggs.tail ++ colAggs): _*)
    val entries = (Seq("added", "removed", "changed", "unchanged") ++
      cols.map(c => s"col:$c"))
      .flatMap(m => Seq(lit(m), col(s"`$m`")))
    one.select(explode(map(entries: _*)).as(Seq("metric", "n")))
      .orderBy(col("metric"))
  }

  /** The snapshot-diff oracle: the same full-outer join and flag counts,
    * unpivoted with UNION ALL. `oldSql`/`newSql` select `k` plus the
    * compared columns under their own names. */
  def snapshotDiffSql(oldSql: String, newSql: String, cols: Seq[String]): String = {
    val anyChanged = cols.map(c => s"o.$c IS DISTINCT FROM n.$c").mkString(" OR ")
    // presence is a literal marker (1 AS __op/__np), never key nullness —
    // a NULL-key row is unmatched on BOTH engines (equi-join null
    // semantics), and key-nullness tests would misread it as added AND
    // removed at once (the r8 advice finding)
    val colCounts = cols.map(c =>
      s"""SELECT 'col:$c' AS metric, CAST(coalesce(sum(CASE WHEN o.__op IS NOT NULL
         |  AND n.__np IS NOT NULL AND o.$c IS DISTINCT FROM n.$c THEN 1 ELSE 0 END), 0)
         |  AS BIGINT) AS n
         |FROM o FULL OUTER JOIN n ON o.k = n.k""".stripMargin)
    s"""WITH o AS (SELECT *, 1 AS __op FROM ($oldSql)),
       |n AS (SELECT *, 1 AS __np FROM ($newSql)),
       |j AS (
       |  SELECT CASE WHEN o.__op IS NULL THEN 'added'
       |              WHEN n.__np IS NULL THEN 'removed'
       |              WHEN $anyChanged THEN 'changed'
       |              ELSE 'unchanged' END AS status
       |  FROM o FULL OUTER JOIN n ON o.k = n.k),
       |s AS (
       |  SELECT st.metric,
       |    CAST(coalesce(sum(CASE WHEN j.status = st.metric THEN 1 ELSE 0 END), 0) AS BIGINT) AS n
       |  FROM (VALUES ('added'), ('removed'), ('changed'), ('unchanged')) st(metric)
       |  LEFT JOIN j ON true GROUP BY st.metric)
       |SELECT metric, n FROM s
       |${colCounts.map(c => s"UNION ALL\n$c").mkString("\n")}
       |ORDER BY metric""".stripMargin
  }
}
