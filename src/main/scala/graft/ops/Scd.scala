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
}
