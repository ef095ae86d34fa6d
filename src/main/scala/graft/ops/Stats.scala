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
}
