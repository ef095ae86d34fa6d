package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Declarative data-contract validation (the dbt-test / expectations
  * shape): each check is a RELATION OF VIOLATING ROWS, the report is one
  * union of their counts — so every check stays a plain Catalyst plan
  * (pushdown, broadcast anti-joins, partial aggregates all apply), and a
  * failing check can be re-run alone to LIST its violations, not just
  * count them.
  *
  * Scale notes: not-null / range / domain checks are scan-fused filters;
  * uniqueness is a keyed window (one shuffle on the key); referential
  * checks are anti-joins (broadcast when the parent's key set is small,
  * shuffle otherwise — Catalyst's call). The report output is
  * #checks rows.
  */
object Contracts {

  /** Rows violating NOT NULL on `c`. */
  def notNull(df: DataFrame, c: String): DataFrame = df.filter(col(c).isNull)

  /** Rows participating in a key collision (every copy counts). */
  def unique(df: DataFrame, keys: String*): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window.partitionBy(keys.map(col): _*)
    df.withColumn("__n", count(lit(1)).over(w)).filter(col("__n") > 1).drop("__n")
  }

  /** Child rows whose `fk` has no match in `parent.pk` (NULL fks are the
    * [[notNull]] check's business, not an orphan). */
  def referential(child: DataFrame, fk: String, parent: DataFrame, pk: String): DataFrame =
    child.filter(col(fk).isNotNull)
      .join(parent.select(col(pk).as(fk)).distinct(), Seq(fk), "left_anti")

  /** Rows with `c` outside the OPEN interval (lo, hi). */
  def range(df: DataFrame, c: String, lo: Double, hi: Double): DataFrame =
    df.filter(col(c).isNull || col(c) <= lo || col(c) >= hi)

  /** Rows whose `c` is not one of the allowed values. */
  def domain(df: DataFrame, c: String, allowed: Seq[String]): DataFrame =
    df.filter(col(c).isNull || !col(c).isin(allowed: _*))

  /** Fold named violation relations into the contract report:
    * (check_name, n_violations, pass), ordered by name. */
  def report(checks: Seq[(String, DataFrame)]): DataFrame =
    checks.map { case (name, d) =>
      d.agg(count(lit(1)).as("n_violations"))
        .select(lit(name).as("check_name"), col("n_violations"))
    }.reduce(_ unionAll _)
      .withColumn("pass", col("n_violations") === 0L)
      .orderBy(col("check_name"))
}
