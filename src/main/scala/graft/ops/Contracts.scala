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

  /** Generic per-column table PROFILE — the "dataset card" every published
    * snapshot carries: per column, row count, null count, exact distinct
    * count, lexicographic min/max of a CANONICAL string form. `cols` maps
    * column name → the canonical string expression; callers pick per-type
    * spellings that format identically on every engine (ints cast direct,
    * doubles through DECIMAL(18,2), timestamps through epoch micros) so
    * min/max compare the same bytes everywhere.
    *
    * Scale shape: one positional explode (|cols| rows per input row,
    * map-side) feeding one groupBy — the distinct count makes it an
    * expand-style two-phase aggregate, still partial-aggregable per
    * column. No joins, no windows; output is |cols| rows. */
  def columnProfile(df: DataFrame, cols: Seq[(String, org.apache.spark.sql.Column)]): DataFrame = {
    require(cols.nonEmpty)
    val entries = explode(array(cols.map { case (n, c) =>
      struct(lit(n).as("cname"), c.cast("string").as("v")) }: _*)).as("e")
    df.select(entries)
      .select(col("e.cname").as("column_name"), col("e.v").as("v"))
      .groupBy(col("column_name"))
      .agg(count(lit(1)).as("n_rows"),
        sum(when(col("v").isNull, 1L).otherwise(0L)).as("n_null"),
        countDistinct(col("v")).as("n_distinct"),
        min(col("v")).as("min_val"),
        max(col("v")).as("max_val"))
      .orderBy(col("column_name"))
  }

  /** DuckDB respell of [[columnProfile]]: `cols` maps column name → the
    * matching canonical VARCHAR SQL expression. */
  def columnProfileSql(table: String, cols: Seq[(String, String)]): String = {
    val legs = cols.map { case (n, e) =>
      s"SELECT '$n' AS column_name, CAST(($e) AS VARCHAR) AS v FROM $table"
    }.mkString("\nUNION ALL\n")
    s"""WITH u AS (
       |$legs)
       |SELECT column_name, CAST(count(*) AS BIGINT) AS n_rows,
       |  CAST(sum(CASE WHEN v IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null,
       |  CAST(count(DISTINCT v) AS BIGINT) AS n_distinct,
       |  min(v) AS min_val, max(v) AS max_val
       |FROM u GROUP BY column_name ORDER BY column_name""".stripMargin
  }
}
