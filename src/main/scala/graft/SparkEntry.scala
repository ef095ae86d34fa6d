package graft
import org.apache.spark.sql.{SparkSession, DataFrame}
import graft.queries.Analytics

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Aggregates the query surface from the per-area modules:
  *   - [[graft.queries.Analytics]] — reference-parity relational operators
  *     (SURVEY.md §2.2–2.6) phrased over the star schema with DuckDB oracles.
  */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The "gold build" shape: agg → left join → inner join → project
    * (silver_to_gold.py:39-84 parity). */
  def entry(spark: SparkSession): DataFrame =
    Analytics.q09GoldJoin(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2, plus the
    * training-data-pipeline extensions (dedup / similarity / text / events). */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Analytics.queries ++ graft.queries.Extensions.queries ++ graft.queries.Breadth.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    Analytics.oracleSql ++ graft.queries.Extensions.oracleSql ++ graft.queries.Breadth.oracleSql
}
