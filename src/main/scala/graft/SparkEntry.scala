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

  /** Queries with NO DuckDB oracle, each by documented necessity and each
    * carrying an exact ScalaTest oracle instead:
    *   - x22: seeded reservoir plan — sampling is engine-specific by nature;
    *     ReservoirSpec pins the 200-seed uniformity contract.
    *   - x141: deflate ratio — no SQL engine exposes DEFLATE; MiningSpec
    *     replays the JVM Deflater row by row.
    * (x15 multimodal left this list in r9: its projected columns are pure
    * byte arithmetic and now carry a real DuckDB oracle; the non-SQL stub
    * outputs stay pinned by MultimodalSpec.)
    * The registration gate (RegistrationGateSpec) forces every other query
    * to carry a SQL oracle — a query can never again ship dark the way
    * x152 did in round 8. */
  def rowsOnly: Set[String] =
    Set("x22_reservoir_sample", "x141_compression_ratio")
}
