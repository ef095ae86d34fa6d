package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated star schema (TESTDATA.md).
  *
  * One parquet file per table under `sfDir`. Kept as plain parquet scans so
  * Catalyst's column pruning / filter pushdown reach the file scan (the
  * reference does this "by hand" — see SURVEY.md §4; here it is free).
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  /** `events.ts` is parquet TIMESTAMP(NANOS), which Spark's vectorized reader
    * rejects outright. Read it as raw long nanos (legacy flag) and normalize
    * to a microsecond TimestampType column — integer `div`, not `/`, because
    * ns-since-epoch (~1.7e18) exceeds double's 2^53 integer range. */
  def events(spark: SparkSession, sfDir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = load(spark, sfDir, "events")
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.withColumn("ts", org.apache.spark.sql.functions.expr("timestamp_micros(ts div 1000)"))
      case _ => raw
    }
  }

  /** Register every table as a temp view named after itself, enabling the
    * `spark.sql(...)` surface (reference EP3: DuckDB view over parquet,
    * view_gold.py:26-28 → S8 in SURVEY.md §2.1). */
  def registerAll(spark: SparkSession, sfDir: String): Unit = {
    names.filterNot(_ == "events")
      .foreach(n => load(spark, sfDir, n).createOrReplaceTempView(n))
    events(spark, sfDir).createOrReplaceTempView("events")
  }
}
