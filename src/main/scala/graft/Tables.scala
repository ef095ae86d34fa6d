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

  // Per-(session, path) memo of the ANALYZED DataFrame. `spark.read.parquet`
  // lists the path and reads footers for schema inference on every call;
  // 200+ registered queries × 1-4 table loads each re-paid that for the
  // same ten immutable files. Reusing the analyzed relation is plan-neutral
  // — the logical plan is still the parquet scan, so pushdown/pruning and
  // every PlanSpec guard are unaffected. Keyed on the SESSION REFERENCE
  // itself (SparkSession uses identity equality), never a hash that a
  // GC'd-then-reallocated session object could collide with; entries whose
  // session has stopped are evicted on the next load so plans bound to dead
  // sessions are neither returned nor retained for the JVM lifetime. The
  // star-schema inputs are read-only by contract (TESTDATA.md), so
  // staleness cannot arise.
  private val loaded =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String), DataFrame]()

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    loaded.keySet.removeIf(k => k._1.sparkContext.isStopped)
    loaded.computeIfAbsent((spark, s"$sfDir/$name.parquet"),
      key => key._1.read.parquet(key._2))
  }

  /** `events.ts` has shipped as parquet TIMESTAMP(NANOS) (which Spark's
    * vectorized reader rejects outright — read as raw long nanos via the
    * legacy flag and rebuild: integer `div`, not `/`, because ns-since-epoch
    * (~1.7e18) exceeds double's 2^53 integer range) and, since round 7's
    * testdata refresh, as TIMESTAMP(isAdjustedToUTC=false, µs) which Spark 4
    * surfaces as TIMESTAMP_NTZ. Every downstream consumer (`unix_micros`,
    * `withWatermark`) needs plain TimestampType, so normalize both shapes
    * here; with the session timezone pinned to UTC the NTZ→LTZ cast is
    * epoch-preserving and matches DuckDB's naive-timestamp reading. */
  def events(spark: SparkSession, sfDir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = load(spark, sfDir, "events")
    normalizeTs(raw)
  }

  /** Normalize an `events`-shaped frame's `ts` column to TimestampType.
    * Shared by the batch loader above and the streaming read sites
    * (`streaming/EventStreams.scala`), so a future testdata type drift is
    * fixed in exactly one place. */
  def normalizeTs(raw: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions.{col, expr}
    import org.apache.spark.sql.types.{LongType, TimestampNTZType}
    raw.schema("ts").dataType match {
      case LongType         => raw.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      case TimestampNTZType => raw.withColumn("ts", col("ts").cast("timestamp"))
      case _                => raw
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
