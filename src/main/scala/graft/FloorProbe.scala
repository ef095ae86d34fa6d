package graft

import org.apache.spark.sql.SparkSession

/** Diagnostic main for the relational-core cost floor (VERDICT r10 ask #8).
  *
  * The core q01–q34 subtotal sits at ~1.6× DuckDB on sf0.1 while the
  * extension subtotal is 0.37×. The open question is WHERE the residual
  * lives: in the parquet scan (fixable by caching/materializing the ten
  * base relations) or in Spark's fixed per-job cost (scheduler + task
  * dispatch + AQE re-planning — amortized to nothing at 100 TB scale, but
  * unavoidable per query on a 60 MB input).
  *
  * This probe times, in one warmed session (the Bench environment):
  *   A. `spark.range(1).count()`              — pure job-launch floor, no IO;
  *   B. memoized `lineitem.count()`           — launch + footer-pruned scan;
  *   C. cached (InMemoryRelation) `lineitem.count()` — launch, zero parquet;
  *   D. q13 COUNT(*) via the registered query — the real core shape;
  *   E. q13 against a fully cached lineitem    — the "SharedViews for core"
  *      counterfactual the verdict asked about.
  * Each is min-of-N (N=20 for the sub-100ms shapes). If A ≈ D ≈ E, the
  * floor is launch-bound and caching the core tables buys nothing — the
  * honest NOTES claim. If D − A ≈ scan time and E ≪ D, caching is the fix.
  *
  * Run: SPARK_GRAFT_SF_DIR=... java -cp classes:spark-jars graft.FloorProbe
  */
object FloorProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def best(n: Int)(body: => Unit): Double = {
      val runs = (1 to n).map { _ =>
        val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
      }
      runs.min
    }

    // Warm: JVM, codegen, page cache, memoized relations.
    Tables.names.foreach(n => Tables.load(spark, sfDir, n).count())
    spark.range(1).count()

    val a = best(20)(spark.range(1).count())
    val li = Tables.load(spark, sfDir, "lineitem")
    val b = best(20)(li.count())
    val cached = spark.read.parquet(s"$sfDir/lineitem.parquet").cache()
    cached.count() // materialize
    val c = best(20)(cached.count())
    val q13 = queries.Analytics.queries("q13_count")
    val d = best(20)(q13(spark, sfDir).count())
    // E: same projection/agg shape as q13 but over the InMemoryRelation.
    val e = best(20) {
      cached.groupBy("l_returnflag").count().count()
    }
    // F: a representative mid-core query (q01 filter+project) for context.
    val q01 = queries.Analytics.queries("q01_filter_project")
    val f = best(10)(q01(spark, sfDir).count())

    // G/H: the same floor and core shape with AQE off — AQE re-plans after
    // every materialized stage, which on a 4-partition local job is pure
    // fixed cost. Measures what the per-query floor would be if short
    // queries opted out of AQE (a per-query session conf, not a session
    // rebuild).
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    val g = best(20)(spark.range(1).count())
    val h = best(20)(q13(spark, sfDir).count())
    val i = best(10)(q01(spark, sfDir).count())
    spark.conf.set("spark.sql.adaptive.enabled", "true")

    def ms(v: Double): String = "%.1f".format(v * 1000)

    // J: the MINIMAL job — one slice, two tasks — vs A's cpus-slice range:
    // separates the per-JOB constant from the per-TASK dispatch cost that
    // local[cpus] pays 32× on every default-parallelism stage.
    val j = best(20)(spark.range(1L, 2L, 1L, 1).count())
    // K: per-query Catalyst cost — DataFrame build + analyze + optimize +
    // physical planning, NO execution — for three core shapes. This is
    // paid once per fn() call (the DataFrame API has no plan cache across
    // re-built frames), so it is a fixed per-query constant the sf0.1
    // bench pays and a 100 TB run amortizes to nothing.
    def planMs(name: String): Double = best(10) {
      val df = SparkEntry.queries(name)(spark, sfDir)
      df.queryExecution.executedPlan // forces analyze→optimize→plan
    } * 1000
    val planned = Seq("q01_filter_project", "q09_gold_join", "q12_rank_sum")
      .map(n => s""""plan_${n.takeWhile(_ != '_')}_ms":${"%.1f".format(planMs(n))}""")
      .mkString(",")

    println(s"""{"launch_ms":${ms(a)},"launch_1slice_ms":${ms(j)},"scan_count_ms":${ms(b)},"cached_count_ms":${ms(c)},"q13_ms":${ms(d)},"q13_cached_ms":${ms(e)},"q01_ms":${ms(f)},"launch_noaqe_ms":${ms(g)},"q13_noaqe_ms":${ms(h)},"q01_noaqe_ms":${ms(i)},$planned}""")
    spark.stop()
  }
}
