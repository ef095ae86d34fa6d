package graft
// Scratch stage-level profiler (local diagnosis only; not part of the API).
import org.apache.spark.sql.SparkSession

object Prof {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def tm[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"PROF $label%-28s ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    if (sys.env.contains("PROF_X06_STAGES")) {
      import org.apache.spark.sql.functions._
      import graft.functions.Exprs._
      val docs = spark.read.parquet(s"$dir/documents.parquet")
      println("docs=" + docs.count())
      val base = docs.select(col("doc_id"), graft.ops.Dedup.tokens(col("text")).as("toks"))
      val banded = base.select(col("doc_id"),
        posexplode(band_hashes(minhash_sig(col("toks"), 3, 128), 64)))
        .toDF("doc_id", "band_idx", "band_hash")
      tm("banded1")(println(banded.count()))
      tm("banded2")(println(banded.count()))
      val cand = graft.ops.Dedup.bucketCandidatePairs(banded, "band_idx", "band_hash", 1000)
      tm("cand1")(println(cand.count()))
      tm("cand2")(println(cand.count()))
      spark.stop(); return
    }
    val names = args.toSeq match {
      case Nil => Seq("x23_pii_scrub", "x24_repetition", "x25_decontaminate")
      case xs  => xs
    }
    names.foreach { n =>
      val q = SparkEntry.queries(n)
      tm(s"$n run1")(q(spark, dir).count())
      tm(s"$n run2")(q(spark, dir).count())
      if (sys.env.contains("PROF_EXPLAIN")) q(spark, dir).explain("formatted")
    }
    spark.stop()
  }
}
