package graft
// Scratch stage-level profiler (local diagnosis only; not part of the API).
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

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
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    docs.count()
    val perDoc = ops.Dedup.shingleSets(docs, "doc_id", "text", 3)
    tm("shingleSets count")(perDoc.count())
    val cands = ops.Dedup.prefixCandidates(perDoc, 0.5)
    tm("prefixCandidates")(cands.count())
    tm("prefixCandidates2")(cands.count())
    val full = ops.Dedup.ngramJaccardPairs(docs, "doc_id", "text", 3, 0.5)
    tm("full x08 run1")(full.count())
    tm("full x08 run2")(full.count())
    tm("full x08 run3")(full.count())
    spark.stop()
  }
}
