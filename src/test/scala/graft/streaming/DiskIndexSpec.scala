package graft.streaming

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/** The on-disk index families' path discipline (r15 verdict #1): every
  * location goes through the Hadoop filesystem API, so the indexes work on
  * any configured store (`file:`, `hdfs:`, `abfss:`, …) and an UNREACHABLE
  * scheme fails loudly — an append tail must never silently read as empty
  * just because the path wasn't a local file. In package graft.streaming
  * deliberately: the contract under test is [[DiskIndex]]'s, the shared
  * plumbing both families ride. */
class DiskIndexSpec extends graft.SparkSpec {

  private val schema = StructType(Seq(
    StructField("doc_id", LongType), StructField("v", LongType)))

  test("appendTail discovers batch dirs through an explicit file: URI") {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("diskidx").toString
    // no batch landed yet: empty-with-schema, under BOTH spellings
    assert(DiskIndex.appendTail(spark, root, schema).isEmpty)
    assert(DiskIndex.appendTail(spark, s"file:$root", schema).isEmpty)
    Seq((1L, 10L)).toDF("doc_id", "v").write.parquet(s"$root/batch=0")
    Seq((2L, 20L)).toDF("doc_id", "v").write.parquet(s"$root/batch=1")
    // a stray non-batch dir must not be swept into the tail
    Seq((99L, 99L)).toDF("doc_id", "v").write.parquet(s"$root/scratch")
    def ids(dir: String): Seq[Long] =
      DiskIndex.appendTail(spark, dir, schema)
        .select($"doc_id").as[Long].collect().sorted.toSeq
    assert(ids(root) == Seq(1L, 2L))
    // the scheme-qualified spelling of the SAME location sees the same tail
    assert(ids(s"file:$root") == Seq(1L, 2L))
  }

  test("appendTail fails loudly on an unreachable scheme, never empty") {
    val ex = intercept[Exception] {
      DiskIndex.appendTail(spark, "nosuchscheme://bucket/index/appends", schema)
    }
    assert(ex.getMessage != null &&
      ex.getMessage.toLowerCase.contains("nosuchscheme"),
      s"expected a scheme-naming failure, got: ${ex.getMessage}")
  }

  test("qualified URIs unify path spellings and separate real locations") {
    val root = java.nio.file.Files.createTempDirectory("diskidx-uri").toString
    val viaFile = DiskIndex.qualifiedUri(spark, s"file:$root")
    val viaBare = DiskIndex.qualifiedUri(spark, root)
    val viaDot = DiskIndex.qualifiedUri(spark, s"$root/sub/..")
    assert(viaFile == viaBare,
      s"two spellings of one location must qualify identically: $viaFile vs $viaBare")
    assert(new org.apache.hadoop.fs.Path(viaDot).getParent != null) // parses
    assert(DiskIndex.qualifiedUri(spark, s"$root/other") != viaBare)
    // catalog names follow the same rule — reopen under any spelling
    // reuses the registration; a different location never collides
    assert(DiskIndex.tableName(spark, "t", s"file:$root")
      == DiskIndex.tableName(spark, "t", root))
    assert(DiskIndex.tableName(spark, "t", s"$root/other")
      != DiskIndex.tableName(spark, "t", root))
  }

  test("blue/green guards reject two spellings of the same location") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("diskidx-bg").toString
    AnnStreams.buildServingIndex(
      Seq((0L, Seq(1.0f, 0.0f)), (1L, Seq(0.0f, 1.0f)), (2L, Seq(0.9f, 0.1f)))
        .toDF("vec_id", "embedding"),
      "vec_id", "embedding", s"$tmp/idx", nlist = 2, trained = false)
    val ex = intercept[IllegalArgumentException] {
      AnnStreams.compactIndex(spark, s"$tmp/idx", s"file:$tmp/idx")
    }
    assert(ex.getMessage.contains("blue/green"))
    // and a genuinely different target works, through the file: spelling
    val compacted = AnnStreams.compactIndex(spark, s"$tmp/idx", s"file:$tmp/idx2")
    assert(compacted.cells.count() == 3 && compacted.appends.isEmpty)
  }
}
