package graft

import java.io.File
import java.nio.file.Files

import graft.io.{Readers, Xlsx}

/** Source operators S1–S3 (SURVEY.md §2.1). */
class ReadersSpec extends SparkSpec {

  test("S2: csvWithHeaderOffset skips 4 metadata lines, header at row 4") {
    val path = resourcePath(
      "bronze/special_education/ingest_date=2024-01-15/special_education2022-23.csv")
    val df = Readers.csvWithHeaderOffset(spark, path, headerRow = 4)
    assert(df.columns.toSeq == Seq("State LEA ID", "LEA Name",
      "School Age All Educational Environments",
      "School Age Inside regular class 80% or more of the day", "School Year", "Unused Col"))
    assert(df.count() == 7)
    val first = df.orderBy(df("State LEA ID")).collect().head
    assert(first.getString(0) == "601" && first.getString(1) == "Fulton County")
  }

  test("S2: header offset on a file with too few lines fails cleanly") {
    val f = Files.createTempFile("short", ".csv")
    Files.writeString(f, "only,one,line\n")
    val e = intercept[IllegalArgumentException] {
      Readers.csvWithHeaderOffset(spark, f.toString, headerRow = 4)
    }
    assert(e.getMessage.contains("fewer than 5 lines"))
  }

  test("S3: minimal XLSX reader — shared strings, inline strings, numbers, gaps") {
    val f = File.createTempFile("graft", ".xlsx")
    TestXlsx.write(f, Seq(
      Seq("colA", "colB", "colC"),
      Seq("shared text", 42, 3.5),
      Seq("#inline text", null, "#  padded  "),
      Seq("shared text", "#", 7)))
    val rows = Xlsx.readSheet(f)
    assert(rows.length == 4)
    assert(rows.head.toSeq == Seq("colA", "colB", "colC"))
    assert(rows(1).toSeq == Seq("shared text", "42", "3.5"))
    assert(rows(2).toSeq == Seq("inline text", null, "  padded  "))
    assert(rows(3).toSeq == Seq("shared text", "", "7"))

    val df = Readers.xlsx(spark, f.getPath)
    assert(df.columns.toSeq == Seq("colA", "colB", "colC"))
    assert(df.count() == 3)
  }

  test("S3: A1 column-reference decoding") {
    assert(Xlsx.colIndex("A1") == 0)
    assert(Xlsx.colIndex("Z3") == 25)
    assert(Xlsx.colIndex("AA10") == 26)
    assert(Xlsx.colIndex("AB1") == 27)
  }

  test("S1: csv reads header and keeps raw strings") {
    val path = resourcePath(
      "bronze/housing_affordability/ingest_date=2024-01-15/housing2019-23.csv")
    val df = Readers.csv(spark, path)
    assert(df.columns.contains("S2503_C01_001E"))
    assert(df.schema.fields.forall(_.dataType.typeName == "string"))
  }

  test("S1: csv with an explicit schema projects and types at the scan") {
    import org.apache.spark.sql.types._
    val path = resourcePath(
      "bronze/housing_affordability/ingest_date=2024-01-15/housing2019-23.csv")
    val schema = StructType(Seq(
      StructField("GEO_ID", StringType), StructField("NAME", StringType)))
    val df = Readers.csv(spark, path, Some(schema))
    assert(df.schema == schema)
    assert(df.count() == 8) // 7 data rows + the label row (filtered in silver)
  }

  // Testdata-schema drift guard: the round-7 refresh silently changed
  // events.ts from long-nanos to TIMESTAMP_NTZ and six queries went dark
  // (VERDICT r7 #1). Pin the NORMALIZED contract every consumer relies on,
  // across every SF dir the driver ships, so the next drift fails here at
  // commit time instead of in the round's correctness run.
  test("S4: Tables.events yields TimestampType ts at every SF") {
    import org.apache.spark.sql.types._
    for (sf <- Seq("sf0.001", "sf0.01", "sf0.1")) {
      val df = Tables.events(spark, s"/root/testdata/$sf")
      assert(df.schema("ts").dataType == TimestampType,
        s"$sf: events.ts must normalize to TIMESTAMP, got ${df.schema("ts").dataType}")
      // unix_micros is the downstream idiom that broke — prove it analyzes
      df.selectExpr("unix_micros(ts)").queryExecution.analyzed
    }
  }

  test("S4: normalizeTs handles NTZ, long-nanos, and already-normalized input") {
    import org.apache.spark.sql.types._
    import spark.implicits._
    val ntz = spark.sql("SELECT CAST('2024-01-02 03:04:05.123456' AS TIMESTAMP_NTZ) AS ts")
    assert(ntz.schema("ts").dataType == TimestampNTZType)
    val fromNtz = Tables.normalizeTs(ntz)
    assert(fromNtz.schema("ts").dataType == TimestampType)
    // UTC session tz → the cast is epoch-preserving
    assert(fromNtz.selectExpr("unix_micros(ts)").as[Long].head ==
      spark.sql("SELECT unix_micros(CAST('2024-01-02 03:04:05.123456' AS TIMESTAMP))")
        .as[Long].head)
    val nanos = Seq(1704164645123456789L).toDF("ts")
    val fromNanos = Tables.normalizeTs(nanos)
    assert(fromNanos.schema("ts").dataType == TimestampType)
    assert(fromNanos.selectExpr("unix_micros(ts)").as[Long].head == 1704164645123456L)
    val already = Tables.normalizeTs(fromNtz)
    assert(already.schema("ts").dataType == TimestampType)
  }

  test("S4: documents and embeddings keep their pinned schemas at every SF") {
    import org.apache.spark.sql.types._
    for (sf <- Seq("sf0.001", "sf0.01", "sf0.1")) {
      val docs = Tables.load(spark, s"/root/testdata/$sf", "documents")
      assert(docs.schema("doc_id").dataType == LongType)
      assert(docs.schema("text").dataType == StringType)
      assert(docs.schema("lang").dataType == StringType)
      assert(docs.schema("source").dataType == StringType)
      // x05's DuckDB oracle rebuilds the FNV-1a byte fold from unicode code
      // points, which only equals the kernel's byte-level fold while the
      // corpus stays pure ASCII — fail HERE if the testdata ever drifts.
      assert(docs.filter(
        org.apache.spark.sql.functions.expr("octet_length(text) <> length(text)"))
        .limit(1).count() == 0L,
        s"$sf: non-ASCII text would break x05's byte-level oracle")
      val emb = Tables.load(spark, s"/root/testdata/$sf", "embeddings")
      assert(emb.schema("vec_id").dataType == LongType)
      assert(emb.schema("embedding").dataType == ArrayType(FloatType, containsNull = true))
      assert(emb.schema("label").dataType == IntegerType)
    }
  }
}
