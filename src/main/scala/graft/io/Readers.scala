package graft.io

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StringType, StructField, StructType}

/** Bronze-layer sources — SURVEY.md §2.1.
  *
  * S1: plain CSV with header (spark.read.csv).
  * S2: CSV with the real header at line index `headerRow` (metadata lines
  *     above it) — no built-in option; implemented distributed-safe below.
  * S3: XLSX — no built-in and no external package in this offline build;
  *     minimal JDK-only reader in [[Xlsx]].
  * S4: parquet (spark.read.parquet).
  */
object Readers {

  /** S1 — CSV scan, header row 0. All-string schema unless one is given:
    * type coercion is an explicit silver-layer step (try_cast), mirroring
    * the reference's pd.to_numeric(errors="coerce") and keeping bronze raw. */
  def csv(spark: SparkSession, path: String, schema: Option[StructType] = None): DataFrame = {
    val r = spark.read.option("header", "true")
    schema match {
      case Some(s) => r.schema(s).csv(path)
      case None    => r.csv(path)
    }
  }

  /** S2 — CSV whose header sits at line index `headerRow` (0-based), with
    * free-text metadata lines above it (`bronze_to_silver.py:57-58`,
    * header=4).
    *
    * Implementation: read as text, number lines with `zipWithIndex` — for a
    * single input file the partitions are ordered by byte offset, so the
    * index is the file line number and this stays correct and parallel for
    * arbitrarily large files (no single-partition coalesce). The header line
    * is fetched by index, then data lines parse via `from_csv` with an
    * all-string schema named after the header. */
  def csvWithHeaderOffset(spark: SparkSession, path: String, headerRow: Int = 4): DataFrame = {
    import spark.implicits._
    val lines = spark.read.textFile(path).rdd.zipWithIndex()
    val headerLine = lines.filter(_._2 == headerRow).map(_._1).collect().headOption
      .getOrElse(throw new IllegalArgumentException(
        s"$path has fewer than ${headerRow + 1} lines — no header to read"))
    val names = parseCsvLine(headerLine)
    val data = lines.filter(_._2 > headerRow).map(_._1).toDF("line")
    val schema = StructType(names.map(n => StructField(n, StringType, nullable = true)))
    data
      .select(from_csv($"line", schema, Map.empty[String, String]).as("r"))
      .select(names.map(n => col(s"r.`$n`")): _*)
  }

  /** Minimal RFC-4180-ish single-line CSV split (quotes + escaped quotes) —
    * only used for the one header line, data lines go through from_csv. */
  private[io] def parseCsvLine(line: String): Seq[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    val sb = new StringBuilder
    var inQ = false
    var i = 0
    while (i < line.length) {
      val c = line.charAt(i)
      if (inQ) {
        if (c == '"') {
          if (i + 1 < line.length && line.charAt(i + 1) == '"') { sb.append('"'); i += 1 }
          else inQ = false
        } else sb.append(c)
      } else c match {
        case '"' => inQ = true
        case ',' => out += sb.result(); sb.clear()
        case _   => sb.append(c)
      }
      i += 1
    }
    out += sb.result()
    out.toSeq
  }

  /** S3 — XLSX scan (first sheet, row 0 = header), all-string columns. */
  def xlsx(spark: SparkSession, path: String): DataFrame = {
    val rows = Xlsx.readSheet(new java.io.File(path))
    if (rows.isEmpty)
      return spark.createDataFrame(new java.util.ArrayList[Row](), StructType(Nil))
    val header = rows.head.map(h => Option(h).getOrElse("").trim)
    val width = header.length
    val schema = StructType(header.map(n => StructField(n, StringType, nullable = true)))
    val data = rows.tail.map { r =>
      Row.fromSeq((0 until width).map(i => if (i < r.length) r(i) else null))
    }
    spark.createDataFrame(spark.sparkContext.parallelize(data.toSeq), schema)
  }

  /** S4 — parquet scan. */
  def parquet(spark: SparkSession, path: String): DataFrame = spark.read.parquet(path)
}
