package graft.io

import org.apache.spark.sql.{DataFrame, SaveMode}

/** Lake layout + sinks — SURVEY.md §2.1 S5/S6/S7.
  *
  * The reference hand-formats `layer/dataset/ingest_date=YYYY-MM-DD/file`
  * paths (`bronze_to_silver.py:18-31`) over a local-FS/ADLS byte store
  * (`storage_io.py`). On Spark the storage abstraction is the Hadoop
  * FileSystem URI scheme (`file://`, `abfss://…`), so the only code needed
  * is the path convention itself; `ingest_date` is a real Hive partition
  * column, which buys partition pruning at scan time for free.
  *
  * `ingestDate` is always an explicit parameter — never "today" — because
  * the reference's env-default (`INGEST_DATE` or today, bronze_to_silver.py:15)
  * is a reproducibility hazard (SURVEY.md §7.3.7).
  */
object Lake {

  /** `base/layer/dataset/ingest_date=DATE` — the reference's path scheme. */
  def path(base: String, layer: String, dataset: String, ingestDate: String): String =
    s"$base/$layer/$dataset/ingest_date=$ingestDate"

  /** S5 — parquet write, overwrite, single output file. The single-file
    * coalesce matches the reference's one-file-per-dataset layout and is for
    * small silver/gold marts only; large tables use [[writePartitioned]]. */
  def writeSingleFile(df: DataFrame, dir: String): Unit =
    df.coalesce(1).write.mode(SaveMode.Overwrite).parquet(dir)

  /** S6 — Hive-partitioned parquet write; `partitionOverwriteMode=dynamic`
    * so re-running one ingest_date never clobbers sibling partitions. */
  def writePartitioned(df: DataFrame, dir: String, partitionCols: Seq[String]): Unit =
    df.write
      .mode(SaveMode.Overwrite)
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy(partitionCols: _*)
      .parquet(dir)

  /** Bucketed+sorted table write (saveAsTable — bucket metadata lives in the
    * catalog). The 100 TB fact-table pattern: two tables bucketed the same
    * way on the join key co-locate, so the join runs with ZERO exchanges —
    * pre-shuffling once at write time instead of per query. */
  def writeBucketed(df: DataFrame, table: String, bucketCol: String, numBuckets: Int): Unit =
    df.write
      .mode(SaveMode.Overwrite)
      .bucketBy(numBuckets, bucketCol)
      .sortBy(bucketCol)
      .format("parquet")
      .saveAsTable(table)

  /** S7 — storage-mode resolution, the reference's `PIPELINE_STORAGE_MODE`
    * switch (`storage_io.py:27-36`) mapped onto Hadoop FileSystem URIs:
    * everything downstream is scheme-agnostic. */
  def resolveBase(mode: String, localBase: String,
      account: String = "", container: String = "", basePath: String = ""): String =
    mode match {
      case "local" => localBase
      case "adls" =>
        require(account.nonEmpty && container.nonEmpty, "adls mode needs account+container")
        val suffix = if (basePath.isEmpty) "" else s"/$basePath"
        s"abfss://$container@$account.dfs.core.windows.net$suffix"
      case other => throw new IllegalArgumentException(s"unknown storage mode: $other")
    }
}
