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
}
