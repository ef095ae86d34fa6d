package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Shared plumbing for the on-disk bucketed index families
  * ([[DedupStreams]]' admission index, [[AnnStreams]]' serving index):
  * location-derived catalog names and bucketed-table re-registration.
  * One copy, so a fix here (name sanitization, path quoting, bucket-spec
  * validation) reaches every disk-backed index the same way. */
private[streaming] object DiskIndex {

  /** Catalog names derive from the index LOCATION: re-opening the same
    * directory reuses the registration, two directories never collide. */
  def tableName(prefix: String, dir: String): String = {
    val abs = new java.io.File(dir).getAbsolutePath
    val md5 = java.security.MessageDigest.getInstance("MD5")
      .digest(abs.getBytes("UTF-8")).take(8).map("%02x".format(_)).mkString
    s"${prefix}_$md5"
  }

  /** The append tail under `root/batch=<id>/` — the idempotent landing
    * zone of a foreachBatch index-maintenance sink (each micro-batch
    * overwrites its own batchId-named directory, so a crash-replayed batch
    * replaces rather than duplicates). Empty-with-`schema` when no batch
    * has landed. */
  def appendTail(spark: SparkSession, root: String,
      schema: org.apache.spark.sql.types.StructType): DataFrame = {
    val batches = Option(new java.io.File(root).listFiles())
      .map(_.filter(f => f.isDirectory && f.getName.startsWith("batch=")))
      .getOrElse(Array.empty)
    if (batches.isEmpty)
      spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
    else spark.read.parquet(batches.map(_.getPath).toSeq: _*)
      .select(schema.fieldNames.map(org.apache.spark.sql.functions.col): _*)
  }

  /** Re-register a bucketed parquet table over existing files (schema read
    * from the parquet footers) if the in-memory catalog lost it — the
    * driver-bounce reopen path. Returns the live table either way. */
  def registerBucketed(spark: SparkSession, name: String, location: String,
      bucketCol: String, buckets: Int): DataFrame = {
    if (!spark.catalog.tableExists(name)) {
      val schemaDdl = spark.read.parquet(location).schema.toDDL
      spark.sql(
        s"""CREATE TABLE $name ($schemaDdl) USING PARQUET
           |CLUSTERED BY ($bucketCol) SORTED BY ($bucketCol) INTO $buckets BUCKETS
           |LOCATION '$location'""".stripMargin)
    }
    spark.table(name)
  }
}
