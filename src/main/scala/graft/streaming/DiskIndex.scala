package graft.streaming

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Shared plumbing for the on-disk bucketed index families
  * ([[DedupStreams]]' admission index, [[AnnStreams]]' serving index):
  * location-derived catalog names and bucketed-table re-registration.
  * One copy, so a fix here (name sanitization, path quoting, bucket-spec
  * validation) reaches every disk-backed index the same way.
  *
  * Every path here goes through the HADOOP filesystem API, never
  * `java.io.File` (r15 verdict #1): the indexes are designed to live on
  * the lake (`abfss://`/`hdfs://`/`s3a://`), where a `java.io.File` of a
  * URI path silently lists NOTHING — appended documents would vanish from
  * the admission check and appended vectors from serve results, with no
  * error. `Path.getFileSystem` resolves the scheme against the session's
  * Hadoop conf and FAILS LOUDLY (`UnsupportedFileSystemException` /
  * "No FileSystem for scheme") on a scheme the deployment cannot reach —
  * an unreadable tail is an error, never an empty one. */
private[graft] object DiskIndex {

  /** The ONE canonical spelling of a location: the fully-qualified URI
    * under the session's Hadoop conf. Two relative/absolute/`file:`
    * spellings of the same directory qualify identically; two different
    * stores never collide. Pure path math — the location need not exist
    * yet (indexes derive their catalog name before their first write). */
  def qualifiedUri(spark: SparkSession, dir: String): String = {
    val p = new Path(dir)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    // .normalize() collapses `.`/`..` segments — Hadoop's Path keeps them,
    // so `dir` and `dir/sub/..` would otherwise qualify to two different
    // strings for ONE physical directory: two catalog names for the same
    // location, and a blue/green guard that lets compaction overwrite the
    // index it is reading (the r16 ADVICE finding). Pure path math, so the
    // location still need not exist.
    val u = fs.makeQualified(p).toUri.normalize()
    // normalize the authority: java.net.URI renders a scheme'd-but-
    // authority-less path as `file:/x` while a qualified bare path renders
    // `file:///x` — same location, two strings. Force the `://` form.
    s"${u.getScheme}://${Option(u.getAuthority).getOrElse("")}${u.getPath}"
  }

  /** Catalog names derive from the index LOCATION's qualified URI:
    * re-opening the same directory (under any spelling) reuses the
    * registration, two directories never collide. */
  def tableName(spark: SparkSession, prefix: String, dir: String): String = {
    val uri = qualifiedUri(spark, dir)
    val md5 = java.security.MessageDigest.getInstance("MD5")
      .digest(uri.getBytes("UTF-8")).take(8).map("%02x".format(_)).mkString
    s"${prefix}_$md5"
  }

  /** The append tail under `root/batch=<id>/` — the idempotent landing
    * zone of a foreachBatch index-maintenance sink (each micro-batch
    * overwrites its own batchId-named directory, so a crash-replayed batch
    * replaces rather than duplicates). Empty-with-`schema` when no batch
    * has landed; listed via Hadoop `globStatus` so the discovery works on
    * any configured filesystem and THROWS on an unreachable scheme. */
  def appendTail(spark: SparkSession, root: String,
      schema: org.apache.spark.sql.types.StructType): DataFrame = {
    val p = new Path(root)
    val fs: FileSystem = p.getFileSystem(spark.sessionState.newHadoopConf())
    val batches = Option(fs.globStatus(new Path(p, "batch=*")))
      .getOrElse(Array.empty)
      .filter(_.isDirectory)
      .map(_.getPath.toString)
    if (batches.isEmpty)
      // a LocalRelation empty, NOT an emptyRDD-backed frame: Catalyst can
      // prove a LocalRelation has zero rows, so PropagateEmptyRelation
      // prunes the whole tail branch out of every serve plan (an RDD scan
      // is opaque — measured: the un-pruned empty branch re-scanned and
      // re-shuffled the arrivals side once per serve)
      spark.createDataFrame(
        java.util.Collections.emptyList[org.apache.spark.sql.Row](), schema)
    // EXPLICIT schema, never inference (r18 finding, caught live by the
    // StreamBench policy-maintenance leg): a batch=<id> dir exists from
    // the moment its write JOB starts, but holds no committed footers
    // until job commit — schema inference over it throws
    // UNABLE_TO_INFER_SCHEMA, killing any reader that opens the index
    // while a maintenance batch is mid-commit. With the schema supplied
    // (it IS the cells schema — the landing paths write exactly it), an
    // in-flight dir reads as its committed rows: zero until the commit
    // renames the files in, the full batch after. Readers never race the
    // writer; unreadable SCHEMES still fail loudly above.
    else spark.read.schema(schema).parquet(batches.toSeq: _*)
      .select(schema.fieldNames.map(org.apache.spark.sql.functions.col): _*)
  }

  /** Delete every `batch=*` dir under each append root — called by every
    * index BUILDER before it returns its handle: base tables are written
    * with mode("overwrite"), so rebuilding into a previously-used location
    * must not silently resurrect a stale tail that was landed under the
    * OLD quantizer/hot order (appended items would serve with wrong cell
    * assignments, with no error — the same silent-wrong-tail family as
    * the r15 java.io.File finding). Hadoop FS, scheme-clean. */
  def clearAppendTails(spark: SparkSession, roots: Seq[String]): Unit = {
    val conf = spark.sessionState.newHadoopConf()
    roots.foreach { root =>
      val p = new Path(root)
      val fs = p.getFileSystem(conf)
      Option(fs.globStatus(new Path(p, "batch=*"))).getOrElse(Array.empty)
        .foreach(st => fs.delete(st.getPath, true))
    }
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
