package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Parallelism repair for CPU-heavy map stages.
  *
  * A single-file (or single-row-group) parquet table scans as ONE input
  * partition, so everything up to the first exchange — tokenizing,
  * shingling, signature hashing, bigram construction — runs on one core
  * no matter how many the cluster has. That layout is common at the edges
  * (small dimension dumps, fresh ingests, test fixtures); operators whose
  * pre-exchange stage is genuinely CPU-bound repair it themselves rather
  * than trusting the upstream layout.
  *
  * Applied SELECTIVELY, by measurement: the interpreted higher-order-
  * function pipeline in topNgrams gains 4.6× (8.1 s → 1.8 s warm at
  * sf0.1); the codegen'd minhash/shingle kernels measured NEUTRAL to
  * slightly negative (their single-core map cost is already small next to
  * their shuffles), so they do not widen.
  */
private[graft] object Par {

  /** Repartition up to the cluster's default parallelism — only when the
    * input arrives with FEWER partitions (never narrows a well-partitioned
    * 100 TB table, where the exchange would be catastrophic; the widening
    * shuffle on an under-partitioned input is by definition small). The
    * explicit partition count matters: AQE would coalesce an un-numbered
    * exchange of a few small MB right back to one partition. */
  def widen(df: DataFrame): DataFrame = {
    val target = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < target) df.repartition(target) else df
  }

  /** Distributed EXCLUSIVE prefix sum — the textbook two-pass scan that
    * replaces `sum().over(Window.orderBy(...))`'s single-partition
    * WindowExec (the r8 scale finding on x88/x100):
    *
    *  1. range-partition on `order` with an explicit partition count (an
    *     un-numbered exchange would be AQE-coalesced back to one
    *     partition) and pin ONE materialization via localCheckpoint so
    *     the offsets pass and the window pass read identical pids;
    *  2. per-partition totals → driver (bounded collect:
    *     ≤ `spark.sql.shuffle.partitions` rows, by config not data),
    *     scanned into exclusive per-partition offsets;
    *  3. offsets broadcast back; the running sum is a pid-PARTITIONED
    *     window — every partition scans in parallel.
    *
    * `order` must be a total order on the rows (a unique sort key): range
    * partitioning routes equal keys to one partition, but rows tying on
    * `order` would get an order-dependent in-partition prefix. For each
    * `(src, out)` in `sums`, adds long column `out` = Σ src over rows
    * strictly before this one in `order`. NULL srcs count as 0. */
  def exclusivePrefix(df: DataFrame, order: Column,
      sums: Seq[(String, String)]): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(sums.nonEmpty)
    val s = df.sparkSession
    val nParts = s.conf.get("spark.sql.shuffle.partitions", "32").toInt
    val p = df.repartitionByRange(nParts, order)
      .withColumn("__pid", spark_partition_id())
      .localCheckpoint()
    val aggs = sums.map { case (src, _) =>
      sum(coalesce(col(src).cast("long"), lit(0L))).as(src) }
    val parts = p.groupBy(col("__pid")).agg(aggs.head, aggs.tail: _*)
      .collect()
      .map(r => r.getInt(0) -> sums.indices.map(i => r.getLong(i + 1)))
      .sortBy(_._1)
    // exclusive scan over the (pid-sorted, possibly gappy) partition totals
    val offs = parts.scanLeft(sums.map(_ => 0L)) { case (acc, (_, tot)) =>
      acc.lazyZip(tot).map(_ + _) }
      .zip(parts).map { case (off, (pid, _)) =>
        org.apache.spark.sql.Row.fromSeq(pid +: off) }
    val schema = org.apache.spark.sql.types.StructType(
      org.apache.spark.sql.types.StructField("__pid",
        org.apache.spark.sql.types.IntegerType, nullable = false) +:
        sums.map { case (_, out) => org.apache.spark.sql.types.StructField(
          s"__off_$out", org.apache.spark.sql.types.LongType, nullable = false) })
    val offsDf = s.createDataFrame(
      s.sparkContext.parallelize(offs.toSeq, 1), schema)
    val w = Window.partitionBy(col("__pid")).orderBy(order)
      .rowsBetween(Window.unboundedPreceding, -1)
    sums.foldLeft(p.join(broadcast(offsDf), Seq("__pid"))) {
      case (acc, (src, out)) =>
        acc.withColumn(out, col(s"__off_$out") +
          coalesce(sum(coalesce(col(src).cast("long"), lit(0L))).over(w), lit(0L)))
    }.drop("__pid" +: sums.map { case (_, out) => s"__off_$out" }: _*)
  }

  /** Exact 1-based global row number by (`valueCol` asc/desc, `tieCol`
    * asc) without a single-partition window: the per-VALUE counts run
    * through [[exclusivePrefix]] (rows-strictly-before per distinct
    * value), ride back on a value equi-join, and the within-value index
    * is a window PARTITIONED by value — every stage is parallel, the only
    * bounded structure is the per-partition offset row set. Ties on
    * (value, tie) must be impossible for the rank to be total — pass a
    * unique tie column. */
  def globalRowNumber(df: DataFrame, valueCol: String, tieCol: String,
      ascending: Boolean, out: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val hist = df.groupBy(col(valueCol)).agg(count(lit(1)).as("__c"))
    val ord = if (ascending) col(valueCol).asc else col(valueCol).desc
    val pre = exclusivePrefix(hist, ord, Seq("__c" -> "__before"))
      .select(col(valueCol), col("__before"))
    val w = Window.partitionBy(col(valueCol)).orderBy(col(tieCol))
    df.join(pre, Seq(valueCol))
      .withColumn(out, col("__before") + row_number().over(w).cast("long"))
      .drop("__before")
  }
}
