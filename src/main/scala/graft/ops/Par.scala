package graft.ops

import org.apache.spark.sql.DataFrame

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
}
