package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Attribute
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{Partitioning, SinglePartition}
import org.apache.spark.sql.execution.{SparkPlan, UnaryExecNode}

/** Exact-k distributed reservoir sampling as a full custom operator stack —
  * build-brief preference (c): LogicalPlan + SparkStrategy + SparkPlan,
  * registered either per-session ([[Reservoir.sample]] self-installs) or at
  * build time via `graft.GraftExtensions` (spark.sql.extensions).
  *
  * Why an operator: "give me exactly k uniformly sampled rows" is a
  * first-class need of a training-data pipeline (fixed eval sets, bounded
  * debugging corpora). `df.sample(fraction)` is Bernoulli — the row COUNT
  * varies; `orderBy(rand()).limit(k)` is exact and Spark plans it as
  * TakeOrderedAndProject, but it materializes a random sort key per row and
  * compares keys through the sort machinery. This operator streams each
  * partition ONCE with an Algorithm-R reservoir (O(k) state, no keys, no
  * comparator), then merges the per-partition reservoirs weighted by their
  * observed counts (Efraimidis–Spirakis exponential keys — the same merge
  * the production sketch libraries use). Exactly min(k, n) rows come out;
  * only numPartitions × k rows ever move.
  */
object Reservoir {

  /** Uniform exact-k sample of `df` (deterministic for a fixed seed +
    * partitioning). Installs the planner strategy into the session on first
    * use. */
  def sample(df: DataFrame, k: Int, seed: Long = 42L): DataFrame = {
    val spark = df.sparkSession
    GraftBridge.installStrategy(spark, ReservoirSampleStrategy)
    GraftBridge.installOptimizerRule(spark, ReservoirColumnPruning)
    GraftBridge.ofRows(spark, ReservoirSample(k, seed, GraftBridge.logicalPlan(df)))
  }

  /** DETERMINISTIC k-smallest-by-priority sample through the same operator
    * stack — the auditable counterpart of [[sample]]: `priorityCol` must be
    * a non-null LONG column with distinct values (callers derive it with
    * seeded integer hashing, e.g. `Exprs.smix64`; NULL-priority rows are
    * skipped). Duplicate priorities — a broken contract — degrade safely:
    * ties are broken by the row's serialized bytes, a content-derived
    * order, so even then identical runs select identically (the selection
    * is merely no longer priority-meaningful). Same
    * physical shape — one streaming pass per partition with O(k) state
    * (a bounded max-heap), then a single-task merge — but zero RNG: the
    * result replays bit-for-bit in any engine with 64-bit arithmetic,
    * which is what lets the driver's DuckDB gate hash-verify this stack's
    * strategy installation, column-pruning rule, partition pass, and merge
    * (x187), leaving only [[sample]]'s JVM-RNG draw rows-only. */
  def samplePq(df: DataFrame, k: Int, priorityCol: String): DataFrame = {
    // Fail at plan time, not silently mis-rank: doExecute reads the column
    // with getLong, which on a non-long column would read a zero-extended
    // 8-byte slot (negative ints become huge positives) instead of erroring.
    require(df.schema(priorityCol).dataType ==
        org.apache.spark.sql.types.LongType,
      s"priority sample: column $priorityCol must be LONG, " +
        s"got ${df.schema(priorityCol).dataType.simpleString}")
    val spark = df.sparkSession
    GraftBridge.installStrategy(spark, ReservoirSampleStrategy)
    GraftBridge.installOptimizerRule(spark, ReservoirColumnPruning)
    GraftBridge.ofRows(spark, PrioritySample(k, priorityCol, GraftBridge.logicalPlan(df)))
  }
}

/** Logical node: exactly min(k, |child|) uniformly sampled rows. */
case class ReservoirSample(k: Int, seed: Long, child: LogicalPlan) extends UnaryNode {
  require(k > 0, "reservoir: k must be positive")
  override def output: Seq[Attribute] = child.output
  override def maxRows: Option[Long] = Some(k.toLong)
  override protected def withNewChildInternal(newChild: LogicalPlan): ReservoirSample =
    copy(child = newChild)
}

/** Custom optimizer rule — build-brief extension point (b): column pruning
  * THROUGH the reservoir. Catalyst's built-in ColumnPruning doesn't know a
  * foreign node, so `Reservoir.sample(df, k).select("id")` would otherwise
  * drag every column of `df` through the per-partition reservoirs and the
  * single-task merge. Reservoir selection reads only the RNG and the row
  * stream — never a column value — so pushing a Project below the sample
  * is semantics-preserving EXACTLY: same partition row counts, same draws,
  * same selected positions for a fixed seed, just narrower rows. At 100 TB
  * that is the difference between shuffling k wide documents per partition
  * and k ids.
  *
  * Fires on Project(ReservoirSample) when the projection needs a strict
  * subset of the child's columns; inserts the pruning Project beneath the
  * sample (where Catalyst's own rules then push it into the scan). The
  * guard makes it fire at most once per sample node. */
object ReservoirColumnPruning
  extends org.apache.spark.sql.catalyst.rules.Rule[LogicalPlan] {
  import org.apache.spark.sql.catalyst.expressions.AttributeSet
  import org.apache.spark.sql.catalyst.plans.logical.Project

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformDown {
    case p @ Project(projList, r: ReservoirSample) =>
      val needed = AttributeSet(projList.flatMap(_.references))
      val kept = r.child.output.filter(needed.contains)
      if (kept.length < r.child.output.length)
        p.copy(child = r.copy(child = Project(kept, r.child)))
      else p
    case p @ Project(projList, r: PrioritySample) =>
      // unlike the RNG reservoir, the priority sample READS one column —
      // the pruned projection must keep it even when the outer projection
      // drops it
      val needed = AttributeSet(projList.flatMap(_.references))
      val kept = r.child.output.filter(a =>
        needed.contains(a) || a.name == r.priorityCol)
      if (kept.length < r.child.output.length)
        p.copy(child = r.copy(child = Project(kept, r.child)))
      else p
  }
}

/** Planner strategy: one physical spelling, no alternatives. */
object ReservoirSampleStrategy extends org.apache.spark.sql.execution.SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case ReservoirSample(k, seed, child) =>
      ReservoirSampleExec(k, seed, planLater(child)) :: Nil
    case PrioritySample(k, priorityCol, child) =>
      PrioritySampleExec(k, priorityCol, planLater(child)) :: Nil
    case _ => Nil
  }
}

/** Logical node: the min(k, |child|) rows with the SMALLEST values of
  * `priorityCol` (a long column; see [[Reservoir.samplePq]]). */
case class PrioritySample(k: Int, priorityCol: String, child: LogicalPlan)
  extends UnaryNode {
  require(k > 0, "priority sample: k must be positive")
  override def output: Seq[Attribute] = child.output
  override def maxRows: Option[Long] = Some(k.toLong)
  // Unlike the RNG reservoir this node READS a column; declaring it keeps
  // Catalyst's generic UnaryNode column pruning from stripping the
  // priority column out from underneath the exec.
  override def references: org.apache.spark.sql.catalyst.expressions.AttributeSet =
    org.apache.spark.sql.catalyst.expressions.AttributeSet(
      child.output.filter(_.name == priorityCol))
  override protected def withNewChildInternal(newChild: LogicalPlan): PrioritySample =
    copy(child = newChild)
}

/** Physical operator: per-partition bounded MAX-heap of the k smallest
  * priorities (single pass, O(k) state, deterministic integer comparisons
  * only), then a single-task merge of ≤ numPartitions × k candidates.
  * Output is sorted ascending by priority — a deterministic total order
  * whenever priorities are distinct. */
case class PrioritySampleExec(k: Int, priorityCol: String, child: SparkPlan)
  extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output
  override def outputPartitioning: Partitioning = SinglePartition
  override protected def withNewChildInternal(newChild: SparkPlan): PrioritySampleExec =
    copy(child = newChild)

  override protected def doExecute(): RDD[InternalRow] = {
    val kk = k
    val ord = child.output.indexWhere(_.name == priorityCol)
    require(ord >= 0, s"priority sample: column $priorityCol not in child output")
    val fieldTypes = child.output.map(_.dataType).toArray
    import org.apache.spark.sql.catalyst.expressions.UnsafeRow
    // Priority ties (a broken caller contract — see [[Reservoir.samplePq]])
    // are broken by the row's OWN serialized bytes: a content-derived,
    // partitioning- and arrival-order-independent total order, evaluated
    // only when two priorities actually collide. Without it, the
    // coalesce(1, shuffle = true) merge below would make tie selection
    // depend on run-to-run shuffle arrival order.
    // Compares in place via the rows' base object/offset — getBytes would
    // copy each row's byte region per comparison, two allocations per
    // heap-comparator call on heavily tied priorities.
    def cmpBytes(x: UnsafeRow, y: UnsafeRow): Int = {
      import org.apache.spark.unsafe.Platform
      val xo = x.getBaseObject; val xOff = x.getBaseOffset; val xn = x.getSizeInBytes
      val yo = y.getBaseObject; val yOff = y.getBaseOffset; val yn = y.getSizeInBytes
      val n = math.min(xn, yn)
      var i = 0
      while (i < n) {
        val c = java.lang.Integer.compare(
          Platform.getByte(xo, xOff + i) & 0xff, Platform.getByte(yo, yOff + i) & 0xff)
        if (c != 0) return c
        i += 1
      }
      java.lang.Integer.compare(xn, yn)
    }
    // Bounded max-heap of the k smallest (priority, bytes) entries; rows are
    // materialized (copied) only on ADMISSION — `toUnsafe` may return a
    // reused row (the stage-1 projection), `materialize` makes it heap-safe.
    // Returned ascending (max-heap polls largest-first; fill backwards).
    def topK(it: Iterator[InternalRow], toUnsafe: InternalRow => UnsafeRow,
        materialize: UnsafeRow => UnsafeRow): Array[(Long, UnsafeRow)] = {
      val heap = new java.util.PriorityQueue[(Long, UnsafeRow)](
        math.max(kk, 1),
        new java.util.Comparator[(Long, UnsafeRow)] {
          override def compare(a: (Long, UnsafeRow), b: (Long, UnsafeRow)): Int = {
            val c = java.lang.Long.compare(b._1, a._1)
            if (c != 0) c else cmpBytes(b._2, a._2)
          }
        })
      it.foreach { row =>
        if (!row.isNullAt(ord)) {
          val pri = row.getLong(ord)
          if (heap.size < kk) {
            heap.offer((pri, materialize(toUnsafe(row))))
          } else {
            val top = heap.peek()
            if (pri < top._1) {
              heap.poll()
              heap.offer((pri, materialize(toUnsafe(row))))
            } else if (pri == top._1) {
              val u = toUnsafe(row)
              if (cmpBytes(u, top._2) < 0) {
                heap.poll()
                heap.offer((pri, materialize(u)))
              }
            }
          }
        }
      }
      val arr = new Array[(Long, UnsafeRow)](heap.size)
      var i = arr.length - 1
      while (i >= 0) { arr(i) = heap.poll(); i -= 1 }
      arr
    }
    // Admission materializes an UnsafeRow copy (the stream reuses rows, and
    // the candidates cross a REAL stage boundary below, so they must be
    // serializable regardless of what row class the child emits). The merge
    // stage skips the copy — its inputs are the already-materialized,
    // individually-deserialized candidates.
    val partials = child.execute().mapPartitions { it =>
      val proj = org.apache.spark.sql.catalyst.expressions
        .UnsafeProjection.create(fieldTypes)
      topK(it, row => proj(row), _.copy()).iterator.map(_._2): Iterator[InternalRow]
    }
    // shuffle = true: with the narrow coalesce(1) the single merge task
    // computed every upstream partition ITSELF whenever the child had no
    // shuffle boundary — the "per-partition pass" ran serially in one task.
    // The shuffle moves only the already-reduced ≤ numPartitions × k
    // candidate rows (negligible), and stage 1 genuinely runs one task per
    // input partition. Merge arrival order cannot change the result: the
    // heap re-ranks by (priority, bytes), a total order over distinct rows.
    partials.coalesce(1, shuffle = true)
      .mapPartitions(it => topK(it, _.asInstanceOf[UnsafeRow], identity)
        .iterator.map(_._2): Iterator[InternalRow])
  }
}

/** Physical operator: per-partition Algorithm-R reservoirs (single pass,
  * O(k) state), then a single-task weighted merge. */
case class ReservoirSampleExec(k: Int, seed: Long, child: SparkPlan)
  extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output
  override def outputPartitioning: Partitioning = SinglePartition
  override protected def withNewChildInternal(newChild: SparkPlan): ReservoirSampleExec =
    copy(child = newChild)

  override protected def doExecute(): RDD[InternalRow] = {
    val kk = k
    val s = seed
    // Seed hygiene: every RNG stream (each partition, and the merge) gets a
    // DISTINCT splitmix64-scrambled seed. Deriving them with plain XOR made
    // partition 0's stream identical to the merge's (s ^ 0 == s), which
    // correlated merge keys with partition-0 acceptance draws — a real,
    // test-caught uniformity bias.
    def scrambled(tag: Long): Long = graft.functions.Ops.splitmix64(s + tag)
    val fieldTypes = child.output.map(_.dataType).toArray
    // stage 1: Algorithm R per partition; emit (partition idx, rows seen,
    // reservoir). Rows are materialized as UnsafeRow copies because the
    // partials cross a real stage boundary below.
    val partials: RDD[(Int, Long, Array[InternalRow])] =
      child.execute().mapPartitionsWithIndex { (idx, it) =>
        val proj = org.apache.spark.sql.catalyst.expressions
          .UnsafeProjection.create(fieldTypes)
        val rng = new java.util.Random(scrambled(idx.toLong + 1L))
        val buf = new Array[InternalRow](kk)
        var n = 0L
        while (it.hasNext) {
          val row = it.next()
          if (n < kk) {
            buf(n.toInt) = proj(row).copy() // unsafe rows are reused by the iterator
          } else {
            val j = (rng.nextDouble() * (n + 1)).toLong
            if (j < kk) buf(j.toInt) = proj(row).copy()
          }
          n += 1
        }
        val res = if (n >= kk) buf else java.util.Arrays.copyOf(buf, n.toInt)
        Iterator.single((idx, n, res))
      }
    // stage 2: weighted merge in one task. Each reservoir item stands for
    // n_i / |res_i| stream rows; Efraimidis–Spirakis assigns key
    // u^(1/weight) and keeps the k largest — uniform over the union.
    // shuffle = true so stage 1 actually runs one task per input partition
    // (the narrow coalesce(1) made the merge task compute every upstream
    // partition serially itself); only numPartitions × k reduced rows move.
    // The shuffle's arrival order is nondeterministic, so the merge sorts
    // partials back into partition order before drawing — the RNG stream
    // consumption is then identical to the old narrow-coalesce order and
    // the sample replays bit-for-bit for a fixed seed + partitioning.
    partials.coalesce(1, shuffle = true).mapPartitions { it =>
      val parts = it.filter(_._2 > 0L).toArray.sortBy(_._1)
      val rng = new java.util.Random(scrambled(0L))
      val keyed = parts.flatMap { case (_, n, res) =>
        val w = n.toDouble / res.length
        res.map(row => (math.pow(rng.nextDouble(), 1.0 / w), row))
      }
      keyed.sortBy(-_._1).take(kk).iterator.map(_._2)
    }
  }
}
