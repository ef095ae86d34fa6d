package graft

import graft.plans.Reservoir

/** Custom operator stack (ReservoirSample logical node → strategy →
  * ReservoirSampleExec): exact-k cardinality, determinism, uniformity, and
  * the plan shape. */
class ReservoirSpec extends SparkSpec {

  test("exactly k rows out; all rows when input smaller than k") {
    import spark.implicits._
    val df = (1L to 1000L).toDF("v").repartition(8)
    assert(Reservoir.sample(df, 25).count() == 25)
    val small = (1L to 7L).toDF("v").repartition(3)
    val got = Reservoir.sample(small, 100).as[Long].collect().sorted.toSeq
    assert(got == (1L to 7L), s"under-k input passes through whole: $got")
  }

  test("deterministic for a fixed seed and partitioning") {
    import spark.implicits._
    val df = (1L to 500L).toDF("v").repartition(4)
    val a = Reservoir.sample(df, 20, seed = 11L).as[Long].collect().sorted.toSeq
    val b = Reservoir.sample(df, 20, seed = 11L).as[Long].collect().sorted.toSeq
    val c = Reservoir.sample(df, 20, seed = 12L).as[Long].collect().sorted.toSeq
    assert(a == b)
    assert(a != c, "different seeds should (overwhelmingly) differ")
  }

  test("sampling is uniform across elements (200 seeds, loose bounds)") {
    import spark.implicits._
    val df = (1L to 100L).toDF("v").repartition(4).cache()
    df.count()
    val hits = new Array[Int](101)
    for (seed <- 1 to 200) {
      Reservoir.sample(df, 10, seed.toLong).as[Long].collect()
        .foreach(v => hits(v.toInt) += 1)
    }
    // each element: Binomial(200, 0.1) → mean 20; P(0 hits) ~ 1e-10,
    // P(>60 hits) ~ 1e-14 — failures here mean real bias, not bad luck
    val (mn, mx) = ((1 to 100).map(hits).min, (1 to 100).map(hits).max)
    assert(mn > 0, s"some element never sampled (min=$mn)")
    assert(mx <= 60, s"some element over-sampled (max=$mx)")
    assert(hits.sum == 2000)
    df.unpersist()
  }

  test("plan uses ReservoirSampleExec (single pass, no sort of the corpus)") {
    import spark.implicits._
    val df = (1L to 100L).toDF("v")
    val exec = Reservoir.sample(df, 5).queryExecution.executedPlan
    assert(exec.collect { case e: graft.plans.ReservoirSampleExec => e }.nonEmpty,
      s"custom exec expected:\n$exec")
    assert(!exec.toString.contains("TakeOrderedAndProject") &&
      !exec.toString.toLowerCase.contains("sortexec"),
      s"no sort machinery expected:\n$exec")
  }

  test("works through spark.sql.extensions installation (GraftExtensions)") {
    // a FRESH session built with the extension must plan the operator too
    val s2 = org.apache.spark.sql.SparkSession.builder()
      .master("local[2]")
      .appName("graft-ext-reservoir")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    import s2.implicits._
    val df = (1L to 50L).toDF("v")
    // bypass Reservoir.sample's self-install: build the plan directly so
    // only the extension-injected strategy can plan it
    val planned = org.apache.spark.sql.GraftBridge.ofRows(s2,
      graft.plans.ReservoirSample(5, 3L, org.apache.spark.sql.GraftBridge.logicalPlan(df.toDF())))
    assert(planned.count() == 5)
  }

  test("samplePq: k smallest by priority, ≡ orderBy-limit, under-k passthrough, null skip") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val df = (1L to 500L).map(i => (i, (i * 2654435761L) % 1000003L))
      .toDF("id", "pri").repartition(7)
    val got = Reservoir.samplePq(df, 30, "pri")
      .select($"id").as[Long].collect().sorted.toSeq
    val want = df.orderBy($"pri".asc).limit(30)
      .select($"id").as[Long].collect().sorted.toSeq
    assert(got == want)
    // custom exec planned, not TakeOrderedAndProject (exchange-free input so
    // the plan isn't hidden inside an AdaptiveSparkPlan wrapper)
    val flat = (1L to 100L).map(i => (i, i * 3L)).toDF("id", "pri")
    val exec = Reservoir.samplePq(flat, 30, "pri").queryExecution.executedPlan
    assert(exec.collect { case e: graft.plans.PrioritySampleExec => e }.nonEmpty,
      s"custom exec expected:\n$exec")
    assert(!exec.toString.contains("TakeOrderedAndProject"), exec.toString)
    // under-k input passes through whole
    val small = (1L to 9L).map(i => (i, i * 10L)).toDF("id", "pri")
    assert(Reservoir.samplePq(small, 100, "pri").count() == 9)
    // NULL-priority rows are skipped
    val withNulls = spark.sql(
      "SELECT id, IF(id % 2 = 0, CAST(NULL AS BIGINT), id) AS pri FROM range(1, 21) t(id)")
    val sel = Reservoir.samplePq(withNulls, 5, "pri")
      .select($"id").as[Long].collect().sorted.toSeq
    assert(sel == Seq(1L, 3L, 5L, 7L, 9L), s"odd ids only: $sel")
  }

  test("samplePq pruning keeps the priority column below the sample, prunes the rest") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val dir = java.nio.file.Files.createTempDirectory("graft-pqp").toString + "/t"
    (1L to 1000L).map(i => (i, s"text_$i", (i * 2654435761L) % 1000003L, s"src${i % 5}"))
      .toDF("id", "text", "pri", "source")
      .write.parquet(dir)
    val wide = spark.read.parquet(dir)
    val narrow = Reservoir.samplePq(wide, 20, "pri").select($"id")
    val scan = narrow.queryExecution.executedPlan.collectLeaves().head.toString
    assert(scan.contains("ReadSchema: struct<id:bigint,pri:bigint>"),
      s"scan must read the projected column AND the priority column only:\n$scan")
    val idsNarrow = narrow.as[Long].collect().sorted.toSeq
    val idsWide = Reservoir.samplePq(wide, 20, "pri")
      .select($"id").as[Long].collect().sorted.toSeq
    assert(idsNarrow == idsWide)
  }

  test("ReservoirColumnPruning pushes projection below the sample, into the scan") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-rcp").toString + "/t"
    (1L to 1000L).map(i => (i, s"text_$i", i * 2.0, s"src${i % 5}"))
      .toDF("id", "text", "score", "source")
      .write.parquet(dir)
    val wide = spark.read.parquet(dir)
    val narrow = Reservoir.sample(wide, 20, seed = 7L).select($"id")
    // the pruning Project must land BELOW ReservoirSample and reach the scan
    val optimized = narrow.queryExecution.optimizedPlan.toString
    assert(optimized.contains("ReservoirSample"), optimized)
    val scan = narrow.queryExecution.executedPlan.collectLeaves().head.toString
    assert(scan.contains("ReadSchema: struct<id:bigint>"),
      s"scan must read only the projected column:\n$scan")
    // value-independence: pruning must not change WHICH rows are sampled
    val idsNarrow = narrow.as[Long].collect().sorted.toSeq
    val idsWide = Reservoir.sample(wide, 20, seed = 7L)
      .select($"id").as[Long].collect().sorted.toSeq
    assert(idsNarrow == idsWide,
      "same seed+partitioning must select identical rows with or without pruning")
  }

  test("samplePq rejects a non-LONG priority column at plan time") {
    // ADVICE r11: doExecute reads the column with getLong, which on e.g. an
    // INT column silently reads a zero-extended 8-byte slot and mis-ranks
    // (negative ints become huge positives). The guard must fail loudly.
    import spark.implicits._
    val intPri = (1 to 50).map(i => (i.toLong, i)).toDF("id", "pri")
    val e = intercept[IllegalArgumentException] {
      Reservoir.samplePq(intPri, 5, "pri")
    }
    assert(e.getMessage.contains("must be LONG"), e.getMessage)
  }

  test("samplePq with DUPLICATE priorities selects deterministically (byte tie-break)") {
    // ADVICE r12: the coalesce(1, shuffle = true) merge made tie selection
    // depend on run-to-run shuffle arrival order when the caller broke the
    // distinct-priority contract. Ties now break on the row's serialized
    // bytes — content-derived, so identical runs (and re-partitionings)
    // select identically even with massive priority collisions.
    import spark.implicits._
    // 400 rows, only 5 distinct priorities → k=12 forces tie decisions at
    // the boundary both in the partials and the merge
    val dup = (1L to 400L).map(i => (i, i % 5)).toDF("id", "pri")
    def run(parts: Int): Seq[(Long, Long)] =
      Reservoir.samplePq(dup.repartition(parts), 12, "pri")
        .as[(Long, Long)].collect().toSeq
    val a = run(8); val b = run(8); val c = run(8)
    assert(a == b && b == c, s"tie selection must be run-stable:\n$a\n$b\n$c")
    // all selected rows must still carry the smallest priority present
    assert(a.forall(_._2 == 0L), s"k=12 from 80 pri-0 rows must all be pri 0: $a")
    // and the same rows must be selected under a DIFFERENT partitioning —
    // the byte order is content-derived, not arrival-derived
    assert(run(3).toSet == a.toSet, "selection must not depend on partitioning")
  }

  test("per-partition pass runs one task per input partition (real stage boundary before merge)") {
    // ADVICE r11: the narrow coalesce(1) merge computed every upstream
    // partition inside the single merge task whenever the child had no
    // shuffle boundary — the "parallel per-partition pass" was serial.
    // With the shuffle boundary, a job over an 8-partition exchange-free
    // child must run a stage with 8 tasks before the 1-task merge.
    import spark.implicits._
    import scala.collection.mutable
    import scala.concurrent.duration._
    val stageTasks = mutable.ArrayBuffer.empty[Int]
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onStageCompleted(
          sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit =
        stageTasks.synchronized { stageTasks += sc.stageInfo.numTasks }
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      val df = (1L to 800L).map(i => (i, i * 7L)).toDF("id", "pri")
        .repartition(8).localCheckpoint() // pin an 8-partition, exchange-free child
      // the listener bus is async; poll (bounded) for the expected stage
      def sawStageWith(n: Int): Boolean = {
        val deadline = System.nanoTime() + 10.seconds.toNanos
        while (System.nanoTime() < deadline) {
          if (stageTasks.synchronized(stageTasks.contains(n))) return true
          Thread.sleep(50)
        }
        false
      }
      stageTasks.synchronized(stageTasks.clear())
      Reservoir.samplePq(df, 10, "pri").collect()
      assert(sawStageWith(8),
        s"expected an 8-task per-partition stage, saw stages with tasks: " +
          stageTasks.synchronized(stageTasks.toList))
      // same property for the RNG reservoir
      stageTasks.synchronized(stageTasks.clear())
      Reservoir.sample(df, 10, seed = 5L).collect()
      assert(sawStageWith(8),
        s"expected an 8-task per-partition stage, saw stages with tasks: " +
          stageTasks.synchronized(stageTasks.toList))
    } finally spark.sparkContext.removeSparkListener(listener)
  }
}
