package graft

import org.apache.spark.sql.functions._
import graft.ops.{Graph, Itemsets, Stats}

/** Exact-behavior contracts for the basket/graph/series mining operators
  * (x113–x116): hand-built inputs with known answers. The DuckDB oracles
  * check engine parity; these check the MATH. */
class MiningSpec extends SparkSpec {

  // --------------------------------------------------------- frequent pairs
  test("frequentPairs: counts, lift, and A-priori item pruning on a known basket set") {
    import spark.implicits._
    // 4 baskets; items: a in 3, b in 3, c in 2, d in 1 (d cannot reach
    // minSupport=2 and must be pruned before pair generation)
    val baskets = Seq(
      (1L, "a"), (1L, "b"), (1L, "d"),
      (2L, "a"), (2L, "b"),
      (3L, "a"), (3L, "c"),
      (4L, "b"), (4L, "c"), (4L, "c") // duplicate line collapses
    ).toDF("bk", "it")
    val out = Itemsets.frequentPairs(baskets, "bk", "it", minSupport = 2L, topK = 10)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(5)))
    // co(a,b)=2 lift=2*4*1e6/(3*3); co(a,c)=1 < 2 dropped; co(b,c)=1 dropped;
    // every pair with d dropped by pass-1 pruning
    assert(out.toSeq == Seq(("a", "b", 2L, 2L * 4L * 1000000L / 9L)))
    // caller-contract path: on an input that IS distinct, waiving the
    // defensive dedup shuffle must change nothing
    val distinctIn = baskets.distinct().localCheckpoint()
    val viaContract = Itemsets
      .frequentPairs(distinctIn, "bk", "it", 2L, 10, assumeDistinct = true)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(5)))
    assert(viaContract.toSeq == out.toSeq)
  }

  test("frequentPairs: empty when nothing reaches support") {
    import spark.implicits._
    val baskets = Seq((1L, "a"), (2L, "b")).toDF("bk", "it")
    assert(Itemsets.frequentPairs(baskets, "bk", "it", 2L, 10).count() == 0L)
  }

  // ------------------------------------------------------ label propagation
  test("labelPropagation: clamped seeds, majority vote, lowest-label ties, unreached = -1") {
    import spark.implicits._
    // path 1-2-3-4 plus isolated pair 5-6 (no seed → -1), and node 7 seeded
    // but also voted at by a neighbor with a different label (clamp wins)
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (5L, 6L), (4L, 7L)).toDF("a", "b")
    val seeds = Seq((1L, 10L), (4L, 20L), (7L, 30L)).toDF("v", "seed_label")
    val out = Graph.labelPropagation(edges, seeds, rounds = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out(1L) == 10L && out(4L) == 20L && out(7L) == 30L) // clamped
    assert(out(2L) == 10L) // neighbor of seed 1
    // node 3 hears 10 (from 2) and 20 (from 4) with one vote each from
    // round 2 on → tie → smallest label
    assert(out(3L) == 10L)
    assert(out(5L) == -1L && out(6L) == -1L) // unreachable from any seed
  }

  test("labelPropagation: driver fast path ≡ distributed loop; degenerate seeds fall back") {
    import spark.implicits._
    // richer shape than the contract test: a 4-cycle with competing seeds,
    // a star whose center hears 3 equal votes (tie → lowest), a 7-chain
    // (3 rounds can't cover it — partial reach), reversed-duplicate
    // edges (1,2)+(2,1) that double those votes identically on both paths,
    // EXACT duplicate raw rows ((2,3) three times, (10,12) twice) that the
    // loop's distinct() and the fast path's driver dedup must both drop,
    // and a self-loop (3,3) both must filter
    val edges = Seq((1L, 2L), (2L, 1L), (2L, 3L), (2L, 3L), (2L, 3L),
      (3L, 3L), (3L, 4L), (4L, 1L),
      (10L, 11L), (10L, 12L), (10L, 12L), (10L, 13L),
      (20L, 21L), (21L, 22L), (22L, 23L), (23L, 24L), (24L, 25L), (25L, 26L))
      .toDF("a", "b")
    val seeds = Seq((1L, 5L), (3L, 7L), (11L, 9L), (12L, 4L), (13L, 4L),
      (20L, 1L)).toDF("v", "seed_label")
    def run(cap: Int) = Graph.labelPropagation(edges, seeds, rounds = 3, cap)
      .as[(Long, Long)].collect().toMap
    val fast = run(1 << 20)
    val loop = run(0)
    assert(fast == loop, "driver fast path diverged from the distributed loop")
    assert(fast(10L) == 4L) // 2 votes for 4 beat 1 vote for 9
    assert(fast(26L) == -1L) // 3 rounds reach only 20..23
    // duplicate seed key (degenerate input): fast path must decline; both
    // spellings then come from the loop and still agree
    val dupSeeds = seeds.unionAll(Seq((1L, 6L)).toDF("v", "seed_label"))
    val a = Graph.labelPropagation(edges, dupSeeds, rounds = 2, 1 << 20)
      .groupBy("v").count().filter($"count" > 1).count()
    val b = Graph.labelPropagation(edges, dupSeeds, rounds = 2, 0)
      .groupBy("v").count().filter($"count" > 1).count()
    assert(a == b) // identical (degenerate) fan-out either way
    // non-long ids: fast path structurally unavailable, loop still correct
    val sEdges = Seq(("a", "b"), ("b", "c")).toDF("a", "b")
    val sSeeds = Seq(("a", 3L)).toDF("v", "seed_label")
    val sOut = Graph.labelPropagation(sEdges, sSeeds, rounds = 2, 1 << 20)
      .as[(String, Long)].collect().toMap
    assert(sOut == Map("a" -> 3L, "b" -> 3L, "c" -> 3L))
  }

  test("labelPropagation boundaries: empty edges, self-loops only, empty seeds") {
    import spark.implicits._
    val seeds = Seq((1L, 10L)).toDF("v", "seed_label")
    val empty = Seq.empty[(Long, Long)].toDF("a", "b")
    for (cap <- Seq(1 << 20, 0)) {
      // no edges → no graph nodes → empty output (seeds outside the graph
      // never appear), identically on both strategies
      assert(Graph.labelPropagation(empty, seeds, 2, cap).count() == 0L)
      // self-loops are filtered before anything else → same as empty
      val loops = Seq((5L, 5L)).toDF("a", "b")
      assert(Graph.labelPropagation(loops, seeds, 2, cap).count() == 0L)
      // empty seeds → every node present but unreached (-1)
      val e = Seq((1L, 2L)).toDF("a", "b")
      val out = Graph.labelPropagation(e,
        Seq.empty[(Long, Long)].toDF("v", "seed_label"), 2, cap)
        .as[(Long, Long)].collect().toMap
      assert(out == Map(1L -> -1L, 2L -> -1L), s"cap=$cap: $out")
    }
  }

  test("labelPropagation: fast path ≡ loop on 6 seeded pseudo-random multigraphs") {
    import spark.implicits._
    for (seed <- 0 until 6) {
      val n = 5 + seed * 3
      val raw = (for {
        i <- 0 until n; j <- 0 until n
        r = graft.functions.Ops.splitmix64(seed.toLong * 7919 + i * n + j)
        if r % 4 == 0
      } yield (i.toLong, j.toLong)) ++ Seq((0L, 0L), (1L, 0L), (0L, 1L))
      // ~half the nodes seeded; labels collide on purpose (majority + tie
      // paths), one NULL seed label (clamps nothing, joins nothing)
      val seeds = (0 until n by 2).map(v =>
        (v.toLong, Some(graft.functions.Ops.splitmix64(seed + v.toLong) % 3))) :+
        (3L, None: Option[Long])
      val sdf = seeds.toDF("v", "seed_label")
      val edf = raw.toDF("a", "b")
      for (rounds <- Seq(1, 3)) {
        val fast = Graph.labelPropagation(edf, sdf, rounds, 1 << 20)
          .as[(Long, Long)].collect().toMap
        val loop = Graph.labelPropagation(edf, sdf, rounds, 0)
          .as[(Long, Long)].collect().toMap
        assert(fast == loop, s"seed=$seed rounds=$rounds: fast $fast != loop $loop")
      }
    }
  }

  // ----------------------------------------------------------- changepoint
  test("meanSplitChangepoint finds an exact step and its segment means") {
    import spark.implicits._
    // 6 days: 2/day for 3 days then 6/day for 3 days → split after day 3,
    // gap = |2 - 6| = 4 → 4_000_000 ppm
    val rows = (for {
      d <- 1 to 6
      k <- 1 to (if (d <= 3) 2 else 6)
    } yield ("g", java.sql.Timestamp.valueOf(f"2024-01-0$d%d 12:00:0$k%d"))).toSeq
    val df = rows.toDF("g", "ts")
    val out = Stats.meanSplitChangepoint(df, "g", "ts").collect()(0)
    assert(out.getAs[java.sql.Date]("split_day").toString == "2024-01-03")
    assert(out.getAs[Long]("n_days") == 6L)
    assert(out.getAs[Long]("gap_ppm") == 4000000L)
    assert(out.getAs[Long]("left_mean_ppm") == 2000000L)
    assert(out.getAs[Long]("right_mean_ppm") == 6000000L)
  }

  test("meanSplitChangepoint: constant series has zero gap and earliest-day tie-break") {
    import spark.implicits._
    val rows = (1 to 4).map(d => ("g", java.sql.Timestamp.valueOf(f"2024-02-0$d%d 01:00:00")))
    val out = Stats.meanSplitChangepoint(rows.toDF("g", "ts"), "g", "ts").collect()(0)
    assert(out.getAs[Long]("gap_ppm") == 0L)
    assert(out.getAs[java.sql.Date]("split_day").toString == "2024-02-01")
  }

  // ------------------------------------------------------------ RRF fusion
  test("x116 hybrid RRF: fused score is exactly the reciprocal-rank sum of its legs") {
    val out = graft.queries.Extensions.x116HybridRrf(spark, "/root/testdata/sf0.001")
      .collect()
    assert(out.nonEmpty && out.length <= 15)
    def leg(rank: Long): Long = if (rank < 0) 0L else 1000000000000L / (60L + rank)
    out.foreach { r =>
      val (s, d, q) = (r.getAs[Long]("sparse_rank"), r.getAs[Long]("dense_rank"),
        r.getAs[Long]("rrf_q"))
      assert(q == leg(s) + leg(d), s"doc ${r.get(0)}")
      assert(s != -1L || d != -1L) // every fused doc came from some leg
    }
    // descending fused order with doc_id tie-break
    val qs = out.map(r => (-r.getAs[Long]("rrf_q"), r.getAs[Long]("doc_id")))
    assert(qs.sameElements(qs.sorted))
  }

  // ------------------------------------------------- weighted priority sample
  test("weightedPrioritySample matches the local replay and is partitioning-invariant") {
    import spark.implicits._
    val df = (1L to 20L).map(i => (i, i * 10L)).toDF("id", "w")
    val expect = (1L to 20L)
      .map(i => (i, (graft.functions.Ops.splitmix64(i) & Long.MaxValue) / (i * 10L)))
      .sortBy { case (id, pri) => (pri, id) }.take(5).map(_._1)
    val got = graft.ops.Curation.weightedPrioritySample(df, "id", "w", k = 5)
      .collect().map(_.getLong(0)).toSeq
    assert(got == expect)
    val reparted = graft.ops.Curation.weightedPrioritySample(
      df.repartition(7), "id", "w", k = 5).collect().map(_.getLong(0)).toSeq
    assert(reparted == expect)
  }

  test("weightedPrioritySample drops non-positive and NULL weights") {
    import spark.implicits._
    val df = Seq((1L, 0L), (2L, -5L), (3L, 100L)).toDF("id", "w")
    val got = graft.ops.Curation.weightedPrioritySample(df, "id", "w", k = 10)
      .collect().map(_.getLong(0)).toSeq
    assert(got == Seq(3L))
  }

  // --------------------------------------------------------------- BPE encode
  test("bpeEncodeReport: hand-computed merges and compression on a 2-doc corpus") {
    import spark.implicits._
    // merges: round 1 count ties (a,a)=2 (a,b)=2 → lex → (a,a);
    // round 2 (a_a,b)=2 wins. Encoded: [a_a_b] and [a_a_b, b].
    val corpus = Seq(("s", "a a b"), ("s", "a a b b")).toDF("source", "text")
    val out = graft.ops.Bpe.bpeEncodeReport(corpus, "source", "text", merges = 2)
      .collect()(0)
    assert(out.getAs[String]("source") == "s")
    assert(out.getAs[Long]("n_docs") == 2L)
    assert(out.getAs[Long]("tok_raw") == 7L)
    assert(out.getAs[Long]("tok_bpe") == 3L)
    assert(out.getAs[Long]("compression_ppm") == 3L * 1000000L / 7L)
  }

  // ------------------------------------------------------- sorted neighborhood
  test("sortedNeighborhoodPairs: in-block neighbors with exact Levenshtein, blocks never cross") {
    import spark.implicits._
    val parts = Seq((1L, "red plate"), (2L, "red plate"), (3L, "red slate"),
      (4L, "zed plate")).toDF("id", "name")
    val got = graft.ops.Dedup.sortedNeighborhoodPairs(parts, "id", "name",
      blockLen = 4, window = 3, maxDist = 4, topK = 100)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(4))).toSeq
    // sort order in block "red ": (1,2) dup, then slate one edit away
    assert(got == Seq((1L, 2L, 0L), (1L, 3L, 1L), (2L, 3L, 1L)))
    // "zed plate" is 1 edit from "red plate" but in another block — by design
    assert(!got.exists(p => p._1 == 4L || p._2 == 4L))
  }

  // ------------------------------------------------------------- OLS trend
  test("olsTrend: exact slope on a hand-built linear series, short groups dropped") {
    import spark.implicits._
    val rows = (0 to 3).map(d =>
      ("g", java.sql.Date.valueOf(s"2024-01-0${d + 1}"), (100L + 3L * d) * 100L)) ++
      Seq(("solo", java.sql.Date.valueOf("2024-01-01"), 500L)) // 1 day → dropped
    val df = rows.toDF("seg", "day", "cents")
    val out = Stats.olsTrend(df, "seg", "day", col("cents")).collect()
    assert(out.length == 1)
    assert(out(0).getAs[String]("seg") == "g")
    assert(out(0).getAs[Long]("n_days") == 4L)
    assert(out(0).getAs[Long]("total_units") == 100L + 103L + 106L + 109L)
    assert(out(0).getAs[Long]("slope_e2") == 300L)
  }

  // --------------------------------------------------------- k-center coreset
  test("kCenterCoreset: farthest-first picks on a hand 1-d corpus") {
    import spark.implicits._
    // points (as 1-dim vectors): id→value 1→0.0, 2→0.001, 3→1.0, 4→1.001
    // start = id 1; farthest = 3 or 4 (4 is farther) → 4; then farthest
    // from {1,4} is 3 (min dist 1e-3·1e6=1000 → d2=1e6)... vs 2 (d2=1e6 to 1)
    // tie on d2 → lowest id → 2
    val pts = Seq((1L, Seq(0.0f)), (2L, Seq(0.001f)), (3L, Seq(1.0f)),
      (4L, Seq(1.001f))).toDF("vec_id", "embedding")
    val got = graft.ops.Clustering.kCenterCoreset(pts, "vec_id", "embedding", k = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    // quantized: 0, 1000, 1000000, 1001000 (floor of the float32 values ×1e6)
    assert(got(0) == (1L, 1L, 0L))
    assert(got(1) == (2L, 4L, 1001000L * 1001000L))
    // round 3 min-dists from {0, 1001000}: id2 → 1000², id3 → 1000² — tie
    // on d2 → lowest id → 2
    assert(got(2) == (3L, 2L, 1000L * 1000L))
  }

  test("kCenterCoreset: empty corpus yields an empty frame with the right schema") {
    import spark.implicits._
    val empty = Seq.empty[(Long, Seq[Float])].toDF("vec_id", "embedding")
    val out = graft.ops.Clustering.kCenterCoreset(empty, "vec_id", "embedding", k = 4)
    assert(out.columns.toSeq == Seq("center_rank", "vec_id", "d2_at_pick"))
    assert(out.count() == 0L)
  }

  // ------------------------------------------------------------- attribution
  test("linearAttribution: per-conversion credit sums to exactly 1e6, remainder to earliest") {
    import spark.implicits._
    def t(min: Int) = new java.sql.Timestamp(1704067200000L + min * 60000L)
    val evs = Seq(
      (1L, t(0), 1L, "click", 0.0),   // earliest of 3 touches → 333334
      (2L, t(10), 1L, "click", 0.0),
      (3L, t(20), 1L, "click", 0.0),
      (4L, t(30), 1L, "purchase", 9.0),
      (5L, t(0), 2L, "click", 0.0),   // outside the hour for user 2's purchase
      (6L, t(90), 2L, "purchase", 1.0))
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    val out = graft.ops.EventAnalytics.linearAttribution(evs,
      "user_id", "event_type", "ts", "event_id", "click", "purchase", 3600L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // all three touches land in hour 0 (UTC midnight)
    assert(out.toSeq == Seq((0L, 3L, 1000000L)))
  }

  test("x123 on real events: every conversion's credit sums to exactly 1e6") {
    import spark.implicits._
    val dir = "/root/testdata/sf0.001"
    val total = graft.queries.Extensions.x123Attribution(spark, dir)
      .agg(sum($"credit_ppm_sum"), sum($"n_credits")).collect()(0)
    // total ppm must be 1e6 × (#purchases with ≥1 credited click)
    val ev = graft.Tables.events(spark, dir)
    val clicks = ev.filter($"event_type" === "click")
      .select($"user_id".as("u"), unix_micros($"ts").as("tus"))
    val convs = ev.filter($"event_type" === "purchase")
      .select($"user_id".as("u"), unix_micros($"ts").as("cus"), $"event_id")
    val nConv = convs.join(clicks, Seq("u"))
      .filter($"tus" >= $"cus" - 3600000000L && $"tus" < $"cus")
      .select($"event_id").distinct().count()
    assert(total.getLong(0) == 1000000L * nConv)
  }

  // ------------------------------------------------------------ HLL overlap
  test("x124: union dominates both legs; intersection is the clamped inclusion-exclusion") {
    val rows = graft.queries.Extensions.x124HllOverlap(spark, "/root/testdata/sf0.001")
      .collect()
    assert(rows.length == 10) // C(5 types, 2)
    rows.foreach { r =>
      val (a, b, u, i) = (r.getAs[Long]("est_a_micro"), r.getAs[Long]("est_b_micro"),
        r.getAs[Long]("est_union_micro"), r.getAs[Long]("est_inter_micro"))
      assert(u >= math.max(a, b)) // register max can only grow the estimate
      assert(i == math.max(0L, a + b - u))
    }
  }

  // -------------------------------------------------------- decayed popularity
  test("decayedPopularity: right-shift half-life weights, stale days contribute zero") {
    import spark.implicits._
    def d(day: Int, n: Int) = (1 to n).map(i =>
      ("t", java.sql.Timestamp.valueOf(f"2024-03-$day%02d 10:00:0${i % 10}%d.$i%03d")))
    // 3 events on the anchor day, 2 one day back, 1 thirty days back (dead)
    val df = (d(31, 3) ++ d(30, 2) ++ d(1, 1)).toDF("g", "ts")
    val out = graft.ops.Stats.decayedPopularity(df, "g", "ts").collect()(0)
    assert(out.getAs[Long]("decayed_q") == 3L * 1048576L + 2L * 524288L)
    assert(out.getAs[Long]("n_events") == 6L)
  }

  // ---------------------------------------------------------- weighted median
  test("weightedMedian: token mass median differs from the row median by design") {
    import spark.implicits._
    // values 1..4 with weights 1,1,1,7 → half the mass (≥5 of 10) first
    // reached at v=4; unweighted median would be 2
    val df = Seq(("s", 1L, 1L), ("s", 2L, 1L), ("s", 3L, 1L), ("s", 4L, 7L))
      .toDF("g", "v", "w")
    val out = graft.ops.Stats.weightedMedian(df, "g", "v", "w").collect()(0)
    assert(out.getAs[Long]("weighted_median") == 4L)
    assert(out.getAs[Long]("total_weight") == 10L)
    // exact half boundary: weights 1,1 → cum*2 >= tot first true at v=1
    val half = Seq(("h", 1L, 1L), ("h", 2L, 1L)).toDF("g", "v", "w")
    assert(graft.ops.Stats.weightedMedian(half, "g", "v", "w")
      .collect()(0).getAs[Long]("weighted_median") == 1L)
  }

  // ---------------------------------------------------------- link prediction
  test("linkPrediction: common neighbors counted globally, existing edges excluded") {
    import spark.implicits._
    // seeds {1,2} share neighbors 10, 11 (outside the seed set); 1-2 NOT an
    // edge → predicted with cn=2. Seeds {1,3} share 10 but ARE an edge →
    // excluded. deg: 1→3 (10,11,3), 2→2 (10,11), so jaccard = 2/(3+2-2)
    val edges = Seq((1L, 10L), (1L, 11L), (2L, 10L), (2L, 11L),
      (3L, 10L), (1L, 3L)).toDF("a", "b")
    val out = graft.ops.Graph.linkPrediction(edges, "a", "b", seedMax = 5L, topK = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(5)))
    assert(out.contains((1L, 2L, 2L, 2L * 1000000L / 3L)))
    assert(!out.exists(p => p._1 == 1L && p._2 == 3L)) // existing edge
    // caller-contract path: on the already-normalized distinct edge set,
    // waiving the defensive normalize+distinct must change nothing
    val normalized = edges
      .select(least($"a", $"b").as("a"), greatest($"a", $"b").as("b"))
      .distinct().localCheckpoint()
    val viaContract = graft.ops.Graph
      .linkPrediction(normalized, "a", "b", 5L, 10, assumeNormalized = true)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(5)))
    assert(viaContract.toSeq == out.toSeq)
  }

  // ------------------------------------------------------------ apportionment
  test("temperatureApportion: hand shares, exact total, largest-remainder ties by name") {
    import spark.implicits._
    // weights 4 and 1 → tempered shares 2000, 1000 → N=10: quotas 20/3, 10/3
    // → bases 6, 3; leftover 1 → larger remainder (2000*10 % 3000 = 2000)
    // goes to "a" → alloc 7, 3
    val w = Seq(("a", 4L), ("b", 1L)).toDF("source", "w")
    val out = graft.ops.Curation.temperatureApportion(w, "source", "w", totalN = 10L)
      .collect().map(r => (r.getString(0), r.getLong(2))).toMap
    assert(out == Map("a" -> 7L, "b" -> 3L))
  }

  test("x128 on real docs: allocations sum to exactly one million") {
    import spark.implicits._
    val tot = graft.queries.Extensions.x128TempMix(spark, "/root/testdata/sf0.001")
      .agg(sum($"alloc")).collect()(0).getLong(0)
    assert(tot == 1000000L)
  }

  // ------------------------------------------------------------- Gini stump
  test("giniStump: perfect split yields zero impurity at the right threshold") {
    import spark.implicits._
    val df = Seq((0.1, false), (0.2, false), (0.3, true), (0.4, true))
      .toDF("score", "pos")
    val out = graft.ops.Stats.giniStump(df, "score", "pos").collect()(0)
    // candidates: t=0.1 (L={F}) and t=0.2 (L={F,F}) both have gini 0 on
    // pure sides... t=0.1: R={F,T,T} impure. t=0.2: both pure → gini 0
    assert(out.getAs[Long]("gini_e9") == 0L)
    assert(out.getAs[Long]("threshold_e9") == 200000000L)
    assert(out.getAs[Long]("n_left") == 2L && out.getAs[Long]("pos_left") == 0L)
    assert(out.getAs[Long]("n_right") == 2L && out.getAs[Long]("pos_right") == 2L)
  }

  test("giniStump: uniform labels split anywhere with zero gini, smallest threshold wins") {
    import spark.implicits._
    val df = Seq((0.1, true), (0.2, true), (0.3, true)).toDF("score", "pos")
    val out = graft.ops.Stats.giniStump(df, "score", "pos").collect()(0)
    assert(out.getAs[Long]("gini_e9") == 0L)
    assert(out.getAs[Long]("threshold_e9") == 100000000L) // tie → smallest
  }

  // ----------------------------------------------------------- TF-IDF pairs
  test("tfIdfDocPairs: identical docs rank first; singleton-df terms never pair") {
    import spark.implicits._
    val corpus = Seq((1L, "apple banana"), (2L, "apple banana"),
      (3L, "cherry durian"), (4L, "apple zebra")).toDF("doc_id", "text")
    val out = graft.ops.Similarity.tfIdfDocPairs(corpus, "doc_id", "text",
      dfMin = 2L, dfMax = 64L, tfCap = 64L, k = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getAs[Long]("cos_e9")))
    // cherry/durian are df=1 → doc 3 has no surviving terms → no pairs
    assert(!out.exists(p => p._1 == 3L || p._2 == 3L))
    // identical vectors (1,2) must rank first at cos ≈ 1.0
    assert(out.head._1 == 1L && out.head._2 == 2L)
    assert(out.head._3 >= 999999990L && out.head._3 <= 1000000000L)
    // the apple-only overlaps (1,4) and (2,4) follow with equal cosine
    assert(out.drop(1).map(p => (p._1, p._2)).toSet == Set((1L, 4L), (2L, 4L)))
    assert(out(1)._3 == out(2)._3 && out(1)._3 < out.head._3)
  }

  // -------------------------------------------------------- sequence windows
  test("sequenceWindows: stride/length geometry and short-stream exclusion") {
    import spark.implicits._
    def t(min: Int) = new java.sql.Timestamp(1704067200000L + min * 60000L)
    val types = Seq("a", "b", "c", "d", "e", "f", "g", "h", "i", "j")
    val evs = types.zipWithIndex.map { case (ty, i) => (i.toLong, t(i), 1L, ty, 0.0) } ++
      Seq((100L, t(0), 2L, "x", 0.0), (101L, t(1), 2L, "y", 0.0)) // too short
    val df = evs.toDF("event_id", "ts", "user_id", "event_type", "value")
    val out = graft.ops.EventAnalytics.sequenceWindows(df,
      "user_id", "event_type", "ts", "event_id", winLen = 8, stride = 4, topK = 10)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    // 10 events → windows at offsets 0 only ((10-8) DIV 4 = 0): a..h
    assert(out == Seq(("a>b>c>d>e>f>g>h", 1L)))
    // 12 events → offsets 0 and 4
    val evs12 = (types ++ Seq("k", "l")).zipWithIndex.map { case (ty, i) =>
      (i.toLong, t(i), 1L, ty, 0.0) }
    val out12 = graft.ops.EventAnalytics.sequenceWindows(
      evs12.toDF("event_id", "ts", "user_id", "event_type", "value"),
      "user_id", "event_type", "ts", "event_id", winLen = 8, stride = 4, topK = 10)
      .collect().map(_.getString(0)).toSeq
    assert(out12.sorted == Seq("a>b>c>d>e>f>g>h", "e>f>g>h>i>j>k>l"))
  }

  // ---------------------------------------------------------- quantile mapping
  test("quantileMap: exact nearest-rank histogram matching") {
    import spark.implicits._
    val src = Seq((11L, 5L), (12L, 6L), (13L, 7L)).toDF("doc_id", "n")
    val tgt = Seq((1L, 10L), (2L, 20L), (3L, 30L), (4L, 40L), (5L, 50L), (6L, 60L))
      .toDF("doc_id", "n")
    val out = graft.ops.Stats.quantileMap(src, tgt, "doc_id", "n")
      .collect().map(r => (r.getLong(0), r.getLong(3))).toMap
    // ranks 1..3 of 3 → target idx ⌈r·6/3⌉ = 2, 4, 6
    assert(out == Map(11L -> 20L, 12L -> 40L, 13L -> 60L))
  }

  // ------------------------------------------------------- linear gap fill
  test("gapFillLinear: exact lerp, clamped edges, truncation on falling slopes") {
    import spark.implicits._
    // observed: day1 → 100, day4 → 10 (falling); day2/3 interpolated;
    // calendar starts/ends at observations so no edge rows here
    def ev(day: Int, cents: Long) =
      ("g", java.sql.Timestamp.valueOf(f"2024-05-0$day%d 09:00:00"), cents)
    val df = Seq(ev(1, 100L), ev(4, 10L)).toDF("g", "ts", "cents")
    val out = graft.ops.EventAnalytics.gapFillLinear(df, "g", "ts", col("cents"))
      .collect().map(r => (r.getAs[java.sql.Date]("day").toString,
        r.getAs[Long]("filled_cents"), r.getAs[Boolean]("was_filled"))).toSeq
    // lerp from 100 down to 10 over 3 days: -30/day truncated toward zero:
    // day2 = 100 - 30 = 70, day3 = 100 - 60 = 40
    assert(out == Seq(
      ("2024-05-01", 100L, false), ("2024-05-02", 70L, true),
      ("2024-05-03", 40L, true), ("2024-05-04", 10L, false)))
    // rising series uses plain integer division: 10 → 100 gives 40, 70
    val up = Seq(ev(1, 10L), ev(4, 100L)).toDF("g", "ts", "cents")
    val upOut = graft.ops.EventAnalytics.gapFillLinear(up, "g", "ts", col("cents"))
      .collect().map(_.getAs[Long]("filled_cents")).toSeq
    assert(upOut == Seq(10L, 40L, 70L, 100L))
  }

  // ------------------------------------------------- point-in-time features
  test("x139 machinery: as-of counts, TTL staleness, and no feature leakage from the future") {
    import spark.implicits._
    // replicate the x139 pipeline on a hand timeline via a scratch dir
    def t(dayMin: (Int, Int)) = new java.sql.Timestamp(
      1704067200000L + dayMin._1 * 86400000L + dayMin._2 * 60000L)
    val rows = Seq(
      (1L, t((0, 0)), 1L, "click", 0.0),
      (2L, t((0, 5)), 1L, "purchase", 1.0),  // sees click 1 (fresh)
      (3L, t((0, 10)), 1L, "click", 0.0),    // AFTER purchase 2 — must not leak
      (4L, t((9, 0)), 1L, "purchase", 1.0),  // last click 9d ago → stale
      (5L, t((0, 0)), 2L, "purchase", 1.0))  // user 2: no history at all
    val dir = java.nio.file.Files.createTempDirectory("graft-pit").toString
    rows.toDF("event_id", "ts", "user_id", "event_type", "value")
      .write.parquet(s"$dir/events.parquet")
    val out = graft.queries.Extensions.x139PitFeatures(spark, dir)
      .collect().map(r => r.getLong(0) ->
        (Option(r.get(1)), Option(r.get(2)), r.getBoolean(3))).toMap
    assert(out(2L) == ((Some(1L), None, false)))  // one click as-of, fresh
    assert(out(4L)._1.isEmpty && out(4L)._3)      // stale → NULL + flag
    assert(out(5L) == ((None, None, true)))       // cold start
  }

  // ------------------------------------------------------------ Cohen's kappa
  test("x140 kappa arithmetic: perfect, independent, and mixed confusion matrices") {
    def kappa(a: Long, b: Long, c: Long, d: Long): Option[Long] = {
      val n = a + b + c + d
      val pe = (a + b) * (a + c) + (c + d) * (b + d)
      val num = n * (a + d) - pe
      val den = n * n - pe
      if (den == 0) None
      else Some(if (num >= 0) num * 1000000 / den else -((-num) * 1000000 / den))
    }
    assert(kappa(50, 0, 0, 50).contains(1000000L)) // perfect agreement
    assert(kappa(25, 25, 25, 25).contains(0L))     // independence
    assert(kappa(100, 0, 0, 0).isEmpty)            // degenerate marginals
    // textbook example: a=20 b=5 c=10 d=15 → po=.7, pe=.5 → κ=.4
    assert(kappa(20, 5, 10, 15).contains(400000L))
  }

  // -------------------------------------------------------- compression ratio
  test("x141 exact oracle: per-source deflate stats replayed row by row on the driver") {
    import spark.implicits._
    val dir = "/root/testdata/sf0.001"
    val got = graft.queries.Extensions.x141CompressionRatio(spark, dir)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    val expect = spark.read.parquet(s"$dir/documents.parquet")
      .select($"source", $"text").collect()
      .map(r => r.getString(0) -> graft.functions.Ops.deflateRatioPpm(
        org.apache.spark.unsafe.types.UTF8String.fromString(r.getString(1))))
      .groupBy(_._1).map { case (s, rs) =>
        val v = rs.map(_._2)
        s -> (v.length.toLong, v.sum / v.length, v.min, v.max)
      }
    assert(got == expect)
  }

  test("deflate ratio: repetitive text compresses far below prose; empty is defined") {
    import org.apache.spark.unsafe.types.UTF8String.{fromString => u}
    val rep = graft.functions.Ops.deflateRatioPpm(u("spam " * 500))
    val prose = graft.functions.Ops.deflateRatioPpm(
      u((1 to 500).map(i => graft.functions.Ops.splitmix64(i.toLong).toHexString).mkString(" ")))
    assert(rep < 50000L)      // > 95% compression on pure repetition
    assert(prose > 400000L)   // high-entropy hex barely compresses
    assert(graft.functions.Ops.deflateRatioPpm(u("")) == 1000000L)
  }

  // ------------------------------------------------------------ Gopher rules
  test("gopherRules: each rule verdict exact on crafted documents") {
    import spark.implicits._
    val good = (("the and of " * 10) + ("sensible words here " * 5)).trim // 50 words, stopwords, alpha
    val short = "tiny doc the and"                        // fails word count
    val symbols = ("the and " + "# " * 20 + "word " * 30).trim // 52 words, 20 '#' → fails r3
    val nostop = ("alpha beta gamma delta " * 8).trim     // fails stopword rule
    val docs = Seq(("s", good), ("s", short), ("s", symbols), ("s", nostop))
      .toDF("src", "text")
    val out = graft.ops.TextAnalysis.gopherRules(docs, "text", "src").collect()(0)
    assert(out.getAs[Long]("n_docs") == 4L)
    assert(out.getAs[Long]("pass_wordcount") == 3L) // all but `short`
    assert(out.getAs[Long]("pass_symbols") == 3L)   // all but `symbols`
    assert(out.getAs[Long]("pass_stopwords") == 3L) // all but `nostop`
    assert(out.getAs[Long]("pass_all") <= 1L)       // only `good` can pass all
  }

  // --------------------------------------------------------------- chi-square
  test("chiSquare: perfect dependence gives chi2 = N; exact independence gives 0") {
    import spark.implicits._
    val dep = (Seq.fill(10)(("x", "p")) ++ Seq.fill(10)(("y", "q"))).toDF("a", "b")
    val d = graft.ops.Stats.chiSquare(dep, "a", "b").collect()(0)
    assert(d.getAs[Long]("n") == 20L && d.getAs[Long]("dof") == 1L)
    assert(d.getAs[Long]("chi2_e6") == 20000000L)
    val ind = (Seq.fill(5)(("x", "p")) ++ Seq.fill(5)(("x", "q")) ++
      Seq.fill(5)(("y", "p")) ++ Seq.fill(5)(("y", "q"))).toDF("a", "b")
    assert(graft.ops.Stats.chiSquare(ind, "a", "b")
      .collect()(0).getAs[Long]("chi2_e6") == 0L)
  }

  // ---------------------------------------------------------------------- RFM
  test("x144 RFM: customers conserved, quintiles deterministic on a strict order") {
    import spark.implicits._
    val out = graft.queries.Extensions.x144RfmSegments(spark, "/root/testdata/sf0.001")
      .collect()
    val nCustomers = graft.Tables.load(spark, "/root/testdata/sf0.001", "orders")
      .select($"o_custkey").distinct().count()
    assert(out.map(_.getAs[Long]("n_customers")).sum == nCustomers)
    assert(out.forall(_.getString(0).matches("[1-5]-[1-5]-[1-5]")))
  }

  // ------------------------------------------------------------------- Wilson
  test("x145 Wilson lower bound: below the raw rate, monotone in successes") {
    val rows = graft.queries.Extensions.x145WilsonReorder(spark, "/root/testdata/sf0.001")
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (n, k, w) = (r.getAs[Long]("n_buyers"), r.getAs[Long]("n_reorderers"),
        r.getAs[Long]("wilson_e6"))
      assert(w <= k * 1000000L / n, s"lower bound above raw rate for part ${r.get(0)}")
      assert(w >= -1000000L && w <= 1000000L)
    }
    // local replay of the pinned shape must match the SQL expression
    def wilson(k: Long, n: Long): Long = {
      val p = k.toDouble / n
      math.floor(((p + 3.8416 / (2.0 * n) -
        1.96 * math.sqrt((p * (1.0 - p) + 3.8416 / (4.0 * n)) / n)) /
        (1.0 + 3.8416 / n)) * 1000000.0).toLong
    }
    rows.foreach { r =>
      assert(r.getAs[Long]("wilson_e6") ==
        wilson(r.getAs[Long]("n_reorderers"), r.getAs[Long]("n_buyers")))
    }
  }

  test("olsTrend: negative slope truncates toward zero like the oracle") {
    import spark.implicits._
    // y = 10, 9, 9 → slope = -1/2 → e2 = -50 exactly; y = 10, 9, 9, 9
    // → slope = -6/20 = -0.3 → -30 (trunc(-600/20), no floor drift)
    val mk = (ys: Seq[Long]) => ys.zipWithIndex.map { case (y, d) =>
      ("g", java.sql.Date.valueOf(s"2024-02-0${d + 1}"), y * 100L) }
    val s1 = Stats.olsTrend(mk(Seq(10L, 9L, 9L)).toDF("seg", "day", "cents"),
      "seg", "day", col("cents")).collect()(0).getAs[Long]("slope_e2")
    assert(s1 == -50L)
    val s2 = Stats.olsTrend(mk(Seq(10L, 9L, 9L, 9L)).toDF("seg", "day", "cents"),
      "seg", "day", col("cents")).collect()(0).getAs[Long]("slope_e2")
    assert(s2 == -30L)
  }

  // ---------------------------------------------------------------- Benford
  test("benfordAudit: hand counts, all nine digits emitted, non-positives dropped") {
    import spark.implicits._
    val df = Seq(1L, 1L, 2L, 30L, 999L, -5L, 0L).toDF("cents")
    val out = Stats.benfordAudit(df, col("cents"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(out.length == 9)
    val byDigit = out.map(r => r._1 -> r).toMap
    assert(byDigit(1L) == (1L, 2L, 400000L, 301029L, 98971L))
    assert(byDigit(2L) == (2L, 1L, 200000L, 176091L, 23909L))
    assert(byDigit(3L) == (3L, 1L, 200000L, 124938L, 75062L))
    assert(byDigit(9L) == (9L, 1L, 200000L, 45757L, 154243L))
    assert(byDigit(4L)._2 == 0L && byDigit(4L)._3 == 0L &&
      byDigit(4L)._5 == -96910L)
  }

  // ---------------------------------------------------- mutual information
  test("mutualInformation: identity gives ln 2, independence gives exactly 0") {
    import spark.implicits._
    // total row label is NULL (cannot collide with a real category)
    def byA(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => Option(r.getString(0)).getOrElse("<total>") ->
        (r.getLong(1), r.getLong(2))).toMap
    val ident = Seq(("a", "a"), ("a", "a"), ("b", "b"), ("b", "b")).toDF("x", "y")
    val mi = byA(Stats.mutualInformation(ident, "x", "y"))
    assert(mi("<total>") == (2L, 693147180L)) // floor(ln 2 · 1e9)
    assert(mi("a") == (1L, 346573590L))       // floor(ln 2 / 2 · 1e9)
    val indep = Seq(("a", "x"), ("a", "y"), ("b", "x"), ("b", "y")).toDF("x", "y")
    val mi0 = byA(Stats.mutualInformation(indep, "x", "y"))
    assert(mi0("<total>")._2 == 0L)
  }

  test("mutualInformation: NULL categories are excluded from N, not silently dropped mid-way") {
    import spark.implicits._
    // 4 clean identity rows + 4 rows with a NULL on one side. If nulls
    // leaked into N but not the cells (the r8 advice bug), the identity MI
    // would read ln 2 over the WRONG N and every probability would shrink.
    val df = Seq(
      (Option("a"), Option("a")), (Option("a"), Option("a")),
      (Option("b"), Option("b")), (Option("b"), Option("b")),
      (Option.empty[String], Option("a")), (Option("a"), Option.empty[String]),
      (Option.empty[String], Option.empty[String]), (Option.empty[String], Option("b")))
      .toDF("x", "y")
    val mi = Stats.mutualInformation(df, "x", "y")
      .collect().map(r => Option(r.getString(0)).getOrElse("<total>") -> r.getLong(2)).toMap
    assert(mi("<total>") == 693147180L) // exactly the clean-subset ln 2
    assert(!mi.contains("null") && mi.keySet == Set("a", "b", "<total>"))
  }

  // ------------------------------------------------------ UCB mixture replay
  test("ucbMixtureReplay: hand-traced 2-arm schedule, conservation, determinism") {
    import spark.implicits._
    val rewards = Seq(("a", 500000L), ("b", 400000L)).toDF("arm", "r_ppm")
    val out = graft.ops.Curation.ucbMixtureReplay(rewards, rounds = 6)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // t=3 (L=1): equal bonuses → a (higher reward). t=4 (L=2): b's n=1 bonus
    // 2e6 beats a's 1414213+Δr. t=5: equal n → a. t=6: a's √(4e12/3) bonus
    // loses to b's √(4e12/2) by more than the 100k reward edge → b.
    assert(out.toSeq == Seq(("a", 500000L, 3L, 500000L), ("b", 400000L, 3L, 500000L)))
    assert(out.map(_._3).sum == 6L)
  }

  test("ucbMixtureReplay on real sources: pulls conserved, best arm never starved") {
    val out = graft.queries.Extensions.x151UcbMixture(spark, "/root/testdata/sf0.001")
      .collect()
    assert(out.length == 20)
    assert(out.map(_.getAs[Long]("n_pulls")).sum == 52L)
    val best = out.maxBy(r => (r.getAs[Long]("r_ppm"), r.getAs[String]("source")))
    assert(best.getAs[Long]("n_pulls") >= 52L / 20L)
  }

  // --------------------------------------------------- perplexity buckets
  test("perplexityBuckets: in-vocab docs beat OOV docs; unseen language falls back to the uniform LM") {
    import spark.implicits._
    val corpus = Seq(
      (1L, "en", "aa bb cc"), (2L, "en", "cc aa bb"), (3L, "en", "zz qq ww"),
      (4L, "fr", "aa")).toDF("doc_id", "lang", "text")
    val ref = Seq((1L, "en", "aa bb cc")).toDF("doc_id", "lang", "text")
    val out = graft.ops.Curation.perplexityBuckets(corpus, ref, "doc_id", "text", "lang")
      .collect().map(r => ((r.getString(0), r.getLong(1)),
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))).toMap
    // every en token in docs 1/2 has ref count 1 → term = ln 2 − ln 4099;
    // every doc-3 token is OOV → term = ln 1 − ln 4099; fr has no ref →
    // term = ln 1 − ln 4096. Expected h replays the exact fold shape:
    // left fold from 0.0, then floor((0 − s) / n · 1e6).
    def h(term: Double, n: Int): Long = {
      val s = (1 to n).foldLeft(0.0)((a, _) => a + term)
      math.floor((0.0 - s) / n.toDouble * 1e6).toLong
    }
    val hIn = h(math.log(2.0) - math.log(4099.0), 3)
    val hOov = h(math.log(1.0) - math.log(4099.0), 3)
    val hFr = h(math.log(1.0) - math.log(4096.0), 1)
    assert(out(("en", 1L)) == (1L, hIn, hIn, hIn))   // doc 1 (tie → lowest id first)
    assert(out(("en", 2L)) == (1L, hIn, hIn, hIn))   // doc 2
    assert(out(("en", 3L)) == (1L, hOov, hOov, hOov)) // doc 3
    assert(out(("fr", 1L)) == (1L, hFr, hFr, hFr))
    assert(hOov > hIn)
  }

  // ------------------------------------------- x152 Fellegi–Sunter linkage
  test("linkageScores: hand-computed log-Bayes weights on the e6 grid, SNM candidates only") {
    import spark.implicits._
    // Block "appl": keys sort one < tre < two → SNM pairs (1,3),(1,2),(3,2);
    // "zebr" is its own block with no neighbor. u-stats over ALL 4 rows:
    //   f1: red=2,blu=1,grn=1 → un=2, ud=4·3=12
    //   f2: big=2,sml=2      → un=4, ud=12
    val df = Seq(
      (1L, "apple one", "red", "big"),
      (2L, "apple two", "red", "sml"),
      (3L, "apple tre", "blu", "big"),
      (4L, "zebra", "grn", "sml")).toDF("id", "name", "f1", "f2")
    val out = graft.ops.Dedup.linkageScores(df, "id", "name", Seq("f1", "f2"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // independently re-derive the grid points with plain scalar math
    def lnE6(x: Long): Long = math.floor(math.log(x.toDouble) * 1e6).toLong
    val base = lnE6(950000L) - lnE6(1000000L)      // agree m-prior
    val base1m = lnE6(50000L) - lnE6(1000000L)     // disagree m-prior
    val f1Agree = base - (lnE6(2L) - lnE6(12L))
    val f1Dis = base1m - (lnE6(10L) - lnE6(12L))
    val f2Agree = base - (lnE6(4L) - lnE6(12L))
    val f2Dis = base1m - (lnE6(8L) - lnE6(12L))
    assert(out.toSeq == Seq(
      (1L, 2L, 1L, f1Agree + f2Dis),   // agree f1 only
      (1L, 3L, 1L, f1Dis + f2Agree),   // agree f2 only
      (3L, 2L, 0L, f1Dis + f2Dis)))    // agree neither
    // rare agreement (f1, un=2) must outscore common agreement (f2, un=4)
    assert(f1Agree > f2Agree)
  }

  test("linkage SNM blocking: sound and complete vs exact Levenshtein when blocks fit the window (200 deterministic records)") {
    import spark.implicits._
    // driver-side exact Levenshtein for the oracle side of the property
    def lev(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1, b.length + 1)((i, j) => if (i == 0) j else if (j == 0) i else 0)
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    // 200 records over 256 four-char block prefixes → block sizes mostly
    // 1-3 ≤ window+1=4; suffixes 0-3 chars so many pairs land ≤ maxDist=4
    val recs = (0 until 200).map { i =>
      val h = graft.functions.Ops.splitmix64(i.toLong)
      val prefix = f"p${(h & 0xff)}%03x"                 // exactly 4 chars = the block key
      val suffix = ((h >>> 8) % 4).toInt match {
        case 0 => ""
        case k => (0 until k).map(j => ('a' + ((h >>> (16 + 8 * j)) % 26).toInt).toChar).mkString
      }
      (i.toLong, prefix + suffix, (h % 7).toString)
    }
    val df = recs.toDF("id", "name", "f1")
    val got = graft.ops.Dedup.linkageScores(df, "id", "name", Seq("f1"), topK = 100000)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val byKey = recs.map { case (id, nm, _) => (id, nm.toLowerCase.trim) }
    val blocks = byKey.groupBy(_._2.take(4))
    // soundness: every candidate shares a block and is within maxDist
    val keyOf = byKey.toMap
    got.foreach { case (a, b) =>
      assert(keyOf(a).take(4) == keyOf(b).take(4), s"cross-block candidate ($a,$b)")
      assert(lev(keyOf(a), keyOf(b)) <= 4, s"over-distance candidate ($a,$b)")
    }
    // completeness: in every block that fits the SNM window, ALL close
    // pairs must be candidates (order within a pair is SNM sort order)
    var checked = 0
    blocks.values.filter(_.size <= 4).foreach { members =>
      for {
        Seq((ia, ka), (ib, kb)) <- members.combinations(2)
        if lev(ka, kb) <= 4
      } {
        assert(got.contains((ia, ib)) || got.contains((ib, ia)),
          s"missed in-window pair ($ia,$ib) keys ($ka,$kb)")
        checked += 1
      }
    }
    assert(checked >= 20, s"property exercised only $checked pairs — fixture too sparse")
  }

  test("entityResolution: threshold → CC → survivorship on the apple fixture") {
    import spark.implicits._
    val df = Seq(
      (1L, "apple one", "red", "big"),
      (2L, "apple twoz", "red", "sml"), // longest name in the entity (lev 4 from "apple one")
      (3L, "apple tre", "blu", "big"),
      (4L, "zebra", "grn", "sml")).toDF("id", "name", "f1", "f2")
    // pair scores from the linkage contract above: (1,2) ≈ −0.85e6,
    // (1,3) ≈ −1.77e6, (3,2) ≈ −5.40e6 — a −2e6 threshold admits the
    // first two, so {1,2,3} closes into one entity via node 1
    val out = graft.ops.Dedup.entityResolution(df, "id", "name", Seq("f1", "f2"),
      minScoreE6 = -2000000L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(3)))
    assert(out.toSeq == Seq((1L, 3L, 2L, 10))) // rep = longest name (id 2, 10 chars)
    // a strict threshold admits nothing → no entities
    assert(graft.ops.Dedup.entityResolution(df, "id", "name", Seq("f1", "f2"),
      minScoreE6 = 10000000L).count() == 0L)
  }

  test("linkageScores: null fields agree via null-safe equality; empty names dropped") {
    import spark.implicits._
    val df = Seq(
      (1L, "pair a", null.asInstanceOf[String], "x"),
      (2L, "pair b", null.asInstanceOf[String], "x"),
      (3L, "", "zz", "zz")).toDF("id", "name", "f1", "f2")
    val out = graft.ops.Dedup.linkageScores(df, "id", "name", Seq("f1", "f2"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // id 3 has an empty key → filtered; (1,2) agree on both (null <=> null)
    assert(out.toSeq == Seq((1L, 2L, 2L)))
  }

  // ------------------------------------------------------------ entropy math
  test("x172 language-entropy spelling: uniform = ln k, single class = 0 (exact grid points)") {
    // plain scalar replay of the ln N − (Σ c·ln c)/N spelling on the e6 grid
    def ent(cs: Seq[Long]): Long = {
      val n = cs.sum.toDouble
      math.floor((math.log(n) - cs.map(c => c * math.log(c.toDouble)).sum / n) * 1e6).toLong
    }
    assert(ent(Seq(7L)) == 0L)
    // 4 equal classes → exactly ln 4 (the fold is c·ln c with c equal)
    assert(ent(Seq(5L, 5L, 5L, 5L)) == math.floor(math.log(4.0) * 1e6).toLong)
    // skew strictly reduces entropy
    assert(ent(Seq(17L, 1L, 1L, 1L)) < ent(Seq(5L, 5L, 5L, 5L)))
  }

  // ------------------------------------------------- incremental maintenance
  test("x174 IVM merge: keys only in base, only in delta, and in both all reconcile") {
    import spark.implicits._
    // replay the merge shape on a hand base/delta pair
    val base = Seq((1L, 2L, 100L), (2L, 1L, 50L)).toDF("k", "n", "c")
    val delta = Seq((2L, 3L, 70L), (3L, 1L, 10L)).toDF("k", "n", "c")
    val merged = base.select($"k", $"n".as("nb"), $"c".as("cb"))
      .join(delta.select($"k", $"n".as("nd"), $"c".as("cd")), Seq("k"), "full_outer")
      .select($"k",
        (coalesce($"nb", lit(0L)) + coalesce($"nd", lit(0L))).as("n"),
        (coalesce($"cb", lit(0L)) + coalesce($"cd", lit(0L))).as("c"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(merged == Map(1L -> ((2L, 100L)), 2L -> ((4L, 120L)), 3L -> ((1L, 10L))))
  }
}
