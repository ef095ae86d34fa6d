package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.ops.{Dedup, Similarity}

/** Operator-level tests for dedup + ANN over the real sf0.001 testdata and
  * hand-built frames with planted duplicates. */
class DedupSimilaritySpec extends SparkSpec {

  private lazy val docs: DataFrame =
    spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
  private lazy val emb: DataFrame =
    spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")

  test("exact dedup: keep-first semantics on planted exact copies") {
    import spark.implicits._
    val planted = Seq(
      (1L, "alpha beta gamma"), (2L, "delta"), (3L, "alpha beta gamma"),
      (4L, "delta"), (5L, "unique text")).toDF("doc_id", "text")
    val kept = Dedup.exactDedup(planted, "doc_id", "text")
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(kept == Seq(1L, 2L, 5L))
    val summary = Dedup.exactDedupSummary(planted, "doc_id", "text")
      .orderBy($"keep_doc_id").collect()
    assert(summary.map(r => (r.getLong(1), r.getLong(2))).toSeq ==
      Seq((1L, 2L), (2L, 2L), (5L, 1L)))
  }

  test("minhash LSH recovers exactly the exact-jaccard near-dup pairs") {
    import spark.implicits._
    val lsh = Dedup.minhashNearDupPairs(docs, "doc_id", "text", threshold = 0.5)
      .select($"doc_a", $"doc_b").as[(Long, Long)].collect().toSet
    val exact = Dedup.ngramJaccardPairs(docs, "doc_id", "text", threshold = 0.5)
      .select($"doc_a", $"doc_b").as[(Long, Long)].collect().toSet
    assert(exact.nonEmpty, "testdata should contain planted near-dups")
    // recall on the high-similarity pairs must be total at this threshold gap
    assert(lsh == exact, s"LSH=${lsh.size} exact=${exact.size} diff=${(lsh diff exact) ++ (exact diff lsh)}")
  }

  test("minhashDedup removes one side of each near-dup pair") {
    import spark.implicits._
    val pairs = Dedup.minhashNearDupPairs(docs, "doc_id", "text", threshold = 0.5)
    val losers = pairs.select($"doc_b").as[Long].collect().toSet
    val kept = Dedup.minhashDedup(docs, "doc_id", "text")
      .select($"doc_id").as[Long].collect().toSet
    assert(kept.intersect(losers).isEmpty)
    assert(kept.size == docs.count() - losers.size)
  }

  test("simhash pairs include the high-jaccard planted dups") {
    import spark.implicits._
    // 64-bit unit-weight simhash is a noisy proxy for jaccard: a j≥0.9 pair
    // lands at hamming ~0–8, so recall at a hamming-6 cut hovers near (not
    // at) 1.0 — the bound asserts the signature separates planted dups from
    // noise, not that the cut is exact (x07's DuckDB oracle pins exactness
    // of the hamming≤3 set itself). Geometry (8,1) keeps the h=6 cut inside
    // the exhaustive range (6 ≤ 8−1), so candidacy never costs recall here.
    val sim = Dedup.simhashNearDupPairs(docs, "doc_id", "text", maxHamming = 6,
      blocks = 8, keyBlocks = 1)
      .select($"doc_a", $"doc_b").as[(Long, Long)].collect().toSet
    val high = Dedup.ngramJaccardPairs(docs, "doc_id", "text", threshold = 0.9)
      .select($"doc_a", $"doc_b").as[(Long, Long)].collect().toSet
    assert(high.nonEmpty)
    val recall = high.count(sim.contains).toDouble / high.size
    assert(recall >= 0.85, s"simhash recall on >0.9-jaccard pairs: $recall")
  }

  test("prefix filter bounds hot-shingle skew without losing true pairs") {
    import spark.implicits._
    // 20 docs share one boilerplate shingle (df = 50% of corpus) but are
    // otherwise disjoint; 20 docs are fully unique; 2 docs are true
    // near-dups (J ≥ 0.9). The naive shingle self-join would generate
    // C(20,2)=190 candidate pairs from the hot shingle alone — the f²
    // blowup the round-2/3 verdicts flagged. The df-ordered prefix filter
    // must sort the hot shingle out of every prefix (each boilerplate doc
    // has 10 rarer df=1 shingles filling its prefix) while still pairing
    // the planted near-dups.
    val boiler = (0 until 20).map { i =>
      (i.toLong, (0 until 10).map(j => s"u${i}x$j").mkString(" ") + " common boiler plate")
    }
    val unique = (20 until 40).map { i =>
      (i.toLong, (0 until 12).map(j => s"v${i}y$j").mkString(" "))
    }
    val nearDup = Seq(
      (100L, "the quick brown fox jumps over the lazy dog again and again"),
      (101L, "the quick brown fox jumps over the lazy dog again and again today"))
    val planted = (boiler ++ unique ++ nearDup).toDF("doc_id", "text")

    val perDoc = Dedup.shingleSets(planted, "doc_id", "text", 3)
    val candidates = Dedup.prefixCandidates(perDoc, 0.5)
      .as[(Long, Long)].collect().toSet
    assert(candidates.size <= 5,
      s"hot shingle must not fan out candidates: $candidates")
    assert(candidates.contains((100L, 101L)), "true near-dup pair must survive the filter")

    val pairs = Dedup.ngramJaccardPairs(planted, "doc_id", "text", threshold = 0.5)
      .select($"doc_a", $"doc_b").as[(Long, Long)].collect().toSet
    assert(pairs == Set((100L, 101L)), s"exact output: $pairs")
  }

  test("positional filter: pair set identical to brute-force all-pairs jaccard") {
    import spark.implicits._
    // The r14 positional filter (1 + min(n_a−pos_a−1, n_b−pos_b−1) ≥ α)
    // prunes candidate ROWS; exactness demands it never prunes a true PAIR.
    // Brute-force truth over every doc pair, several thresholds so α lands
    // on and off integer boundaries (the ceil-rounding edge the 1e-9 guards).
    val sets = Dedup.shingleSets(docs, "doc_id", "text", 3)
      .select($"doc_id", $"shingles").as[(Long, Array[Long])].collect()
    for (t <- Seq(0.3, 0.5, 2.0 / 3.0, 0.75, 0.9)) {
      val truth = (for {
        (ia, sa) <- sets.iterator
        (ib, sb) <- sets.iterator
        if ia < ib
        inter = sa.toSet.intersect(sb.toSet).size
        j = inter.toDouble / (sa.length + sb.length - inter)
        if j >= t
      } yield (ia, ib)).toSet
      val got = Dedup.ngramJaccardPairs(docs, "doc_id", "text", threshold = t)
        .select($"doc_a", $"doc_b").as[(Long, Long)].collect().toSet
      assert(got == truth,
        s"t=$t: missing=${(truth diff got).take(5)} extra=${(got diff truth).take(5)}")
    }
  }

  test("simhash: non-exhaustive maxHamming with default geometry is opt-in") {
    import spark.implicits._
    val two = Seq((1L, "alpha beta gamma delta"), (2L, "alpha beta gamma epsilon"))
      .toDF("doc_id", "text")
    // default (6,3) geometry is exhaustive only through h=3: beyond it the
    // caller must pass geometry explicitly (the r13 default change shrank
    // this regime — silence would hand old callers a smaller pair set)
    val e = intercept[IllegalArgumentException] {
      Dedup.simhashNearDupPairs(two, "doc_id", "text", maxHamming = 4)
    }
    assert(e.getMessage.contains("exhaustive range"))
    // explicit geometry opts in — and an exhaustive explicit one still works
    assert(Dedup.simhashNearDupPairs(two, "doc_id", "text", maxHamming = 6,
      blocks = 8, keyBlocks = 1).count() >= 0)
  }

  test("brute-force ANN: top-k is exactly the naive driver-side answer") {
    import spark.implicits._
    val result = Similarity.bruteForceTopK(emb, emb.filter($"vec_id" < 3), "vec_id", "embedding", k = 5)
      .select($"query_id", $"item_id", $"rank").as[(Long, Long, Int)].collect()
      .groupBy(_._1).view.mapValues(_.sortBy(_._3).map(_._2).toSeq).toMap
    // naive oracle
    val vecs = emb.select($"vec_id", $"embedding").as[(Long, Array[Float])].collect()
    def cos(a: Array[Float], b: Array[Float]): Double = {
      val dot = a.zip(b).map { case (x, y) => x.toDouble * y }.sum
      val na = math.sqrt(a.map(x => x.toDouble * x).sum)
      val nb = math.sqrt(b.map(x => x.toDouble * x).sum)
      dot / (na * nb)
    }
    for (qid <- 0L until 3L) {
      val qv = vecs.find(_._1 == qid).get._2
      val expected = vecs.filter(_._1 != qid)
        .map { case (id, v) => (id, cos(qv, v)) }
        .sortBy { case (id, s) => (-s, id) }.take(5).map(_._1).toSeq
      assert(result(qid) == expected, s"query $qid")
    }
  }

  test("IVF ANN: results are a subset of probed cells with reasonable recall") {
    import spark.implicits._
    val brute = Similarity.bruteForceTopK(emb, emb.filter($"vec_id" < 10), "vec_id", "embedding", k = 10)
      .select($"query_id", $"item_id").as[(Long, Long)].collect().groupBy(_._1)
    val ivf = Similarity.ivfTopK(emb, emb.filter($"vec_id" < 10), "vec_id", "embedding",
      k = 10, nlist = 8, nprobe = 4)
      .select($"query_id", $"item_id").as[(Long, Long)].collect().groupBy(_._1)
    assert(ivf.keySet == brute.keySet)
    val recalls = brute.keys.map { q =>
      val b = brute(q).map(_._2).toSet
      val i = ivf(q).map(_._2).toSet
      i.intersect(b).size.toDouble / b.size
    }.toSeq
    val mean = recalls.sum / recalls.size
    // random embeddings are a worst case for IVF; probing half the cells
    // should still recover a solid fraction of the true top-10
    assert(mean >= 0.3, s"mean IVF recall $mean")
    ivf.values.foreach(v => assert(v.length <= 10))
  }

  test("LSH bucket kernel: mega-buckets drop with bounded state, small buckets pair up") {
    import spark.implicits._
    // one degenerate bucket (60 ids sharing a band hash) over the cap of 10,
    // one healthy bucket of 3, one singleton
    val banded = ((1L to 60L).map(id => (id, 0, 111L)) ++
      Seq((101L, 1, 222L), (102L, 1, 222L), (103L, 1, 222L)) ++
      Seq((200L, 2, 333L)))
      .toDF("doc_id", "band_idx", "band_hash")
    val pairs = Dedup.bucketCandidatePairs(banded, "band_idx", "band_hash", maxBucketSize = 10)
      .as[(Long, Long)].collect().toSet
    assert(pairs == Set((101L, 102L), (101L, 103L), (102L, 103L)),
      s"mega-bucket must be dropped, singleton ignored: $pairs")
  }

  test("bounded_collect_set: saturates to NULL past the cap, exact below it") {
    import spark.implicits._
    import graft.functions.BoundedLongSet.bounded_collect_set
    val df = ((1L to 20L).map(v => ("big", v)) ++ Seq(("small", 7L), ("small", 7L), ("small", 3L)))
      .toDF("g", "v").repartition(4) // force partial buffers + merge
    val rows = df.groupBy($"g").agg(bounded_collect_set($"v", 5).as("ids"))
      .collect().map(r => r.getString(0) -> Option(r.getSeq[Long](1))).toMap
    assert(rows("big").isEmpty, "over-cap group must evaluate to NULL")
    assert(rows("small").get.sorted == Seq(3L, 7L), "distinct + exact below cap")
  }

  test("embedding near-dup candidates carry exact cosine, highest first") {
    import spark.implicits._
    val top = Dedup.embeddingNearDupPairs(emb, "vec_id", "embedding")
      .orderBy($"cos_sim".desc).limit(5)
      .select($"id_a", $"id_b", $"cos_sim").as[(Long, Long, Double)].collect()
    assert(top.nonEmpty)
    assert(top.forall { case (a, b, c) => a < b && c <= 1.0 && c >= -1.0 })
    assert(top.sortBy(-_._3).toSeq == top.toSeq)
  }

  test("near-dup clusters: transitive closure with min-id labels, O(diameter) convergence") {
    import spark.implicits._
    // chain 1-2-3 (transitivity: 1~3 never emitted as a pair), triangle
    // 10-11-12, separate pair 20-21, and a 9-hop path 30..39 to exercise
    // multi-round convergence
    val pairs = (Seq((1L, 2L), (2L, 3L), (10L, 11L), (11L, 12L), (10L, 12L), (20L, 21L))
      ++ (30L until 39L).map(i => (i, i + 1)))
      .toDF("doc_a", "doc_b")
    val got = Dedup.nearDupClusters(pairs)
      .as[(Long, Long)].collect().toMap
    val want = Map(1L -> 1L, 2L -> 1L, 3L -> 1L,
      10L -> 10L, 11L -> 10L, 12L -> 10L, 20L -> 20L, 21L -> 20L) ++
      (30L to 39L).map(_ -> 30L).toMap
    assert(got == want)
    // insufficient iteration budget must throw, not return partial labels
    // (driverEdgeCap = 0 forces the distributed loop the budget applies to)
    intercept[IllegalArgumentException] {
      Dedup.nearDupClusters((30L until 39L).map(i => (i, i + 1)).toDF("doc_a", "doc_b"),
        maxIters = 2, driverEdgeCap = 0).collect()
    }
    // hybrid: the driver union-find fast path and the distributed loop are
    // the same function — identical labels on the same graph
    val viaLoop = Dedup.nearDupClusters(pairs, driverEdgeCap = 0)
      .as[(Long, Long)].collect().toMap
    assert(viaLoop == want, "distributed loop diverged from union-find fast path")
  }

  test("cost-based embedding near-dup: exact and LSH paths agree; planner picks by geometry") {
    import spark.implicits._
    // geometry math: 64x4-bit bands admit ~98% of random pairs; 8x16-bit ~0.01%
    assert(Dedup.lshRandomPairCollisionProb(64, 4) > 0.9)
    assert(Dedup.lshRandomPairCollisionProb(8, 16) < 0.001)
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.select($"id_a", $"id_b", $"cos_sim").as[(Long, Long, Double)].collect()
        .map { case (a, b, c) => (a, b, math.rint(c * 1e12) / 1e12) }.toSet
    // non-discriminating geometry -> exact broadcast-nested-loop plan
    val exact = Dedup.embeddingNearDup(emb, "vec_id", "embedding",
      threshold = 0.45, bands = 64, bitsPerBand = 4)
    assert(exact.queryExecution.executedPlan.toString.contains("BroadcastNestedLoopJoin"),
      "low-discrimination geometry must route to the exact kernel")
    // discriminating geometry -> LSH candidate plan (no nested loop)
    val lsh = Dedup.embeddingNearDup(emb, "vec_id", "embedding",
      threshold = 0.45, bands = 8, bitsPerBand = 16)
    assert(!lsh.queryExecution.executedPlan.toString.contains("BroadcastNestedLoopJoin"),
      "discriminating geometry must keep the banded LSH plan")
    // exact path == brute-force reference; LSH path at a high threshold is a
    // subset of exact at the same threshold with identical cosines per pair
    val exactSet = pairs(exact)
    assert(exactSet == pairs(Dedup.cosineAllPairs(emb, "vec_id", "embedding", 0.45)))
    val lshHi = pairs(Dedup.embeddingNearDup(emb, "vec_id", "embedding",
      threshold = 0.3, bands = 64, bitsPerBand = 2, maxCandidateFraction = 1.1))
    val exactHi = pairs(Dedup.cosineAllPairs(emb, "vec_id", "embedding", 0.3))
    assert(lshHi.subsetOf(exactHi))
  }

  test("centroidOutliers: known centroid, outlier flag, partition-invariant bits") {
    import spark.implicits._
    // label A: (1,0,0),(0,1,0),(-1,0,0) → centroid (0, 1/3, 0) — the x-axis
    // vectors are ORTHOGONAL to it (cos 0, not outliers under tau=0).
    // label B: (0,0,1),(0,0,2),(0,0,-1) → centroid (0,0,2/3) — the planted
    // (0,0,-1) points opposite → cos -1 → outlier.
    val rows = Seq(
      (1L, Array(1f, 0f, 0f), "A"),
      (2L, Array(0f, 1f, 0f), "A"),
      (3L, Array(-1f, 0f, 0f), "A"),
      (4L, Array(0f, 0f, 1f), "B"),
      (5L, Array(0f, 0f, 2f), "B"),
      (6L, Array(0f, 0f, -1f), "B"))
    val df = rows.toDF("vec_id", "embedding", "label")
    val out = Similarity.centroidOutliers(df, "vec_id", "embedding", "label")
      .orderBy("vec_id")
      .as[(Long, String, Double, Boolean)].collect()
    val byId = out.map(r => r._1 -> r).toMap
    assert(byId(1L)._3.abs < 1e-9 && !byId(1L)._4)             // orthogonal → cos 0
    assert(math.abs(byId(2L)._3 - 1.0) < 1e-9 && !byId(2L)._4) // along centroid
    assert(byId(3L)._3.abs < 1e-9 && !byId(3L)._4)
    assert(math.abs(byId(4L)._3 - 1.0) < 1e-9 && math.abs(byId(5L)._3 - 1.0) < 1e-9)
    assert(math.abs(byId(6L)._3 + 1.0) < 1e-9 && byId(6L)._4)  // opposite → outlier
    // bit-determinism under repartitioning: the exact doubles must not move
    val repartitioned = Similarity.centroidOutliers(
      df.repartition(7), "vec_id", "embedding", "label")
      .orderBy("vec_id").as[(Long, String, Double, Boolean)].collect()
    assert(out.toSeq == repartitioned.toSeq)
  }

  test("keepBestPerCluster: per-cluster argmax survives, ties to lowest id, unpaired pass") {
    import spark.implicits._
    val docs = Seq(
      (1L, 10L), (2L, 30L), (3L, 30L), // cluster {1,2,3}: 2 and 3 tie on score → 2 wins
      (4L, 5L),                        // unpaired → survives untouched
      (5L, 1L), (6L, 2L)               // cluster {5,6}: 6 wins on score
    ).toDF("doc_id", "score")
    val pairs = Seq((1L, 2L), (2L, 3L), (5L, 6L)).toDF("doc_a", "doc_b")
    val kept = Dedup.keepBestPerCluster(docs, pairs, "doc_id", col("score"))
      .select($"doc_id").as[Long].collect().sorted.toSeq
    assert(kept == Seq(2L, 4L, 6L))
    // empty pair graph: everything survives
    val noPairs = Seq.empty[(Long, Long)].toDF("doc_a", "doc_b")
    assert(Dedup.keepBestPerCluster(docs, noPairs, "doc_id", col("score")).count() == 6)
  }

  test("ivfAppend: appended index searches identically to a fixed-centroid rebuild") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val emb = Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    val base = emb.filter($"vec_id" % 3 =!= 0)
    val batch = emb.filter($"vec_id" % 3 === 0)
    val index = Similarity.buildIvfIndex(base, "vec_id", "embedding", nlist = 8)
    val appended = Similarity.ivfAppend(index, batch, "vec_id", "embedding")
    // ground truth: same centroids, full corpus assigned in one pass
    val rebuilt = index.copy(
      cells = Similarity.assignCells(emb, index.centroids, "vec_id", "embedding"))
    val queries = emb.filter($"vec_id" < 5)
    def results(ix: Similarity.IvfIndex): Seq[(Long, Long)] =
      Similarity.ivfSearch(ix, queries, "vec_id", "embedding", k = 10, nprobe = 4)
        .select(col("query_id"), col("item_id")).as[(Long, Long)]
        .collect().sorted.toSeq
    val fromAppend = results(appended)
    assert(fromAppend == results(rebuilt), "append must equal rebuild")
    // the appended batch is actually reachable: some result comes from it
    assert(fromAppend.exists { case (_, item) => item % 3 == 0 },
      s"no appended vector ever surfaced: $fromAppend")
    index.cells.unpersist(); appended.cells.unpersist()
  }

  test("ivfRecallReport: exact integers replayed by a plain-Scala local oracle") {
    // the x188 SQL oracle asserts structure and floors; THIS is the exact
    // oracle for the integers it cannot assert — given the index's trained
    // centroids, a straightforward local replay (assign cells, probe the
    // nprobe best cells, hits = |candidates ∩ exact top-10|) must produce
    // the same n_results / n_hits / recall_ppm per nprobe.
    import spark.implicits._
    val e = Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    val q = e.filter($"vec_id" < 10)
    val index = Similarity.buildIvfIndex(e, "vec_id", "embedding", nlist = 16)
    val truth = Similarity.bruteForceTopK(e, q, "vec_id", "embedding", k = 10)
      .select($"query_id", $"item_id")
    val got = Similarity
      .ivfRecallReport(index, q, truth, "vec_id", "embedding", k = 10)
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))
      .toMap

    // ---- local replay, plain Scala double math ----
    val vecs = e.select($"vec_id", $"embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    def cos(a: Array[Float], b: Array[Float]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) {
        d += a(i).toDouble * b(i); na += a(i).toDouble * a(i); nb += b(i).toDouble * b(i); i += 1
      }
      if (na == 0.0 || nb == 0.0) 0.0 else d / (math.sqrt(na) * math.sqrt(nb))
    }
    // best (cos desc, centroid id asc) — mirror nearestCell's tie-break
    def rankedCells(v: Array[Float]): Seq[Int] =
      index.centroids.toSeq.map { case (cid, cv) => (cos(v, cv), cid) }
        .sortBy { case (s, cid) => (-s, cid) }.map(_._2)
    val cells: Map[Long, Int] = vecs.map { case (id, v) => id -> rankedCells(v).head }
    val queries = vecs.keys.filter(_ < 10).toSeq.sorted
    def topTruth(qid: Long): Set[Long] =
      vecs.keys.filter(_ != qid).toSeq
        .map(id => (cos(vecs(qid), vecs(id)), id))
        .sortBy { case (s, id) => (-s, id) }.take(10).map(_._2).toSet
    val truthLocal = queries.map(qid => qid -> topTruth(qid)).toMap
    Seq(1, 2, 4, 8).foreach { np =>
      var nResults = 0L; var nHits = 0L
      queries.foreach { qid =>
        val probed = rankedCells(vecs(qid)).take(np).toSet
        val cand = vecs.keys.filter(id => id != qid && probed(cells(id))).toSeq
          .map(id => (cos(vecs(qid), vecs(id)), id))
          .sortBy { case (s, id) => (-s, id) }.take(10).map(_._2)
        nResults += cand.length
        nHits += cand.count(truthLocal(qid))
      }
      val nTruth = queries.map(truthLocal(_).size).sum.toLong
      val recallPpm = math.floor(nHits.toDouble * 1e6 / nTruth).toLong
      assert(got(np.toLong) == ((queries.length.toLong, nResults, nTruth, nHits, recallPpm)),
        s"nprobe=$np: got ${got(np.toLong)}, local replay " +
          s"(${queries.length}, $nResults, $nTruth, $nHits, $recallPpm)")
    }
    // and the report is genuinely a SWEEP: strictly more hits by nprobe=8
    assert(got(8L)._4 > got(1L)._4, s"recall should improve across the sweep: $got")
    index.cells.unpersist()
  }

  test("semanticDedup: drops the centroid-nearer side of each qualifying pair, per cluster") {
    import spark.implicits._
    // cluster "c": 1=(1,0) and 2=(0.9,0.05) are near-parallel (cos ≈ 0.998
    // ≥ 0.3) → one qualifying pair; 3=(0,1) is orthogonal to both. With
    // S = Σq, d_i = |n·q_i − S|²: d_1 > d_2, so 2 (centroid-nearer) drops.
    // cluster "d": two antiparallel vectors — dot < 0 never qualifies.
    val emb = Seq(
      (1L, Array(1.0f, 0.0f), "c"),
      (2L, Array(0.9f, 0.05f), "c"),
      (3L, Array(0.0f, 1.0f), "c"),
      (10L, Array(1.0f, 0.0f), "d"),
      (11L, Array(-1.0f, 0.0f), "d")
    ).toDF("vec_id", "embedding", "label")
    val kept = Similarity.semanticDedup(emb, "vec_id", "embedding", "label")
      .select($"vec_id").as[Long].collect().sorted.toSeq
    assert(kept == Seq(1L, 3L, 10L, 11L), s"got $kept")
    // identical vectors tie on distance → the SMALLER id is the keeper
    val twins = Seq(
      (5L, Array(0.5f, 0.5f), "t"), (6L, Array(0.5f, 0.5f), "t")
    ).toDF("vec_id", "embedding", "label")
    val keptTwins = Similarity.semanticDedup(twins, "vec_id", "embedding", "label")
      .select($"vec_id").as[Long].collect().toSeq
    assert(keptTwins == Seq(5L), s"tie must keep the smaller id: $keptTwins")
  }

  test("labelCohesion: |sum v|^2 - sum|v|^2 identity equals the naive pair sum") {
    import spark.implicits._
    val vecs = Map(
      "a" -> Seq(Array(1.0f, 0.0f), Array(0.8f, 0.6f), Array(0.9f, -0.1f)),
      "b" -> Seq(Array(0.0f, 1.0f), Array(0.0f, -1.0f)))
    val df = vecs.toSeq.flatMap { case (l, vs) => vs.zipWithIndex.map {
      case (v, i) => (l.hashCode.toLong + i, v, l) } }
      .toDF("vec_id", "embedding", "label")
    val out = Similarity.labelCohesion(df, "vec_id", "embedding", "label")
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getDecimal(2), if (r.isNullAt(3)) None else Some(r.getDouble(3))))).toMap
    // naive ordered-pair dot sum over the SAME quantized integers
    def q(v: Array[Float]): Array[Long] = v.map(x => math.floor(x.toDouble * 1e6).toLong)
    vecs.foreach { case (l, vs) =>
      val qs = vs.map(q)
      val naive = (for { i <- qs.indices; j <- qs.indices if i != j } yield
        qs(i).zip(qs(j)).map { case (x, y) => BigInt(x) * BigInt(y) }.sum).sum
      val (n, dec, mean) = out(l)
      assert(n == vs.size)
      assert(BigInt(dec.toBigInteger) == naive, s"label $l: $dec vs $naive")
      val expectedMean = naive.toDouble / (n * (n - 1)) / 1e12
      assert(math.abs(mean.get - expectedMean) < 1e-9)
    }
    // n=1 label: zero pairs, NULL mean, zero numerator
    val single = Seq((1L, Array(0.5f, 0.5f), "solo")).toDF("vec_id", "embedding", "label")
    val s1 = Similarity.labelCohesion(single, "vec_id", "embedding", "label").head
    assert(s1.getLong(1) == 1L && s1.getDecimal(2).longValueExact() == 0L && s1.isNullAt(3))
  }

  test("duplicateSpanStats: cross-doc spans merge into intervals; within-doc repeats don't count") {
    import spark.implicits._
    val docs = Seq(
      (1L, "a b c d e f"),          // "a b c","b c d" shared with doc 2 → pos 0,1 merge: 4 tokens
      (2L, "a b c d x y"),          // same two dup windows → 4 of 6 tokens covered
      (3L, "q r s"),                // unique window → clean
      (4L, "m n"),                  // shorter than the span — no windows at all
      (5L, "a b c 1 2 3 4 5 b c d") // dup at pos 0 and pos 8, gap > L → TWO runs of 3
    ).toDF("doc_id", "text")
    val out = Dedup.duplicateSpanStats(docs, "doc_id", "text", spanTokens = 3)
      .orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))
    assert(out.toSeq == Seq(
      (1L, 6L, 2L, 4L, 4.0 / 6.0),
      (2L, 6L, 2L, 4L, 4.0 / 6.0),
      (3L, 3L, 0L, 0L, 0.0),
      (4L, 2L, 0L, 0L, 0.0),
      (5L, 11L, 2L, 6L, 6.0 / 11.0)))
    // a doc whose only repeats are INTERNAL stays clean (distinct-doc rule)
    val internal = Seq((1L, "z z z z z z"), (2L, "p q r s t u")).toDF("doc_id", "text")
    val clean = Dedup.duplicateSpanStats(internal, "doc_id", "text", 3)
      .agg(sum($"n_dup_positions")).head.getLong(0)
    assert(clean == 0L)
  }

  test("incrementalDedupReport: new-vs-corpus matches only, within-batch dups ignored") {
    import spark.implicits._
    val corpus = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "completely unrelated corpus content about spark plans")).toDF("doc_id", "text")
    val fresh = Seq(
      (10L, "the quick brown fox jumps over the lazy dog"),   // dup of corpus 1
      (11L, "the quick brown fox jumps over the lazy dog"),   // dup of 1 AND of 10
      (12L, "entirely novel text that matches nothing else here")).toDF("doc_id", "text")
    val out = Dedup.incrementalDedupReport(fresh, corpus, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).sortBy(_._1)
    // 10 and 11 each match corpus doc 1; their matching EACH OTHER is not counted
    assert(out.toSeq == Seq((10L, 1L, false), (11L, 1L, false), (12L, 0L, true)))
  }

  test("quantizedTopK: int8 range, zero-vector safe, parallel vectors rank first") {
    import spark.implicits._
    val vecs = Seq(
      (0L, Array(1.0f, 0.0f, 0.0f)),
      (1L, Array(100.0f, 0.0f, 0.0f)),  // parallel to query 0 → qdot 127*127
      (2L, Array(0.0f, 5.0f, 0.0f)),    // orthogonal → qdot 0
      (3L, Array(-2.0f, 0.0f, 0.0f)),   // anti-parallel → qdot -127*127
      (4L, Array(0.0f, 0.0f, 0.0f))     // zero vector → quantizes to zeros
    ).toDF("vec_id", "embedding")
    val out = Similarity.quantizedTopK(vecs, vecs.filter($"vec_id" === 0L),
      "vec_id", "embedding", k = 4)
      .orderBy($"rank")
      .collect().map(r => (r.getLong(1), r.getLong(2))).toSeq
    assert(out == Seq(
      (1L, 127L * 127L), (2L, 0L), (4L, 0L), (3L, -127L * 127L)))
  }

  test("walkAuthority: hand-traced integer masses on a 3-node path") {
    import spark.implicits._
    // path a-b-c: deg a=1, b=2, c=1; init 10⁶, damping 85/100, floor=150000
    val pairs = Seq((1L, 2L), (2L, 3L)).toDF("doc_a", "doc_b")
    val out = Dedup.walkAuthority(pairs, iters = 2)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    // iter1: inflow a=500000, b=2e6, c=500000 → a=c=150000+425000=575000,
    //        b=150000+1700000=1850000
    // iter2: shares a=575000, b=925000, c=575000 → inflow a=c=925000,
    //        b=1150000 → a=c=150000+786250=936250, b=150000+977500=1127500
    assert(out == Map(
      1L -> ((1L, 936250L)), 2L -> ((2L, 1127500L)), 3L -> ((1L, 936250L))))
    // mass is conserved up to per-node floor loss: total ≤ n·initMass
    assert(out.values.map(_._2).sum <= 3000000L)
  }

  test("containmentPairs: quote inside a long doc found despite tiny Jaccard") {
    import spark.implicits._
    // doc 1 = 6-token quote (4 shingles); doc 2 = the quote + 20 extra
    // tokens (24 shingles, all 4 of doc 1's among them); doc 3 unrelated
    val quote = "alpha beta gamma delta epsilon zeta"
    val container = quote + " " + (1 to 20).map(i => s"w$i").mkString(" ")
    val docs = Seq((1L, quote), (2L, container), (3L, "totally different text here"))
      .toDF("doc_id", "text")
    val out = Dedup.containmentPairs(docs, "doc_id", "text", shingleK = 3,
      threshold = 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2),
        r.getDouble(5), r.getDouble(6)))
    // only the ordered pair 1→2 qualifies: containment 4/4 = 1.0 but
    // Jaccard 4/(4+24−4) — the regime symmetric mining cannot see
    assert(out.toSeq == Seq((1L, 2L, 4, 1.0, 4.0 / 24.0)))
  }

  test("weightedJaccardPairs: repetition changes the weighted metric only") {
    import spark.implicits._
    // doc 2 repeats doc 1's text twice: set Jaccard 1.0, weighted 0.5
    val docs = Seq(
      (1L, "a b c"), (2L, "a b c a b c"), (3L, "a b x")).toDF("doc_id", "text")
    val pairs = Seq((1L, 2L), (1L, 3L)).toDF("doc_a", "doc_b")
    val out = Dedup.weightedJaccardPairs(docs, "doc_id", "text", pairs)
      .orderBy($"doc_a", $"doc_b")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getDouble(4))).toSeq
    // 1↔2: min Σ=3 (each of a,b,c once), max Σ=3+6−3=6 → 0.5
    // 1↔3: shared {a,b} min Σ=2, max Σ=3+3−2=4 → 0.5
    assert(out == Seq((1L, 2L, 3L, 6L, 0.5), (1L, 3L, 2L, 4L, 0.5)))
  }

  test("weightedJaccardPairs: disjoint pair scores 0, not dropped") {
    import spark.implicits._
    val docs = Seq((1L, "a b"), (2L, "x y")).toDF("doc_id", "text")
    val pairs = Seq((1L, 2L)).toDF("doc_a", "doc_b")
    val out = Dedup.weightedJaccardPairs(docs, "doc_id", "text", pairs).collect()
    assert(out.length == 1)
    assert(out(0).getLong(2) == 0L && out(0).getLong(3) == 4L &&
      out(0).getDouble(4) == 0.0)
  }

  // ----------------------------------------------------- exactSubstrStrip
  test("exactSubstrStrip removes exactly the covered positions, in order") {
    import spark.implicits._
    // docs 1 and 2 share the 5-token run "a b c d e"; doc 3 is clean
    val docs = Seq(
      (1L, "x a b c d e y"),
      (2L, "a b c d e z"),
      (3L, "p q r s t u")).toDF("doc_id", "text")
    val out = Dedup.exactSubstrStrip(docs, "doc_id", "text", spanTokens = 5)
      .orderBy($"doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    assert(out.toSeq == Seq(
      (1L, 7L, 2L, "x y"),
      (2L, 6L, 1L, "z"),
      (3L, 6L, 6L, "p q r s t u")))
  }

  test("exactSubstrStrip: overlapping windows merge; full-doc coverage empties the doc") {
    import spark.implicits._
    // 1 and 2 are identical 6-token docs → two overlapping dup windows
    // (starts 0 and 1) merge to one interval covering everything
    val docs = Seq(
      (1L, "a b c d e f"),
      (2L, "a b c d e f"),
      (3L, "short doc")).toDF("doc_id", "text")
    val out = Dedup.exactSubstrStrip(docs, "doc_id", "text", spanTokens = 5)
      .orderBy($"doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    assert(out.toSeq == Seq(
      (1L, 6L, 0L, ""),
      (2L, 6L, 0L, ""),
      (3L, 2L, 2L, "short doc")))
  }

  test("ophRecallReport: every count replayed by a plain-Scala brute-force oracle") {
    import spark.implicits._
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    import org.apache.spark.unsafe.types.UTF8String
    // short-doc family: base docs of 4..43 tokens, each with a truncated
    // near-dup partner — J spread around the 0.5 threshold, shingle counts
    // under numBins (the regime the report exists to measure)
    val docsRows = (0 until 30).flatMap { i =>
      val n = 4 + i % 40
      val ws = (0 until n).map(j => s"t${(i * 31 + j * 7) % 90}")
      Seq((2L * i, ws.mkString(" ")),
        (2L * i + 1, ws.take(math.max(2, n - 1 - i % 5)).mkString(" ")))
    }
    val (numBins, configs, t, edges) = (32, Seq(16, 8), 0.5, Seq(4, 8, 16))
    val report = Dedup.ophRecallReport(docsRows.toDF("doc_id", "text"),
      "doc_id", "text", shingleK = 3, numBins = numBins, bandConfigs = configs,
      threshold = t, bucketEdges = edges)
      .collect().map(r => (r.getLong(0), r.getLong(2)) ->
        (r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7))).toMap
    // ---- brute force over the same kernels ----
    def arr(s: String) = new GenericArrayData(
      s.toLowerCase.split("\\s+").map(x => UTF8String.fromString(x): Any))
    val perDoc = docsRows.map { case (id, s) =>
      val sh = graft.functions.Ops.shingleHashes(arr(s), 3)
      def longs(a: org.apache.spark.sql.catalyst.util.ArrayData) =
        (0 until a.numElements()).map(a.getLong).toVector
      (id, sh.toSet, sh.length,
        longs(graft.functions.Ops.minhashSig(arr(s), 3, numBins)),
        longs(graft.functions.Ops.ophSig(arr(s), 3, numBins)))
    }
    def bucketOf(m: Int): Long = edges.sorted.reverse.find(m >= _).map(_.toLong).getOrElse(0L)
    val pairs = for {
      (ia, sa, na, ca, oa) <- perDoc; (ib, sb, nb, cb, ob) <- perDoc if ia < ib
    } yield {
      val inter = sa.intersect(sb).size
      val bkt = bucketOf(math.min(na, nb))
      (bkt, inter.toDouble / (na + nb - inter) >= t, ca, cb, oa, ob)
    }
    for (bands <- configs) {
      val r = numBins / bands
      def cand(x: Vector[Long], y: Vector[Long]) =
        (0 until bands).exists(b => x.slice(b * r, b * r + r) == y.slice(b * r, b * r + r))
      val byB = pairs.groupBy(_._1)
      for ((bkt, ps) <- byB) {
        val truth = ps.filter(_._2)
        val candC = ps.filter(p => cand(p._3, p._4))
        val candO = ps.filter(p => cand(p._5, p._6))
        val expected = (truth.size.toLong, candC.size.toLong,
          candC.count(_._2).toLong, candO.size.toLong, candO.count(_._2).toLong)
        // a bucket with pairs but zero truth AND zero candidates emits no row
        if (expected != ((0L, 0L, 0L, 0L, 0L)))
          assert(report.get((bands.toLong, bkt)).contains(expected),
            s"bands=$bands bucket=$bkt: got ${report.get((bands.toLong, bkt))}, want $expected")
        else assert(!report.contains((bands.toLong, bkt)),
          s"bands=$bands bucket=$bkt: unexpected row for an empty bucket")
      }
    }
    // the family must actually exercise the short regime: some truth below 16
    assert(pairs.exists(p => p._2 && p._1 < 16), "vacuous corpus: no short truth pairs")
  }

  test("simhashRecallReport: counts replayed by a plain-Scala brute-force oracle") {
    import spark.implicits._
    import graft.functions.Exprs.simhash64
    import graft.ops.Dedup.tokens
    // Corpus engineered for hamming DIVERSITY (the r11 x171 lesson: a gate
    // corpus that yields zero qualifying rows verifies nothing): 8 groups
    // of a 301-token base doc plus append-1/2/3-token variants — each
    // append shifts every bit-sum by ±1, so variants land a few hamming
    // bits from their base (truth pairs in 1..7) — plus 4 exact copies
    // (hamming 0) and 16 unrelated word salads (far pairs, no truth).
    val rows = (for (g <- 0 until 8) yield {
      val base = (0 until 301).map(j => s"g${g}w${
        (graft.functions.Ops.splitmix64(g * 1009 + j) % 60 + 60) % 60}").mkString(" ")
      Seq((g * 10L, base), (g * 10L + 1, s"$base xa$g"),
        (g * 10L + 2, s"$base xa$g xb$g"), (g * 10L + 3, s"$base xa$g xb$g xc$g"))
    }).flatten ++ (0 until 4).map(i => (200L + i, "same exact copy of this doc")) ++
      (0 until 16).map { i =>
        (300L + i, (0 until 9).map(j => s"r${
          (graft.functions.Ops.splitmix64(i * 131 + j) % 997 + 997) % 997}").mkString(" "))
      }
    val df = rows.toDF("doc_id", "text")
    val rep = Dedup.simhashRecallReport(df, "doc_id", "text")
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) -1L else r.getLong(3))).toMap

    // ---- brute-force replay over the SAME signatures ----
    val sig = df.select($"doc_id", simhash64(tokens($"text")).as("s"))
      .as[(Long, Long)].collect().toMap
    val ids = sig.keys.toSeq.sorted
    val pairs = for { i <- ids.indices; j <- (i + 1) until ids.length }
      yield (sig(ids(i)), sig(ids(j)))
    def ham(p: (Long, Long)): Int = java.lang.Long.bitCount(p._1 ^ p._2)
    def share16(p: (Long, Long)): Boolean = (0 until 4).exists(c =>
      ((p._1 >>> (c * 16)) & 0xFFFFL) == ((p._2 >>> (c * 16)) & 0xFFFFL))
    for (h <- 1 to 7) {
      val truth = pairs.count(p => ham(p) <= h).toLong
      val cand = pairs.count(p => ham(p) <= h && share16(p)).toLong
      val recall = if (truth == 0) -1L else cand * 1000000L / truth
      assert(rep(h.toLong) == ((cand, truth, recall)),
        s"h=$h: report ${rep(h.toLong)}, brute force ($cand, $truth, $recall)")
    }
    // the sweep is non-vacuous: exact copies pair up at every h, and the
    // appended-token variants land strictly more truth pairs by h=7
    assert(rep(1L)._2 >= 6L, s"exact-copy pairs missing: $rep")
    assert(rep(7L)._2 > rep(1L)._2, s"no variant pairs in 2..7: $rep")
    // pigeonhole guarantee: 4 chunks are exhaustive through h=3
    for (h <- 1 to 3)
      assert(rep(h.toLong)._1 == rep(h.toLong)._2, s"h=$h recall must be total: $rep")
  }

  test("simhash block geometries agree inside their exhaustive range") {
    // The Manku C(6,3) family (production since r13) and the classic 4×16
    // single-chunk family are BOTH provably exhaustive for hamming ≤ 3, so
    // absent bucket saturation they must emit the identical pair set — the
    // geometry changes candidate generation cost and key-space crowding,
    // never the h≤3 answer. Run on the sf0.001 corpus (real text, planted
    // near-dups, no saturation at this scale).
    import spark.implicits._
    val corpus = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    def pairs(b: Int, k: Int) = Dedup.simhashNearDupPairs(
      corpus, "doc_id", "text", maxHamming = 3, blocks = b, keyBlocks = k)
      .select($"doc_a", $"doc_b", $"hamming").as[(Long, Long, Int)].collect().toSet
    val manku = pairs(6, 3)
    val classic = pairs(4, 1)
    assert(manku == classic,
      s"exhaustive geometries disagree: only-manku=${(manku diff classic).take(5)} " +
        s"only-classic=${(classic diff manku).take(5)}")
    assert(manku.nonEmpty, "vacuous corpus: no hamming<=3 pairs at sf0.001")
  }

  test("one-permutation hashing: OPH pairs == classic minhash pairs == planted truth") {
    // The cheap signature (one hash per shingle, rotation densification)
    // must land the identical verified pair set the 128-pass classic
    // signature lands at the same band geometry — the verify stage computes
    // exact Jaccard either way, so only candidate RECALL could differ, and
    // at this geometry both are deterministic on planted J≥0.5 structure.
    import spark.implicits._
    def pairs(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      df.select($"doc_a", $"doc_b").as[(Long, Long)].collect().toSet
    val oph = pairs(Dedup.minhashNearDupPairsOph(docs, "doc_id", "text",
      shingleK = 3, numBins = 128, bands = 64, threshold = 0.5))
    val classic = pairs(Dedup.minhashNearDupPairs(docs, "doc_id", "text",
      shingleK = 3, numHashes = 128, bands = 64, threshold = 0.5))
    assert(oph == classic, s"only-classic=${(classic diff oph).take(5)} " +
      s"only-oph=${(oph diff classic).take(5)}")
    assert(oph.nonEmpty, "vacuous corpus")
    // signature determinism: a pure function of the shingle SET — token
    // order and duplication must not change it
    val sigs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta"),
      (2L, "alpha beta gamma delta epsilon zeta"),
      (3L, "completely different words here now")
    ).toDF("doc_id", "text")
      .select($"doc_id", graft.functions.Exprs.oph_sig(Dedup.tokens($"text")).as("sig"))
      .as[(Long, Seq[Long])].collect().toMap
    assert(sigs(1L) == sigs(2L), "identical docs must sign identically")
    assert(sigs(1L) != sigs(3L), "different docs must not")
    assert(sigs(1L).length == 128)
  }

  test("pipeline composition: exact dedup upstream makes mega-bucket saturation lossless") {
    // The saturation contract drops pairs WITHIN an identical-text
    // mega-cluster (r13 ScaleStress plant) — which would be the worst
    // possible miss for a dedup pipeline if near-dup ran on raw text. The
    // production composition never does: exact dedup (md5 keep-first)
    // collapses identical copies FIRST, so the near-dup stage sees one
    // representative per distinct text and saturation has nothing left to
    // drop. Pin that end-to-end: composed survivors == the survivors you
    // get with no mega-cluster present at all.
    import spark.implicits._
    val cluster = (0 until 50).map(i => (1000L + i, "identical boilerplate copy zz1 zz2 zz3"))
    val sat = docs.select($"doc_id", $"text")
      .unionAll(cluster.toDF("doc_id", "text"))
    // tiny cap so the 50-copy cluster saturates its buckets even here
    def survivors(corpus: org.apache.spark.sql.DataFrame): Set[Long] = {
      val uniq = Dedup.exactDedup(corpus, "doc_id", "text")
      val losers = Dedup.minhashNearDupPairs(uniq, "doc_id", "text",
        threshold = 0.5, maxBucketSize = 10)
        .select($"doc_b").as[Long].collect().toSet
      uniq.select($"doc_id").as[Long].collect().toSet -- losers
    }
    val composed = survivors(sat)
    // the cluster collapses to its keep-first representative, which (being
    // textually unrelated to the base corpus) must survive near-dup intact
    assert(composed.contains(1000L), "keep-first representative must survive")
    assert((1001L to 1049L).forall(id => !composed.contains(id)),
      "exact dedup must have removed every non-representative copy")
    // and the base corpus's survivor set is unperturbed by the plant
    assert(composed - 1000L == survivors(docs.select($"doc_id", $"text")),
      "mega-cluster must not change which ordinary docs survive")
  }

  test("block-combination pigeonhole property: h ≤ blocks−keyBlocks pairs ALWAYS share a key") {
    // The exhaustiveness claim, brute-forced over randomized signatures:
    // flip up to (blocks − keyBlocks) random bits and assert some key
    // combination is untouched — for the production (6,3) family and the
    // classic (4,1). Key extraction here is independent test code (plain
    // bit slicing over the same near-equal layout), not the SQL expressions
    // under test.
    val rnd = new scala.util.Random(20260815L)
    def layout(blocks: Int): Seq[(Int, Int)] = {
      val base = 64 / blocks; val extra = 64 % blocks
      val widths = Seq.tabulate(blocks)(i => base + (if (i < extra) 1 else 0))
      widths.scanLeft(0)(_ + _).zip(widths)
    }
    def keys(sig: Long, blocks: Int, keyBlocks: Int): Seq[Long] = {
      val lay = layout(blocks)
      lay.indices.combinations(keyBlocks).map { combo =>
        var acc = 0L; var shift = 0
        combo.foreach { b =>
          val (off, w) = lay(b)
          acc |= ((sig >>> off) & ((1L << w) - 1)) << shift
          shift += w
        }
        acc
      }.toSeq
    }
    for (_ <- 1 to 2000; (b, k) <- Seq((6, 3), (4, 1), (8, 1))) {
      val sig = rnd.nextLong()
      val flips = rnd.nextInt(b - k + 1) // 0..exhaustive bound
      var other = sig
      (1 to flips).foreach(_ => other ^= 1L << rnd.nextInt(64))
      val shared = keys(sig, b, k).zip(keys(other, b, k)).exists { case (x, y) => x == y }
      assert(shared,
        s"($b,$k): sig=$sig flips=$flips other=$other — qualifying pair shares no key")
    }
  }

  test("simhashRecallReport FAILS LOUDLY when a truth bucket saturates (no silent undercount)") {
    // ADVICE r12 (medium): the 8×8-bit truth leg has only 2048 buckets, so
    // a skewed corpus can push one past the cap — bounded_collect_set would
    // NULL it and the report would silently DROP truth pairs, breaking the
    // "exhaustive for h ≤ 7" claim and letting recall_micro exceed 10⁶.
    // Saturation must now throw, naming the knob.
    import spark.implicits._
    // 9 exact copies → identical signatures → one truth bucket of size 9
    // per chunk; truthBucketCap = 8 saturates all of them
    val df = (1L to 9L).map(i => (i, "nine exact copies of this document"))
      .toDF("doc_id", "text")
    val e = intercept[IllegalArgumentException] {
      Dedup.simhashRecallReport(df, "doc_id", "text", truthBucketCap = 8)
    }
    assert(e.getMessage.contains("truthBucketCap"), e.getMessage)
    // and the same corpus under a sufficient cap reports exhaustively:
    // C(9,2) = 36 hamming-0 pairs, total recall at every threshold
    val ok = Dedup.simhashRecallReport(df, "doc_id", "text", truthBucketCap = 9)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(ok(1L) == ((36L, 36L)), s"exact copies must pair exhaustively: $ok")
    assert(ok(7L) == ((36L, 36L)), s"cumulative counts must hold at h=7: $ok")
  }

  test("exactSubstrStrip is consistent with duplicateSpanStats on the real corpus") {
    import spark.implicits._
    val corpus = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val strip = Dedup.exactSubstrStrip(corpus, "doc_id", "text", spanTokens = 5)
      .select($"doc_id", ($"n_tokens" - $"n_kept").as("stripped"))
    val stats = Dedup.duplicateSpanStats(corpus, "doc_id", "text", spanTokens = 5)
      .select($"doc_id", $"dup_tokens")
    val mismatches = strip.join(stats, Seq("doc_id"))
      .filter($"stripped" =!= $"dup_tokens").count()
    assert(mismatches == 0L)
    // and something actually gets stripped on this corpus
    assert(strip.filter($"stripped" > 0L).count() > 0L)
  }
}
