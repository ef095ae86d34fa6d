package graft

import org.apache.spark.sql.functions._
import graft.functions.{HllAgg, VecSumAgg, Ops}
import graft.ops.{Clustering, Stats}

/** Exact-behavior contracts for the round-8 additions: the element-wise
  * vector-sum aggregate, the HLL register aggregate, distributed k-means,
  * and the exact AUC — each checked against an independent local reference
  * (the DuckDB oracle checks engine parity; these check the MATH). */
class ClusteringSketchSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.01"

  // --------------------------------------------------------------- vec_sum
  test("vec_sum equals the posexplode reference and is partitioning-invariant") {
    import spark.implicits._
    val df = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select($"vec_id",
        expr("transform(embedding, v -> cast(floor(cast(v as double) * 1000000.0) as bigint))")
          .as("qv"),
        ($"vec_id" % 3).as("g"))
    val viaAgg = df.groupBy($"g").agg(VecSumAgg.vec_sum($"qv").as("s"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toVector).toMap
    val viaExplode = df.select($"g", posexplode($"qv"))
      .groupBy($"g", $"pos").agg(sum($"col").as("s"))
      .collect().groupBy(_.getLong(0))
      .map { case (g, rows) =>
        g -> rows.sortBy(_.getInt(1)).map(_.getLong(2)).toVector
      }
    assert(viaAgg == viaExplode)
    val repart = df.repartition(7, $"vec_id")
      .groupBy($"g").agg(VecSumAgg.vec_sum($"qv").as("s"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toVector).toMap
    assert(repart == viaAgg)
  }

  test("vec_sum ignores NULL vectors and raises on ragged input") {
    import spark.implicits._
    val ok = Seq((1L, Some(Seq(1L, 2L))), (2L, None), (3L, Some(Seq(10L, 20L))))
      .toDF("id", "qv")
      .agg(VecSumAgg.vec_sum($"qv")).collect()(0).getSeq[Long](0)
    assert(ok == Seq(11L, 22L))
    val ragged = Seq(Seq(1L, 2L), Seq(1L, 2L, 3L)).toDF("qv")
    val e = intercept[org.apache.spark.SparkException] {
      ragged.agg(VecSumAgg.vec_sum($"qv")).collect()
    }
    assert(e.getMessage.contains("ragged") ||
      Option(e.getCause).exists(_.getMessage.contains("ragged")))
  }

  // --------------------------------------------------------------- hll
  /** Local reference fold of the registers. */
  private def refRegisters(keys: Seq[Long], p: Int): Vector[Int] = {
    val regs = Array.fill(1 << p)(0)
    keys.foreach { k =>
      val h = Ops.splitmix64(k)
      val bucket = (h >>> (64 - p)).toInt
      val rem = h & ((1L << (64 - p)) - 1L)
      val rho = if (rem == 0L) 64 - p + 1 else java.lang.Long.numberOfTrailingZeros(rem) + 1
      if (rho > regs(bucket)) regs(bucket) = rho
    }
    regs.toVector
  }

  test("hll_registers matches the local reference and is duplication-insensitive") {
    import spark.implicits._
    val users = spark.read.parquet(s"$sfDir/events.parquet").select($"user_id")
    val fromAgg = users.agg(HllAgg.hll_registers($"user_id", 4)).collect()(0)
      .getSeq[Int](0).toVector
    val distinctKeys = users.distinct().as[Long].collect().toSeq
    assert(fromAgg == refRegisters(distinctKeys, 4))
    // 10000 events over 150 users: the register vector from the full stream
    // equals the one from the distinct set (duplication-insensitive), and
    // a different partitioning merges to the same state.
    val fromDistinct = users.distinct()
      .agg(HllAgg.hll_registers($"user_id", 4)).collect()(0).getSeq[Int](0).toVector
    assert(fromAgg == fromDistinct)
    val repart = users.repartition(13)
      .agg(HllAgg.hll_registers($"user_id", 4)).collect()(0).getSeq[Int](0).toVector
    assert(fromAgg == repart)
  }

  test("hll_registers merge algebra: registers of a union = elementwise max") {
    import spark.implicits._
    val a = (1L to 400L).toDF("k")
    val b = (300L to 700L).toDF("k")
    def regsOf(df: org.apache.spark.sql.DataFrame): Vector[Int] =
      df.agg(HllAgg.hll_registers($"k", 4)).head.getSeq[Int](0).toVector
    val union = regsOf(a.union(b))
    val merged = regsOf(a).zip(regsOf(b)).map { case (x, y) => math.max(x, y) }
    assert(union == merged)
  }

  test("x99 estimate lands within the m=16 error regime of the exact count") {
    val rows = graft.queries.Extensions.x99HllUsers(spark, sfDir).collect()
    assert(rows.length == 5)
    rows.foreach { r =>
      val exact = r.getLong(r.fieldIndex("n_exact"))
      val est = r.getLong(r.fieldIndex("est_micro")).toDouble / 1e6
      // 1.04/sqrt(16) = 26% standard error; allow 2σ
      assert(math.abs(est - exact) / exact < 0.52, s"est $est vs exact $exact")
      assert(r.getLong(r.fieldIndex("zero_regs")) == 0L)
    }
  }

  // --------------------------------------------------------------- kmeans
  /** Local exact-integer Lloyd reference — same quantization, seeding,
    * tie-break, floor-div update, empty-cluster carry. */
  private def refKmeans(vecs: Seq[(Long, Array[Float])], k: Int, iters: Int)
      : Map[Long, (Long, Long)] = {
    val qv = vecs.sortBy(_._1).map { case (id, v) =>
      id -> v.map(x => math.floor(x.toDouble * 1000000.0).toLong)
    }
    var cent = qv.take(k).map(_._2.clone()).toArray
    def nearest(q: Array[Long]): (Long, Int) =
      cent.zipWithIndex.map { case (c, j) =>
        var d = 0L; var i = 0
        while (i < q.length) { val t = q(i) - c(i); d += t * t; i += 1 }
        (d, j)
      }.min
    for (_ <- 1 to iters) {
      val grouped = qv.groupBy { case (_, q) => nearest(q)._2 }
      cent = cent.zipWithIndex.map { case (old, j) =>
        grouped.get(j) match {
          case Some(members) =>
            val s = new Array[Long](old.length)
            members.foreach { case (_, q) =>
              var i = 0; while (i < q.length) { s(i) += q(i); i += 1 }
            }
            s.map(Math.floorDiv(_, members.size.toLong))
          case None => old
        }
      }
    }
    qv.map { case (id, q) => val (d, j) = nearest(q); id -> (j.toLong, d) }.toMap
  }

  test("kmeansAssign matches the local exact-integer reference") {
    import spark.implicits._
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val got = Clustering.kmeansAssign(emb, "vec_id", "embedding", k = 8, iters = 3)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val vecs = emb.select($"vec_id", $"embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toSeq
    assert(got == refKmeans(vecs, 8, 3))
    // every cluster is populated on this corpus
    assert(got.values.map(_._1).toSet == (0L until 8L).toSet)
  }

  test("kmeansAssign: empty clusters keep their centroid (duplicate seeds)") {
    import spark.implicits._
    // Seeds are p0, p1, p1-dup. Round 1: ties go to the lowest j, so
    // cluster 2 is EMPTY and must keep its seed centroid rather than
    // divide by zero. Its unmoved centroid then wins the exact-match
    // points back in round 2 (cluster 1's centroid moved to the member
    // mean) — the carry-through is observable in the final assignment.
    val df = Seq(
      (0L, Seq(0.0f, 0.0f)),
      (1L, Seq(1.0f, 1.0f)),
      (2L, Seq(1.0f, 1.0f)),
      (3L, Seq(0.9f, 0.9f))).toDF("vec_id", "embedding")
    val got = Clustering.kmeansAssign(df, "vec_id", "embedding", k = 3, iters = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(0L -> 0L, 1L -> 2L, 2L -> 2L, 3L -> 1L))
    val vecs = Seq(
      (0L, Array(0.0f, 0.0f)), (1L, Array(1.0f, 1.0f)),
      (2L, Array(1.0f, 1.0f)), (3L, Array(0.9f, 0.9f)))
    assert(got == refKmeans(vecs, 3, 2).map { case (id, (j, _)) => id -> j })
  }

  // --------------------------------------------------------------- auc
  test("scoreAuc: perfect separation, reversal, and ties give the textbook values") {
    import spark.implicits._
    // perfect: all positives above all negatives → AUC = 1
    val perfect = Seq((0.9, true), (0.8, true), (0.2, false), (0.1, false))
      .toDF("s", "y")
    val p = Stats.scoreAuc(perfect, "s", "y").collect()(0)
    assert(p.getLong(p.fieldIndex("auc_micro")) == 1000000L)
    assert(p.getLong(p.fieldIndex("auc_num")) == 2L * 2L * 2L)
    // reversed → AUC = 0
    val rev = Stats.scoreAuc(
      Seq((0.1, true), (0.2, true), (0.8, false), (0.9, false)).toDF("s", "y"),
      "s", "y").collect()(0)
    assert(rev.getLong(rev.fieldIndex("auc_micro")) == 0L)
    // all tied → AUC = 1/2 exactly
    val tied = Stats.scoreAuc(
      Seq((0.5, true), (0.5, true), (0.5, false), (0.5, false)).toDF("s", "y"),
      "s", "y").collect()(0)
    assert(tied.getLong(tied.fieldIndex("auc_micro")) == 500000L)
    // mixed hand-computed case: pos {0.8, 0.5}, neg {0.5, 0.3}
    // pairs: (0.8>0.5)=2 +(0.5=0.5)=1 + (0.5>0.3)=2 + (0.8>0.3)=2 → num=7? — spell it:
    // num = Σ 2·[p>n] + [p=n] = 2(0.8>0.5) + 2(0.8>0.3) + 1(0.5=0.5) + 2(0.5>0.3) = 7
    val mixed = Stats.scoreAuc(
      Seq((0.8, true), (0.5, true), (0.5, false), (0.3, false)).toDF("s", "y"),
      "s", "y").collect()(0)
    assert(mixed.getLong(mixed.fieldIndex("auc_num")) == 7L)
    assert(mixed.getLong(mixed.fieldIndex("auc_micro")) == 875000L)
    // NULL scores are excluded
    val withNull = Stats.scoreAuc(
      Seq((Some(0.9), true), (None, true), (Some(0.1), false)).toDF("s", "y"),
      "s", "y").collect()(0)
    assert(withNull.getLong(withNull.fieldIndex("n_pos")) == 1L)
    assert(withNull.getLong(withNull.fieldIndex("auc_micro")) == 1000000L)
  }

  // --------------------------------------------------------------- lsh tuning
  test("x101: the banding S-curve is monotone and internally consistent") {
    val rows = graft.queries.Extensions.x101LshTuning(spark, sfDir).collect()
    assert(rows.length == 4)
    rows.foreach { r =>
      val cand = r.getLong(r.fieldIndex("n_candidates"))
      val tp = r.getLong(r.fieldIndex("n_tp"))
      val truth = r.getLong(r.fieldIndex("n_truth"))
      assert(tp <= math.min(cand, truth))
      assert(r.getLong(r.fieldIndex("bands")) * r.getLong(r.fieldIndex("rows_per_band")) == 16L)
    }
    // rows come back bands DESC = rows_per_band ASC: candidates shrink,
    // precision rises, recall falls as bands coarsen — the S-curve.
    val cands = rows.map(_.getLong(2))
    assert(cands.zip(cands.tail).forall { case (a, b) => a >= b })
    val prec = rows.map(r => Option(r.get(r.fieldIndex("precision_micro"))).map(_.asInstanceOf[Long]).getOrElse(0L))
    assert(prec.zip(prec.tail).forall { case (a, b) => a <= b })
    val recIdx = rows.head.fieldIndex("recall_micro")
    val rec = rows.map(_.getLong(recIdx))
    assert(rec.zip(rec.tail).forall { case (a, b) => a >= b })
    // 16 one-row bands at threshold 0.5: per-pair miss prob ≤ 2^-16 — full
    // recall on this corpus's 25 truth pairs.
    assert(rec.head == 1000000L)
  }

  // ------------------------------------------------------- fk profile
  test("x105: FK health rows are internally consistent; estimates track exact counts") {
    val rows = graft.queries.Extensions.x105FkProfile(spark, sfDir).collect()
    assert(rows.length == 4)
    rows.foreach { r =>
      val nChild = r.getLong(r.fieldIndex("n_child"))
      val nDistinct = r.getLong(r.fieldIndex("n_distinct_fk"))
      val est = r.getLong(r.fieldIndex("hll_est_micro")).toDouble / 1e6
      assert(nDistinct <= nChild)
      assert(r.getLong(r.fieldIndex("n_null_fk")) == 0L)
      assert(r.getLong(r.fieldIndex("n_orphan_keys")) == 0L) // keys nest on this generator
      // m=16 regime: generous 2σ band, but never nonsense
      assert(est > nDistinct * 0.4 && est < nDistinct * 1.6,
        s"${r.getString(0)}: est $est vs exact $nDistinct")
    }
  }

  // --------------------------------------------------------------- bpe
  test("bpeMerges: hand-computed merges on a tiny corpus, non-overlapping scan") {
    import spark.implicits._
    // "a a a b" + "a b x": pairs r1: (a,a)=2? no — doc1 has (a,a)×2,(a,b);
    // doc2 (a,b),(b,x). counts: (a,a)=2, (a,b)=2, (b,x)=1 → tie (a,a) vs
    // (a,b) → lexicographic → (a,a). Rewrite: doc1 [a_a, a, b] (leftmost
    // non-overlap), doc2 unchanged.
    // r2: doc1 (a_a,a),(a,b); doc2 (a,b),(b,x) → (a,b)=2 wins.
    // r3: doc1 [a_a, a_b], doc2 [a_b, x] → (a_a,a_b)=1,(a_b,x)=1 → lex →
    // (a_a,a_b).
    val df = Seq("a a a b", "a b x").toDF("text")
    val got = graft.ops.Bpe.bpeMerges(df, "text", merges = 3).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))
    assert(got.toSeq == Seq(
      (1L, "a", "a", 2L),
      (2L, "a", "b", 2L),
      (3L, "a_a", "a_b", 1L)))
  }

  test("bpeMerges early-stops when no adjacent pairs remain") {
    import spark.implicits._
    val df = Seq("one", "two").toDF("text") // single-token docs: zero pairs
    assert(graft.ops.Bpe.bpeMerges(df, "text", merges = 5).collect().isEmpty)
  }

  test("bpeMerges batched rounds replay the strictly-sequential trajectory") {
    import spark.implicits._
    // Driver-side reference: one merge per round, leftmost non-overlapping
    // rewrite, (count desc, lhs, rhs) tie-break — the semantics the batch
    // prefix rule (disjoint, self-pair-free, strict count gap) must
    // preserve exactly. Tiny alphabet forces the interacting/tied shapes
    // that make batching collapse to the single-merge fallback.
    def mergeOnce(toks: Vector[String], l: String, r: String): Vector[String] = {
      val out = Vector.newBuilder[String]
      var i = 0
      while (i < toks.length) {
        if (i + 1 < toks.length && toks(i) == l && toks(i + 1) == r) {
          out += s"${l}_$r"; i += 2
        } else { out += toks(i); i += 1 }
      }
      out.result()
    }
    def seqBpe(corpus0: Seq[Vector[String]], merges: Int): Seq[(Long, String, String, Long)] = {
      var corpus = corpus0
      val learned = Seq.newBuilder[(Long, String, String, Long)]
      var t = 1
      var stop = false
      while (t <= merges && !stop) {
        val counts = scala.collection.mutable.Map.empty[(String, String), Long]
        corpus.foreach(_.sliding(2).foreach {
          case Seq(a, b) => counts((a, b)) = counts.getOrElse((a, b), 0L) + 1
          case _         => ()
        })
        if (counts.isEmpty) stop = true
        else {
          val ((l, r), c) = counts.toSeq.sortBy { case ((l, r), c) => (-c, l, r) }.head
          learned += ((t.toLong, l, r, c))
          corpus = corpus.map(mergeOnce(_, l, r))
          t += 1
        }
      }
      learned.result()
    }
    (0 until 6).foreach { seed =>
      val rnd = new scala.util.Random(seed)
      val syms = Vector("a", "b", "c", "d")
      val corpus = Seq.fill(12)(
        Vector.fill(1 + rnd.nextInt(8))(syms(rnd.nextInt(syms.length))))
      val got = graft.ops.Bpe.bpeMerges(
        corpus.map(_.mkString(" ")).toDF("text"), "text", merges = 6)
        .collect()
        .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))
        .toSeq
      assert(got == seqBpe(corpus, 6), s"trajectory diverged for seed $seed")
    }
  }

  test("x104 on the real corpus: top-pair counts are non-increasing") {
    // standard BPE property: a merged symbol's new adjacencies can never
    // outnumber the occurrences of the merge that created it
    val rows = graft.queries.Extensions.x104BpeMerges(spark, sfDir).collect()
    assert(rows.length == 8)
    val counts = rows.map(_.getLong(3))
    assert(counts.zip(counts.tail).forall { case (a, b) => a >= b })
    assert(counts.last > 0)
  }

  // ------------------------------------------------------- log quantiles
  test("logBucketQuantiles: estimates bound the exact percentile within bucket width") {
    import spark.implicits._
    val ev = spark.read.parquet(s"$sfDir/events.parquet")
    val est = Stats.logBucketQuantiles(ev, "event_type", "value").collect()
      .map(r => (r.getString(0), r.getLong(1)) -> (r.getLong(2), r.getLong(3))).toMap
    assert(est.size == 15) // 5 types × 3 pcts
    val exact = ev.groupBy($"event_type")
      .agg(expr("percentile(value, 0.5)").as("p50"),
        expr("percentile(value, 0.9)").as("p90"),
        expr("percentile(value, 0.99)").as("p99"),
        count(lit(1)).as("n"))
      .collect()
      .map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2), r.getDouble(3), r.getLong(4)))
      .toMap
    exact.foreach { case (et, (p50, p90, p99, n)) =>
      Seq(50L -> p50, 90L -> p90, 99L -> p99).foreach { case (pct, ex) =>
        val (nVals, q) = est((et, pct))
        assert(nVals == n)
        val estV = q.toDouble / 1e6
        // the sketch returns the bucket LOWER bound; the true quantile sits
        // within one bucket width (≤ 25% relative) above it
        assert(estV <= ex * 1.01 && estV >= ex * 0.70,
          s"$et p$pct: est $estV vs exact $ex")
      }
      // monotone across pcts
      assert(est((et, 50L))._2 <= est((et, 90L))._2 &&
        est((et, 90L))._2 <= est((et, 99L))._2)
    }
  }

  // --------------------------------------------------------- covariance
  test("covarianceMatrix matches a driver-side double computation on the quantized grid") {
    import spark.implicits._
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val got = Stats.covarianceMatrix(emb, "embedding").collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5), r.getString(6))).toMap
    assert(got.size == 64 * 65 / 2)
    val vecs = emb.select($"embedding").collect()
      .map(_.getSeq[Float](0).map(v => math.floor(v.toDouble * 1000.0).toLong).toArray)
    val n = vecs.length.toLong
    val d = vecs.head.length
    // spot-check a handful of cells exactly (BigInt reference)
    for ((i, j) <- Seq((1, 1), (1, 64), (17, 32), (64, 64))) {
      val sI = vecs.map(v => BigInt(v(i - 1))).sum
      val sJ = vecs.map(v => BigInt(v(j - 1))).sum
      val sIj = vecs.map(v => BigInt(v(i - 1)) * BigInt(v(j - 1))).sum
      val (gn, gsi, gsj, gsij, cov) = got((i.toLong, j.toLong))
      assert(gn == n && BigInt(gsi) == sI && BigInt(gsj) == sJ && BigInt(gsij) == sIj)
      assert(BigInt(cov) == BigInt(n) * sIj - sI * sJ)
    }
    // every diagonal covariance numerator is non-negative (n·Σx² ≥ (Σx)²)
    (1 to d).foreach { i =>
      assert(BigInt(got((i.toLong, i.toLong))._5) >= 0)
    }
  }

  test("x100 on the real corpus: bounds and internal consistency") {
    val r = graft.queries.Extensions.x100ScoreAuc(spark, sfDir).collect()(0)
    val np = r.getLong(r.fieldIndex("n_pos"))
    val nn = r.getLong(r.fieldIndex("n_neg"))
    val num = r.getLong(r.fieldIndex("auc_num"))
    assert(np + nn == 500L)
    assert(num >= 0L && num <= 2L * np * nn)
    val micro = r.getLong(r.fieldIndex("auc_micro"))
    assert(micro >= 0L && micro <= 1000000L)
  }

  // ----------------------------------------- dominant eigenvector (x108)
  test("dominantEigenvector matches an independent local replay exactly") {
    import spark.implicits._
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val got = Stats.dominantEigenvector(emb, "embedding", iters = 8)
      .orderBy($"i").collect().map(r => (r.getLong(0), r.getLong(1)))

    // independent replay in plain Scala from the raw floats
    val vecs = emb.select($"embedding").collect()
      .map(_.getSeq[Float](0).map(v => math.floor(v.toDouble * 1000.0).toLong).toArray)
    val n = vecs.length
    val d = vecs.head.length
    val s = Array.tabulate(d)(i => vecs.map(v => BigInt(v(i))).sum)
    val cov = Array.tabulate(d, d) { (i, j) =>
      BigInt(n) * vecs.map(v => BigInt(v(i)) * v(j)).sum - s(i) * s(j)
    }
    val ma = cov.flatten.map(_.abs).max
    val sh = math.max(ma.bitLength - 28, 0)
    val c = cov.map(_.map(x => ((x.abs >> sh) * x.signum).toLong))
    var v = Array.fill(d)(16384L)
    for (_ <- 1 to 8) {
      val w = Array.tabulate(d)(i => (0 until d).map(j => c(i)(j) * v(j)).sum)
      val m = math.max(w.map(math.abs).max, 1L)
      v = w.map(x => if (x >= 0) x * 16384L / m else -(-x * 16384L / m))
    }
    assert(got.toSeq == v.zipWithIndex.map { case (vq, i) => ((i + 1).toLong, vq) }.toSeq)

    // it's an eigen-direction in the making: Rayleigh quotient never drops
    def rayleigh(x: Array[Long]): Double = {
      val cx = Array.tabulate(d)(i =>
        (0 until d).map(j => c(i)(j).toDouble * x(j)).sum)
      val num = (0 until d).map(i => x(i).toDouble * cx(i)).sum
      val den = x.map(t => t.toDouble * t).sum
      num / den
    }
    assert(rayleigh(v) >= rayleigh(Array.fill(d)(16384L)) - 1e-6)
  }

  test("dominantEigenvector degenerate inputs: constant corpus and empty corpus") {
    import spark.implicits._
    val const = Seq.fill(10)(Seq.fill(4)(0.5f)).toDF("embedding")
    val z = Stats.dominantEigenvector(const, "embedding", iters = 3)
      .orderBy($"i").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(z.toSeq == (1 to 4).map(i => (i.toLong, 0L)))
    val empty = Seq.empty[Seq[Float]].toDF("embedding")
    assert(Stats.dominantEigenvector(empty, "embedding").count() == 0L)
  }

  // --------------------------------------------------- simplified silhouette
  test("simplifiedSilhouette: hand-computed 1-d two-cluster scores") {
    import spark.implicits._
    // cluster 0: {0.0, 0.2} → centroid 100000 on the e6 grid;
    // cluster 1: {1.0} → centroid 1000000.
    // v1: a=1e10, b=1e12 → floor(9.9e14/1e12)  = 990
    // v2: a=1e10, b=6.4e11 → floor(6.3e14/6.4e11) = 984
    // v3: a=0,    b=8.1e11 → 1000
    val df = Seq((1L, Seq(0.0f), 0), (2L, Seq(0.2f), 0), (3L, Seq(1.0f), 1))
      .toDF("vec_id", "embedding", "label")
    val out = Clustering.simplifiedSilhouette(df, "vec_id", "embedding", "label")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(out.toSeq == Seq(
      (-1L, 3L, 991L, 984L, 1000L), // total: floor(2974/3)
      (0L, 2L, 987L, 984L, 990L),
      (1L, 1L, 1000L, 1000L, 1000L)))
  }

  test("simplifiedSilhouette: single cluster scores zero everywhere") {
    import spark.implicits._
    val df = Seq((1L, Seq(0.1f, 0.9f), 7), (2L, Seq(0.4f, 0.2f), 7))
      .toDF("vec_id", "embedding", "label")
    val out = Clustering.simplifiedSilhouette(df, "vec_id", "embedding", "label")
      .collect()
    assert(out.forall(r => r.getLong(2) == 0L && r.getLong(3) == 0L && r.getLong(4) == 0L))
    assert(out.map(_.getLong(0)).toSeq == Seq(-1L, 7L))
  }

  test("centroidConfusion: 1-d two-label fixture — separable labels diagonal, stray point crosses") {
    import spark.implicits._
    // label 1 at {0.0, 0.2} → centroid 0.1; label 2 at {1.0, 1.2, 0.15} →
    // centroid ~0.783; the stray 0.15 sits nearer label 1's centroid
    val df = Seq(
      (1L, Seq(0.0f), 1), (2L, Seq(0.2f), 1),
      (3L, Seq(1.0f), 2), (4L, Seq(1.2f), 2), (5L, Seq(0.15f), 2))
      .toDF("vec_id", "embedding", "label")
    val out = Clustering.centroidConfusion(df, "vec_id", "embedding", "label")
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(out == Map((1L, 1L) -> 2L, (2L, 2L) -> 2L, (2L, 1L) -> 1L))
  }

  test("centroidConfusion: null labels dropped; empty input yields zero rows") {
    import spark.implicits._
    val df = Seq((1L, Seq(0.5f), Option.empty[Int])).toDF("vec_id", "embedding", "label")
    assert(Clustering.centroidConfusion(df, "vec_id", "embedding", "label").count() == 0L)
  }

  test("x165 participation ratio math: equal variances → d, one dominant axis → near 1") {
    // plain scalar replay of the PR formula over variance numerators
    def pr(vs: Seq[Double]): Double = math.pow(vs.sum, 2) / vs.map(v => v * v).sum
    assert(math.abs(pr(Seq(5.0, 5.0, 5.0, 5.0)) - 4.0) < 1e-12)
    assert(pr(Seq(100.0, 0.001, 0.001)) < 1.01)
    // scale invariance: the shared n² denominator cancelling is safe
    assert(math.abs(pr(Seq(3.0, 7.0)) - pr(Seq(30.0, 70.0))) < 1e-12)
  }

  test("simplifiedSilhouette: empty corpus yields zero rows (oracle HAVING drops the rollup total)") {
    import spark.implicits._
    val df = Seq.empty[(Long, Seq[Float], Int)].toDF("vec_id", "embedding", "label")
    assert(Clustering.simplifiedSilhouette(df, "vec_id", "embedding", "label").count() == 0L)
    // the oracle must filter its grand-total row the same way
    assert(Clustering.silhouetteSql("embeddings", "vec_id", "embedding", "label")
      .contains("HAVING count(*) > 0"))
  }
}
