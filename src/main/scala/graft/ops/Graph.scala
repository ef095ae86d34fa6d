package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Relational graph kernels over pair relations (co-occurrence graphs, the
  * near-dup pair graph, FK adjacency). No graph runtime — edges are rows,
  * the algorithms are joins, so Catalyst plans them like everything else.
  */
object Graph {

  /** Default cap for the hybrid driver-local fast paths, derived from the
    * DRIVER's heap rather than fixed: the probe collect's transient
    * footprint (boxed Rows + the dedup set, ~10× the packed payload) is
    * budgeted at ~2 KiB of heap per edge, so a 1 GiB driver defaults to
    * ~512k edges and the `ceiling` (4M for the graph ops) is only reached
    * at ≥ 8 GiB — a GB-scale collect is never the default on a driver that
    * can't absorb it, while callers can still opt in explicitly via the
    * cap-taking overloads. */
  private[graft] def memoryScaledCap(ceiling: Int): Int =
    math.min(ceiling.toLong, Runtime.getRuntime.maxMemory() / 2048L).toInt

  /** Global triangle census of an undirected graph given as an edge
    * relation (dupes, reversals, and self-loops tolerated): node/edge
    * counts, wedge count Σ_v C(deg v, 2), triangle count, and the global
    * clustering coefficient 3·Δ/wedges in ppm.
    *
    * Triangle counting is by DEGREE ORIENTATION (the standard distributed
    * formulation — Suri & Vassilvitskii, WWW'11 "Counting Triangles and the
    * Curse of the Last Reducer"): orient every edge from its (deg, id)-
    * smaller endpoint to the larger, enumerate wedges by self-joining the
    * oriented list on the source, close each wedge against the oriented
    * edge set. Orientation caps every out-list at O(√m), so the wedge
    * self-join — the step that explodes on skewed natural graphs (a hub of
    * degree d contributes C(d,2) wedges) — carries at most m^1.5 rows
    * TOTAL, with no per-key hotspot: precisely the salting this workload
    * would otherwise need, but exact. Everything is equi-joins on node ids
    * (AQE broadcasts the degree table when small); nothing is quadratic in
    * nodes or collected to the driver. */
  def triangleStats(edges: DataFrame, aCol: String, bCol: String): DataFrame =
    triangleStats(edges, aCol, bCol,
      broadcastClosureMaxEdges = memoryScaledCap(4 << 20).toLong)

  /** As [[triangleStats]]; `broadcastClosureMaxEdges` picks the wedge-
    * CLOSURE strategy. The wedge stream (m^1.5 rows worst case) dwarfs the
    * edge set (m rows), so when the ORIENTED edge list fits a driver array
    * (m ≤ threshold, ids < 2³²) it is collected once, sorted, and shipped
    * in the task binary as a packed-long set probed by a codegen'd binary
    * search ([[graft.functions.Exprs.PairInSortedSet]]): wedges are
    * generated AND closed map-side — they never shuffle. This is the same
    * size-threshold decision as a broadcast hash join, applied to the
    * closure (measured 26.4 s → join path vs set path on the sf0.1
    * co-purchase graph's 148M wedges). Beyond the threshold the exact
    * shuffle join runs instead — identical counts either way (spec-pinned). */
  def triangleStats(edges: DataFrame, aCol: String, bCol: String,
      broadcastClosureMaxEdges: Long): DataFrame = {
    val eNorm = edges
      .select(least(col(aCol), col(bCol)).as("a"), greatest(col(aCol), col(bCol)).as("b"))
      .filter(col("a") =!= col("b") && col("a").isNotNull && col("b").isNotNull)
    // Driver-local leg (the [[labelPropagation]] hybrid discipline): when
    // the RAW normalized edge list fits the same driver-array budget the
    // set-probe closure already trusts, the whole census — dedup, degrees,
    // (deg, id) orientation, and merge-intersection of sorted out-lists —
    // runs off ONE CollectLimit job (transient driver footprint at the
    // full 4M-row default cap: ~0.5–1 GB of boxed Rows + the dedup set,
    // ~10× the packed payload — the same honest price labelPropagation's
    // scaladoc quotes for this budget). The forward algorithm's work is
    // Σ_(u→v) (|out(u)|+|out(v)|) ≤ O(m^1.5), but WITHOUT materializing
    // the wedge stream the distributed plan probes (148M rows at sf0.1 —
    // ~20 binary-search levels each); measured ~2.3 s → ~0.9 s on the
    // co-purchase graph. Over the cap, or with non-LONG ids, the
    // distributed plan below runs unchanged; the probe is a CollectLimit,
    // so an over-cap graph moves ≤ cap+1 rows. Fast ≡ distributed is
    // spec-pinned (GraphSpec) including the dirty-input normalization.
    val longT = org.apache.spark.sql.types.LongType
    if (broadcastClosureMaxEdges > 0 && broadcastClosureMaxEdges <= (Int.MaxValue - 8).toLong &&
        eNorm.schema("a").dataType == longT && eNorm.schema("b").dataType == longT) {
      val probe = eNorm.limit(broadcastClosureMaxEdges.toInt + 1).collect()
      if (probe.nonEmpty && probe.length <= broadcastClosureMaxEdges)
        return driverCensus(edges.sparkSession, probe)
    }
    // e feeds three consumers (degrees, orientation, edge count) and
    // oriented feeds three (both wedge sides, closure) — materialize each
    // once rather than re-running the upstream joins per consumer
    val e = eNorm
      .distinct()
      .localCheckpoint()
    val deg = e.select(col("a").as("v")).unionAll(e.select(col("b").as("v")))
      .groupBy(col("v")).agg(count(lit(1)).as("deg"))
    val oriented0 = e
      .join(deg.withColumnRenamed("v", "a").withColumnRenamed("deg", "dega"), "a")
      .join(deg.withColumnRenamed("v", "b").withColumnRenamed("deg", "degb"), "b")
      .select(
        when(col("dega") < col("degb") ||
          (col("dega") === col("degb") && col("a") < col("b")), col("a"))
          .otherwise(col("b")).as("src"),
        when(col("dega") < col("degb") ||
          (col("dega") === col("degb") && col("a") < col("b")), col("b"))
          .otherwise(col("a")).as("dst"),
        when(col("dega") < col("degb") ||
          (col("dega") === col("degb") && col("a") < col("b")), col("degb"))
          .otherwise(col("dega")).as("ddeg"))
    val oriented = oriented0.localCheckpoint()
    val x = oriented.select(col("src"), col("dst").as("v"), col("ddeg").as("dv"))
    val y = oriented.select(col("src"), col("dst").as("w"), col("ddeg").as("dw"))
    val wedges = x.join(y, Seq("src"))
      .filter(col("dv") < col("dw") || (col("dv") === col("dw") && col("v") < col("w")))
      .select(col("v"), col("w"))
    // Closure strategy: map-side set probe when the edge list is
    // driver-array-sized and ids pack into 64 bits; exact shuffle join
    // otherwise. One tiny agg job decides (e is already checkpointed).
    val st = e.agg(count(lit(1)).as("m"),
      max(greatest(col("a"), col("b"))).as("mx"), min(col("a")).as("mn")).collect()(0)
    val m = st.getLong(0)
    val packable = m > 0 && m <= broadcastClosureMaxEdges &&
      !st.isNullAt(2) && st.getLong(2) >= 0 && st.getLong(1) < (1L << 32)
    val nTri =
      if (packable) {
        val arr = oriented
          .select(expr("shiftleft(src, 32) | (dst & 4294967295)").as("pk"))
          .collect().map(_.getLong(0))
        java.util.Arrays.sort(arr)
        wedges
          .filter(graft.functions.Exprs.pair_in_sorted_set(col("v"), col("w"), arr))
          .agg(count(lit(1)).as("n_triangles"))
      } else wedges
        .join(oriented.select(col("src").as("v"), col("dst").as("w")), Seq("v", "w"))
        .agg(count(lit(1)).as("n_triangles"))
    val counts = e.agg(count(lit(1)).as("n_edges"))
      .crossJoin(deg.agg(count(lit(1)).as("n_nodes"),
        sum(expr("(deg * (deg - 1)) DIV 2")).as("n_wedges")))
      .crossJoin(nTri)
    counts.select(col("n_nodes"), col("n_edges"), col("n_wedges"), col("n_triangles"),
      when(col("n_wedges") === 0L, lit(0L)).otherwise(
        floor(col("n_triangles").cast("double") * lit(3000000.0) /
          col("n_wedges").cast("double")).cast("long")).as("clustering_ppm"))
  }

  /** Driver-local leg of [[triangleStats]]: the forward algorithm over the
    * collected raw probe (nodes renumbered dense, out-lists CSR-sorted,
    * triangles = Σ merge-intersections of oriented out-lists). Emits the
    * identical one-row census the distributed plan produces. `probe` must
    * be non-empty, LONG-typed, already normalized (a < b, no nulls or
    * self-loops) but NOT deduped — the driver set replays the loop's
    * distinct(). */
  private def driverCensus(spark: org.apache.spark.sql.SparkSession,
      probe: Array[org.apache.spark.sql.Row]): DataFrame = {
    val seen = new java.util.HashSet[AnyRef]()
    val nodeIdx = new java.util.HashMap[java.lang.Long, Integer]()
    var nodeIds = new Array[Long](1024)
    def idxOf(v: Long): Int = {
      val got = nodeIdx.get(v)
      if (got != null) got.intValue
      else {
        val nid = nodeIdx.size
        nodeIdx.put(v, Integer.valueOf(nid))
        if (nid >= nodeIds.length)
          nodeIds = java.util.Arrays.copyOf(nodeIds, nodeIds.length * 2)
        nodeIds(nid) = v
        nid
      }
    }
    var ea = new Array[Int](1024); var eb = new Array[Int](1024); var m = 0
    probe.foreach { r =>
      val a = r.getLong(0); val b = r.getLong(1)
      if (seen.add((a, b))) {
        if (m >= ea.length) {
          ea = java.util.Arrays.copyOf(ea, ea.length * 2)
          eb = java.util.Arrays.copyOf(eb, eb.length * 2)
        }
        ea(m) = idxOf(a); eb(m) = idxOf(b); m += 1
      }
    }
    val n = nodeIdx.size
    val deg = new Array[Int](n)
    var i = 0
    while (i < m) { deg(ea(i)) += 1; deg(eb(i)) += 1; i += 1 }
    var wedges = 0L
    var v0 = 0
    while (v0 < n) { wedges += deg(v0).toLong * (deg(v0) - 1) / 2; v0 += 1 }
    // (deg, original id) orientation — the distributed plan's comparator
    def before(u: Int, v: Int): Boolean =
      deg(u) < deg(v) || (deg(u) == deg(v) && nodeIds(u) < nodeIds(v))
    val osrc = new Array[Int](m); val odst = new Array[Int](m)
    val outCnt = new Array[Int](n)
    i = 0
    while (i < m) {
      val s = if (before(ea(i), eb(i))) ea(i) else eb(i)
      val d = if (s == ea(i)) eb(i) else ea(i)
      osrc(i) = s; odst(i) = d; outCnt(s) += 1
      i += 1
    }
    val off = new Array[Int](n + 1)
    i = 0
    while (i < n) { off(i + 1) = off(i) + outCnt(i); i += 1 }
    val adj = new Array[Int](m)
    val fill = java.util.Arrays.copyOf(off, n)
    i = 0
    while (i < m) { adj(fill(osrc(i))) = odst(i); fill(osrc(i)) += 1; i += 1 }
    i = 0
    while (i < n) { java.util.Arrays.sort(adj, off(i), off(i + 1)); i += 1 }
    // per-edge intersections are independent and the sum is associative,
    // so the dominant pass (Σ out-list lengths ≈ 300M element reads on the
    // sf0.1 co-purchase graph) fans out over driver cores deterministically
    val tri = java.util.stream.IntStream.range(0, m).parallel().mapToLong { e =>
      var p = off(osrc(e)); val pEnd = off(osrc(e) + 1)
      var q = off(odst(e)); val qEnd = off(odst(e) + 1)
      var c = 0L
      while (p < pEnd && q < qEnd) {
        val x = adj(p); val y = adj(q)
        if (x == y) { c += 1; p += 1; q += 1 }
        else if (x < y) p += 1
        else q += 1
      }
      c
    }.sum()
    val ppm =
      if (wedges == 0L) 0L
      else math.floor(tri.toDouble * 3000000.0 / wedges.toDouble).toLong
    val longT = org.apache.spark.sql.types.LongType
    val out = new java.util.ArrayList[org.apache.spark.sql.Row](1)
    out.add(org.apache.spark.sql.Row(n.toLong, m.toLong, wedges, tri, ppm))
    spark.createDataFrame(out,
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("n_nodes", longT, nullable = false),
        org.apache.spark.sql.types.StructField("n_edges", longT, nullable = false),
        org.apache.spark.sql.types.StructField("n_wedges", longT, nullable = false),
        org.apache.spark.sql.types.StructField("n_triangles", longT, nullable = false),
        org.apache.spark.sql.types.StructField("clustering_ppm", longT, nullable = false))))
  }

  /** Semi-supervised label propagation (Zhu & Ghahramani'02 shape, hard
    * labels): seeds are CLAMPED; every other node takes, each round, the
    * majority label among its labeled neighbors from the PREVIOUS round
    * (ties → smallest label; no labeled neighbor → keep what it had).
    * Returns `(v, label)` with label = -1 for nodes never reached.
    *
    * Fully deterministic — majority + lowest-label tie-break, synchronous
    * rounds — so an unrolled SQL replay lands on the identical assignment.
    * Each round is one shuffle (the vote groupBy); the frontier relation is
    * localCheckpoint'd per round so round t never replays rounds 1..t-1
    * (the lineage discipline that made x28's connected components converge
    * fast). Votes are per (node, label) — bounded by the edge count, never
    * quadratic — and the argmax is a bounded per-node window. At 100 TB
    * this is the standard BSP formulation: state lives in the cluster,
    * the driver holds nothing but the round counter. */
  def labelPropagation(edges: DataFrame, seeds: DataFrame, rounds: Int): DataFrame =
    labelPropagation(edges, seeds, rounds, driverEdgeCap = memoryScaledCap(4 << 20))

  /** As [[labelPropagation]]; `driverEdgeCap` picks the execution strategy.
    *
    * Hybrid execution (the [[graft.ops.Dedup.nearDupClusters]] discipline):
    * each synchronous round of the distributed loop is ~4 jobs of joins +
    * an eager localCheckpoint, so a 3-round run pays ~12× the fixed per-job
    * cost — on a co-occurrence graph whose EDGE LIST fits a driver array,
    * that fixed cost dwarfs the data. When the distinct edge set fits under
    * `driverEdgeCap` (default [[memoryScaledCap]](4M): the 4M-edge ceiling
    * ≈ 64 MB of packed id pairs applies only on a ≥ 8 GiB driver — the
    * transient collect+dedup footprint is ~10× that in boxed Row/set
    * overhead, ~0.5–1 GB at the full ceiling, and smaller drivers get a
    * proportionally smaller default; same budget as [[triangleStats]]'s
    * broadcast closure), seeds
    * fit the same bound, all ids are LONG, and seed keys are unique, the
    * identical synchronous schedule (clamped seeds, majority vote,
    * lowest-label ties, no-labeled-neighbor keeps) runs driver-local,
    * emitting a LocalRelation. Over the cap — the 100 TB path — the BSP
    * loop below runs unchanged. Probing is scale-safe: a CollectLimit over
    * the RAW filtered edges (≤cap+1 rows ever cross the wire), BEFORE the
    * distinct — the fast path dedups in the driver set it builds anyway,
    * so the under-cap case pays ONE narrow job and skips the distinct
    * shuffle + checkpoint materialization entirely (measured: −1.4 s of
    * the x114 budget at sf0.1). The loop path builds its distinct +
    * checkpointed edge relation only when actually taken. Fast path ≡
    * loop is spec-pinned (MiningSpec), and x114's oracle replays the
    * loop's algebra in SQL. */
  def labelPropagation(edges: DataFrame, seeds: DataFrame, rounds: Int,
      driverEdgeCap: Int): DataFrame = {
    val eRaw = edges.toDF("a", "b")
      .filter(col("a") =!= col("b") && col("a").isNotNull && col("b").isNotNull)
    val seed0 = seeds.toDF("v", "seed_label")
    val longT = org.apache.spark.sql.types.LongType
    val longIds = eRaw.schema("a").dataType == longT &&
      eRaw.schema("b").dataType == longT && seed0.schema("v").dataType == longT &&
      seed0.schema("seed_label").dataType == longT
    if (longIds && driverEdgeCap > 0) {
      val eProbe = eRaw.limit(driverEdgeCap + 1).collect()
      if (eProbe.length <= driverEdgeCap) fastLabelProp(
        edges.sparkSession, eProbe, seed0, rounds, driverEdgeCap, longT
      ) match {
        case Some(df) => return df
        case None => ()
      }
    }
    val e = eRaw.distinct().localCheckpoint()
    labelPropLoop(e, seeds, rounds)
  }

  /** Driver-local leg of [[labelPropagation]]: dedups the raw edge probe
    * (the same `(a,b)` distinct the loop applies), runs the identical
    * clamped-majority schedule, and emits a LocalRelation. Returns None —
    * declining to the loop — on duplicate seed keys (degenerate input
    * whose fan-out semantics belong to the distributed join). */
  private def fastLabelProp(spark: org.apache.spark.sql.SparkSession,
      eProbe: Array[org.apache.spark.sql.Row], seed0: DataFrame, rounds: Int,
      driverEdgeCap: Int, longT: org.apache.spark.sql.types.LongType): Option[DataFrame] = {
    {
      val sProbe = seed0.limit(driverEdgeCap + 1).collect()
      // seed map; a null v never joins (SQL null-key semantics), a null
      // seed_label clamps nothing (coalesce falls through). Duplicate seed
      // keys would fan out the distributed join's label rows — degenerate
      // input — so the fast path declines and the loop's semantics stand.
      val seedMap = new java.util.HashMap[java.lang.Long, java.lang.Long]()
      val seenSeedKeys = new java.util.HashSet[java.lang.Long]()
      var seedDup = sProbe.length > driverEdgeCap
      sProbe.foreach { r =>
        if (!seedDup && !r.isNullAt(0)) {
          val v = java.lang.Long.valueOf(r.getLong(0))
          if (!seenSeedKeys.add(v)) seedDup = true
          else if (!r.isNullAt(1)) seedMap.put(v, r.getLong(1))
        }
      }
      if (!seedDup) {
        // directed messages = both orientations of every DISTINCT edge —
        // the raw probe may carry duplicate (a,b) rows (the loop's
        // distinct() removes them), so dedup here with the same pair
        // identity; (a,b) and (b,a) both surviving distinct each
        // contribute two messages, exactly like the loop's unionAll.
        // Nodes are renumbered to dense ints first-seen order so the vote
        // rounds run over flat arrays, not boxed maps (the HashMap spelling
        // of the same schedule measured ~1 s at 1.2M edges; this is ~30 ms).
        val seenPairs = new java.util.HashSet[AnyRef]()
        val nodeIdx = new java.util.HashMap[java.lang.Long, Integer]()
        var nodeIds = new Array[Long](1024)
        def idxOf(v: Long): Int = {
          val got = nodeIdx.get(v)
          if (got != null) got.intValue
          else {
            val nid = nodeIdx.size
            nodeIdx.put(v, Integer.valueOf(nid))
            if (nid >= nodeIds.length)
              nodeIds = java.util.Arrays.copyOf(nodeIds, nodeIds.length * 2)
            nodeIds(nid) = v
            nid
          }
        }
        val msgs = new Array[Int](eProbe.length * 4)
        var i = 0
        eProbe.foreach { r =>
          val a = r.getLong(0); val b = r.getLong(1)
          if (seenPairs.add((a, b))) {
            val ai = idxOf(a); val bi = idxOf(b)
            msgs(i) = ai; msgs(i + 1) = bi; msgs(i + 2) = bi; msgs(i + 3) = ai
            i += 4
          }
        }
        val mlen = i
        val nNodes = nodeIdx.size
        // labels can only ever be seed values: index them sorted-ascending
        // so "smallest label wins ties" ≡ "smallest index wins ties"
        val labelVals = {
          val s = new java.util.TreeSet[java.lang.Long]()
          seedMap.values.forEach(l => { s.add(l); () })
          val arr = new Array[Long](s.size)
          var p = 0; s.forEach(l => { arr(p) = l.longValue; p += 1 }); arr
        }
        val nLabels = labelVals.length
        // the per-round vote matrix is nNodes × nLabels; a degenerate label
        // cardinality that overflows a driver array belongs to the cluster
        if (nLabels > 0 && nNodes.toLong * nLabels > (1L << 26)) return None
        val labelIdx = new java.util.HashMap[java.lang.Long, Integer]()
        var li = 0
        while (li < nLabels) { labelIdx.put(labelVals(li), li); li += 1 }
        // labels: -1 = NULL label (unseeded, never yet voted at); seeded
        // graph nodes (non-null label) start clamped
        var labels = new Array[Int](nNodes)
        val clamped = new Array[Boolean](nNodes)
        java.util.Arrays.fill(labels, -1)
        var n0 = 0
        while (n0 < nNodes) {
          val sl = seedMap.get(nodeIds(n0))
          if (sl != null) { labels(n0) = labelIdx.get(sl).intValue; clamped(n0) = true }
          n0 += 1
        }
        val votes = new Array[Long](nNodes * math.max(nLabels, 1))
        for (_ <- 1 to rounds) {
          java.util.Arrays.fill(votes, 0L)
          var k = 0
          while (k < mlen) {
            val lv = labels(msgs(k))
            if (lv >= 0) votes(msgs(k + 1) * nLabels + lv) += 1L
            k += 2
          }
          val next = labels.clone()
          var d = 0
          while (d < nNodes) {
            if (!clamped(d)) {
              // ascending index scan + strict > keeps the smallest label
              // value among the max-count ties — the loop's tie-break
              var bestIdx = -1; var bestN = 0L
              var c = 0
              while (c < nLabels) {
                val n = votes(d * nLabels + c)
                if (n > bestN) { bestN = n; bestIdx = c }
                c += 1
              }
              if (bestIdx >= 0) next(d) = bestIdx
            }
            d += 1
          }
          labels = next
        }
        val out: java.util.List[org.apache.spark.sql.Row] =
          new java.util.ArrayList[org.apache.spark.sql.Row](nNodes)
        var o = 0
        while (o < nNodes) {
          out.add(org.apache.spark.sql.Row(nodeIds(o),
            if (labels(o) < 0) -1L else labelVals(labels(o))))
          o += 1
        }
        return Some(spark.createDataFrame(out,
          org.apache.spark.sql.types.StructType(Seq(
            org.apache.spark.sql.types.StructField("v", longT, nullable = false),
            org.apache.spark.sql.types.StructField("label", longT, nullable = false)))))
      }
    }
    None
  }

  /** Distributed BSP leg of [[labelPropagation]] — `e` must already be the
    * distinct, checkpointed `(a,b)` edge relation. */
  private def labelPropLoop(e: DataFrame, seeds: DataFrame, rounds: Int): DataFrame = {
    // bidirectional message edges, built once
    val msgs = e.unionAll(e.select(col("b").as("a"), col("a").as("b")))
      .toDF("src", "dst").localCheckpoint()
    val nodes = msgs.select(col("src").as("v")).distinct().localCheckpoint()
    val seed = seeds.toDF("v", "seed_label")
    var labels = nodes.join(seed, Seq("v"), "left")
      .select(col("v"), col("seed_label").as("label")).localCheckpoint()
    // The label table is node-sized; below the broadcast-join-style
    // threshold, hint it so the vote join stays map-side (localCheckpoint
    // drops size stats, so AQE alone would fall back to sort-merge — the
    // x101 lesson). Above it, the shuffle join is the correct plan anyway.
    val smallGraph = nodes.count() <= 4000000L
    def maybeBcast(df: DataFrame): DataFrame = if (smallGraph) broadcast(df) else df
    for (_ <- 1 to rounds) {
      val votes = msgs
        .join(maybeBcast(labels.filter(col("label").isNotNull)),
          msgs("src") === labels("v"))
        .groupBy(col("dst"), col("label")).agg(count(lit(1)).as("n_votes"))
      // majority + lowest-label tie as ONE partial-aggregable max of
      // (n_votes, -label) — no window sort, map-side combinable
      val best = votes.groupBy(col("dst"))
        .agg(max(struct(col("n_votes"), (-col("label")).as("nl"))).as("b"))
        .select(col("dst").as("v"), (-col("b.nl")).as("new_label"))
      labels = labels.join(maybeBcast(best), Seq("v"), "left")
        .join(maybeBcast(seed), Seq("v"), "left")
        .select(col("v"),
          coalesce(col("seed_label"), col("new_label"), col("label")).as("label"))
        .localCheckpoint()
    }
    labels.select(col("v"), coalesce(col("label"), lit(-1L)).as("label"))
  }

  /** Common-neighbor link prediction over a seed subset: for every
    * NON-edge pair of seed nodes (id < `seedMax`), the number of shared
    * neighbors anywhere in the graph, plus the neighborhood Jaccard on the
    * ppm grid — the classic "customers also bought" candidate generator.
    *
    * Scale shape: full wedge enumeration (center u, neighbors v,w) is the
    * Σ deg² skew bomb, so BOTH adjacency legs pre-filter to seed
    * endpoints BEFORE the self-join — per-center work is (seed-degree)²,
    * bounded by the seed set, while common neighbors are still counted
    * over the WHOLE graph (the center is unrestricted). Existing edges
    * drop via an anti-join; degrees join back from the full degree table. */
  def linkPrediction(edges: DataFrame, aCol: String, bCol: String,
      seedMax: Long, topK: Int): DataFrame =
    linkPrediction(edges, aCol, bCol, seedMax, topK, assumeNormalized = false)

  /** As [[linkPrediction]]; `assumeNormalized = true` is a CALLER CONTRACT
    * (the [[graft.ops.Itemsets.frequentPairs]] discipline) that the input
    * is already the distinct `a < b` non-null edge SET and already
    * materialized (e.g. a checkpointed shared view) — the op then skips
    * its defensive normalize + distinct shuffle + checkpoint. A caller
    * that lies gets inflated common-neighbor counts. */
  def linkPrediction(edges: DataFrame, aCol: String, bCol: String,
      seedMax: Long, topK: Int, assumeNormalized: Boolean): DataFrame = {
    val e = if (assumeNormalized) edges.select(col(aCol).as("a"), col(bCol).as("b"))
    else edges
      .select(least(col(aCol), col(bCol)).as("a"), greatest(col(aCol), col(bCol)).as("b"))
      .filter(col("a") =!= col("b") && col("a").isNotNull && col("b").isNotNull)
      .distinct()
      .localCheckpoint()
    val adj = e.select(col("a").as("src"), col("b").as("dst"))
      .unionAll(e.select(col("b").as("src"), col("a").as("dst")))
    val deg = adj.groupBy(col("dst").as("v")).agg(count(lit(1)).as("deg"))
    val adjS = adj.filter(col("dst") < seedMax)
    val cn = adjS.select(col("src"), col("dst").as("pa"))
      .join(adjS.select(col("src"), col("dst").as("pb")), Seq("src"))
      .filter(col("pa") < col("pb"))
      .groupBy(col("pa"), col("pb")).agg(count(lit(1)).as("cn"))
    cn.join(e, cn("pa") === e("a") && cn("pb") === e("b"), "left_anti")
      .join(broadcast(deg.select(col("v").as("pa"), col("deg").as("deg_a"))), Seq("pa"))
      .join(broadcast(deg.select(col("v").as("pb"), col("deg").as("deg_b"))), Seq("pb"))
      .select(col("pa"), col("pb"), col("cn"), col("deg_a"), col("deg_b"),
        expr("(cn * 1000000) DIV (deg_a + deg_b - cn)").as("jaccard_ppm"))
      .orderBy(col("cn").desc, col("pa"), col("pb"))
      .limit(topK)
  }

  /** DuckDB respell of [[linkPrediction]]. */
  def linkPredictionSql(edgeSql: String, seedMax: Long, topK: Int): String =
    s"""WITH e0 AS ($edgeSql),
       |e AS (SELECT DISTINCT least(a, b) AS a, greatest(a, b) AS b FROM e0
       |      WHERE a <> b AND a IS NOT NULL AND b IS NOT NULL),
       |adj AS (SELECT a AS src, b AS dst FROM e
       |        UNION ALL SELECT b AS src, a AS dst FROM e),
       |deg AS (SELECT dst AS v, CAST(count(*) AS BIGINT) AS deg FROM adj GROUP BY 1),
       |adjs AS (SELECT src, dst FROM adj WHERE dst < $seedMax),
       |cn AS (
       |  SELECT x.dst AS pa, y.dst AS pb, CAST(count(*) AS BIGINT) AS cn
       |  FROM adjs x JOIN adjs y ON x.src = y.src AND x.dst < y.dst
       |  GROUP BY 1, 2),
       |ne AS (
       |  SELECT cn.* FROM cn ANTI JOIN e ON cn.pa = e.a AND cn.pb = e.b)
       |SELECT ne.pa, ne.pb, ne.cn, da.deg AS deg_a, db.deg AS deg_b,
       |  (ne.cn * 1000000) // (da.deg + db.deg - ne.cn) AS jaccard_ppm
       |FROM ne JOIN deg da ON da.v = ne.pa JOIN deg db ON db.v = ne.pb
       |ORDER BY ne.cn DESC, ne.pa, ne.pb LIMIT $topK""".stripMargin

  /** DuckDB respell of [[labelPropagation]] label-COUNT summary: the rounds
    * unroll as CTEs (`l0..l$rounds`), majority + lowest-label tie via a
    * window, seeds re-clamped every round — the identical synchronous
    * schedule. */
  def labelPropagationSummarySql(edgeSql: String, seedSql: String, rounds: Int): String = {
    val base =
      s"""WITH e0 AS ($edgeSql),
         |e AS (SELECT DISTINCT a, b FROM e0 WHERE a <> b
         |        AND a IS NOT NULL AND b IS NOT NULL),
         |m AS (SELECT a AS src, b AS dst FROM e
         |      UNION ALL SELECT b AS src, a AS dst FROM e),
         |nodes AS (SELECT DISTINCT src AS v FROM m),
         |seed AS ($seedSql),
         |l0 AS (SELECT nodes.v, seed.seed_label AS label
         |       FROM nodes LEFT JOIN seed ON seed.v = nodes.v)""".stripMargin
    val steps = (1 to rounds).map { r =>
      val prev = s"l${r - 1}"
      s"""v$r AS (
         |  SELECT m.dst, p.label, CAST(count(*) AS BIGINT) AS n_votes
         |  FROM m JOIN $prev p ON p.v = m.src AND p.label IS NOT NULL
         |  GROUP BY 1, 2),
         |b$r AS (
         |  SELECT dst AS v, label AS new_label FROM (
         |    SELECT dst, label,
         |      row_number() OVER (PARTITION BY dst
         |        ORDER BY n_votes DESC, label ASC) AS rk
         |    FROM v$r) WHERE rk = 1),
         |l$r AS (
         |  SELECT p.v,
         |    coalesce(seed.seed_label, b$r.new_label, p.label) AS label
         |  FROM $prev p
         |  LEFT JOIN b$r ON b$r.v = p.v
         |  LEFT JOIN seed ON seed.v = p.v)""".stripMargin
    }.mkString(",\n", ",\n", "")
    s"""$base$steps
       |SELECT coalesce(label, -1) AS label, CAST(count(*) AS BIGINT) AS n_nodes
       |FROM l$rounds GROUP BY 1 ORDER BY label""".stripMargin
  }
}
