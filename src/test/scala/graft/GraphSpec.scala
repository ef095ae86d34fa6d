package graft

import graft.ops.Graph

/** Exact contracts for the triangle census ([[graft.ops.Graph]]): known
  * closed forms, dirty-input tolerance, and a brute-force cross-check on a
  * deterministic pseudo-random graph. */
class GraphSpec extends SparkSpec {

  private def census(edges: Seq[(Long, Long)]): (Long, Long, Long, Long, Long) = {
    import spark.implicits._
    val r = Graph.triangleStats(edges.toDF("pa", "pb"), "pa", "pb").collect()(0)
    (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
  }

  test("K3: one triangle, fully clustered") {
    assert(census(Seq((1L, 2L), (2L, 3L), (1L, 3L))) == ((3L, 3L, 3L, 1L, 1000000L)))
  }

  test("C4: four wedges, no triangles") {
    assert(census(Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L))) == ((4L, 4L, 4L, 0L, 0L)))
  }

  test("K4: four triangles, clustering 1.0") {
    val k4 = for { i <- 1L to 4L; j <- (i + 1) to 4L } yield (i, j)
    assert(census(k4) == ((4L, 6L, 12L, 4L, 1000000L)))
  }

  test("dirty input: duplicates, reversals, and self-loops are normalized away") {
    val dirty = Seq((1L, 2L), (2L, 1L), (1L, 2L), (3L, 3L), (2L, 3L), (1L, 3L))
    assert(census(dirty) == ((3L, 3L, 3L, 1L, 1000000L)))
  }

  test("matches a brute-force count on a deterministic pseudo-random graph") {
    val n = 30
    val edges = (for {
      i <- 0 until n; j <- (i + 1) until n
      if graft.functions.Ops.splitmix64(i.toLong * n + j) % 5 == 0
    } yield (i.toLong, j.toLong)).toSeq
    val es = edges.toSet
    def adj(a: Long, b: Long) = es.contains((a min b, a max b))
    val expTri = (for {
      i <- 0 until n; j <- (i + 1) until n; k <- (j + 1) until n
      if adj(i, j) && adj(j, k) && adj(i, k)
    } yield 1).size.toLong
    val degs = edges.flatMap(e => Seq(e._1, e._2)).groupBy(identity).view.mapValues(_.size)
    val expWedges = degs.values.map(d => d.toLong * (d - 1) / 2).sum
    val got = census(edges)
    assert(got._1 == degs.size.toLong && got._2 == edges.size.toLong)
    assert(got._3 == expWedges && got._4 == expTri)
  }

  test("census boundaries: single edge, all-self-loops, and empty input agree across strategies") {
    import spark.implicits._
    // single edge: 2 nodes, 1 edge, 0 wedges, 0 triangles, ppm 0
    assert(census(Seq((7L, 9L))) == ((2L, 1L, 0L, 0L, 0L)))
    // self-loops only: normalized away entirely — the driver leg must
    // decline (empty probe) and the distributed plan owns the degenerate
    // output shape, on BOTH strategy spellings
    val loops = Seq((1L, 1L), (2L, 2L)).toDF("pa", "pb")
    val viaDefault = Graph.triangleStats(loops, "pa", "pb").collect()(0)
    val viaJoin = Graph.triangleStats(loops, "pa", "pb", 0L).collect()(0)
    assert(viaDefault.toSeq == viaJoin.toSeq)
    assert(viaDefault.getLong(0) == 0L && viaDefault.getLong(1) == 0L)
    // fully empty input: same contract
    val empty = Seq.empty[(Long, Long)].toDF("pa", "pb")
    assert(Graph.triangleStats(empty, "pa", "pb").collect()(0).toSeq ==
      Graph.triangleStats(empty, "pa", "pb", 0L).collect()(0).toSeq)
  }

  test("driver census ≡ shuffle-join closure on 10 seeded pseudo-random multigraphs") {
    import spark.implicits._
    for (seed <- 0 until 10) {
      val n = 6 + seed * 2
      // raw MULTIgraph rows: duplicates, reversals, and self-loops included
      // (splitmix-driven, so the sweep is reproducible), exercising the
      // driver leg's dedup/normalization against the distributed distinct
      val raw = (for {
        i <- 0 until n; j <- 0 until n
        r = graft.functions.Ops.splitmix64(seed.toLong * 10007 + i * n + j)
        if r % 3 == 0
      } yield (i.toLong, j.toLong)) ++ Seq((0L, 0L), (1L, 0L), (0L, 1L))
      val df = raw.toDF("pa", "pb")
      val fast = Graph.triangleStats(df, "pa", "pb").collect()(0).toSeq
      val join = Graph.triangleStats(df, "pa", "pb",
        broadcastClosureMaxEdges = 0L).collect()(0).toSeq
      assert(fast == join, s"seed=$seed: driver census $fast != join closure $join")
    }
  }

  test("driver census, set-probe closure, and shuffle-join closure all agree") {
    import spark.implicits._
    val n = 25
    val edges = (for {
      i <- 0 until n; j <- (i + 1) until n
      if graft.functions.Ops.splitmix64(i.toLong * n + j + 7) % 4 == 0
    } yield (i.toLong, j.toLong)).toSeq
    val m = edges.size
    val df = edges.toDF("pa", "pb")
    // default cap admits the raw probe → driver-local census
    val viaDriver = Graph.triangleStats(df, "pa", "pb").collect()(0).toSeq
    // raw rows (4×duplicated) overflow a cap the DISTINCT set fits under →
    // the driver leg declines, the distributed set-probe closure runs
    val dup = df.unionAll(df).unionAll(df).unionAll(df)
    val viaSet = Graph.triangleStats(dup, "pa", "pb",
      broadcastClosureMaxEdges = 2L * m).collect()(0).toSeq
    // cap 0 disables both bounded strategies → exact shuffle join
    val viaJoin = Graph.triangleStats(df, "pa", "pb",
      broadcastClosureMaxEdges = 0L).collect()(0).toSeq
    assert(viaDriver == viaJoin, "driver census diverged from the join closure")
    assert(viaSet == viaJoin, "set-probe closure diverged from the join closure")
    // ids beyond 2^32: fine for the driver leg (dense renumber)…
    val big = edges.map { case (a, b) => (a + (1L << 40), b + (1L << 40)) }
    val viaBigDriver = Graph.triangleStats(big.toDF("pa", "pb"), "pa", "pb")
      .collect()(0).toSeq
    assert(viaBigDriver == viaDriver)
    // …but they cannot pack for the set probe — over-cap big ids must land
    // on the join path with the same counts
    val bigDup = big.toDF("pa", "pb")
    val viaBigJoin = Graph.triangleStats(
      bigDup.unionAll(bigDup).unionAll(bigDup).unionAll(bigDup), "pa", "pb",
      broadcastClosureMaxEdges = 2L * m).collect()(0).toSeq
    assert(viaBigJoin == viaDriver)
  }
}
