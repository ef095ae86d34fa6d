package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed k-means (Lloyd's algorithm) over an embedding column — the
  * corpus-scale clustering primitive behind semantic dedup (x95 consumes an
  * upstream cluster column; this op is that upstream), data mixing, and
  * IVF-style partitioning.
  *
  * Contrast with [[Similarity.buildIvfIndex]]: IVF trains on a ≤4096-vector
  * driver-local sample because index centroids only steer recall. Here the
  * ASSIGNMENT is the product, so every iteration runs over the full corpus:
  * assign map-side against broadcast-literal centroids, update with ONE
  * aggregation whose shuffle volume is #partitions · k · d longs
  * ([[graft.functions.VecSumAgg]] map-side partials — never n·d exploded
  * rows). Driver state per round is the k·d centroid matrix (k=8, d=64 →
  * 4 KB), independent of corpus size.
  *
  * Exactness discipline (x95's): components quantize to ⌊10⁶·x⌋ once at
  * scan; distances are integer sums of squared differences, bounded by
  * d·(2·10⁶·max|x|)² ≈ 2⁴⁷ for unit-ish vectors — int64-safe at ANY corpus
  * size because the bound depends on dimensionality and quantization range,
  * not row count. Centroid updates use floor division (`Math.floorDiv`),
  * ties break to the lowest centroid id, and empty clusters keep their
  * previous centroid — every rule re-spelled identically in the DuckDB
  * oracle, so assignments are bit-exact across engines (x98).
  */
object Clustering {

  /** One Lloyd assignment pass as a pure map-side Column: argmin over the
    * literal centroid matrix of the integer squared distance, ties to the
    * lowest centroid id. Returns struct(d, j). */
  private def nearest(qv: Column, centroids: Array[Array[Long]]): Column =
    array_min(array(centroids.zipWithIndex.toIndexedSeq.map { case (cv, j) =>
      struct(
        aggregate(
          zip_with(qv, typedlit(cv.toSeq), (x, c) => (x - c) * (x - c)),
          lit(0L), (acc, v) => acc + v).as("d"),
        lit(j.toLong).as("j"))
    }: _*))

  /** `iters` full-corpus Lloyd rounds from deterministic seeds (the k
    * lowest-id vectors), then a final assignment against the trained
    * centroids. Output: (vec_id, cluster, d) — d the integer squared
    * distance to the winning centroid. */
  def kmeansAssign(emb: DataFrame, idCol: String, vecCol: String,
      k: Int = 8, iters: Int = 3): DataFrame = {
    val base = emb.select(
      col(idCol).cast("long").as("vec_id"),
      expr(s"transform($vecCol, v -> cast(floor(cast(v as double) * 1000000.0) as bigint))")
        .as("qv"))
      .persist()
    try {
      var centroids: Array[Array[Long]] = base.orderBy(col("vec_id")).limit(k)
        .select(col("qv")).collect()
        .map(_.getSeq[Long](0).toArray)
      // empty corpus: no seeds, no assignments — an empty result with the
      // output schema, not an analysis error from a zero-arm argmin
      if (centroids.isEmpty)
        return base.select(col("vec_id"), lit(0L).as("cluster"), lit(0L).as("d"))
          .limit(0)
      for (_ <- 1 to iters) {
        // k rows of (cluster, elementwise-sum, n) — bounded collect, like the
        // IVF trainer's per-round centroid pull.
        val stats = base
          .select(col("qv"), nearest(col("qv"), centroids).getField("j").as("cluster"))
          .groupBy(col("cluster"))
          .agg(graft.functions.VecSumAgg.vec_sum(col("qv")).as("s"), count(lit(1)).as("n"))
          .collect()
          .map(r => (r.getLong(0).toInt, (r.getSeq[Long](1).toArray, r.getLong(2))))
          .toMap
        centroids = centroids.zipWithIndex.map { case (old, j) =>
          stats.get(j) match {
            case Some((s, n)) => s.map(Math.floorDiv(_, n))
            case None         => old // empty cluster keeps its centroid
          }
        }
      }
      val m = nearest(col("qv"), centroids)
      base.select(col("vec_id"),
        m.getField("j").as("cluster"),
        m.getField("d").as("d"))
    } finally base.unpersist()
  }

  /** The x98 oracle: the SAME algorithm unrolled as DuckDB CTEs — quantize,
    * k lowest-id seeds, `iters` (assign → floor-div-update) rounds with
    * empty-cluster carry-through, final assignment. Integer-only end to
    * end; `min([d, j])` mirrors the struct argmin tie-break. */
  def kmeansSql(table: String, idCol: String, vecCol: String,
      k: Int, iters: Int): String = {
    val distExpr = (c: String) =>
      s"""list_reduce(list_transform(range(1, len(q.qv) + 1),
         |      i -> (q.qv[i] - $c.cv[i]) * (q.qv[i] - $c.cv[i])), (x, y) -> x + y)""".stripMargin
    val rounds = (1 to iters).map { t =>
      s"""a$t AS (
         |  SELECT q.vec_id, q.qv,
         |    min([${distExpr("c")}, c.j]) AS m
         |  FROM q, c${t - 1} c GROUP BY q.vec_id, q.qv),
         |s$t AS (
         |  SELECT m[2] AS j, u.p AS pos, sum(u.x) AS s
         |  FROM (SELECT m, unnest(list_transform(qv, (x, i) -> struct_pack(p := i, x := x))) AS u
         |        FROM a$t)
         |  GROUP BY 1, 2),
         |n$t AS (SELECT m[2] AS j, count(*) AS n FROM a$t GROUP BY 1),
         |sl$t AS (
         |  SELECT s.j, list((s.s - ((s.s % n.n) + n.n) % n.n) // n.n ORDER BY s.pos) AS cv
         |  FROM s$t s JOIN n$t n ON s.j = n.j GROUP BY s.j),
         |c$t AS (
         |  SELECT c.j, coalesce(sl.cv, c.cv) AS cv
         |  FROM c${t - 1} c LEFT JOIN sl$t sl ON c.j = sl.j)""".stripMargin
    }.mkString(",\n")
    s"""WITH q AS (
       |  SELECT CAST($idCol AS BIGINT) AS vec_id,
       |    list_transform($vecCol, v -> CAST(floor(CAST(v AS DOUBLE) * 1000000.0) AS BIGINT)) AS qv
       |  FROM $table),
       |c0 AS (
       |  SELECT row_number() OVER (ORDER BY vec_id) - 1 AS j, qv AS cv
       |  FROM (SELECT * FROM q ORDER BY vec_id LIMIT $k)),
       |$rounds
       |SELECT q.vec_id, CAST(min([${distExpr("c")}, c.j])[2] AS BIGINT) AS cluster,
       |  CAST(min([${distExpr("c")}, c.j])[1] AS BIGINT) AS d
       |FROM q, c$iters c GROUP BY q.vec_id
       |ORDER BY q.vec_id""".stripMargin
  }

  /** Greedy k-center coreset (Gonzalez'85 2-approximation — the diversity
    * sampler behind coverage-driven data pruning): start from the lowest-id
    * vector, then repeatedly pick the point FARTHEST from every chosen
    * center (exact integer squared distance, ties to the lowest id).
    * Returns the k picks as (center_rank, vec_id, d2_at_pick) —
    * d2_at_pick is the covering radius the pick certifies.
    *
    * Scale shape per round: the chosen centers ride as broadcast literals
    * in a map-side min-distance projection (same kernel as [[kmeansAssign]]
    * assignment) and the pick is a 1-row TakeOrdered — k rounds, k·d longs
    * of driver state, the corpus never shuffles at all. Same integer
    * discipline as k-means, so [[kCenterSql]] replays every pick
    * bit-for-bit. */
  def kCenterCoreset(emb: DataFrame, idCol: String, vecCol: String,
      k: Int = 8): DataFrame = {
    val spark = emb.sparkSession
    import spark.implicits._
    val base = emb.select(
      col(idCol).cast("long").as("vec_id"),
      expr(s"transform($vecCol, v -> cast(floor(cast(v as double) * 1000000.0) as bigint))")
        .as("qv"))
      .persist()
    try {
      val first = base.orderBy(col("vec_id")).limit(1).collect()
      if (first.isEmpty)
        return Seq.empty[(Long, Long, Long)].toDF("center_rank", "vec_id", "d2_at_pick")
      var centers = Array(first(0).getSeq[Long](1).toArray)
      val picks = scala.collection.mutable.ArrayBuffer(
        (1L, first(0).getLong(0), 0L))
      for (t <- 2 to k) {
        val minD = nearest(col("qv"), centers).getField("d")
        val next = base.select(col("vec_id"), col("qv"), minD.as("d"))
          .orderBy(col("d").desc, col("vec_id")).limit(1).collect()
        if (next.nonEmpty) {
          picks += ((t.toLong, next(0).getLong(0), next(0).getLong(2)))
          centers :+= next(0).getSeq[Long](1).toArray
        }
      }
      picks.toSeq.toDF("center_rank", "vec_id", "d2_at_pick")
        .orderBy(col("center_rank"))
    } finally base.unpersist()
  }

  /** Simplified silhouette (Hruschka et al.'s centroid variant — the O(n·k)
    * clustering-quality gate run after [[kmeansAssign]]; the classic
    * all-pairs silhouette is O(n²) and unrunnable at corpus scale): per
    * vector, a = squared distance to its OWN cluster centroid, b = min
    * squared distance to any OTHER centroid, s = (b−a)/max(a,b) on an exact
    * per-mille grid. Positive mean = clusters separate; ≤0 = the vector sits
    * closer to a foreign centroid than its own.
    *
    * Scale shape: centroids come from ONE aggregation bounded by k rows
    * ([[graft.functions.VecSumAgg]] partials, floor-div quantization), ride
    * back as broadcast literals in a map-side projection — the corpus never
    * shuffles for scoring, and the per-cluster rollup is a partial-aggregable
    * groupBy. Integer discipline throughout (⌊10⁶·x⌋ grid, int64 squared
    * distances, s_pm via the subtract-mod floor division both engines spell
    * identically; ×1000 keeps (b−a)·1000 ≤ 2⁵⁸ — int64-safe at any corpus
    * size), so [[silhouetteSql]] reproduces every score bit-for-bit.
    *
    * Output: one row per cluster plus a TOTAL row (cluster = −1):
    * (cluster, n_vecs, mean_s_pm, min_s_pm, max_s_pm), ordered by cluster. */
  def simplifiedSilhouette(emb: DataFrame, idCol: String, vecCol: String,
      clusterCol: String): DataFrame = {
    val base = emb.select(
      col(idCol).cast("long").as("vec_id"),
      col(clusterCol).cast("long").as("cluster"),
      expr(s"transform($vecCol, v -> cast(floor(cast(v as double) * 1000000.0) as bigint))")
        .as("qv"))
    // bounded collect: k centroid rows (cluster count, not corpus size)
    val centroids: Array[(Long, Array[Long])] = base
      .groupBy(col("cluster"))
      .agg(graft.functions.VecSumAgg.vec_sum(col("qv")).as("s"), count(lit(1)).as("n"))
      .collect()
      .map(r => (r.getLong(0),
        r.getSeq[Long](1).toArray.map(Math.floorDiv(_, r.getLong(2)))))
      .sortBy(_._1)
    if (centroids.isEmpty)
      return emb.sparkSession.range(0)
        .select(col("id").as("cluster"), lit(0L).as("n_vecs"),
          lit(0L).as("mean_s_pm"), lit(0L).as("min_s_pm"), lit(0L).as("max_s_pm"))
    val arr = array(centroids.toIndexedSeq.map { case (cid, cv) =>
      struct(
        aggregate(
          zip_with(col("qv"), typedlit(cv.toSeq), (x, c) => (x - c) * (x - c)),
          lit(0L), (acc, v) => acc + v).as("d"),
        lit(cid).as("j"))
    }: _*)
    val scored = base.withColumn("__arr", arr)
      .withColumn("a", expr("filter(__arr, p -> p.j = cluster)[0].d"))
      .withColumn("b", expr("array_min(filter(__arr, p -> p.j != cluster)).d"))
      .withColumn("__num", (col("b") - col("a")) * 1000L)
      .withColumn("__den", greatest(col("a"), col("b")))
      .withColumn("s_pm",
        when(col("b").isNull || col("__den") === 0L, 0L)
          // exact floor division: the numerator is first made divisible
          // (subtract the nonnegative pmod), so DIV never rounds — int64
          // throughout, no double leg (2⁵⁸ exceeds double's 2⁵³ integers)
          .otherwise(expr("(__num - pmod(__num, __den)) div __den")))
    scored.rollup(col("cluster"))
      .agg(count(lit(1)).as("n_vecs"),
        sum(col("s_pm")).as("__s"),
        min(col("s_pm")).as("min_s_pm"),
        max(col("s_pm")).as("max_s_pm"))
      .select(coalesce(col("cluster"), lit(-1L)).as("cluster"),
        col("n_vecs"),
        when(col("n_vecs") === 0L, 0L)
          .otherwise(expr("(__s - pmod(__s, n_vecs)) div n_vecs"))
          .as("mean_s_pm"),
        col("min_s_pm"), col("max_s_pm"))
      .orderBy(col("cluster"))
  }

  /** The x147 oracle: centroids, distances, per-mille scores, and the
    * rollup respelled as DuckDB CTEs with the identical subtract-mod floor
    * divisions. */
  def silhouetteSql(table: String, idCol: String, vecCol: String,
      clusterCol: String): String =
    s"""WITH q AS (
       |  SELECT CAST($idCol AS BIGINT) AS vec_id, CAST($clusterCol AS BIGINT) AS cluster,
       |    list_transform($vecCol, v -> CAST(floor(CAST(v AS DOUBLE) * 1000000.0) AS BIGINT)) AS qv
       |  FROM $table),
       |pos AS (
       |  SELECT cluster, u.p AS pos, u.x AS qc FROM (
       |    SELECT cluster, unnest(list_transform(qv, (x, i) -> struct_pack(p := i, x := x))) AS u
       |    FROM q)),
       |sagg AS (SELECT cluster, pos, CAST(sum(qc) AS BIGINT) AS s FROM pos GROUP BY 1, 2),
       |nn AS (SELECT cluster, CAST(count(*) AS BIGINT) AS n FROM q GROUP BY cluster),
       |cent AS (
       |  SELECT sagg.cluster,
       |    list((s - ((s % n) + n) % n) // n ORDER BY pos) AS cv
       |  FROM sagg JOIN nn ON sagg.cluster = nn.cluster GROUP BY sagg.cluster, n),
       |d AS (
       |  SELECT q.vec_id, q.cluster, c.cluster AS cj,
       |    list_reduce(list_prepend(CAST(0 AS BIGINT),
       |      list_transform(range(1, len(q.qv) + 1),
       |        i -> (q.qv[i] - c.cv[i]) * (q.qv[i] - c.cv[i]))), (x, y) -> x + y) AS d
       |  FROM q, cent c),
       |ab AS (
       |  SELECT vec_id, cluster,
       |    min(CASE WHEN cj = cluster THEN d END) AS a,
       |    min(CASE WHEN cj <> cluster THEN d END) AS b
       |  FROM d GROUP BY 1, 2),
       |sc AS (
       |  SELECT cluster,
       |    CASE WHEN b IS NULL OR greatest(a, b) = 0 THEN 0
       |         ELSE (((b - a) * 1000) - ((((b - a) * 1000) % greatest(a, b))
       |                + greatest(a, b)) % greatest(a, b)) // greatest(a, b)
       |    END AS s_pm
       |  FROM ab)
       |SELECT coalesce(cluster, -1) AS cluster,
       |  CAST(count(*) AS BIGINT) AS n_vecs,
       |  CAST(CASE WHEN count(*) = 0 THEN 0
       |       ELSE (sum(s_pm) - ((sum(s_pm) % count(*)) + count(*)) % count(*)) // count(*)
       |  END AS BIGINT) AS mean_s_pm,
       |  CAST(min(s_pm) AS BIGINT) AS min_s_pm,
       |  CAST(max(s_pm) AS BIGINT) AS max_s_pm
       |FROM sc GROUP BY ROLLUP(cluster)
       |HAVING count(*) > 0 -- empty corpus: drop the rollup's 0-count total row (op returns no rows)
       |ORDER BY cluster""".stripMargin

  /** The x122 oracle: the greedy loop unrolled — pick t is a scalar CTE,
    * round t's min-distance takes the LEAST over all prior picks (each a
    * 1-row cross join). */
  def kCenterSql(table: String, idCol: String, vecCol: String, k: Int): String = {
    def dist(c: String) =
      s"""list_reduce(list_transform(range(1, len(q.qv) + 1),
         |      i -> (q.qv[i] - $c.qv[i]) * (q.qv[i] - $c.qv[i])), (x, y) -> x + y)""".stripMargin
    val rounds = (2 to k).map { t =>
      val froms = (1 until t).map(i => s"p$i").mkString(", ")
      val least = (1 until t).map(i => dist(s"p$i")).mkString("least(", ",\n", ")")
      s"""p$t AS (
         |  SELECT q.vec_id, q.qv, $least AS d
         |  FROM q, $froms ORDER BY d DESC, q.vec_id LIMIT 1)""".stripMargin
    }.mkString(",\n")
    val unioned = (s"SELECT 1 AS center_rank, vec_id, CAST(0 AS BIGINT) AS d2_at_pick FROM p1" +:
      (2 to k).map(t => s"SELECT $t, vec_id, CAST(d AS BIGINT) FROM p$t")).mkString("\nUNION ALL ")
    s"""WITH q AS (
       |  SELECT CAST($idCol AS BIGINT) AS vec_id,
       |    list_transform($vecCol, v -> CAST(floor(CAST(v AS DOUBLE) * 1000000.0) AS BIGINT)) AS qv
       |  FROM $table),
       |p1 AS (SELECT vec_id, qv FROM q ORDER BY vec_id LIMIT 1),
       |$rounds
       |SELECT CAST(center_rank AS BIGINT) AS center_rank, vec_id, d2_at_pick FROM (
       |$unioned)
       |ORDER BY center_rank""".stripMargin
  }

  /** Nearest-centroid classifier CONFUSION MATRIX: per-label centroids
    * from the labeled vectors (the Rocchio classifier), every vector
    * re-assigned to its nearest centroid (ties → lowest label), counts by
    * (true, predicted). The domain-classifier sanity check run before a
    * label column is trusted to route 100 TB.
    *
    * Same machinery as [[simplifiedSilhouette]]: one k-bounded centroid
    * aggregate (VecSumAgg partials, floor-div quantization) rides back as
    * broadcast literals; assignment is a map-side argmin over the literal
    * array; the confusion rollup carries ≤k² keys. Integer throughout —
    * e6 grid vectors, int64 squared distances. */
  def centroidConfusion(emb: DataFrame, idCol: String, vecCol: String,
      labelCol: String): DataFrame = {
    val base = emb.select(
      col(idCol).cast("long").as("vec_id"),
      col(labelCol).cast("long").as("label"),
      expr(s"transform($vecCol, v -> cast(floor(cast(v as double) * 1000000.0) as bigint))")
        .as("qv"))
      .filter(col("label").isNotNull)
    // bounded collect: one row per label
    val centroids: Array[(Long, Array[Long])] = base
      .groupBy(col("label"))
      .agg(graft.functions.VecSumAgg.vec_sum(col("qv")).as("s"), count(lit(1)).as("n"))
      .collect()
      .map(r => (r.getLong(0),
        r.getSeq[Long](1).toArray.map(Math.floorDiv(_, r.getLong(2)))))
      .sortBy(_._1)
    if (centroids.isEmpty)
      return emb.sparkSession.range(0)
        .select(col("id").as("label_true"), col("id").as("label_pred"),
          lit(0L).as("n"))
    val arr = array(centroids.toIndexedSeq.map { case (cid, cv) =>
      struct(
        aggregate(
          zip_with(col("qv"), typedlit(cv.toSeq), (x, c) => (x - c) * (x - c)),
          lit(0L), (acc, v) => acc + v).as("d"),
        lit(cid).as("j"))
    }: _*)
    base.withColumn("__arr", arr)
      .withColumn("pred", expr("array_min(__arr).j")) // struct order: (d, j) — ties → lowest label
      .groupBy(col("label").as("label_true"), col("pred").as("label_pred"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("label_true"), col("label_pred"))
  }

  /** The [[centroidConfusion]] oracle: per-label centroid CTEs with the
    * identical floor-div quantization, per-vector argmin via a
    * vec-partitioned rank window, k²-bounded rollup. */
  def centroidConfusionSql(table: String, idCol: String, vecCol: String,
      labelCol: String): String =
    s"""WITH q AS (
       |  SELECT CAST($idCol AS BIGINT) AS vec_id, CAST($labelCol AS BIGINT) AS label,
       |    list_transform($vecCol, v -> CAST(floor(CAST(v AS DOUBLE) * 1000000.0) AS BIGINT)) AS qv
       |  FROM $table WHERE $labelCol IS NOT NULL),
       |pos AS (
       |  SELECT label, u.p AS pos, u.x AS qc FROM (
       |    SELECT label, unnest(list_transform(qv, (x, i) -> struct_pack(p := i, x := x))) AS u
       |    FROM q)),
       |sagg AS (SELECT label, pos, CAST(sum(qc) AS BIGINT) AS s FROM pos GROUP BY 1, 2),
       |nn AS (SELECT label, CAST(count(*) AS BIGINT) AS n FROM q GROUP BY label),
       |cent AS (
       |  SELECT sagg.label AS clabel,
       |    list((s - ((s % n) + n) % n) // n ORDER BY pos) AS cv
       |  FROM sagg JOIN nn ON sagg.label = nn.label GROUP BY sagg.label, n),
       |d AS (
       |  SELECT q.vec_id, q.label, c.clabel,
       |    list_reduce(list_prepend(CAST(0 AS BIGINT),
       |      list_transform(range(1, len(q.qv) + 1),
       |        i -> (q.qv[i] - c.cv[i]) * (q.qv[i] - c.cv[i]))), (x, y) -> x + y) AS dist
       |  FROM q, cent c),
       |pick AS (
       |  SELECT vec_id, label, clabel AS pred,
       |    row_number() OVER (PARTITION BY vec_id ORDER BY dist, clabel) AS rk
       |  FROM d)
       |SELECT label AS label_true, pred AS label_pred, CAST(count(*) AS BIGINT) AS n
       |FROM pick WHERE rk = 1
       |GROUP BY 1, 2 ORDER BY label_true, label_pred""".stripMargin
}
