package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Relational graph kernels over pair relations (co-occurrence graphs, the
  * near-dup pair graph, FK adjacency). No graph runtime — edges are rows,
  * the algorithms are joins, so Catalyst plans them like everything else.
  */
object Graph {

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
  def triangleStats(edges: DataFrame, aCol: String, bCol: String): DataFrame = {
    // e feeds three consumers (degrees, orientation, edge count) and
    // oriented feeds three (both wedge sides, closure) — materialize each
    // once rather than re-running the upstream joins per consumer
    val e = edges
      .select(least(col(aCol), col(bCol)).as("a"), greatest(col(aCol), col(bCol)).as("b"))
      .filter(col("a") =!= col("b") && col("a").isNotNull && col("b").isNotNull)
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
    val nTri = wedges
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
}
