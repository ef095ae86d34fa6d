package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.functions.Exprs._

/** Approximate-nearest-neighbor search over an embedding column.
  *
  * Two paths:
  *  - [[bruteForceTopK]] — exact cosine top-k. The query side is broadcast
  *    (it is small by construction); the corpus streams map-side through a
  *    codegen'd cosine kernel and a per-query top-k window. At 100 TB the
  *    corpus never shuffles — only (query_id, candidate) pairs after the
  *    window's rank filter.
  *  - [[ivfTopK]] — IVF-style two-level search: corpus vectors are assigned
  *    to their nearest coarse centroid once (a write-time step in a real
  *    lake), queries probe only the `nprobe` closest centroid cells. The
  *    scan is 1/nlist-ish of brute force; recall trades off via nprobe.
  */
object Similarity {

  /** Exact cosine top-k: for each query vector, the k most similar corpus
    * vectors (excluding itself when ids collide). */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, k: Int = 10): DataFrame = {
    val c = corpus.select(col(idCol).as("item_id"), col(vecCol).as("item_vec"))
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("query_vec"))
    val scored = c.join(broadcast(q), col("item_id") =!= col("query_id"))
      .select(col("query_id"), col("item_id"),
        cosine_sim(col("query_vec"), col("item_vec")).as("cos_sim"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos_sim").desc, col("item_id").asc)
    scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
  }

  /** Coarse centroids via deterministic Lloyd iterations: seeds are the
    * `nlist` lowest-id vectors, then `iters` rounds of
    * assign(distributed) → mean(distributed) with only the tiny centroid
    * set collected per round — the standard IVF training loop, seeded
    * deterministically instead of k-means++ randomness. */
  def coarseCentroids(corpus: DataFrame, idCol: String, vecCol: String,
      nlist: Int, iters: Int = 3): DataFrame = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val base = corpus.select(col(idCol).as("item_id"), col(vecCol).as("item_vec"))
    base.cache()
    var centroids = base.orderBy(col("item_id")).limit(nlist)
      .select(col("item_vec").as("centroid"))
      .collect().map(_.getSeq[Float](0).toArray).zipWithIndex
      .map { case (v, i) => (i, v) }
    for (_ <- 1 to iters) {
      val cDf = centroids.toSeq.toDF("centroid_id", "centroid")
      val assigned = base.join(broadcast(cDf))
        .select(col("item_id"), col("item_vec"), col("centroid_id"),
          cosine_sim(col("item_vec"), col("centroid")).as("c_sim"))
        .withColumn("rn", row_number().over(
          Window.partitionBy(col("item_id")).orderBy(col("c_sim").desc, col("centroid_id").asc)))
        .filter(col("rn") === 1)
      // per-cell mean vector (element-wise) — aggregate in the cluster
      val means = assigned
        .select(col("centroid_id"), posexplode(col("item_vec")))
        .groupBy(col("centroid_id"), col("pos"))
        .agg(avg(col("col")).as("m"))
        .collect().groupBy(_.getInt(0))
        .map { case (cid, rows) =>
          val dim = rows.map(_.getInt(1)).max + 1
          val v = new Array[Float](dim)
          rows.foreach(r => v(r.getInt(1)) = r.getDouble(2).toFloat)
          (cid, v)
        }
      // empty cells keep their previous centroid
      centroids = centroids.map { case (cid, old) => (cid, means.getOrElse(cid, old)) }
    }
    centroids.toSeq.toDF("centroid_id", "centroid")
  }

  /** Assign every corpus vector to its nearest centroid (broadcast the tiny
    * centroid set; pick argmax cosine with a per-vector window). */
  def assignCells(corpus: DataFrame, centroids: DataFrame, idCol: String, vecCol: String): DataFrame = {
    val scored = corpus.select(col(idCol).as("item_id"), col(vecCol).as("item_vec"))
      .join(broadcast(centroids))
      .select(col("item_id"), col("item_vec"), col("centroid_id"),
        cosine_sim(col("item_vec"), col("centroid")).as("c_sim"))
    val w = Window.partitionBy(col("item_id")).orderBy(col("c_sim").desc, col("centroid_id").asc)
    scored.withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .select(col("item_id"), col("item_vec"), col("centroid_id"))
  }

  /** IVF search: probe the `nprobe` nearest cells per query, exact cosine
    * within the probed cells, top-k per query. */
  def ivfTopK(corpus: DataFrame, queries: DataFrame, idCol: String, vecCol: String,
      k: Int = 10, nlist: Int = 16, nprobe: Int = 4): DataFrame = {
    val centroids = coarseCentroids(corpus, idCol, vecCol, nlist)
    val cells = assignCells(corpus, centroids, idCol, vecCol)
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("query_vec"))
    val qCells = q.join(broadcast(centroids))
      .select(col("query_id"), col("query_vec"), col("centroid_id"),
        cosine_sim(col("query_vec"), col("centroid")).as("c_sim"))
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("query_id")).orderBy(col("c_sim").desc, col("centroid_id").asc)))
      .filter(col("rn") <= nprobe)
      .select(col("query_id"), col("query_vec"), col("centroid_id"))
    val scored = qCells.join(cells, Seq("centroid_id"))
      .filter(col("item_id") =!= col("query_id"))
      .select(col("query_id"), col("item_id"),
        cosine_sim(col("query_vec"), col("item_vec")).as("cos_sim"))
      // a vector can be reached via multiple probed cells of different bands — dedupe
      .groupBy(col("query_id"), col("item_id")).agg(max(col("cos_sim")).as("cos_sim"))
    val w = Window.partitionBy(col("query_id")).orderBy(col("cos_sim").desc, col("item_id").asc)
    scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
  }
}
