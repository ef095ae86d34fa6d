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

  /** Deterministic coarse centroids: every `corpusSize / nlist`-th vector by
    * id order. (A production lake would k-means these at ingest; determinism
    * matters more here than centroid quality, and recall is governed by
    * nprobe either way.) */
  def coarseCentroids(corpus: DataFrame, idCol: String, vecCol: String, nlist: Int): DataFrame = {
    val w = Window.orderBy(col("cid_src"))
    corpus.select(col(idCol).as("cid_src"), col(vecCol).as("centroid"))
      .withColumn("rn", row_number().over(w) - 1)
      .withColumn("total", count(lit(1)).over())
      .filter(col("rn") % greatest(floor(col("total") / nlist), lit(1)) === 0)
      .withColumn("centroid_id", row_number().over(Window.orderBy(col("rn"))) - 1)
      .filter(col("centroid_id") < nlist)
      .select(col("centroid_id"), col("centroid"))
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
