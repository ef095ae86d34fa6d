package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Market-basket co-occurrence mining over a (basket, item) relation —
  * the classic Apriori two-pass shape, phrased as Spark relational algebra
  * so the cluster does the candidate pruning instead of a driver loop.
  */
object Itemsets {

  /** Frequent item PAIRS with support ≥ `minSupport`, with per-pair lift.
    *
    * Two passes (A-priori, Agrawal & Srikant VLDB'94, downward closure):
    * pass 1 counts single items and keeps the frequent ones; pass 2
    * restricts every basket to frequent items BEFORE generating pairs, so
    * the within-basket self-join only ever sees items that can still reach
    * the threshold. The frequent-item table is support-bounded (≤ total
    * item occurrences / minSupport rows — data-size-independent for a
    * fixed support RATE), so it broadcasts: the basket scan is pruned
    * map-side with zero shuffle, and the only shuffle left is the pair
    * count itself, which map-side combines on (item, item) keys. Baskets
    * are bounded (an order has ~7 lines), so within-basket pair expansion
    * is linear in input, never quadratic in catalog.
    *
    * All-integer output: `lift_ppm = ⌊co·n_baskets·10⁶ / (cnt_a·cnt_b)⌋`
    * (co·n·10⁶ ≤ ~2e15 at sf0.1 — inside int64), so DuckDB reproduces
    * every row bit-for-bit. Deterministic order: co DESC, item_a, item_b.
    */
  def frequentPairs(baskets: DataFrame, basketCol: String, itemCol: String,
                    minSupport: Long, topK: Int): DataFrame =
    frequentPairs(baskets, basketCol, itemCol, minSupport, topK,
      assumeDistinct = false)

  /** As [[frequentPairs]]; `assumeDistinct = true` is a CALLER CONTRACT
    * that the non-null `(basket, item)` rows are already distinct AND the
    * input relation is already materialized (e.g. a checkpointed shared
    * view) — the op then skips its defensive distinct-shuffle +
    * checkpoint, which on an already-clean input is pure duplicated work
    * (one full shuffle + block write). A caller that lies gets inflated
    * counts: the contract is on the caller, exactly like feeding
    * pre-bucketed tables to a bucketed join. */
  def frequentPairs(baskets: DataFrame, basketCol: String, itemCol: String,
                    minSupport: Long, topK: Int,
                    assumeDistinct: Boolean): DataFrame = {
    val b0 = baskets
      .select(col(basketCol).as("bk"), col(itemCol).as("it"))
      .filter(col("bk").isNotNull && col("it").isNotNull)
    val b = if (assumeDistinct) b0
      else b0.distinct()
        .localCheckpoint() // feeds item counts, both pair sides, basket total
    val itemCnt = b.groupBy(col("it")).agg(count(lit(1)).as("cnt"))
    val freq = itemCnt.filter(col("cnt") >= minSupport)
    // Map-side basket pruning: broadcast the support-bounded frequent set.
    val fb = b.join(broadcast(freq.select(col("it"))), Seq("it"))
    val pairs = fb.select(col("bk"), col("it").as("ia"))
      .join(fb.select(col("bk"), col("it").as("ib")), Seq("bk"))
      .filter(col("ia") < col("ib"))
      .groupBy(col("ia"), col("ib")).agg(count(lit(1)).as("co"))
      .filter(col("co") >= minSupport)
    val nB = b.select(col("bk")).distinct().agg(count(lit(1)).as("n_baskets"))
    pairs
      .join(broadcast(freq.select(col("it").as("ia"), col("cnt").as("cnt_a"))), Seq("ia"))
      .join(broadcast(freq.select(col("it").as("ib"), col("cnt").as("cnt_b"))), Seq("ib"))
      .crossJoin(nB)
      .select(col("ia").as("item_a"), col("ib").as("item_b"), col("co"),
        col("cnt_a"), col("cnt_b"),
        expr("(co * n_baskets * 1000000) DIV (cnt_a * cnt_b)").as("lift_ppm"))
      .orderBy(col("co").desc, col("item_a"), col("item_b"))
      .limit(topK)
  }

  /** DuckDB respell of [[frequentPairs]] — identical passes, identical
    * integer lift. */
  def frequentPairsSql(table: String, basketCol: String, itemCol: String,
                       minSupport: Long, topK: Int): String =
    s"""WITH b AS (
       |  SELECT DISTINCT $basketCol AS bk, $itemCol AS it FROM $table
       |  WHERE $basketCol IS NOT NULL AND $itemCol IS NOT NULL),
       |ic AS (SELECT it, CAST(count(*) AS BIGINT) AS cnt FROM b GROUP BY it),
       |freq AS (SELECT * FROM ic WHERE cnt >= $minSupport),
       |fb AS (SELECT b.bk, b.it FROM b JOIN freq USING (it)),
       |p AS (
       |  SELECT x.it AS ia, y.it AS ib, CAST(count(*) AS BIGINT) AS co
       |  FROM fb x JOIN fb y ON x.bk = y.bk AND x.it < y.it
       |  GROUP BY 1, 2 HAVING count(*) >= $minSupport),
       |nb AS (SELECT CAST(count(DISTINCT bk) AS BIGINT) AS n_baskets FROM b)
       |SELECT p.ia AS item_a, p.ib AS item_b, p.co,
       |  fa.cnt AS cnt_a, fc.cnt AS cnt_b,
       |  (p.co * nb.n_baskets * 1000000) // (fa.cnt * fc.cnt) AS lift_ppm
       |FROM p
       |JOIN freq fa ON fa.it = p.ia
       |JOIN freq fc ON fc.it = p.ib
       |CROSS JOIN nb
       |ORDER BY p.co DESC, item_a, item_b LIMIT $topK""".stripMargin
}
