package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.{Exprs, Ops}

/** Shard-topology planning for a growing corpus — what actually happens when
  * a 100 TB lake reshards from N to M output buckets: under plain mod-hash
  * placement nearly every row moves (a full-corpus rewrite); under a
  * consistent-hash ring only the keyspace ceded to the new shards moves
  * (≈ (M−N)/M of it). This operator measures BOTH policies on the real key
  * column so the rewrite cost is a number, not folklore.
  */
object Sharding {

  /** The virtual-node ring for `shards` shards: (position, shard) sorted by
    * position — positions are SplitMix64 of a per-(shard, replica) seed,
    * signed int64 order, ties broken by shard id. Driver-built (bounded by
    * shards·vnodes, never by data) and baked into the plan as literals. */
  private[graft] def ring(shards: Int, vnodesPerShard: Int): Seq[(Long, Int)] =
    (for { s <- 0 until shards; r <- 0 until vnodesPerShard }
      yield (Ops.splitmix64(s.toLong * 1000003L + r), s))
      .sortBy(identity)

  /** Successor lookup on a baked ring: owner = shard of the first vnode at
    * position ≥ h (wrapping to the first vnode). `size(filter(pos < h))` is
    * the insertion index into the sorted literal array — a bounded
    * per-row scan over shards·vnodes elements, zero shuffle, no join. */
  private def ringOwner(h: Column, rg: Seq[(Long, Int)]): Column = {
    val pos = typedlit(rg.map(_._1))
    val sh = typedlit(rg.map(_._2.toLong))
    val idx = size(filter(pos, p => p < h))
    element_at(sh, when(idx === lit(rg.size), lit(1)).otherwise(idx + lit(1)))
  }

  /** Per-policy rebalance report for resharding `oldShards → newShards`:
    * rows moved and the post-move max shard load (balance quality), for
    * mod-hash and consistent-hash placement of `smix64(keyCol)`.
    *
    * Scale shape: one map-side projection computes all four assignments
    * (codegen'd hash + bounded ring scans — no shuffle), then the report
    * is two aggregates whose cardinality is the SHARD COUNT, not the
    * corpus: a global (count, moved, moved) fold and a ≤max(N,M)-key
    * load histogram per policy. */
  def rebalanceReport(df: DataFrame, keyCol: String,
      oldShards: Int, newShards: Int, vnodesPerShard: Int = 32): DataFrame = {
    val h = Exprs.smix64(col(keyCol).cast("long"))
    val assigns = df.select(
      pmod(h, lit(oldShards.toLong)).as("mod_old"),
      pmod(h, lit(newShards.toLong)).as("mod_new"),
      ringOwner(h, ring(oldShards, vnodesPerShard)).as("ring_old"),
      ringOwner(h, ring(newShards, vnodesPerShard)).as("ring_new"))

    def leg(method: String, oldCol: String, newCol: String): DataFrame = {
      val moved = assigns.agg(
        count(lit(1)).as("n_docs"),
        sum(when(col(oldCol) =!= col(newCol), 1L).otherwise(0L)).as("n_moved"))
      val load = assigns.groupBy(col(newCol)).agg(count(lit(1)).as("c"))
        .agg(max(col("c")).as("max_load_after"))
      moved.crossJoin(load).select(
        lit(method).as("method"), col("n_docs"), col("n_moved"),
        floor(col("n_moved").cast("double") * lit(1000000.0) /
          col("n_docs").cast("double")).cast("long").as("moved_ppm"),
        col("max_load_after"))
    }
    leg("mod", "mod_old", "mod_new")
      .unionByName(leg("ring", "ring_old", "ring_new"))
      .orderBy(col("method"))
  }

  /** DuckDB respell of [[rebalanceReport]] — SplitMix64 via the 32-bit-split
    * HUGEINT mulmod (the x99 discipline), the rings baked as literal lists
    * from the same [[ring]] builder. */
  def rebalanceSql(table: String, keyCol: String,
      oldShards: Int, newShards: Int, vnodesPerShard: Int = 32): String = {
    def mulmod(a: String, b: String): String =
      s"""((($a % 4294967296::HUGEINT) * $b +
         |  ((($a // 4294967296::HUGEINT) * $b) % 4294967296::HUGEINT)
         |    * 4294967296::HUGEINT) % 18446744073709551616::HUGEINT)""".stripMargin
    val m2 = mulmod("xor(x, x // 1073741824::HUGEINT)", "13787848793156543929::HUGEINT")
    val m3 = mulmod("xor(x, x // 134217728::HUGEINT)", "10723151780598845931::HUGEINT")
    def ringSel(rg: Seq[(Long, Int)], as: String): String = {
      val pos = rg.map(_._1).mkString("[", ", ", "]")
      val sh = rg.map(_._2).mkString("[", ", ", "]")
      val n = rg.size
      s"""CAST(($sh)[CASE WHEN len(list_filter($pos, p -> p < h)) = $n THEN 1
         |  ELSE len(list_filter($pos, p -> p < h)) + 1 END] AS BIGINT) AS $as"""
        .stripMargin
    }
    s"""WITH k AS (SELECT CAST($keyCol AS HUGEINT) AS u FROM $table),
       |m1 AS (SELECT (u % 18446744073709551616::HUGEINT + 11400714819323198485::HUGEINT)
       |         % 18446744073709551616::HUGEINT AS x FROM k),
       |m2 AS (SELECT $m2 AS x FROM m1),
       |m3 AS (SELECT $m3 AS x FROM m2),
       |hh AS (SELECT xor(x, x // 2147483648::HUGEINT) AS uh FROM m3),
       |hs AS (SELECT CAST(CASE WHEN uh >= 9223372036854775808::HUGEINT
       |         THEN uh - 18446744073709551616::HUGEINT ELSE uh END AS BIGINT) AS h
       |       FROM hh),
       |a AS (
       |  SELECT h,
       |    ((h % $oldShards) + $oldShards) % $oldShards AS mod_old,
       |    ((h % $newShards) + $newShards) % $newShards AS mod_new,
       |    ${ringSel(ring(oldShards, vnodesPerShard), "ring_old")},
       |    ${ringSel(ring(newShards, vnodesPerShard), "ring_new")}
       |  FROM hs),
       |rep AS (
       |  SELECT 'mod' AS method, CAST(count(*) AS BIGINT) AS n_docs,
       |    CAST(sum(CASE WHEN mod_old <> mod_new THEN 1 ELSE 0 END) AS BIGINT) AS n_moved
       |  FROM a
       |  UNION ALL
       |  SELECT 'ring', CAST(count(*) AS BIGINT),
       |    CAST(sum(CASE WHEN ring_old <> ring_new THEN 1 ELSE 0 END) AS BIGINT)
       |  FROM a),
       |ml AS (
       |  SELECT 'mod' AS method, CAST(max(c) AS BIGINT) AS max_load_after
       |  FROM (SELECT count(*) AS c FROM a GROUP BY mod_new)
       |  UNION ALL
       |  SELECT 'ring', CAST(max(c) AS BIGINT)
       |  FROM (SELECT count(*) AS c FROM a GROUP BY ring_new))
       |SELECT rep.method, n_docs, n_moved,
       |  CAST(floor(CAST(n_moved AS DOUBLE) * 1000000.0 / CAST(n_docs AS DOUBLE))
       |    AS BIGINT) AS moved_ppm,
       |  ml.max_load_after
       |FROM rep JOIN ml USING (method) ORDER BY method""".stripMargin
  }
}
