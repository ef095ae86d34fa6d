package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types.DecimalType

import graft.Tables
import graft.gold.Normalize

/** Reference-parity analytic operator surface — SURVEY.md §2, phrased over the
  * driver's star schema (TESTDATA.md) so every query has a DuckDB oracle.
  *
  * Each entry maps 1:1 to operator rows in SURVEY.md §2 (cited per query).
  * Determinism rules for oracle hash-parity:
  *   - every query ends in a total ORDER BY (unique tiebreak column);
  *   - double aggregations go through DECIMAL(18,2) so Spark's partial/final
  *     split and DuckDB's single-pass sum produce bit-identical results, then
  *     cast back to double so schemas agree (SURVEY.md §7.3 item 6);
  *   - per-row double arithmetic (no reordering) is IEEE-identical across
  *     engines and needs no rounding.
  */
object Analytics {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  /** Exact distributive sum of a 2-decimal double column: decimal-widened so
    * aggregation order cannot perturb the result, returned as double. */
  private def sumDec(c: Column): Column = sum(c.cast(DecimalType(18, 2))).cast("double")
  private def sumDecSql(e: String): String = s"CAST(SUM(CAST($e AS DECIMAL(18,2))) AS DOUBLE)"

  // ---------------------------------------------------------------- q01
  // P1 (row filter !=), P2 (projection), P3 (rename). Filter + projection are
  // pushed into the parquet scan by Catalyst (SURVEY.md §4).
  def q01FilterProject(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    t(s, dir, "orders")
      .filter($"o_orderstatus" =!= "O")
      .select($"o_orderkey", $"o_orderpriority".as("priority"), $"o_totalprice".as("total"))
      .orderBy($"o_orderkey")
  }
  val q01Sql: String =
    """SELECT o_orderkey, o_orderpriority AS priority, o_totalprice AS total
      |FROM orders WHERE o_orderstatus <> 'O' ORDER BY o_orderkey""".stripMargin

  // ---------------------------------------------------------------- q02
  // P4: numeric coercion with null-on-failure (pandas errors="coerce" →
  // try_cast, ANSI-proof; SURVEY.md §7.3 item 3).
  def q02TryCast(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.events(s, dir)
      .select(
        $"event_id",
        expr("try_cast(regexp_extract(props, '([0-9]+)', 1) AS DOUBLE)").as("k_num"),
        expr("try_cast(event_type AS DOUBLE)").as("bad_cast"))
      .orderBy($"event_id")
  }
  val q02Sql: String =
    """SELECT event_id,
      |  TRY_CAST(regexp_extract(props, '([0-9]+)', 1) AS DOUBLE) AS k_num,
      |  TRY_CAST(event_type AS DOUBLE) AS bad_cast
      |FROM events ORDER BY event_id""".stripMargin

  // ---------------------------------------------------------------- q03
  // P5 (fillna → coalesce) + P6 (row-wise horizontal sum).
  def q03HorizontalSum(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    t(s, dir, "lineitem")
      .select(
        $"l_orderkey", $"l_linenumber",
        (coalesce($"l_tax", lit(0.0)) + coalesce($"l_discount", lit(0.0)) +
          coalesce($"l_quantity", lit(0.0))).as("row_sum"))
      .orderBy($"l_orderkey", $"l_linenumber")
  }
  val q03Sql: String =
    """SELECT l_orderkey, l_linenumber,
      |  COALESCE(l_tax, 0.0) + COALESCE(l_discount, 0.0) + COALESCE(l_quantity, 0.0) AS row_sum
      |FROM lineitem ORDER BY l_orderkey, l_linenumber""".stripMargin

  // ---------------------------------------------------------------- q04
  // P7 (guarded division, 0-denominator → NULL, ×100) + P8 (derived column).
  def q04GuardedDiv(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    t(s, dir, "lineitem")
      .select(
        $"l_orderkey", $"l_linenumber",
        (lit(100.0) * $"l_extendedprice" / nullif($"l_quantity", lit(0.0))).as("unit_price_pct"))
      .orderBy($"l_orderkey", $"l_linenumber")
  }
  val q04Sql: String =
    """SELECT l_orderkey, l_linenumber,
      |  100.0 * l_extendedprice / NULLIF(l_quantity, 0.0) AS unit_price_pct
      |FROM lineitem ORDER BY l_orderkey, l_linenumber""".stripMargin

  // ---------------------------------------------------------------- q05
  // P9 (string cast+trim on key) + P10 (county normalizer) over synthetic
  // "<nation> County, Georgia" strings so both regex branches fire.
  def q05StringNorm(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    t(s, dir, "nation")
      .select(
        $"n_nationkey",
        trim($"n_name".cast("string")).as("key_trimmed"),
        Normalize.normalizeCounty(concat($"n_name", lit(" County, Georgia"))).as("norm_full"),
        Normalize.normalizeCounty($"n_name").as("norm_plain"),
        Normalize.normalizeCounty(lit("")).as("norm_empty"))
      .orderBy($"n_nationkey")
  }
  val q05Sql: String =
    s"""SELECT n_nationkey,
       |  trim(CAST(n_name AS VARCHAR)) AS key_trimmed,
       |  ${Normalize.normalizeCountySql("concat(n_name, ' County, Georgia')")} AS norm_full,
       |  ${Normalize.normalizeCountySql("n_name")} AS norm_plain,
       |  ${Normalize.normalizeCountySql("''")} AS norm_empty
       |FROM nation ORDER BY n_nationkey""".stripMargin

  // ---------------------------------------------------------------- q06
  // A1: multi-key group-by with mean + count-distinct (the LEA rollup shape),
  // P11/P12 null-key pre-filter (pandas drops NULL group keys — SURVEY §7.3.1).
  def q06RollupMeanNunique(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    t(s, dir, "customer")
      .filter($"c_nationkey".isNotNull)
      .groupBy($"c_nationkey")
      .agg(
        (sumDec($"c_acctbal") / count(lit(1))).as("avg_acctbal"),
        countDistinct($"c_mktsegment").as("n_segments"),
        count(lit(1)).as("n_customers"))
      .orderBy($"c_nationkey")
  }
  val q06Sql: String =
    s"""SELECT c_nationkey,
       |  ${sumDecSql("c_acctbal")} / COUNT(*) AS avg_acctbal,
       |  COUNT(DISTINCT c_mktsegment) AS n_segments,
       |  COUNT(*) AS n_customers
       |FROM customer WHERE c_nationkey IS NOT NULL
       |GROUP BY c_nationkey ORDER BY c_nationkey""".stripMargin

  // ---------------------------------------------------------------- q07
  // J1: left equi-join, small dimension broadcast (BroadcastHashJoin — the
  // 100 TB-safe plan: no shuffle of the big side).
  def q07LeftJoin(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    t(s, dir, "supplier")
      .join(broadcast(t(s, dir, "nation")), $"s_nationkey" === $"n_nationkey", "left")
      .select($"s_suppkey", $"s_name", $"s_acctbal", $"n_name".as("nation_name"))
      .orderBy($"s_suppkey")
  }
  val q07Sql: String =
    """SELECT s_suppkey, s_name, s_acctbal, n_name AS nation_name
      |FROM supplier LEFT JOIN nation ON s_nationkey = n_nationkey
      |ORDER BY s_suppkey""".stripMargin

  // ---------------------------------------------------------------- q08
  // J2: duplicate elimination with deterministic keep-first semantics
  // (row_number over a stable order — SURVEY §7.3.2), not dropDuplicates.
  def q08DedupKeepFirst(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val w = Window.partitionBy($"o_custkey").orderBy($"o_orderkey")
    t(s, dir, "orders")
      .withColumn("rn", row_number().over(w))
      .filter($"rn" === 1)
      .select($"o_custkey", $"o_orderkey", $"o_totalprice")
      .orderBy($"o_custkey")
  }
  val q08Sql: String =
    """WITH ranked AS (
      |  SELECT o_custkey, o_orderkey, o_totalprice,
      |         row_number() OVER (PARTITION BY o_custkey ORDER BY o_orderkey) AS rn
      |  FROM orders)
      |SELECT o_custkey, o_orderkey, o_totalprice FROM ranked WHERE rn = 1
      |ORDER BY o_custkey""".stripMargin

  /** The "gold build" dataframe (SURVEY §2.4): per-nation customer rollup
    * ⟕ per-nation supplier rollup ⋈ nation ⋈ region — the exact
    * agg→left-join→inner-join shape of silver_to_gold.py:39-84. */
  def goldPerNation(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val custAgg = t(s, dir, "customer")
      .groupBy($"c_nationkey")
      .agg(
        (sumDec($"c_acctbal") / count(lit(1))).as("avg_cust_acctbal"),
        countDistinct($"c_custkey").as("n_customers"))
    val suppAgg = t(s, dir, "supplier")
      .groupBy($"s_nationkey")
      .agg(
        (sumDec($"s_acctbal") / count(lit(1))).as("avg_supp_acctbal"),
        count(lit(1)).as("n_suppliers"))
    custAgg
      .join(suppAgg, $"c_nationkey" === $"s_nationkey", "left")
      .join(broadcast(t(s, dir, "nation")), $"c_nationkey" === $"n_nationkey", "inner")
      .join(broadcast(t(s, dir, "region")), $"n_regionkey" === $"r_regionkey", "inner")
      .select(
        $"n_nationkey".as("nationkey"), $"n_name".as("nation_name"),
        $"r_name".as("region_name"),
        $"avg_cust_acctbal", $"n_customers", $"avg_supp_acctbal", $"n_suppliers")
  }
  val goldPerNationSql: String =
    s"""WITH cust_agg AS (
       |  SELECT c_nationkey,
       |    ${sumDecSql("c_acctbal")} / COUNT(*) AS avg_cust_acctbal,
       |    COUNT(DISTINCT c_custkey) AS n_customers
       |  FROM customer GROUP BY c_nationkey),
       |supp_agg AS (
       |  SELECT s_nationkey,
       |    ${sumDecSql("s_acctbal")} / COUNT(*) AS avg_supp_acctbal,
       |    COUNT(*) AS n_suppliers
       |  FROM supplier GROUP BY s_nationkey)
       |SELECT n_nationkey AS nationkey, n_name AS nation_name, r_name AS region_name,
       |       avg_cust_acctbal, n_customers, avg_supp_acctbal, n_suppliers
       |FROM cust_agg
       |LEFT JOIN supp_agg ON c_nationkey = s_nationkey
       |JOIN nation ON c_nationkey = n_nationkey
       |JOIN region ON n_regionkey = r_regionkey""".stripMargin

  // ---------------------------------------------------------------- q09
  // J3 + A1 + J1: the flagship gold pipeline query.
  def q09GoldJoin(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    goldPerNation(s, dir).orderBy($"nationkey")
  }
  val q09Sql: String = goldPerNationSql + "\nORDER BY nationkey"

  // ---------------------------------------------------------------- q10
  // O2 + P12: ORDER BY ASC LIMIT 1 top-1 min with IS NOT NULL guard
  // (TakeOrderedAndProject — true top-k, no full sort).
  def q10Top1Asc(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    t(s, dir, "customer")
      .filter($"c_acctbal".isNotNull)
      .orderBy($"c_acctbal".asc, $"c_custkey".asc)
      .limit(1)
      .select($"c_custkey", $"c_name", $"c_acctbal")
  }
  val q10Sql: String =
    """SELECT c_custkey, c_name, c_acctbal FROM customer
      |WHERE c_acctbal IS NOT NULL
      |ORDER BY c_acctbal ASC, c_custkey ASC LIMIT 1""".stripMargin

  // ---------------------------------------------------------------- q11
  // O3/O4: ORDER BY DESC LIMIT k top-k.
  def q11TopKDesc(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    t(s, dir, "orders")
      .orderBy($"o_totalprice".desc, $"o_orderkey".asc)
      .limit(20)
      .select($"o_orderkey", $"o_custkey", $"o_totalprice")
  }
  val q11Sql: String =
    """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
      |ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 20""".stripMargin

  // ---------------------------------------------------------------- q12
  // W1/W2 (global rank windows, NULLS LAST), W3 (CTE), P13 (rank-sum
  // arithmetic), O5 (final ordering). Mirrors view_gold.py:94-113. The
  // un-partitioned window is kept for reference parity only — it serializes
  // to one partition, acceptable at nation cardinality (25), never used on
  // large tables (SURVEY §7.3.5).
  def q12RankSum(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    // the gold build is materialized once per session/corpus and shared
    // with q09's live build path (q09 keeps the full plan for its
    // broadcast-join guard; everything downstream reads the 25-row view)
    val gold = graft.ops.SharedViews.materialized(s, s"gold_per_nation/$dir") {
      goldPerNation(s, dir)
    }
    val ranked = gold
      .withColumn("r_cust_bal", rank().over(Window.orderBy($"avg_cust_acctbal".desc_nulls_last)))
      .withColumn("r_cust_cnt", rank().over(Window.orderBy($"n_customers".desc_nulls_last)))
      .withColumn("r_supp_bal", rank().over(Window.orderBy($"avg_supp_acctbal".desc_nulls_last)))
    ranked
      .select(
        $"nationkey", $"nation_name",
        $"r_cust_bal", $"r_cust_cnt", $"r_supp_bal",
        ($"r_cust_bal" + $"r_cust_cnt" + $"r_supp_bal").as("overall_rank_sum"))
      .orderBy($"overall_rank_sum".asc, $"nationkey".asc)
  }
  val q12Sql: String =
    s"""WITH gold AS (
       |$goldPerNationSql
       |), ranked AS (
       |  SELECT *,
       |    rank() OVER (ORDER BY avg_cust_acctbal DESC NULLS LAST) AS r_cust_bal,
       |    rank() OVER (ORDER BY n_customers DESC NULLS LAST) AS r_cust_cnt,
       |    rank() OVER (ORDER BY avg_supp_acctbal DESC NULLS LAST) AS r_supp_bal
       |  FROM gold)
       |SELECT nationkey, nation_name, r_cust_bal, r_cust_cnt, r_supp_bal,
       |       r_cust_bal + r_cust_cnt + r_supp_bal AS overall_rank_sum
       |FROM ranked ORDER BY overall_rank_sum ASC, nationkey ASC""".stripMargin

  // ---------------------------------------------------------------- q13
  // A2: COUNT(*).
  def q13Count(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem").agg(count(lit(1)).as("n_rows"))
  val q13Sql: String = "SELECT COUNT(*) AS n_rows FROM lineitem"

  // ---------------------------------------------------------------- q14
  // O1: LIMIT-n sample (made deterministic with a key order so the oracle
  // hash is stable) + S4 parquet scan column pruning (only 4 of 5 columns).
  def q14Limit(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    t(s, dir, "documents")
      .select($"doc_id", $"lang", $"source", $"n_chars")
      .orderBy($"doc_id")
      .limit(10)
  }
  val q14Sql: String =
    "SELECT doc_id, lang, source, n_chars FROM documents ORDER BY doc_id LIMIT 10"

  // ---------------------------------------------------------------- q15
  // Scan→agg over the fact table: the TPC-H Q1 shape (pricing summary).
  // Partial aggregation (map-side combine) happens before the 2-key shuffle;
  // at 100 TB this is the canonical "shuffle only the aggregates" plan.
  def q15PricingSummary(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    t(s, dir, "lineitem")
      .filter($"l_shipdate" <= lit(java.sql.Timestamp.valueOf("1998-09-02 00:00:00")))
      .groupBy($"l_returnflag", $"l_linestatus")
      .agg(
        sumDec($"l_quantity").as("sum_qty"),
        sumDec($"l_extendedprice").as("sum_base_price"),
        count(lit(1)).as("count_order"))
      .orderBy($"l_returnflag", $"l_linestatus")
  }
  val q15Sql: String =
    s"""SELECT l_returnflag, l_linestatus,
       |  ${sumDecSql("l_quantity")} AS sum_qty,
       |  ${sumDecSql("l_extendedprice")} AS sum_base_price,
       |  COUNT(*) AS count_order
       |FROM lineitem
       |WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
       |GROUP BY l_returnflag, l_linestatus
       |ORDER BY l_returnflag, l_linestatus""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q01_filter_project" -> q01FilterProject _,
    "q02_try_cast" -> q02TryCast _,
    "q03_horizontal_sum" -> q03HorizontalSum _,
    "q04_guarded_div" -> q04GuardedDiv _,
    "q05_string_norm" -> q05StringNorm _,
    "q06_rollup_mean_nunique" -> q06RollupMeanNunique _,
    "q07_left_join" -> q07LeftJoin _,
    "q08_dedup_keepfirst" -> q08DedupKeepFirst _,
    "q09_gold_join" -> q09GoldJoin _,
    "q10_top1_asc" -> q10Top1Asc _,
    "q11_topk_desc" -> q11TopKDesc _,
    "q12_rank_sum" -> q12RankSum _,
    "q13_count" -> q13Count _,
    "q14_limit" -> q14Limit _,
    "q15_pricing_summary" -> q15PricingSummary _)

  val oracleSql: Map[String, String] = Map(
    "q01_filter_project" -> q01Sql,
    "q02_try_cast" -> q02Sql,
    "q03_horizontal_sum" -> q03Sql,
    "q04_guarded_div" -> q04Sql,
    "q05_string_norm" -> q05Sql,
    "q06_rollup_mean_nunique" -> q06Sql,
    "q07_left_join" -> q07Sql,
    "q08_dedup_keepfirst" -> q08Sql,
    "q09_gold_join" -> q09Sql,
    "q10_top1_asc" -> q10Sql,
    "q11_topk_desc" -> q11Sql,
    "q12_rank_sum" -> q12Sql,
    "q13_count" -> q13Sql,
    "q14_limit" -> q14Sql,
    "q15_pricing_summary" -> q15Sql)
}
