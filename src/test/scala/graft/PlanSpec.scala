package graft

import org.apache.spark.sql.DataFrame

import graft.queries.{Analytics, Breadth, Extensions}

/** Plan-shape regression guards: the physical plans the 100 TB design
  * depends on must not silently degrade (a lost pushdown or a broadcast
  * flipping to sort-merge is invisible to result-correctness tests). */
class PlanSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def plan(df: DataFrame): String =
    df.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))

  /** Count physical nodes by their formatted-explain detail headers
    * ("(12) BroadcastHashJoin") so tree+detail duplication doesn't double. */
  private def count(p: String, needle: String): Int =
    p.linesIterator.count(_.matches(s"^\\(\\d+\\) $needle.*"))

  test("q15: filter and column pruning reach the parquet scan") {
    val p = plan(Analytics.q15PricingSummary(spark, dir))
    assert(p.contains("PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate"),
      s"filter not pushed:\n$p")
    assert(p.contains("ReadSchema: struct<l_quantity:double,l_extendedprice:double," +
      "l_returnflag:string,l_linestatus:string,l_shipdate:timestamp"), s"columns not pruned:\n$p")
    assert(count(p, "HashAggregate") >= 2, "partial+final aggregate split expected")
  }

  test("q09 gold join: all dimension joins broadcast, none sort-merge") {
    val p = plan(Analytics.q09GoldJoin(spark, dir))
    assert(count(p, "BroadcastHashJoin") == 3, s"expected 3 broadcast joins:\n$p")
    assert(count(p, "SortMergeJoin") == 0, s"no sort-merge join expected:\n$p")
  }

  test("q20 big-big join: lineitem joins orders via shuffle, dims broadcast") {
    val p = plan(Breadth.q20BigJoinRevenue(spark, dir))
    // at least the nation join broadcasts; the fact-fact join must not
    // broadcast the fact table (either SMJ or shuffled-hash is acceptable)
    assert(count(p, "BroadcastHashJoin") >= 1, s"dim join should broadcast:\n$p")
    assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin") ||
      count(p, "BroadcastHashJoin") >= 3, // AQE may legitimately broadcast at sf0.001
      s"unexpected join strategy:\n$p")
  }

  test("x06 minhash LSH: bucket kernel keeps the exchange count bounded") {
    val p = plan(Extensions.x06MinhashNearDup(spark, dir))
    assert(count(p, "Exchange") <= 6, s"LSH pipeline grew extra shuffles:\n$p")
    assert(count(p, "Window") == 0,
      s"no window (sort) operator expected in the LSH path:\n$p")
  }

  test("q10 top-1: TakeOrderedAndProject, not a global sort") {
    val p = plan(Analytics.q10Top1Asc(spark, dir))
    assert(p.contains("TakeOrderedAndProject"), s"top-k should not full-sort:\n$p")
  }

  test("x19 top-k aggregate: hash aggregate with partial merge, no window sort") {
    val p = plan(Breadth.x19TopKAgg(spark, dir))
    assert(count(p, "ObjectHashAggregate") + count(p, "HashAggregate") >= 2,
      s"expected partial+final aggregate:\n$p")
    assert(!p.contains("WindowExec"), s"no window operator expected:\n$p")
  }
}
