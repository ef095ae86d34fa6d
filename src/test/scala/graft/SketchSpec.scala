package graft

/** Accuracy contract for the approximate aggregates behind q22 (sketch
  * values are engine-specific; the numeric 5% bound lives here, while q22's
  * DuckDB oracle pins the within-ε booleans + exact distinct counts). */
class SketchSpec extends SparkSpec {

  test("approx distinct within 5% of exact; median quantile sane") {
    import org.apache.spark.sql.functions._
    val rows = spark.read.parquet("/root/testdata/sf0.01/lineitem.parquet")
      .groupBy(col("l_returnflag"))
      .agg(
        countDistinct(col("l_orderkey")).as("exact_distinct"),
        approx_count_distinct(col("l_orderkey"), 0.02).as("approx_distinct"),
        expr("approx_percentile(l_extendedprice, 0.5, 1000)").as("p50_price"),
        expr("approx_percentile(l_extendedprice, 0.95, 1000)").as("p95_price"),
        expr("approx_percentile(l_quantity, 0.5, 1000)").as("median_qty"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val exact = r.getLong(r.fieldIndex("exact_distinct"))
      val approx = r.getLong(r.fieldIndex("approx_distinct"))
      assert(math.abs(approx - exact).toDouble / exact < 0.05,
        s"flag ${r.getString(0)}: approx $approx vs exact $exact")
      val p50 = r.getDouble(r.fieldIndex("p50_price"))
      val p95 = r.getDouble(r.fieldIndex("p95_price"))
      assert(p50 <= p95)
      val med = r.getDouble(r.fieldIndex("median_qty"))
      assert(med >= 1.0 && med <= 50.0)
    }
  }

  test("q22's within-epsilon booleans all hold on real data") {
    val rows = graft.queries.Breadth.q22Sketches(spark, "/root/testdata/sf0.01").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      Seq("hll_ok", "p50_ok", "p95_ok", "median_ok").foreach { c =>
        assert(r.getBoolean(r.fieldIndex(c)), s"flag ${r.getString(0)}: $c false")
      }
      assert(r.getLong(r.fieldIndex("exact_distinct")) > 0)
    }
  }

  test("count-min: exact for collision-free data, one-sided error, merge == single build") {
    import org.apache.spark.unsafe.types.UTF8String
    import graft.functions.Ops
    val rows = 4; val width = 1024
    def u(s: String) = UTF8String.fromString(s)
    def lookup(m: Array[Long], s: String): Long =
      Ops.cmsLookup(new org.apache.spark.sql.catalyst.util.GenericArrayData(m), u(s), rows, width)
    // small vocab, wide sketch: whp no collisions → estimates are EXACT
    val m = new Array[Long](rows * width)
    val data = Seq("a" -> 5, "bb" -> 3, "ccc" -> 1)
    data.foreach { case (t, n) => (1 to n).foreach(_ => Ops.cmsAdd(m, u(t), rows, width)) }
    data.foreach { case (t, n) =>
      assert(lookup(m, t) == n.toLong, s"$t: ${lookup(m, t)} != $n") }
    // one-sided: an estimate is NEVER below the true count, for any token
    assert(lookup(m, "absent") >= 0L)
    data.foreach { case (t, n) => assert(lookup(m, t) >= n.toLong) }
    // merge distributivity: two half-builds summed == one full build
    val m1 = new Array[Long](rows * width); val m2 = new Array[Long](rows * width)
    val mFull = new Array[Long](rows * width)
    (1 to 3).foreach(_ => Ops.cmsAdd(m1, u("a"), rows, width))
    (1 to 2).foreach(_ => Ops.cmsAdd(m2, u("a"), rows, width))
    (1 to 5).foreach(_ => Ops.cmsAdd(mFull, u("a"), rows, width))
    val merged = m1.zip(m2).map { case (x, y) => x + y }
    assert(merged.sameElements(mFull))
  }
}
