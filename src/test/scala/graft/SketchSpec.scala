package graft

/** Accuracy contract for the approximate aggregates in q22 (sketch values
  * are engine-specific, so the oracle is a bound, not a hash). */
class SketchSpec extends SparkSpec {

  test("approx distinct within 5% of exact; median quantile sane") {
    val rows = graft.queries.Breadth.q22Sketches(spark, "/root/testdata/sf0.01").collect()
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
}
