package graft

import org.apache.spark.sql.functions.udaf

import graft.functions.TypedAggs
import graft.functions.TypedAggs.MomentState

/** Top-level so the Dataset encoder needs no outer-scope instance. */
case class Sale(region: String, amount: Double)

/** Typed Aggregator surface: Welford mean/variance as a typed fold on a
  * Dataset and as a registered SQL UDAF, against exact references. */
class TypedAggsSpec extends SparkSpec {

  private val data = Seq(
    Sale("e", 10.0), Sale("e", 20.0), Sale("e", 30.0),
    Sale("w", 5.0), Sale("w", 5.0), Sale("w", 14.0), Sale("w", 8.0))

  private def exact(xs: Seq[Double]): (Double, Double) = {
    val m = xs.sum / xs.size
    val v = if (xs.size < 2) 0.0 else xs.map(x => (x - m) * (x - m)).sum / (xs.size - 1)
    (m, v)
  }

  test("typed groupByKey fold matches exact mean/variance") {
    import spark.implicits._
    val agg = new TypedAggs.MeanVariance[Sale](_.amount).toColumn
    val out = data.toDS().groupByKey(_.region).agg(agg).collect().toMap
    val expected = data.groupBy(_.region).map { case (k, v) => k -> exact(v.map(_.amount)) }
    out.foreach { case (k, (m, v)) =>
      val (em, ev) = expected(k)
      assert(math.abs(m - em) < 1e-12 && math.abs(v - ev) < 1e-12, s"region $k")
    }
  }

  test("registered as SQL UDAF over the real orders table") {
    import spark.implicits._
    spark.udf.register("mean_var", udaf(TypedAggs.MeanVarianceOfDouble))
    Tables.load(spark, "/root/testdata/sf0.001", "orders").createOrReplaceTempView("orders_t")
    val rows = spark.sql(
      """SELECT o_orderstatus, mean_var(o_totalprice) AS mv, avg(o_totalprice) AS a
        |FROM orders_t GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin)
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val mv = r.getStruct(1)
      assert(math.abs(mv.getDouble(0) - r.getDouble(2)) < 1e-6,
        s"Welford mean vs avg for ${r.getString(0)}")
      assert(mv.getDouble(1) >= 0.0)
    }
  }

  test("merge across splits equals single-stream state") {
    val xs = (1 to 1000).map(i => i * 0.5 + (i % 7))
    val (l, r) = xs.splitAt(400)
    val whole = xs.foldLeft(MomentState(0, 0, 0))(_.add(_))
    val merged = l.foldLeft(MomentState(0, 0, 0))(_.add(_))
      .merge(r.foldLeft(MomentState(0, 0, 0))(_.add(_)))
    assert(math.abs(whole.mean - merged.mean) < 1e-9)
    assert(math.abs(whole.variance - merged.variance) < 1e-6)
  }
}
