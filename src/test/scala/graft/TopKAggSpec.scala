package graft

import graft.functions.TopKBuffer

/** Bounded-heap top-k aggregate: kernel oracle vs naive sort, serialization
  * roundtrip, merge correctness, tie-breaking. */
class TopKAggSpec extends SparkSpec {

  private def naiveTopK(xs: Seq[(Double, Long)], k: Int): Seq[(Double, Long)] =
    xs.sortBy { case (o, i) => (-o, i) }.take(k)

  test("heap == naive sort on random data with ties") {
    val rnd = new scala.util.Random(11)
    for (_ <- 1 to 20) {
      val xs = Seq.fill(200)((rnd.nextInt(30).toDouble, rnd.nextInt(1000).toLong)).distinct
      val buf = new TopKBuffer(5)
      xs.foreach { case (o, i) => buf.insert(o, i) }
      assert(buf.sortedDescending == naiveTopK(xs, 5))
    }
  }

  test("merge of split streams == single stream") {
    val rnd = new scala.util.Random(13)
    val xs = Seq.fill(500)((rnd.nextDouble() * 100, rnd.nextLong().abs))
    val (l, r) = xs.splitAt(250)
    val a = new TopKBuffer(7); l.foreach { case (o, i) => a.insert(o, i) }
    val b = new TopKBuffer(7); r.foreach { case (o, i) => b.insert(o, i) }
    a.mergeFrom(b)
    assert(a.sortedDescending == naiveTopK(xs, 7))
  }

  test("serialization roundtrip preserves contents") {
    val buf = new TopKBuffer(4)
    Seq((5.0, 1L), (3.0, 2L), (9.0, 3L), (9.0, 1L), (1.0, 9L)).foreach { case (o, i) => buf.insert(o, i) }
    val back = TopKBuffer.fromBytes(4, buf.toBytes)
    assert(back.sortedDescending == buf.sortedDescending)
    assert(buf.sortedDescending == Seq((9.0, 1L), (9.0, 3L), (5.0, 1L), (3.0, 2L)))
  }

  test("NaN ord values sort greatest (Spark semantics) and stay evictable") {
    // NaN lands at the TOP (Spark sorts NaN as greater than any double), and
    // a NaN at the heap root must not block later inserts (primitive <
    // comparisons would make worse(NaN, …) always false).
    val buf = new TopKBuffer(2)
    buf.insert(Double.NaN, 7L); buf.insert(1.0, 1L); buf.insert(2.0, 2L)
    val got = buf.sortedDescending
    assert(got.head._1.isNaN && got.head._2 == 7L)
    assert(got(1) == (2.0, 2L))
    // two NaNs tie on ord → id ASC decides; a better (smaller-id) NaN evicts
    val b2 = new TopKBuffer(2)
    b2.insert(Double.NaN, 9L); b2.insert(Double.NaN, 4L); b2.insert(Double.NaN, 2L)
    assert(b2.sortedDescending.map(_._2) == Seq(2L, 4L))
  }

  test("fewer rows than k returns all, sorted") {
    val buf = new TopKBuffer(10)
    buf.insert(2.0, 5L); buf.insert(7.0, 1L)
    assert(buf.sortedDescending == Seq((7.0, 1L), (2.0, 5L)))
  }

  test("DataFrame aggregate matches window row_number spelling") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.expressions.Window
    val orders = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    val viaAgg = graft.queries.Breadth.x19TopKAgg(spark, "/root/testdata/sf0.001")
      .as[(Long, Double, Long)].collect().toSeq
    val w = Window.partitionBy($"o_custkey").orderBy($"o_totalprice".desc, $"o_orderkey")
    val viaWindow = orders
      .withColumn("rn", row_number().over(w)).filter($"rn" <= 3)
      .select($"o_custkey", $"o_totalprice".as("price"), $"o_orderkey".as("okey"))
      .orderBy($"o_custkey", $"price".desc, $"okey")
      .as[(Long, Double, Long)].collect().toSeq
    assert(viaAgg == viaWindow)
  }
}
