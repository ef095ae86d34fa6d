package graft

/** q17's fused single-shuffle set-ops spelling must equal the native
  * union/intersect/except operator chain — the rewrite trades exchanges for
  * one aggregation, never semantics. */
class SetOpsSpec extends SparkSpec {

  test("fused q17 == native UNION/INTERSECT/EXCEPT operators") {
    import spark.implicits._
    val dir = "/root/testdata/sf0.001"
    val cn = spark.read.parquet(s"$dir/customer.parquet")
      .select($"c_nationkey".as("k")).distinct()
    val sn = spark.read.parquet(s"$dir/supplier.parquet")
      .select($"s_nationkey".as("k")).distinct()
    val native = cn.union(sn).distinct().withColumn("op", org.apache.spark.sql.functions.lit("union"))
      .unionByName(cn.intersect(sn).withColumn("op", org.apache.spark.sql.functions.lit("intersect")))
      .unionByName(cn.except(sn).withColumn("op", org.apache.spark.sql.functions.lit("except")))
      .select($"op", $"k")
      .as[(String, Long)].collect().toSet
    val fused = graft.queries.Breadth.q17SetOps(spark, dir)
      .as[(String, Long)].collect().toSet
    assert(fused == native)
  }
}
