package graft

import org.apache.spark.sql.functions._

import graft.ops.Skew

/** Salting must be result-transparent: identical output to the unsalted
  * operator on heavily skewed data. */
class SkewSpec extends SparkSpec {

  private lazy val skewed = {
    import spark.implicits._
    // 90% of rows share key 1
    (1 to 2000).map(i => (if (i <= 1800) 1L else (i % 50).toLong, i.toDouble))
      .toDF("k", "v")
  }
  private lazy val dim = {
    import spark.implicits._
    (0L to 60L).map(k => (k, s"name$k")).toDF("k", "name")
  }

  test("saltedJoin == plain join on skewed keys (inner and left)") {
    import spark.implicits._
    for (jt <- Seq("inner", "left")) {
      val plain = skewed.join(dim, Seq("k"), jt)
        .select($"k", $"v", $"name").as[(Long, Double, String)].collect().sorted.toSeq
      val salted = Skew.saltedJoin(skewed, dim, "k", saltFactor = 8, joinType = jt)
        .select($"k", $"v", $"name").as[(Long, Double, String)].collect().sorted.toSeq
      assert(salted == plain, s"join type $jt")
    }
  }

  test("saltedCountSum == plain groupBy count/sum, bit-identical doubles") {
    import spark.implicits._
    val plain = skewed.groupBy($"k")
      .agg(count(lit(1)).as("n"),
        sum($"v".cast(org.apache.spark.sql.types.DecimalType(18, 2))).cast("double").as("total"))
      .as[(Long, Long, Double)].collect().sortBy(_._1).toSeq
    val salted = Skew.saltedCountSum(skewed, "k", "v", saltFactor = 8)
      .as[(Long, Long, Double)].collect().sortBy(_._1).toSeq
    assert(salted == plain)
  }

  test("salted shuffle actually spreads the hot key") {
    import spark.implicits._
    val salts = skewed.withColumn("__salt",
      pmod(monotonically_increasing_id(), lit(8L)).cast("int"))
      .filter($"k" === 1L).select($"__salt").distinct().count()
    assert(salts > 1, "hot key must land in multiple salt sub-keys")
  }
}
