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

  test("deletion-neighborhood fuzzy pairs == brute-force levenshtein <= 1 on planted names") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // variable lengths; substitution, insertion, deletion, equality, and
    // near-misses (ed = 2) that deletion blocking must candidate but reject
    val names = Seq(
      1L -> "alpha", 2L -> "alpja",      // substitution
      3L -> "beta", 4L -> "betas",       // insertion at end
      5L -> "gamma", 6L -> "gama",       // deletion mid-string
      7L -> "x", 8L -> "xy", 9L -> "y",  // short strings: x~xy, xy~y, x~y(sub)
      10L -> "delta", 11L -> "dalte",    // ed=2 — must NOT match
      12L -> "epsilon", 13L -> "epsilon" // exact duplicates
    ).toDF("k", "name")
    val got = graft.queries.Breadth.editDistanceOnePairs(names)
      .as[(Long, Long, Int)].collect().toSet
    val rows = names.as[(Long, String)].collect()
    val want = (for {
      (ka, na) <- rows; (kb, nb) <- rows if ka < kb
      d = {
        // tiny reference levenshtein
        val dp = Array.tabulate(na.length + 1, nb.length + 1) { (i, j) =>
          if (i == 0) j else if (j == 0) i else 0 }
        for (i <- 1 to na.length; j <- 1 to nb.length)
          dp(i)(j) = math.min(math.min(dp(i - 1)(j) + 1, dp(i)(j - 1) + 1),
            dp(i - 1)(j - 1) + (if (na(i - 1) == nb(j - 1)) 0 else 1))
        dp(na.length)(nb.length)
      } if d <= 1
    } yield (ka, kb, d)).toSet
    assert(got == want, s"got=$got want=$want")
  }
}
