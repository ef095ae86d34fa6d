package graft

import graft.functions.Exprs

/** EP3 parity: the analytics surface as literal SQL over registered views
  * (S8), schema introspection (S9), and the custom functions registered into
  * the session FunctionRegistry. */
class SqlSurfaceSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("S8: registerAll exposes every table as a view; SQL == DataFrame result") {
    Tables.registerAll(spark, dir)
    val sql = spark.sql(
      """WITH cust_agg AS (
        |  SELECT c_nationkey,
        |    CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_cust_acctbal,
        |    COUNT(DISTINCT c_custkey) AS n_customers
        |  FROM customer GROUP BY c_nationkey)
        |SELECT n_nationkey AS nationkey, n_name AS nation_name, avg_cust_acctbal, n_customers
        |FROM cust_agg JOIN nation ON c_nationkey = n_nationkey
        |ORDER BY nationkey""".stripMargin).collect()
    val df = graft.queries.Analytics.goldPerNation(spark, dir)
      .selectExpr("nationkey", "nation_name", "avg_cust_acctbal", "n_customers")
      .orderBy("nationkey").collect()
    assert(sql.toSeq == df.toSeq)
  }

  test("S9: DESCRIBE on a registered view (schema introspection)") {
    Tables.registerAll(spark, dir)
    val desc = spark.sql("DESCRIBE lineitem").collect()
      .map(r => (r.getString(0), r.getString(1))).toMap
    assert(desc("l_quantity") == "double")
    assert(desc("l_returnflag") == "string")
    assert(desc.size >= 11)
  }

  test("custom expressions are callable from SQL after registerAll") {
    Exprs.registerAll(spark)
    Tables.registerAll(spark, dir)
    val r = spark.sql(
      """SELECT vec_id, cosine_sim(embedding, embedding) AS self_sim,
        |       dot_f(embedding, embedding) AS self_dot
        |FROM embeddings ORDER BY vec_id LIMIT 3""".stripMargin).collect()
    r.foreach { row =>
      assert(math.abs(row.getDouble(1) - 1.0) < 1e-9)
      assert(row.getDouble(2) > 0.0)
    }
    val lang = spark.sql(
      "SELECT lang_id('the cat and the dog in the house') AS l").collect().head.getString(0)
    assert(lang == "en")
    val sim = spark.sql(
      "SELECT simhash64(split('a b c d e', ' ')) AS h").collect().head.getLong(0)
    val sim2 = spark.sql(
      "SELECT simhash64(split('a b c d e', ' ')) AS h").collect().head.getLong(0)
    assert(sim == sim2)
  }

  test("custom expressions: interpreted eval equals codegen result") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val df = Seq(
      (Array(1.0f, 2.0f, 3.0f), Array(3.0f, 2.0f, 1.0f)),
      (Array(0.5f, -1.0f, 2.5f), Array(1.0f, 1.0f, 1.0f))).toDF("a", "b")
    val viaCodegen = df.select(Exprs.cosine_sim($"a", $"b").as("c")).collect().map(_.getDouble(0))
    // force interpreted path: wrap in a non-codegen context via RDD eval
    val rows = df.select($"a", $"b").collect()
    val viaEval = rows.map { r =>
      val toAd = (s: Seq[Float]) => new org.apache.spark.sql.catalyst.util.GenericArrayData(s.map(f => f: Any).toArray)
      graft.functions.Ops.cosine(toAd(r.getSeq[Float](0)), toAd(r.getSeq[Float](1)))
    }
    viaCodegen.zip(viaEval).foreach { case (c, e) => assert(c == e) }
  }
}
