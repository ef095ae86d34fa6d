package graft

import org.apache.spark.sql.SparkSession

/** GraftExtensions must install the function surface on a freshly built
  * session (the spark.sql.extensions deployment path). */
class ExtensionsInstallSpec extends SparkSpec {

  test("withExtensions session resolves graft functions from SQL") {
    val old = spark // ensure the shared context exists first
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      val s2 = SparkSession.builder()
        .master("local[2]")
        .withExtensions(new GraftExtensions)
        .getOrCreate()
      val r = s2.sql(
        """SELECT cosine_sim(array(CAST(1.0 AS FLOAT), CAST(0.0 AS FLOAT)),
          |                  array(CAST(1.0 AS FLOAT), CAST(0.0 AS FLOAT))) AS c,
          |       lang_id('the cat and the dog') AS l,
          |       simhash64(array('a','b')) AS h""".stripMargin).collect().head
      assert(math.abs(r.getDouble(0) - 1.0) < 1e-12)
      assert(r.getString(1) == "en")
      // a child session inherits the injected functions (catalog-level)
      val child = s2.newSession()
      val c = child.sql("SELECT dot_f(array(CAST(2.0 AS FLOAT)), array(CAST(3.0 AS FLOAT))) AS d")
        .collect().head.getDouble(0)
      assert(c == 6.0)
      // round-8 additions: hashing/LSH surface reachable from SQL
      val r8 = child.sql(
        """SELECT smix64(42) AS s,
          |       size(minhash_sig(array('a','b','c','d'))) AS m,
          |       size(band_hashes(minhash_sig(array('a','b','c','d')))) AS b,
          |       size(winnow_fingerprint('abcdefghijklmnopqrstuvwxyz')) AS w""".stripMargin)
        .collect().head
      assert(r8.getLong(0) == graft.functions.Ops.splitmix64(42L))
      assert(r8.getInt(1) == 16 && r8.getInt(2) == 16 && r8.getInt(3) >= 1)
    } finally {
      SparkSession.setDefaultSession(old)
      SparkSession.setActiveSession(old)
    }
  }
}
