package graft

import graft.gold.Normalize

/** P10 county normalizer — reference parity (silver_to_gold.py:19-36) +
  * seeded property-style sweeps (SURVEY.md §5; scalatest+scalacheck only in
  * the cache, no scalatestplus bridge, so the sweeps are hand-seeded). */
class NormalizeSpec extends SparkSpec {

  private def norm(values: String*): Seq[Option[String]] = {
    import spark.implicits._
    values.toDF("v").select(Normalize.normalizeCounty($"v")).collect()
      .map(r => Option(r.getString(0))).toSeq
  }

  test("reference cases: state suffix, county word, trim, lowercase") {
    assert(norm("Fulton County, Georgia") == Seq(Some("fulton")))
    assert(norm("  DeKalb County  ") == Seq(Some("dekalb")))
    assert(norm("Atlanta City") == Seq(Some("atlanta city")))
    assert(norm("COBB COUNTY, GEORGIA") == Seq(Some("cobb")))
    assert(norm("Fulton, Georgia") == Seq(Some("fulton")))
  }

  test("empty and null → NULL (reference returns None)") {
    assert(norm("") == Seq(None))
    assert(norm("   ") == Seq(None))
    assert(norm(", Georgia") == Seq(None))
    // leading " County" survives the strip-after-trim order: input is trimmed
    // to "County" first, and the \s+county pattern then has no whitespace to
    // anchor on — reference behavior (strip at silver_to_gold.py:28)
    assert(norm(" County") == Seq(Some("county")))
    import spark.implicits._
    val r = Seq[Option[String]](None).toDF("v")
      .select(Normalize.normalizeCounty($"v")).collect()
    assert(r.head.isNullAt(0))
  }

  test("unanchored state regex matches mid-string, as the reference's re.sub") {
    // ",\s*georgia\b" is not end-anchored in the reference
    assert(norm("Fulton County, Georgia Extra") == Seq(Some("fulton extra")))
  }

  /** Direct Scala port of the reference's `_normalize_county_name`
    * (silver_to_gold.py:19-36) — the property oracle. (Note the function is
    * NOT idempotent: "x , county georgia" → "x , georgia" → "x"; the county
    * strip can create a new state-suffix adjacency. We mirror, not "fix".) */
  private def referenceNormalize(v: String): Option[String] = {
    if (v == null) return None
    var s = v.trim
    if (s.isEmpty) return None
    s = s.replaceAll("(?i),\\s*georgia\\b", "")
    s = s.replaceAll("(?i)\\s+county\\b", "")
    s = s.trim
    if (s.isEmpty) None else Some(s.toLowerCase)
  }

  test("property: matches a direct port of the reference normalizer") {
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    val vocab = Seq("Fulton", "County", "Georgia", "city", "COUNTY", "", " ", ",", "x")
    val inputs = Seq.fill(400)(Seq.fill(6)(vocab(rnd.nextInt(vocab.size))).mkString(" "))
    val outs = inputs.toDF("v")
      .select(Normalize.normalizeCounty($"v").as("n")).collect()
      .map(r => if (r.isNullAt(0)) None else Some(r.getString(0))).toSeq
    val expected = inputs.map(referenceNormalize)
    outs.zip(expected).zip(inputs).foreach { case ((got, want), in) =>
      assert(got == want, s"input='$in'")
    }
    outs.flatten.foreach(n => assert(n == n.trim && n == n.toLowerCase && n.nonEmpty))
  }

  test("property: guarded division never yields Infinity") {
    import spark.implicits._
    import graft.clean.Silver
    val rnd = new scala.util.Random(7)
    val rows = Seq.fill(300)((rnd.nextDouble() * 2e6 - 1e6,
      if (rnd.nextInt(4) == 0) 0.0 else rnd.nextDouble() * 20 - 10))
    val out = rows.toDF("num", "den")
      .select(Silver.guardedPct($"num", $"den").as("pct")).collect()
    assert(out.exists(_.isNullAt(0)), "zero denominators must appear and yield NULL")
    out.foreach { r =>
      if (!r.isNullAt(0)) assert(!r.getDouble(0).isInfinite && !r.getDouble(0).isNaN)
    }
  }
}
