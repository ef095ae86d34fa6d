package graft

import java.nio.file.{Files, Paths, StandardCopyOption}

import graft.queries.Viewer

/** EP3 viewer surface over the fixture-built gold table. */
class ViewerSpec extends SparkSpec {

  private lazy val gold = {
    val dir = Files.createTempDirectory("graft-viewer").toString
    val date = "2024-01-15"
    def copy(rel: String): Unit = {
      val src = Paths.get(resourcePath(rel))
      val dst = Paths.get(s"$dir/$rel")
      Files.createDirectories(dst.getParent)
      Files.copy(src, dst, StandardCopyOption.REPLACE_EXISTING)
    }
    copy(s"bronze/housing_affordability/ingest_date=$date/housing2019-23.csv")
    copy(s"bronze/special_education/ingest_date=$date/special_education2022-23.csv")
    TestXlsx.writeSchoolFixture(new java.io.File(
      s"$dir/bronze/school_performance/ingest_date=$date/school_performance.xlsx"))
    val pipe = new Pipeline(spark, dir, date)
    val (h, s, sp) = pipe.buildSilverFrames()
    graft.gold.Gold.buildLeaJoinedGold(h, s, sp)
  }

  test("viewer queries: schema dump, sample, three top-1s, rank-sum best") {
    val qs = Viewer.queries(spark, gold)
    assert(qs.keySet == Set("describe", "sample", "most_affordable",
      "best_ccrpi", "most_inclusive", "overall_best"))
    assert(qs("describe").collect().map(_.getString(0)).contains("ccrpi_score_2023_mean"))
    assert(qs("sample").count() == 5) // all 5 gold rows (< LIMIT 10)
    // most affordable: lowest non-null cost-burden pct among gold counties
    val aff = qs("most_affordable").collect().head
    assert(aff.getString(0) == "cobb") // cobb has the lowest burden pct in the fixture
    val best = qs("best_ccrpi").collect().head
    assert(best.getString(0) == "dekalb" && best.getDouble(2) == 90.25)
    val overall = qs("overall_best").collect().head
    assert(overall.getInt(2) >= 3) // sum of three ranks, each ≥ 1
  }
}
