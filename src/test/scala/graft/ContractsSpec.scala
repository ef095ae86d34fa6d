package graft

import org.apache.spark.sql.functions._
import graft.ops.{Contracts, Stats}

/** Contract-validation and privacy-audit contracts on DIRTY fixtures —
  * the oracled x135/x136 run on clean synthetic data where every check
  * passes; these pin the violation ARITHMETIC. */
class ContractsSpec extends SparkSpec {

  test("contract report counts each violation class exactly on a dirty fixture") {
    import spark.implicits._
    val parent = Seq(1L, 2L, 3L).toDF("pk")
    val child = Seq(
      (1L, Some(1L), 5.0, "A"),   // clean
      (1L, Some(2L), 5.0, "A"),   // duplicate key with row 1 (both count)
      (2L, None, 5.0, "B"),       // null fk
      (3L, Some(99L), 5.0, "A"),  // orphan fk
      (4L, Some(3L), -1.0, "A"),  // range violation
      (5L, Some(3L), 5.0, "Z"))   // domain violation
      .toDF("id", "fk", "v", "cat")
    val rep = Contracts.report(Seq(
      "id_unique" -> Contracts.unique(child, "id"),
      "fk_not_null" -> Contracts.notNull(child, "fk"),
      "fk_referential" -> Contracts.referential(child, "fk", parent, "pk"),
      "v_range" -> Contracts.range(child, "v", 0.0, 10.0),
      "cat_domain" -> Contracts.domain(child, "cat", Seq("A", "B"))))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getBoolean(2))).toMap
    assert(rep("id_unique") == ((2L, false)))      // both copies of id=1
    assert(rep("fk_not_null") == ((1L, false)))
    assert(rep("fk_referential") == ((1L, false))) // NULL fk is NOT an orphan
    assert(rep("v_range") == ((1L, false)))
    assert(rep("cat_domain") == ((1L, false)))
    // report is ordered by name
    val names = Contracts.report(Seq(
      "b" -> Contracts.notNull(child, "fk"), "a" -> Contracts.notNull(child, "fk")))
      .collect().map(_.getString(0)).toSeq
    assert(names == Seq("a", "b"))
  }

  test("kAnonymity: hand-built classes, k and at-risk rows exact") {
    import spark.implicits._
    // classes: (US,M)→3 rows, (US,F)→1 row, (DE,M)→2 rows
    val df = Seq(("US", "M"), ("US", "M"), ("US", "M"), ("US", "F"),
      ("DE", "M"), ("DE", "M")).toDF("country", "sex")
    val out = Stats.kAnonymity(df, Seq("country", "sex"), k = 3L).collect()(0)
    assert(out.getAs[Long]("n_rows") == 6L)
    assert(out.getAs[Long]("n_classes") == 3L)
    assert(out.getAs[Long]("k_anonymity") == 1L)
    assert(out.getAs[Long]("n_violating_classes") == 2L) // sizes 1 and 2 < 3
    assert(out.getAs[Long]("n_rows_at_risk") == 3L)
  }

  test("seasonalResiduals: weekday means subtract exactly") {
    import spark.implicits._
    // two Mondays (counts 2 and 4 → mean 3) and one Tuesday (count 5)
    def ev(day: String, n: Int) = (1 to n).map(i =>
      ("t", java.sql.Timestamp.valueOf(s"$day 10:00:0${i % 10}")))
    val df = (ev("2024-01-01", 2) ++ ev("2024-01-08", 4) ++ ev("2024-01-02", 5))
      .toDF("g", "ts")
    val out = Stats.seasonalResiduals(df, "g", "ts")
      .collect().map(r => r.getAs[java.sql.Date]("day").toString ->
        r.getAs[Long]("resid_ppm")).toMap
    assert(out("2024-01-01") == -1000000L) // 2 - 3 per day
    assert(out("2024-01-08") == 1000000L)
    assert(out("2024-01-02") == 0L)        // sole Tuesday = its own mean
  }
}
