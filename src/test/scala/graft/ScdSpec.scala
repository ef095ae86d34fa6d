package graft

import org.apache.spark.sql.functions._
import graft.ops.Scd

/** Behavior contract for SCD2 dimension maintenance ([[graft.ops.Scd]]) on
  * hand-built histories — every merge leg, null-safe change detection, and
  * idempotence. The x107 DuckDB oracle checks engine parity at corpus scale;
  * these pin the semantics on inputs small enough to enumerate. */
class ScdSpec extends SparkSpec {

  private def dim(rows: Seq[(Long, Option[Double], String, String, Option[String], Boolean)]) = {
    import spark.implicits._
    rows.toDF("k", "bal", "seg", "valid_from", "valid_to", "is_current")
  }
  private def upd(rows: Seq[(Long, Option[Double], String)]) = {
    import spark.implicits._
    rows.toDF("k", "bal", "seg")
  }
  private def merge(cur: org.apache.spark.sql.DataFrame, u: org.apache.spark.sql.DataFrame) =
    Scd.scd2Merge(cur, u, "k", Seq("bal", "seg"), "2024-06-01")
      .orderBy(col("k"), col("valid_from"))
      .collect()
      .map(r => (r.getLong(0), Option(r.get(1)), r.getString(2),
        r.getString(3), Option(r.getString(4)), r.getBoolean(5)))
      .toVector

  test("all four merge legs: change, idempotent redelivery, insert, passthrough") {
    val cur = dim(Seq(
      (1L, Some(10.0), "A", "2020-01-01", None, true),            // changed by update
      (2L, Some(20.0), "B", "2020-01-01", None, true),            // identical redelivery
      (3L, Some(30.0), "C", "2020-01-01", None, true)))           // no update
    val u = upd(Seq(
      (1L, Some(11.0), "A"),
      (2L, Some(20.0), "B"),
      (9L, Some(90.0), "Z")))                                     // brand-new key
    val out = merge(cur, u)
    assert(out == Vector(
      (1L, Some(10.0), "A", "2020-01-01", Some("2024-06-01"), false),
      (1L, Some(11.0), "A", "2024-06-01", None, true),
      (2L, Some(20.0), "B", "2020-01-01", None, true),
      (3L, Some(30.0), "C", "2020-01-01", None, true),
      (9L, Some(90.0), "Z", "2024-06-01", None, true)))
  }

  test("closed history rows pass through untouched and never re-open") {
    val cur = dim(Seq(
      (1L, Some(5.0), "A", "2018-01-01", Some("2020-01-01"), false),
      (1L, Some(10.0), "A", "2020-01-01", None, true)))
    val u = upd(Seq((1L, Some(10.0), "X")))                        // seg change only
    val out = merge(cur, u)
    assert(out == Vector(
      (1L, Some(5.0), "A", "2018-01-01", Some("2020-01-01"), false),
      (1L, Some(10.0), "A", "2020-01-01", Some("2024-06-01"), false),
      (1L, Some(10.0), "X", "2024-06-01", None, true)))
  }

  test("null-safe change detection: NULL→value and value→NULL both version") {
    val cur = dim(Seq(
      (1L, None, "A", "2020-01-01", None, true),
      (2L, Some(2.0), "B", "2020-01-01", None, true),
      (3L, None, "C", "2020-01-01", None, true)))
    val u = upd(Seq(
      (1L, Some(1.0), "A"),                                       // NULL → value
      (2L, None, "B"),                                            // value → NULL
      (3L, None, "C")))                                           // NULL == NULL: no-op
    val out = merge(cur, u)
    assert(out.count(_._6) == 3 && out.size == 5)
    assert(out.filter(_._1 == 3L) ==
      Vector((3L, None, "C", "2020-01-01", None, true)))
  }

  test("idempotence: re-merging the same batch is a no-op") {
    val cur = dim(Seq((1L, Some(10.0), "A", "2020-01-01", None, true)))
    val u = upd(Seq((1L, Some(11.0), "A")))
    val once = merge(cur, u)
    val cur2 = dim(once.map { case (k, b, s, vf, vt, ic) =>
      (k, b.map(_.asInstanceOf[Double]), s, vf, vt, ic) })
    assert(merge(cur2, u) == once)
  }

  test("empty update batch returns the history unchanged") {
    val cur = dim(Seq(
      (1L, Some(5.0), "A", "2018-01-01", Some("2020-01-01"), false),
      (1L, Some(10.0), "A", "2020-01-01", None, true)))
    val out = merge(cur, upd(Seq.empty))
    assert(out.size == 2 && out.count(_._6) == 1)
  }

  // -------------------------------------------------------- snapshot diff
  test("snapshotDiff: hand fixture — status counts and per-column drift, null-safe") {
    import spark.implicits._
    val old = Seq(
      (1L, Some("a"), Some(10L)), (2L, Some("b"), Some(20L)),
      (3L, Some("c"), Some(30L)), (4L, Some("d"), None),
      (5L, Some("e"), Some(50L))).toDF("k", "s", "v")
    val neu = Seq(
      (1L, Some("a"), Some(10L)),              // unchanged
      (3L, Some("c"), Some(31L)),              // v changed
      (4L, Some("d"), Some(40L)),              // v NULL → 40 (null-safe change)
      (5L, Option.empty[String], Some(50L)),   // s e → NULL
      (6L, Some("f"), Some(60L))).toDF("k", "s", "v") // added; 2 removed
    val out = graft.ops.Scd.snapshotDiff(old, neu, "k", Seq("s", "v"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out == Map("added" -> 1L, "removed" -> 1L, "changed" -> 3L,
      "unchanged" -> 1L, "col:s" -> 1L, "col:v" -> 2L))
  }

  test("snapshotDiff: NULL-key rows never match — removed+added on op AND oracle alike") {
    import spark.implicits._
    // identical NULL-key rows on both sides: equi-join null semantics say
    // they never match, so the old one is 'removed' and the new one
    // 'added'. The r8 advice found the SQL's key-nullness test calling the
    // OLD-side row 'added'; presence markers fixed it — pin op ≡ oracle.
    val old = Seq((Option(1L), "a", 1L), (Option.empty[Long], "x", 9L))
      .toDF("k", "s", "v")
    val neu = Seq((Option(1L), "a", 1L), (Option.empty[Long], "x", 9L))
      .toDF("k", "s", "v")
    val expect = Map("added" -> 1L, "removed" -> 1L, "changed" -> 0L,
      "unchanged" -> 1L, "col:s" -> 0L, "col:v" -> 0L)
    val got = graft.ops.Scd.snapshotDiff(old, neu, "k", Seq("s", "v"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == expect)
    // the generated oracle uses only ANSI constructs Spark SQL also runs —
    // execute it verbatim against the same fixture
    old.createOrReplaceTempView("sd_old")
    neu.createOrReplaceTempView("sd_new")
    val sql = graft.ops.Scd.snapshotDiffSql(
      "SELECT k, s, v FROM sd_old", "SELECT k, s, v FROM sd_new", Seq("s", "v"))
    val oracle = spark.sql(sql)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(oracle == expect)
  }
}
