package graft

import java.sql.Timestamp

import graft.ops.EventAnalytics

class EventAnalyticsSpec extends SparkSpec {
  private def ts(min: Int): Timestamp = new Timestamp(1704067200000L + min * 60000L)

  test("conversionFunnel: strict event-time progression per stage") {
    import spark.implicits._
    val events = Seq(
      // user 1: full funnel in order → counts at every stage
      (1L, "view", ts(0)), (1L, "click", ts(5)), (1L, "purchase", ts(10)),
      // user 2: view then click, no purchase → stages 0,1
      (2L, "view", ts(0)), (2L, "click", ts(1)),
      // user 3: purchase BEFORE view — logged out of order → stage 0 only
      (3L, "purchase", ts(0)), (3L, "view", ts(5)), (3L, "click", ts(6)),
      // user 4: click only, never viewed → no stage at all
      (4L, "click", ts(0)),
      // user 5: view and click at the SAME instant — strict < fails → stage 0
      (5L, "view", ts(7)), (5L, "click", ts(7))
    ).toDF("user_id", "event_type", "ts")
    val out = EventAnalytics.conversionFunnel(events, "user_id", "event_type", "ts",
      Seq("view", "click", "purchase"))
      .orderBy("stage_idx")
      .collect().map(r => (r.getInt(0), r.getString(1), r.getLong(2))).toSeq
    // user 3 clicks after view (stage 1) but its purchase precedes both
    assert(out == Seq((0, "view", 4L), (1, "click", 3L), (2, "purchase", 1L)))
  }

  test("retentionCohorts: epoch-week cohorts, offset 0 is cohort size") {
    import spark.implicits._
    def wk(weeks: Int, min: Int): Timestamp =
      new Timestamp((1704067200L + weeks * 604800L) * 1000L + min * 60000L)
    // epoch week of 2024-01-01 00:00 UTC: 1704067200 / 604800 = 2817 (floor)
    val base = 1704067200L / 604800L
    val events = Seq(
      (1L, wk(0, 0)), (1L, wk(1, 0)), (1L, wk(1, 5)), (1L, wk(3, 0)),
      (2L, wk(0, 10)), (2L, wk(0, 20)),
      (3L, wk(1, 0)), (3L, wk(2, 0))
    ).toDF("user_id", "ts")
    val out = EventAnalytics.retentionCohorts(events, "user_id", "ts")
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(out == Map(
      (base, 0L) -> 2L,     // users 1,2 first seen week 0
      (base, 1L) -> 1L,     // user 1 active week 1
      (base, 3L) -> 1L,     // user 1 active week 3
      (base + 1, 0L) -> 1L, // user 3 first seen week 1
      (base + 1, 1L) -> 1L))
  }

  test("eventTransitions: per-user lag pairs, first event excluded, id tiebreak") {
    import spark.implicits._
    val events = Seq(
      (1L, "view", ts(0), 1L), (1L, "click", ts(1), 2L), (1L, "view", ts(2), 3L),
      (2L, "view", ts(0), 4L), (2L, "click", ts(1), 5L),
      // user 3: two events at the SAME instant — id order decides the pair
      (3L, "b_type", ts(0), 7L), (3L, "a_type", ts(0), 6L)
    ).toDF("user_id", "event_type", "ts", "event_id")
    val out = EventAnalytics.eventTransitions(events, "user_id", "event_type", "ts", "event_id")
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(out == Map(
      ("view", "click") -> 2L,      // users 1 and 2
      ("click", "view") -> 1L,      // user 1
      ("a_type", "b_type") -> 1L))  // user 3: id 6 before id 7
  }

  test("gapFillHourly: zero-filled grid spans the observed hour range per group") {
    import spark.implicits._
    def hr(h: Int, min: Int = 0): Timestamp =
      new Timestamp(1704067200000L + h * 3600000L + min * 60000L)
    val base = 1704067200L / 3600L // epoch-hour of 2024-01-01 00:00 UTC
    val events = Seq(
      ("a", hr(0)), ("a", hr(0, 30)), ("a", hr(3)), // a: hours 0 and 3, gap 1-2
      ("b", hr(1))                                  // b: hour 1 only
    ).toDF("event_type", "ts")
    val out = EventAnalytics.gapFillHourly(events, "event_type", "ts")
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    // global range is hours 0..3 — BOTH groups get the full dense grid
    assert(out == Map(
      ("a", base + 0) -> 2L, ("a", base + 1) -> 0L, ("a", base + 2) -> 0L, ("a", base + 3) -> 1L,
      ("b", base + 0) -> 0L, ("b", base + 1) -> 1L, ("b", base + 2) -> 0L, ("b", base + 3) -> 0L))
  }

  test("snapshotDiff: inserted/deleted/changed tagged, unchanged suppressed, null-safe") {
    import spark.implicits._
    import graft.io.Lake
    val old = Seq((1L, Some(10.0)), (2L, Some(20.0)), (3L, Some(30.0)), (4L, None))
      .toDF("k", "v")
    val neu = Seq((1L, Some(10.0)), (2L, Some(21.0)), (4L, None), (5L, Some(50.0)))
      .toDF("k", "v") // 1 unchanged, 2 changed, 3 deleted, 4 null==null unchanged, 5 inserted
    val out = Lake.snapshotDiff(old, neu, "k", Seq("v"))
      .orderBy("k")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(out == Seq((2L, "changed"), (3L, "deleted"), (5L, "inserted")))
  }

  test("keywordSearch: coordination rank, tf tiebreak, id tiebreak, top-k") {
    import spark.implicits._
    import graft.ops.Similarity
    val docs = Seq(
      (1L, "alpha beta alpha"),   // both terms → (2, tf 3)
      (2L, "alpha beta gamma"),   // both terms → (2, tf 2)
      (3L, "beta beta beta"),     // beta only → (1, tf 3)
      (4L, "delta only here"),    // no match — excluded
      (5L, "alpha beta alpha beta") // (2, tf 4) → best
    ).toDF("doc_id", "text")
    val out = Similarity.keywordSearch(docs, "doc_id", "text",
      Seq("alpha", "beta"), k = 3)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2))).toSeq
    // k=3 cuts doc 3 (fewer matched terms than any 2-term doc)
    assert(out == Seq((5L, 2, 4), (1L, 2, 3), (2L, 2, 2)))
    // zero-shuffle contract: scan → filter → TakeOrdered, no Exchange needed
    val plan = Similarity.keywordSearch(docs, "doc_id", "text", Seq("alpha"), 2)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), s"expected top-k operator:\n$plan")
  }

  test("bm25Search: hand-computed scores, rank order, non-matchers excluded") {
    import spark.implicits._
    import graft.ops.Similarity
    val docs = Seq(
      (1L, "alpha beta alpha"),      // len 3, tf(alpha)=2 tf(beta)=1
      (2L, "alpha gamma delta"),     // len 3, tf(alpha)=1
      (3L, "beta beta beta beta"),   // len 4, tf(beta)=4
      (4L, "zeta eta")               // no match — excluded
    ).toDF("doc_id", "text")
    val out = Similarity.bm25Search(docs, "doc_id", "text",
      Seq("alpha", "beta"), k = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    // N=4, avgdl=3, df(alpha)=df(beta)=2 → idf = ln(1 + 2.5/2.5) = ln 2.
    // doc1 norm=1.2: 2·2.2/3.2 + 1·2.2/2.2 = 2.375·ln2
    // doc3 norm=1.5: 4·2.2/5.5 = 1.6·ln2 ; doc2: 1.0·ln2
    val ln2 = math.log(2.0)
    assert(out.map(_._1) == Seq(1L, 3L, 2L))
    assert(out.map(_._2) == Seq(2L, 1L, 1L))
    val expected = Seq(2.375 * ln2, 1.6 * ln2, 1.0 * ln2)
    out.map(_._3).zip(expected).foreach { case (got, want) =>
      assert(math.abs(got - want) < 1e-12, s"score $got vs $want")
    }
    // global top-k must be TakeOrderedAndProject, not a full sort
    val plan = Similarity.bm25Search(docs, "doc_id", "text", Seq("alpha"), 2)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), s"expected top-k operator:\n$plan")
  }

  test("rateLimit: first N per user-hour, hour rollover resets, ts-then-id tiebreak") {
    import spark.implicits._
    def ts(m: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 10:$m%02d:00")
    val events = Seq(
      (1L, 7L, ts(0)), (2L, 7L, ts(1)), (3L, 7L, ts(2)), (4L, 7L, ts(3)), // 4th dropped
      (5L, 7L, java.sql.Timestamp.valueOf("2024-01-01 11:00:00")), // new hour → kept
      (6L, 8L, ts(5)), (7L, 8L, ts(5)), (8L, 8L, ts(5)), (9L, 8L, ts(5)) // equal ts → id order
    ).toDF("event_id", "user_id", "ts")
    val kept = EventAnalytics.rateLimit(events, "user_id", "ts", "event_id", maxPerHour = 3)
      .select($"event_id").collect().map(_.getLong(0)).sorted.toSeq
    assert(kept == Seq(1L, 2L, 3L, 5L, 6L, 7L, 8L))
  }

  test("attributionReport: first/last/linear credits, lookback exclusion, empty-touch conversions") {
    import spark.implicits._
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val events = Seq(
      // u1: view then click then TWO purchases — both convs see the same
      // two touches (no reset between conversions, by design): first=view,
      // last=click, linear 500000 each, twice
      (1L, 1L, "view", ts("2024-01-01 00:00:01")),
      (2L, 1L, "click", ts("2024-01-01 00:00:02")),
      (3L, 1L, "purchase", ts("2024-01-01 00:00:03")),
      (4L, 1L, "purchase", ts("2024-01-01 00:00:05")),
      (5L, 1L, "error", ts("2024-01-01 02:00:00")),   // after both convs → no credit
      // u4: click a day before the purchase — outside the 1h lookback
      (6L, 4L, "click", ts("2024-01-01 00:00:00")),
      (7L, 4L, "purchase", ts("2024-01-02 00:00:00")),
      // u5: conversion with no touches at all
      (8L, 5L, "purchase", ts("2024-01-01 00:00:00"))).toDF("event_id", "user_id", "et", "ts")
    val out = EventAnalytics.attributionReport(events, "user_id", "event_id",
      "et", "ts", convType = "purchase", lookbackUs = 3600L * 1000000L)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out.toSeq == Seq(
      ("click", 0L, 2L, 1000000L),
      ("view", 2L, 0L, 1000000L)))
  }
}
