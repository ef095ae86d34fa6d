package graft

import org.apache.spark.sql.functions._
import graft.ops.{Curation, SharedViews, TextAnalysis}

/** Novelty / vocabulary-growth / char-class / language-mix operators, and
  * the session-scoped SharedViews materialization. */
class CorpusGrowthSpec extends SparkSpec {

  test("shingleNovelty: exact copy scores 0, first doc 1, partial overlap exact") {
    import spark.implicits._
    val docs = Seq(
      (1L, "a b c d e"),     // shingles: abc bcd cde — all first here
      (2L, "a b c d e"),     // exact copy → nothing novel
      (3L, "a b c x y z")).toDF("doc_id", "text") // abc seen; bcx cxy xyz novel
    val out = TextAnalysis.shingleNovelty(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(out(1L) == ((3L, 3L, 1.0)))
    assert(out(2L) == ((3L, 0L, 0.0)))
    assert(out(3L) == ((4L, 3L, 0.75)))
  }

  test("charClassProfile: exact class counts and Simpson index") {
    import spark.implicits._
    val docs = Seq(
      (1L, "ab 12!"),  // 2 letters, 2 digits, 1 space, 1 punct, 0 other; n=6
      (2L, ""),        // empty → NULL simpson
      (3L, "@@@@")).toDF("doc_id", "text") // 4 other → simpson 1.0
    val rows = TextAnalysis.charClassProfile(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r).toMap
    val r1 = rows(1L)
    assert((r1.getInt(1), r1.getInt(2), r1.getInt(3), r1.getInt(4), r1.getInt(5), r1.getInt(6)) ==
      ((6, 2, 2, 1, 1, 0)))
    assert(r1.getDouble(7) == (4.0 + 4.0 + 1.0 + 1.0 + 0.0) / 36.0)
    assert(rows(2L).isNullAt(7))
    assert(rows(3L).getDouble(7) == 1.0)
  }

  test("vocabGrowthBuckets: new types land in the first-occurrence bucket, cumulative is exact") {
    import spark.implicits._
    // maxId = 9, buckets = 10 → bucket == doc_id
    val docs = Seq(
      (0L, "a b"),  // types a,b new; shingle "a b" new
      (4L, "a c"),  // c new; shingle "a c" new
      (9L, "a b")).toDF("doc_id", "text") // nothing new
    val out = TextAnalysis.vocabGrowthBuckets(docs, "doc_id", "text", buckets = 10)
      .orderBy($"bucket").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(out.toSeq == Seq((0L, 2L, 1L, 2L, 1L), (4L, 1L, 1L, 3L, 2L)))
  }

  test("temperatureLangMix: sqrt weights with exact rational token counts") {
    import spark.implicits._
    val docs = Seq(
      ("en", "w w w w w w w w w"), // 9 tokens → sqrt 3
      ("fr", "w w w w")).toDF("lang", "text") // 4 tokens → sqrt 2
    val out = Curation.temperatureLangMix(docs, "lang", "text")
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(out("en") == ((1L, 9L, 3.0 / 5.0)))
    assert(out("fr") == ((1L, 4L, 2.0 / 5.0)))
  }

  test("SharedViews.materialized builds once per (session, tag)") {
    import spark.implicits._
    var builds = 0
    def build() = { builds += 1; Seq((1L, 2L)).toDF("a", "b") }
    val first = SharedViews.materialized(spark, "corpusgrowthspec/tag1")(build())
    val again = SharedViews.materialized(spark, "corpusgrowthspec/tag1")(build())
    val other = SharedViews.materialized(spark, "corpusgrowthspec/tag2")(build())
    assert(builds == 2) // tag1 built once, tag2 once
    assert(first eq again) // the SAME checkpointed frame, not an equal copy
    assert(first.collect().toSeq == other.collect().toSeq)
  }
}
