package graft

import org.apache.spark.sql.functions._

import graft.ops.Curation

/** Curation ops: deterministic sampling, per-group caps, and the composed
  * pipeline's stage accounting. */
class CurationSpec extends SparkSpec {

  private lazy val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")

  test("uniform sample is seed-deterministic and near the target fraction") {
    val a = Curation.uniformSample(docs, 0.3).select("doc_id").collect().map(_.getLong(0)).toSet
    val b = Curation.uniformSample(docs, 0.3).select("doc_id").collect().map(_.getLong(0)).toSet
    assert(a == b)
    val frac = a.size.toDouble / docs.count()
    assert(frac > 0.15 && frac < 0.45, s"fraction $frac")
  }

  test("stratified sample respects per-stratum fractions") {
    import spark.implicits._
    val sampled = Curation.stratifiedSample(docs, "lang",
      Map("en" -> 0.5, "de" -> 0.1, "es" -> 0.0, "fr" -> 0.0, "zh" -> 0.0))
    val counts = sampled.groupBy($"lang").count().as[(String, Long)].collect().toMap
    assert(!counts.contains("es") && !counts.contains("fr") && !counts.contains("zh"))
    val enTotal = docs.filter($"lang" === "en").count()
    assert(counts.getOrElse("en", 0L) > enTotal / 5 && counts("en") < enTotal)
  }

  test("perGroupCap keeps at most n per group, lowest ids first") {
    import spark.implicits._
    val capped = Curation.perGroupCap(docs, "source", "doc_id", 5)
    val bySource = capped.groupBy($"source").count().as[(String, Long)].collect()
    assert(bySource.forall(_._2 <= 5))
    // keep-first: each source's kept ids are its 5 smallest
    val keptIds = capped.select($"source", $"doc_id").as[(String, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted.toSeq).toMap
    val allIds = docs.select($"source", $"doc_id").as[(String, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted.take(5).toSeq).toMap
    assert(keptIds == allIds)
  }

  test("curate: stages are monotonically decreasing and report is consistent") {
    val (curated, stats) = Curation.curate(docs, maxPerSource = 10)
    assert(stats.input == docs.count())
    assert(stats.afterQuality <= stats.input)
    assert(stats.afterLang <= stats.afterQuality)
    assert(stats.afterDedup <= stats.afterLang)
    assert(stats.afterCap <= stats.afterDedup)
    assert(curated.count() == stats.afterCap)
    assert(stats.afterCap > 0)
    // cap actually binds per source
    import spark.implicits._
    assert(curated.groupBy($"source").count().as[(String, Long)].collect().forall(_._2 <= 10))
  }
}
