package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Corpus curation: sampling, per-source caps, and the composed
  * quality→language→dedup→cap pipeline a training-data run executes.
  *
  * Scale notes: per-group caps are a window row_number over the group key —
  * one shuffle, and with a LIMIT-like pushdown effect (rows beyond the cap
  * drop before any downstream stage). Sampling is seed-deterministic and
  * map-side.
  */
object Curation {

  /** Deterministic uniform sample (seeded Bernoulli — map-side, no shuffle). */
  def uniformSample(df: DataFrame, fraction: Double, seed: Long = 42L): DataFrame =
    df.sample(withReplacement = false, fraction, seed)

  /** Deterministic stratified sample: per-stratum fractions (sampleBy). */
  def stratifiedSample(df: DataFrame, stratumCol: String,
      fractions: Map[String, Double], seed: Long = 42L): DataFrame =
    df.stat.sampleBy(stratumCol, fractions, seed)

  /** Keep at most `n` rows per group, by ascending `orderCol` — the standard
    * per-domain/per-source cap. Deterministic (orderCol must be unique per
    * group for exact reproducibility). */
  def perGroupCap(df: DataFrame, groupCol: String, orderCol: String, n: Int): DataFrame = {
    val w = Window.partitionBy(col(groupCol)).orderBy(col(orderCol))
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= n)
      .drop("__rn")
  }

  /** Curation report row counts per stage. */
  case class CurationStats(input: Long, afterQuality: Long, afterLang: Long,
      afterDedup: Long, afterCap: Long)

  /** The composed training-data curation flow over a documents table:
    *  1. quality gate (stopword ratio ≥ min, mean word length in range)
    *  2. language allow-list (heuristic lang-id)
    *  3. exact + MinHash near-dup removal (keep-lowest-id)
    *  4. per-source cap
    * Returns (curated corpus, per-stage counts). Every stage is a DataFrame
    * transform; the stats actions are the only materializations. */
  def curate(
      docs: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text",
      sourceCol: String = "source",
      minStopRatio: Double = 0.0,
      maxMeanWordLen: Double = 20.0,
      allowedLangs: Seq[String] = Seq("en", "de", "es", "fr", "zh"),
      maxPerSource: Int = 1000): (DataFrame, CurationStats) = {
    val input = docs.count()

    val quality = TextAnalysis.qualityScores(docs, idCol, textCol)
      .filter(col("stopword_ratio") >= minStopRatio &&
        col("mean_word_len") <= maxMeanWordLen)
      .select(col(idCol))
    val afterQualityDf = docs.join(quality, Seq(idCol), "left_semi")
    val afterQuality = afterQualityDf.count()

    val langOk = TextAnalysis.languageId(afterQualityDf, idCol, textCol)
      .filter(col("lang_pred").isin(allowedLangs.map(x => x: Any): _*))
      .select(col(idCol))
    val afterLangDf = afterQualityDf.join(langOk, Seq(idCol), "left_semi")
    val afterLang = afterLangDf.count()

    val exactDeduped = Dedup.exactDedup(afterLangDf, idCol, textCol)
    val nearDeduped = Dedup.minhashDedup(exactDeduped, idCol, textCol)
    val afterDedup = nearDeduped.count()

    val capped = perGroupCap(nearDeduped, sourceCol, idCol, maxPerSource)
    val afterCap = capped.count()

    (capped, CurationStats(input, afterQuality, afterLang, afterDedup, afterCap))
  }
}
