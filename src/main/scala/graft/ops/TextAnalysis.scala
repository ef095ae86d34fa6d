package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.Exprs._

/** Text-analysis operators for corpus curation: token counting, quality
  * scoring, language id, fingerprinting. Everything except the custom
  * expressions is built-in-function composition, so the whole stage stays
  * in codegen and runs map-side (zero shuffle at any scale).
  */
object TextAnalysis {

  val Stopwords: Seq[String] =
    Seq("the", "a", "an", "of", "to", "in", "is", "and", "or", "for", "on", "with")

  /** Whitespace tokens. */
  def wsTokens(text: Column): Column = split(text, "\\s+")

  /** doc_id + token counts (whitespace and BPE-ish word-regex runs). */
  def tokenCounts(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(
      col(idCol),
      size(wsTokens(col(textCol))).as("n_ws_tokens"),
      size(expr(s"regexp_extract_all(lower($textCol), '[a-z0-9]+', 0)")).as("n_word_tokens"),
      length(col(textCol)).as("n_chars"))

  /** Heuristic quality features + a combined score:
    * length, punctuation ratio, stopword ratio, mean word length.
    * The score formula is arbitrary-but-documented; what matters is each
    * feature is a pure per-row expression (codegen, no shuffle). */
  def qualityScores(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val txt = col(textCol)
    val nChars = length(txt).cast("double")
    val nPunct = (length(txt) - length(regexp_replace(txt, "[.,;:!?'\"()-]", ""))).cast("double")
    val words = split(lower(txt), "\\s+")
    val nWords = size(words).cast("double")
    val nStop = size(filter(words, w => w.isin(Stopwords.map(x => x: Any): _*))).cast("double")
    val punctRatio = nPunct / nullif(nChars, lit(0.0))
    val stopRatio = nStop / nullif(nWords, lit(0.0))
    val meanWordLen = (nChars - (nWords - lit(1.0))) / nullif(nWords, lit(0.0))
    docs.select(
      col(idCol),
      nChars.as("n_chars"),
      punctRatio.as("punct_ratio"),
      stopRatio.as("stopword_ratio"),
      meanWordLen.as("mean_word_len"),
      (stopRatio * lit(2.0) + (lit(1.0) - punctRatio)).as("quality_score"))
  }

  /** Language id over the closed de/en/es/fr/zh set (custom expression,
    * char-n-gram marker heuristic), with agreement flag against a labeled
    * column when present. */
  def languageId(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(col(idCol), lang_id(col(textCol)).as("lang_pred"))

  /** Winnowing fingerprints (array<bigint>) + order-sensitive whole-doc hash. */
  def fingerprints(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(
      col(idCol),
      winnow_fingerprint(col(textCol), 8, 16).as("fingerprint"),
      xxhash64(col(textCol)).as("content_hash"))
}
