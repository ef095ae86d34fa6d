package graft.gold

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** County-name normalization — SURVEY.md §2.2 P10.
  *
  * Reference semantics (`/root/reference/silver_to_gold.py:15-36`):
  *   1. strip a trailing ", Georgia" (case-insensitive, optional spaces)
  *   2. strip a trailing " County" word (case-insensitive)
  *   3. trim whitespace
  *   4. lowercase
  *   5. empty or null input → NULL
  *
  * Implemented as pure built-in expression composition (regexp_replace /
  * trim / lower / nullif), so it stays inside whole-stage codegen — no UDF,
  * no custom Expression needed (SURVEY.md §7.2).
  */
object Normalize {
  // Inline (?i) flags work in both Java regex (Spark) and RE2 (DuckDB),
  // which keeps the oracle SQL bit-identical to this Column expression.
  // Both patterns are UNanchored with \b, exactly as the reference's
  // compiled regexes (silver_to_gold.py:15-16).
  val StripGeorgia = "(?i),\\s*georgia\\b"
  val StripCounty  = "(?i)\\s+county\\b"

  /** Reference op order matters: strip() FIRST (silver_to_gold.py:28), then
    * the two subs, then strip again — a leading " County" must survive
    * (no preceding whitespace once trimmed), which regex-before-trim would
    * wrongly remove. Caught by the property sweep in NormalizeSpec. */
  def normalizeCounty(c: Column): Column =
    nullif(
      lower(trim(regexp_replace(regexp_replace(trim(c), StripGeorgia, ""), StripCounty, ""))),
      lit(""))

  /** The same expression as DuckDB SQL text, for oracle parity.
    * DuckDB's regexp_replace is first-match-only by default, so pass the 'g'
    * flag to mirror Spark's (and Python re.sub's) replace-all semantics. */
  def normalizeCountySql(expr: String): String =
    s"nullif(lower(trim(regexp_replace(regexp_replace(trim($expr), '(?i),\\s*georgia\\b', '', 'g'), '(?i)\\s+county\\b', '', 'g'))), '')"
}
