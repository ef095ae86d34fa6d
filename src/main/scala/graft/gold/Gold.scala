package graft.gold

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Gold build — the reference's `build_lea_joined_gold`
  * (`silver_to_gold.py:39-84`): A1 rollup + J1 left join + J2 keep-first
  * dedup + J3 inner join, with the two pandas semantic traps handled
  * explicitly (SURVEY.md §7.3 items 1–2).
  */
object Gold {

  /** LEA-level school rollup — silver_to_gold.py:63-70.
    *
    * pandas `groupby` silently drops rows whose group key is NaN; Spark
    * keeps NULL keys, so every group column is pre-filtered non-null (the
    * reference's `dropna(subset=["lea_id"])` only covers lea_id — county
    * from the normalizer is the silent one). */
  def schoolLeaRollup(school: DataFrame): DataFrame =
    school
      .filter(col("lea_id").isNotNull && col("district_name").isNotNull && col("county").isNotNull)
      .groupBy(col("lea_id"), col("district_name"), col("county"))
      .agg(
        avg(col("ccrpi_score_2023")).as("ccrpi_score_2023_mean"), // mean skips nulls, as pandas
        countDistinct(col("school_id")).as("school_count"))       // nunique skips nulls, as pandas

  /** One housing row per county, keep-FIRST in stable file order —
    * silver_to_gold.py:81. `dropDuplicates` keeps an arbitrary row, so this
    * uses row_number over GEO_ID (unique, file-ordered for ACS exports)
    * for deterministic pandas parity. */
  def housingPerCounty(housing: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("county")).orderBy(col("GEO_ID"))
    housing
      .filter(col("county").isNotNull)
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }

  /** Full gold build. All three inputs are county/LEA-cardinality marts, so
    * both joins broadcast (no shuffle of anything at any realistic scale of
    * this dataset family); the rollup is the only exchange. */
  def buildLeaJoinedGold(housing: DataFrame, school: DataFrame, special: DataFrame): DataFrame = {
    // normalize join keys — silver_to_gold.py:52-60
    val housingKeyed = housing.withColumn("county", Normalize.normalizeCounty(col("county_name")))
    val schoolKeyed = school
      .withColumn("lea_id", trim(col("lea_id").cast("string")))
      .withColumn("county", Normalize.normalizeCounty(col("district_name")))
    val specialKeyed = special.withColumn("lea_id", trim(col("lea_id").cast("string")))

    val schoolLea = schoolLeaRollup(schoolKeyed)

    // J1: left join special-ed by LEA (fan-out on duplicate lea_id preserved
    // deliberately — silver_to_gold.py:73-77, SURVEY.md §7.3.4)
    val leaJoined = schoolLea.join(
      specialKeyed.select("lea_id", "total_swd", "pct_inclusive_80_plus", "school_year"),
      Seq("lea_id"), "left")

    // J2 + J3: housing deduped per county, inner join restricts to counties
    // present in housing — silver_to_gold.py:81-84
    val joined = leaJoined.join(housingPerCounty(housingKeyed), Seq("county"), "inner")

    // pandas merge column order: left frame's columns, then right's minus the
    // key (Spark's Seq-join puts the key first) — FIXTURES.md A4 golden schema
    joined.select(
      (Seq("lea_id", "district_name", "county", "ccrpi_score_2023_mean", "school_count",
        "total_swd", "pct_inclusive_80_plus", "school_year", "GEO_ID", "county_name",
        "occupied_housing_units") ++ graft.clean.Silver.Housing.burdenCols :+
        "total_cost_burden_30_plus_pct").map(col): _*)
  }
}
