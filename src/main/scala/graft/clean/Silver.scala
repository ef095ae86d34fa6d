package graft.clean

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Bronze→silver cleaning transforms — SURVEY.md §2.2 P1–P9, one object per
  * reference dataset. Pure DataFrame→DataFrame; sources/sinks live in
  * graft.io. All numeric coercion is `try_cast` (null-on-failure), the exact
  * Spark spelling of pandas `to_numeric(errors="coerce")`
  * (`bronze_to_silver.py:96-98`, `:150-152`) that stays correct under ANSI
  * mode (SURVEY.md §7.3.3).
  */
object Silver {

  private def toDouble(c: Column): Column = c.cast("string").try_cast("double")

  /** Guarded percentage: 100 * num / den with den==0 → NULL
    * (`…/(units.replace({0: NA})) * 100.0`, bronze_to_silver.py:109-112). */
  def guardedPct(num: Column, den: Column): Column =
    num / nullif(den, lit(0.0)) * lit(100.0)

  /** Housing (ACS S2503 CSV) cleaning — bronze_to_silver.py:60-112. */
  object Housing {
    val burdenCols: Seq[String] = Seq(
      "inc_lt_20k_cost_burden_30_plus",
      "inc_20k_34_999_cost_burden_30_plus",
      "inc_35k_49_999_cost_burden_30_plus",
      "inc_50k_74_999_cost_burden_30_plus",
      "inc_75k_plus_cost_burden_30_plus")

    val renames: Seq[(String, String)] = Seq(
      "GEO_ID" -> "GEO_ID",
      "NAME" -> "county_name",
      "S2503_C01_001E" -> "occupied_housing_units",
      "S2503_C01_028E" -> "inc_lt_20k_cost_burden_30_plus",
      "S2503_C01_032E" -> "inc_20k_34_999_cost_burden_30_plus",
      "S2503_C01_036E" -> "inc_35k_49_999_cost_burden_30_plus",
      "S2503_C01_040E" -> "inc_50k_74_999_cost_burden_30_plus",
      "S2503_C01_044E" -> "inc_75k_plus_cost_burden_30_plus")

    def clean(raw: DataFrame): DataFrame = {
      val selected = raw
        // P1: drop the ACS human-readable label row (data row 0)
        .filter(col("GEO_ID") =!= "Geography")
        // P2+P3: project + rename
        .select(renames.map { case (from, to) => col(from).as(to) }: _*)
      // P4: coerce-to-null numerics (occupied units + 5 burden tiers)
      val typed = ("occupied_housing_units" +: burdenCols)
        .foldLeft(selected)((df, c) => df.withColumn(c, toDouble(col(c))))
      // P5+P6: fillna(0) then row-wise sum of the burden tiers;
      // P7+P8: guarded division by occupied units, ×100
      val burdenSum = burdenCols.map(c => coalesce(col(c), lit(0.0))).reduce(_ + _)
      typed.withColumn("total_cost_burden_30_plus_pct",
        guardedPct(burdenSum, col("occupied_housing_units")))
    }
  }

  /** School performance (XLSX) cleaning — bronze_to_silver.py:115-125. */
  object School {
    def clean(raw: DataFrame): DataFrame =
      raw.select(
        col("schoolid").cast("string").as("school_id"),
        col("schoolname").cast("string").as("school_name"),
        col("systemid").cast("string").as("lea_id"),
        col("systemname").cast("string").as("district_name"),
        toDouble(col("single_score_23")).as("ccrpi_score_2023"))
  }

  /** Special education (CSV, header at row 4) cleaning —
    * bronze_to_silver.py:128-162. */
  object SpecialEd {
    def clean(raw: DataFrame): DataFrame = {
      val inclusive = "School Age Inside regular class 80% or more of the day"
      raw.select(
        col("State LEA ID").cast("string").as("lea_id"),
        col("LEA Name").cast("string").as("district_name"),
        toDouble(col("School Age All Educational Environments")).as("total_swd"),
        toDouble(col(inclusive)).as("inclusive_80_plus"),
        col("School Year").cast("string").as("school_year"))
        // P7: share of SWD inside regular class 80%+ (0-denominator → NULL)
        .withColumn("pct_inclusive_80_plus",
          guardedPct(col("inclusive_80_plus"), col("total_swd")))
        // final projection/order — bronze_to_silver.py:160-162
        .select("lea_id", "district_name", "total_swd", "pct_inclusive_80_plus", "school_year")
    }
  }
}
